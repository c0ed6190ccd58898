"""Thermal emission: DISORT test case 7a oracle values (reference
``tests/engine/thermal_emissions/test_disort.py:6-50``) plus emission WF and
standard-vs-DO consistency checks."""

import numpy as np

import sasktran2_tpu as sk


def _disort7a_setup(od, with_surface_emission=False):
    config = sk.Config(
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
        emission_source=sk.EmissionSource.DiscreteOrdinates,
        num_streams=16,
        num_singlescatter_moments=17,
        delta_m_scaling=True,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6,
        solar_azimuth=0.0,
        earth_radius_m=6372000.0,
        altitude_grid_m=np.array([0.0, 1000.0]),
        geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, 0.0, 1.0, 200000.0))

    atmosphere = sk.Atmosphere(
        geometry, config, numwavel=1, calculate_derivatives=False
    )
    ssa = 0.95
    g = 0.75
    atmosphere.storage.total_extinction[:] = od / 1000.0
    atmosphere.storage.ssa[:] = ssa
    atmosphere.storage.solar_irradiance[:] = 0.0
    atmosphere.storage.emission_source[:] = 1.09657540e-05
    if with_surface_emission:
        atmosphere.surface.emission[:] = 1.09657540e-05
    for l_idx in range(17):
        atmosphere.leg_coeff.a1[l_idx][:] = g**l_idx * (2 * l_idx + 1)
    return config, geometry, viewing, atmosphere


def test_disort_thermal_only_example():
    """DISORT case 7a, thermal only, OD=100: expected 7.93075833e-06
    (reference hard-coded oracle, test_disort.py:55)."""
    config, geometry, viewing, atmosphere = _disort7a_setup(100.0)
    engine = sk.Engine(config, geometry, viewing)
    rad = engine.calculate_radiance(atmosphere)
    np.testing.assert_allclose(
        rad["radiance"].to_numpy()[0, 0, 0], 7.93075833e-06, rtol=1e-5
    )


def test_disort_thermal_with_surface():
    """DISORT 7a variant with surface emission, OD=1: expected
    1.02396134e-05 (test_disort.py:111)."""
    config, geometry, viewing, atmosphere = _disort7a_setup(
        1.0, with_surface_emission=True
    )
    engine = sk.Engine(config, geometry, viewing)
    rad = engine.calculate_radiance(atmosphere)
    np.testing.assert_allclose(
        rad["radiance"].to_numpy()[0, 0, 0], 1.02396134e-05, rtol=1e-5
    )


def test_thermal_isothermal_blackbody_limit():
    """Optically thick isothermal purely-absorbing atmosphere: radiance
    approaches the Planck source (blackbody limit)."""
    B = 2.5e-5
    config = sk.Config(
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
        emission_source=sk.EmissionSource.DiscreteOrdinates,
        num_streams=4,
        num_singlescatter_moments=4,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.array([0.0, 1000.0]),
        geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, 0.0, 0.8, 200000.0))
    atmosphere = sk.Atmosphere(geometry, config, numwavel=1,
                               calculate_derivatives=False)
    atmosphere.storage.total_extinction[:] = 50.0 / 1000.0
    atmosphere.storage.ssa[:] = 1e-8
    atmosphere.storage.solar_irradiance[:] = 0.0
    atmosphere.storage.emission_source[:] = B
    atmosphere.leg_coeff.a1[0][:] = 1.0
    engine = sk.Engine(config, geometry, viewing)
    rad = engine.calculate_radiance(atmosphere)["radiance"].to_numpy()[0, 0, 0]
    np.testing.assert_allclose(rad, B, rtol=1e-6)


def test_emission_standard_vs_do_consistency():
    """Standard (along-ray) and DO emission sources agree for a
    non-scattering atmosphere viewed at nadir."""
    B = 1e-5
    kwargs = dict(
        num_streams=4, num_singlescatter_moments=4,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 10000, 11),
        geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, 0.0, 1.0, 200000.0))

    def run(emission_source, ms):
        config = sk.Config(
            multiple_scatter_source=ms,
            single_scatter_source=(
                sk.SingleScatterSource.DiscreteOrdinates
                if ms != sk.MultipleScatterSource.NoSource
                else sk.SingleScatterSource.NoSource
            ),
            emission_source=emission_source,
            **kwargs,
        )
        atmosphere = sk.Atmosphere(geometry, config, numwavel=1,
                                   calculate_derivatives=False)
        atmosphere.storage.total_extinction[:] = 1e-4 * np.exp(
            -np.linspace(0, 10000, 11) / 3000.0
        )[:, None]
        atmosphere.storage.ssa[:] = 0.0
        atmosphere.storage.solar_irradiance[:] = 0.0
        atmosphere.storage.emission_source[:] = B * np.linspace(
            1.0, 0.5, 11
        )[:, None]
        atmosphere.leg_coeff.a1[0][:] = 1.0
        engine = sk.Engine(config, geometry, viewing)
        return engine.calculate_radiance(atmosphere)["radiance"].to_numpy()[
            0, 0, 0
        ]

    r_do = run(sk.EmissionSource.DiscreteOrdinates,
               sk.MultipleScatterSource.DiscreteOrdinates)
    r_std = run(sk.EmissionSource.Standard,
                sk.MultipleScatterSource.NoSource)
    # the two modes use different within-layer emission models (exponential
    # in OD vs endpoint-blended linear), so agreement is ~1%
    np.testing.assert_allclose(r_do, r_std, rtol=1e-2)
