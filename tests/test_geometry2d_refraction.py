"""2D refracted ray paths (role of the reference Rust 2D tracer's
altitude-refracted paths, ``trace2d.rs``): parity with the straight 2D
tracer at n = 1 and with the refracted 1D tracer for a horizontally
uniform atmosphere."""

import numpy as np

import sasktran2_tpu as sk

ALTS = np.linspace(0, 80000, 17)
NH = 11


def _geometry2d():
    g = sk.Geometry2D(
        cos_sza=0.6,
        solar_azimuth=0.0,
        earth_radius_m=6372000.0,
        altitude_grid_m=ALTS,
        horizontal_angle_grid_radians=np.linspace(-0.5, 0.5, NH),
    )
    return g


def _config(refract):
    return sk.Config(
        single_scatter_source=sk.SingleScatterSource.NoSource,
        multiple_scatter_source=sk.MultipleScatterSource.NoSource,
        occultation_source=sk.OccultationSource.Standard,
        output_los_optical_depth=True,
        los_refraction=refract,
    )


def _run_2d(refract, n_profile):
    geometry = _geometry2d()
    geometry.refractive_index = n_profile
    viewing = sk.ViewingGeometry()
    for talt in (12000.0, 25000.0):
        viewing.add_ray(sk.TangentAltitude(talt, 2e5, 0.0, 0.0))
    engine = sk.Engine(_config(refract), geometry, viewing)
    atmo = sk.Atmosphere(geometry, _config(refract), numwavel=1,
                         calculate_derivatives=False)
    prof = 5e-5 * np.exp(-ALTS / 8000.0)
    atmo.storage.total_extinction[:] = np.tile(prof, NH)[:, None]
    atmo.storage.ssa[:] = 0.0
    atmo.leg_coeff.a1[0] = 1.0
    out = engine.calculate_radiance(atmo)
    return out["los_optical_depth"].to_numpy()[0]


def test_2d_refracted_n1_matches_straight():
    """Unit refractive index: the curved tracer must reproduce the
    straight 2D path."""
    n1 = np.ones_like(ALTS)
    od_straight = _run_2d(False, n1)
    od_curved = _run_2d(True, n1)
    np.testing.assert_allclose(od_curved, od_straight, rtol=2e-6)


def test_2d_refracted_matches_1d():
    """Horizontally uniform 2D atmosphere with a real refractivity
    profile: LOS optical depth must match the (validated) refracted 1D
    tracer."""
    n_prof = 1.0 + 2.8e-4 * np.exp(-ALTS / 8000.0)
    od_2d = _run_2d(True, n_prof)

    g1 = sk.Geometry1D(0.6, 0.0, 6372000.0, ALTS,
                       geometry_type=sk.GeometryType.Spherical)
    g1.refractive_index = n_prof
    v1 = sk.ViewingGeometry()
    for talt in (12000.0, 25000.0):
        v1.add_ray(sk.TangentAltitudeSolar(talt, 0.0, 2e5, 0.6))
    c1 = _config(True)
    e1 = sk.Engine(c1, g1, v1)
    atmo = sk.Atmosphere(g1, c1, numwavel=1, calculate_derivatives=False)
    atmo.storage.total_extinction[:] = (
        5e-5 * np.exp(-ALTS / 8000.0)
    )[:, None]
    atmo.storage.ssa[:] = 0.0
    atmo.leg_coeff.a1[0] = 1.0
    od_1d = e1.calculate_radiance(atmo)["los_optical_depth"].to_numpy()[0]
    np.testing.assert_allclose(od_2d, od_1d, rtol=1e-6)

    # the refracted path is genuinely different from the straight one
    od_straight = _run_2d(False, n_prof)
    assert np.all(np.abs(od_2d - od_straight) / od_straight > 1e-4)


def test_2d_solar_refraction_rejected():
    import pytest

    geometry = _geometry2d()
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.TangentAltitude(12000.0, 2e5))
    config = _config(False)
    config.solar_refraction = True
    with pytest.raises(NotImplementedError):
        sk.Engine(config, geometry, viewing)
