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


def test_polarized_do_thermal_matches_scalar():
    """Polarized DO thermal: with scalar-equivalent Greek matrices
    (a2=a3=b1=0) the I channel must equal the scalar solver's thermal
    radiance and Q=U must vanish (solver-level check)."""
    import jax.numpy as jnp

    from sasktran2_tpu.rt import disco, disco_vec

    rng = np.random.default_rng(11)
    P, L, nstr = 6, 4, 8
    dtau = rng.uniform(0.05, 0.4, P)
    omega = rng.uniform(0.2, 0.8, P)
    ls = np.arange(L)
    a1 = np.broadcast_to((2 * ls + 1) * 0.4**ls, (P, L)).copy()
    zeros = np.zeros((P, L))
    mu0 = 0.6
    user_mu = np.array([0.7, 0.35])
    user_up = np.array([True, False])
    user_azi = np.array([0.4, 1.7])
    albedo = 0.25
    b_top = 1e-5 * np.linspace(1.0, 0.6, P)
    b_bot = 1e-5 * np.linspace(0.95, 0.55, P)
    surf_em = 2e-5

    kw = dict(
        thermal_b0=jnp.asarray(b_top)[None],
        thermal_b1_bottom=jnp.asarray(b_bot)[None],
        surface_emission=jnp.asarray([surf_em]),
        f0=jnp.asarray([0.3]),
    )
    t_s = disco.build_mode_tables(nstr, L, mu0, user_mu)
    rad_s = np.asarray(disco.solve_plane_parallel(
        jnp.asarray(dtau)[None], jnp.asarray(omega)[None],
        jnp.asarray(a1)[None], jnp.asarray([albedo]), t_s, user_up,
        user_azi, **kw,
    ))[0]

    t_v = disco_vec.build_vector_mode_tables(nstr, L, mu0, user_mu)
    rad_v = np.asarray(disco_vec.solve_plane_parallel_vector(
        jnp.asarray(dtau)[None], jnp.asarray(omega)[None],
        jnp.asarray(a1)[None], jnp.asarray(zeros)[None],
        jnp.asarray(zeros)[None], jnp.asarray(zeros)[None],
        jnp.asarray([albedo]), t_v, user_up, user_azi, **kw,
    ))[0]

    np.testing.assert_allclose(rad_v[:, 0], rad_s, rtol=1e-10)
    np.testing.assert_allclose(rad_v[:, 1:], 0.0, atol=1e-12)


def test_polarized_thermal_isothermal_blackbody():
    """Polarized engine: optically thick isothermal absorber -> I = B,
    Q = U = 0 (blackbody radiation is unpolarized)."""
    B = 2.5e-5
    config = sk.Config(
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
        emission_source=sk.EmissionSource.DiscreteOrdinates,
        num_streams=4,
        num_singlescatter_moments=4,
        num_stokes=3,
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
    rad = engine.calculate_radiance(atmosphere)["radiance"].to_numpy()[0, 0]
    np.testing.assert_allclose(rad[0], B, rtol=1e-6)
    np.testing.assert_allclose(rad[1:3], 0.0, atol=1e-12 * B)


def test_polarized_disort7a_thermal_I():
    """DISORT 7a thermal-only through the polarized engine: the I channel
    must reproduce the scalar oracle (thermal emission is unpolarized; the
    scattered field polarizes only through the a2/b1 Greek terms, which the
    scalar-equivalent phase expansion sets to zero here). Nadir viewing:
    only the m=0 azimuth mode contributes, so one forced mode suffices."""
    _, geometry, viewing, _ = _disort7a_setup(100.0)
    config = sk.Config(
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
        emission_source=sk.EmissionSource.DiscreteOrdinates,
        num_streams=16,
        num_singlescatter_moments=17,
        delta_m_scaling=True,
        num_stokes=3,
        num_forced_azimuth=1,
    )
    atmosphere = sk.Atmosphere(geometry, config, numwavel=1,
                               calculate_derivatives=False)
    atmosphere.storage.total_extinction[:] = 100.0 / 1000.0
    atmosphere.storage.ssa[:] = 0.95
    atmosphere.storage.solar_irradiance[:] = 0.0
    atmosphere.storage.emission_source[:] = 1.09657540e-05
    for l_idx in range(17):
        atmosphere.leg_coeff.a1[l_idx][:] = 0.75**l_idx * (2 * l_idx + 1)
    engine = sk.Engine(config, geometry, viewing)
    rad = engine.calculate_radiance(atmosphere)["radiance"].to_numpy()[0, 0]
    np.testing.assert_allclose(rad[0], 7.93075833e-06, rtol=1e-5)
