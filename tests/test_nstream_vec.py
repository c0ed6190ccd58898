"""Wavelength-minor polarized solver vs the generic wavelength-leading
polarized solver (which itself is validated against the Coulson tables and
a brute-force vector oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sasktran2_tpu.rt import disco_vec
from sasktran2_tpu.rt.disco_vec_minor import (
    build_vector_minor_tables,
    solve_nstream_vector,
)


def _random_vector_problem(rng, W=5, P=9, L=None, nstr=4):
    L = L or nstr
    dtau = rng.uniform(0.01, 0.6, (W, P))
    omega = rng.uniform(0.3, 0.97, (W, P))
    ls = np.arange(L)
    # Rayleigh-like greeks blended with an HG tail keeps a2/a3/b1 nonzero
    # and physically plausible
    g = rng.uniform(0.2, 0.7, (W, P, 1))
    a1 = (2 * ls + 1) * g**ls
    a2 = 0.7 * a1 * (ls >= 2)
    a3 = 0.5 * a1 * (ls >= 2)
    b1 = 0.3 * a1 * (ls >= 2)
    albedo = rng.uniform(0.0, 0.8, (W,))
    return dtau, omega, a1, a2, a3, b1, albedo


@pytest.mark.parametrize("nstr", [2, 4, 8])
def test_vector_minor_matches_generic(nstr):
    rng = np.random.default_rng(7 + nstr)
    W, P = 5, 9
    dtau, omega, a1, a2, a3, b1, albedo = _random_vector_problem(
        rng, W, P, nstr=nstr
    )
    user_mu = np.array([0.35, 0.8, 0.55])
    user_up = np.array([True, True, False])
    user_azi = np.array([0.4, 1.2, 2.4])
    L = a1.shape[-1]
    mu0 = 0.6

    tab_gen = disco_vec.build_vector_mode_tables(nstr, L, mu0, user_mu)
    rad_gen = disco_vec.solve_plane_parallel_vector(
        jnp.asarray(dtau), jnp.asarray(omega),
        jnp.asarray(a1), jnp.asarray(a2), jnp.asarray(a3), jnp.asarray(b1),
        jnp.asarray(albedo), tab_gen, user_up, user_azi,
    )  # [W, U, 3]

    tab_min = build_vector_minor_tables(nstr, L, mu0, user_mu)
    rad_min = solve_nstream_vector(
        jnp.asarray(dtau.T), jnp.asarray(omega.T),
        jnp.asarray(np.moveaxis(a1, -1, 0).transpose(0, 2, 1)),
        jnp.asarray(np.moveaxis(a2, -1, 0).transpose(0, 2, 1)),
        jnp.asarray(np.moveaxis(a3, -1, 0).transpose(0, 2, 1)),
        jnp.asarray(np.moveaxis(b1, -1, 0).transpose(0, 2, 1)),
        jnp.asarray(albedo), tab_min, user_up, user_azi,
    )  # [U, 3, W]

    np.testing.assert_allclose(
        np.moveaxis(np.asarray(rad_min), -1, 0),
        np.asarray(rad_gen),
        rtol=1e-9, atol=1e-12,
    )


def test_vector_minor_no_ss():
    rng = np.random.default_rng(3)
    nstr, W, P = 4, 4, 7
    dtau, omega, a1, a2, a3, b1, albedo = _random_vector_problem(
        rng, W, P, nstr=nstr
    )
    user_mu = np.array([0.5])
    user_up = np.array([True])
    user_azi = np.array([0.9])
    L = a1.shape[-1]
    mu0 = 0.72

    tab_gen = disco_vec.build_vector_mode_tables(nstr, L, mu0, user_mu)
    rad_gen = disco_vec.solve_plane_parallel_vector(
        jnp.asarray(dtau), jnp.asarray(omega),
        jnp.asarray(a1), jnp.asarray(a2), jnp.asarray(a3), jnp.asarray(b1),
        jnp.asarray(albedo), tab_gen, user_up, user_azi, include_ss=False,
    )
    tab_min = build_vector_minor_tables(nstr, L, mu0, user_mu)
    rad_min = solve_nstream_vector(
        jnp.asarray(dtau.T), jnp.asarray(omega.T),
        jnp.asarray(np.moveaxis(a1, -1, 0).transpose(0, 2, 1)),
        jnp.asarray(np.moveaxis(a2, -1, 0).transpose(0, 2, 1)),
        jnp.asarray(np.moveaxis(a3, -1, 0).transpose(0, 2, 1)),
        jnp.asarray(np.moveaxis(b1, -1, 0).transpose(0, 2, 1)),
        jnp.asarray(albedo), tab_min, user_up, user_azi, include_ss=False,
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(rad_min), -1, 0), np.asarray(rad_gen),
        rtol=1e-9, atol=1e-12,
    )


def test_vector_minor_gradients_match():
    """Jacobians of the two layouts agree (vjp through both)."""
    rng = np.random.default_rng(11)
    nstr, W, P = 4, 3, 5
    dtau, omega, a1, a2, a3, b1, albedo = _random_vector_problem(
        rng, W, P, nstr=nstr
    )
    user_mu = np.array([0.6])
    user_up = np.array([True])
    user_azi = np.array([0.0])
    L = a1.shape[-1]
    mu0 = 0.6

    tab_gen = disco_vec.build_vector_mode_tables(nstr, L, mu0, user_mu)
    tab_min = build_vector_minor_tables(nstr, L, mu0, user_mu)

    def f_gen(d, o):
        return jnp.sum(disco_vec.solve_plane_parallel_vector(
            d, o,
            jnp.asarray(a1), jnp.asarray(a2), jnp.asarray(a3),
            jnp.asarray(b1),
            jnp.asarray(albedo), tab_gen, user_up, user_azi,
        ))

    def f_min(d, o):
        return jnp.sum(solve_nstream_vector(
            d.T, o.T,
            jnp.asarray(np.moveaxis(a1, -1, 0).transpose(0, 2, 1)),
            jnp.asarray(np.moveaxis(a2, -1, 0).transpose(0, 2, 1)),
            jnp.asarray(np.moveaxis(a3, -1, 0).transpose(0, 2, 1)),
            jnp.asarray(np.moveaxis(b1, -1, 0).transpose(0, 2, 1)),
            jnp.asarray(albedo), tab_min, user_up, user_azi,
        ))

    g_gen = jax.grad(f_gen, argnums=(0, 1))(
        jnp.asarray(dtau), jnp.asarray(omega)
    )
    g_min = jax.grad(f_min, argnums=(0, 1))(
        jnp.asarray(dtau), jnp.asarray(omega)
    )
    for a, b in zip(g_gen, g_min):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-11
        )


@pytest.mark.parametrize("nstr", [4])
def test_engine_polarized_fast_path_matches_generic(nstr):
    """The engine's wavelength-minor POLARIZED fast path (nstokes=3
    ground/nadir DO groups) reproduces the generic per-wavelength
    polarized route, including WFs."""
    import sasktran2_tpu as sk
    from sasktran2_tpu.climatology import add_us76_standard_atmosphere

    config = sk.Config(
        num_streams=nstr,
        num_stokes=3,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
        num_singlescatter_moments=4,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 60000, 11),
        geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, 0.3, 0.8, 2e5))
    viewing.add_ray(sk.GroundViewingSolar(0.6, 1.1, 0.5, 2e5))

    def run(force_generic):
        engine = sk.Engine(config, geometry, viewing)
        if force_generic:
            engine._polarized_fast_ok = lambda: False
        else:
            assert engine._polarized_fast_ok()
        atmo = sk.Atmosphere(
            geometry, config, wavelengths_nm=np.array([350.0, 550.0]),
        )
        add_us76_standard_atmosphere(atmo)
        atmo["rayleigh"] = sk.constituent.Rayleigh()
        atmo["surface"] = sk.constituent.LambertianSurface(0.3)
        return engine.calculate_radiance(atmo)

    out_fast = run(False)
    out_gen = run(True)
    for key in out_gen.keys():
        a = out_fast[key].to_numpy()
        b = out_gen[key].to_numpy()
        np.testing.assert_allclose(
            a, b, rtol=1e-6, atol=1e-4 * np.abs(b).max(), err_msg=key,
        )


def test_engine_polarized_limb_fast_path_matches_generic():
    """The engine's wavelength-minor POLARIZED LIMB fast path
    (SZA-interpolated vector DO source) reproduces the generic
    per-wavelength polarized route, including WFs."""
    import sasktran2_tpu as sk
    from sasktran2_tpu.climatology import add_us76_standard_atmosphere

    config = sk.Config(
        num_streams=4,
        num_stokes=3,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.Exact,
        num_singlescatter_moments=4,
        num_do_sza=2,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 60000, 11),
        geometry_type=sk.GeometryType.Spherical,
    )
    viewing = sk.ViewingGeometry()
    for talt in (15000.0, 30000.0):
        viewing.add_ray(sk.TangentAltitudeSolar(talt, 0.4, 2e5, 0.6))

    def run(force_generic):
        engine = sk.Engine(config, geometry, viewing)
        if force_generic:
            engine._polarized_fast_ok = lambda: False
        else:
            assert engine._polarized_fast_ok()
        atmo = sk.Atmosphere(
            geometry, config, wavelengths_nm=np.array([350.0, 550.0]),
        )
        add_us76_standard_atmosphere(atmo)
        atmo["rayleigh"] = sk.constituent.Rayleigh()
        atmo["surface"] = sk.constituent.LambertianSurface(0.3)
        return engine.calculate_radiance(atmo)

    out_fast = run(False)
    out_gen = run(True)
    for key in out_gen.keys():
        a = out_fast[key].to_numpy()
        b = out_gen[key].to_numpy()
        np.testing.assert_allclose(
            a, b, rtol=1e-6, atol=1e-4 * np.abs(b).max(), err_msg=key,
        )


def test_vector_minor_16_streams_vs_bruteforce():
    """Polarized 16 streams against the dense matrix-exponential vector
    oracle (tests/bruteforce.py solve_brute_vector — a completely
    different algorithm). Closes the round-4 envelope gap: the polarized
    suite previously capped at nstr=8 because the ENGINE graph at
    polarized nstr=16 is compile-prohibitive on CPU; the solver-level
    graph compiles in ~60 s. Thin layers keep the ORACLE's growing expm
    modes (e^{k dtau}, k up to ~92 at nstr=16) well conditioned."""
    from .bruteforce import solve_brute_vector

    nstr = 16
    L = nstr
    P = 4
    M = 4
    rng = np.random.default_rng(61)
    dtau = rng.uniform(0.002, 0.03, P)
    omega = rng.uniform(0.6, 0.95, P)
    ls = np.arange(L)
    g = rng.uniform(0.3, 0.6, (P, 1))
    a1 = (2 * ls + 1) * g**ls
    a2 = 0.7 * a1 * (ls >= 2)
    a3 = 0.5 * a1 * (ls >= 2)
    b1 = 0.3 * a1 * (ls >= 2)
    albedo = 0.3
    mu0 = 0.55
    user_mu = np.array([0.9, 0.4])
    user_up = np.array([True, False])
    user_azi = np.array([0.4, 1.7])

    tab = build_vector_minor_tables(nstr, L, mu0, user_mu, num_azimuth=M)
    rad = solve_nstream_vector(
        jnp.asarray(dtau)[:, None], jnp.asarray(omega)[:, None],
        jnp.asarray(a1.T)[:, :, None], jnp.asarray(a2.T)[:, :, None],
        jnp.asarray(a3.T)[:, :, None], jnp.asarray(b1.T)[:, :, None],
        jnp.asarray([albedo]), tab, user_up, user_azi, num_azimuth=M,
    )  # [U, 3, W]
    ref = solve_brute_vector(
        dtau, omega, a1, a2, a3, b1, albedo, mu0, nstr,
        user_mu, user_up, user_azi, num_azimuth=M,
    )  # [U, 3]
    np.testing.assert_allclose(
        np.asarray(rad)[:, :, 0], ref, rtol=3e-5, atol=1e-9
    )


def test_vector_minor_dolp_16_vs_8_converged():
    """Conservative Rayleigh slab (the Korkin regime) at the solver
    level: the nstr=16 Stokes vector and DOLP must match the nstr=8
    stream-converged values (the slab has only l <= 2 moments)."""
    L = 3
    P = 6
    a1 = np.zeros((P, L)); a1[:, 0] = 1.0; a1[:, 2] = 0.5  # noqa: E702
    a2 = np.zeros((P, L)); a2[:, 2] = 3.0                  # noqa: E702
    a3 = np.zeros((P, L))
    b1 = np.zeros((P, L)); b1[:, 2] = np.sqrt(6.0) / 2.0   # noqa: E702
    dtau = np.full(P, 0.25 / P)
    omega = np.full(P, 1.0)
    mu0 = 0.9999
    user_mu = np.array([0.7575])  # ~ vza 40.76 deg
    user_up = np.array([True])
    user_azi = np.array([np.pi])

    def run(nstr):
        tab = build_vector_minor_tables(nstr, L, mu0, user_mu,
                                        num_azimuth=3)
        r = solve_nstream_vector(
            jnp.asarray(dtau)[:, None], jnp.asarray(omega)[:, None],
            jnp.asarray(a1.T)[:, :, None], jnp.asarray(a2.T)[:, :, None],
            jnp.asarray(a3.T)[:, :, None], jnp.asarray(b1.T)[:, :, None],
            jnp.asarray([0.0]), tab, user_up, user_azi, num_azimuth=3,
        )
        return np.asarray(r)[0, :, 0]

    iqu16 = run(16)
    iqu8 = run(8)
    # measured: I differs 1.1e-3 relative between 8 and 16 streams
    # (stream convergence of the user-angle quadrature); DOLP agrees at
    # 1.3e-4 because the error is common-mode across I and Q
    np.testing.assert_allclose(iqu16, iqu8, rtol=5e-3,
                               atol=1e-5 * abs(iqu8[0]))
    dolp16 = np.hypot(iqu16[1], iqu16[2]) / iqu16[0]
    dolp8 = np.hypot(iqu8[1], iqu8[2]) / iqu8[0]
    np.testing.assert_allclose(dolp16, dolp8, rtol=1e-3)
    assert 0.1 < dolp16 < 0.7
