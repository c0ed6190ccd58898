"""Wavelength-minor N-stream solver vs the generic wavelength-leading
solver (which itself is validated against a brute-force matrix-exponential
oracle and DISORT 7a)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sasktran2_tpu.ops import lanes
from sasktran2_tpu.rt import disco
from sasktran2_tpu.rt.disco_nstream import solve_nstream


def _random_problem(rng, W=6, P=13, L=None, nstr=8):
    L = L or nstr
    dtau = rng.uniform(0.01, 0.7, (W, P))
    omega = rng.uniform(0.3, 0.97, (W, P))
    ls = np.arange(L)
    g = rng.uniform(0.2, 0.8, (W, P, 1))
    beta = (2 * ls + 1) * g**ls
    albedo = rng.uniform(0.0, 0.8, (W,))
    return dtau, omega, beta, albedo


def _compare(nstr, thermal=False, include_ss=True, chapman=False,
             num_azimuth=None, mu0=0.6, rtol=1e-9):
    rng = np.random.default_rng(42 + nstr)
    W, P = 6, 13
    dtau, omega, beta, albedo = _random_problem(rng, W, P, nstr=nstr)
    user_mu = np.array([0.35, 0.8, 0.55])
    user_up = np.array([True, True, False])
    user_azi = np.array([0.0, 1.2, 2.4])
    tables = disco.build_mode_tables(
        nstr, beta.shape[-1], mu0, user_mu, num_azimuth=num_azimuth
    )

    kw = {}
    kw_t = {}
    if thermal:
        b0 = rng.uniform(0.5, 2.0, (W, P))
        b1b = rng.uniform(0.5, 2.0, (W, P))
        se = rng.uniform(0.0, 1.0, (W,))
        kw = {
            "thermal_b0": jnp.asarray(b0),
            "thermal_b1_bottom": jnp.asarray(b1b),
            "surface_emission": jnp.asarray(se),
        }
        kw_t = {
            "thermal_b0": jnp.asarray(b0.T),
            "thermal_b1_bottom": jnp.asarray(b1b.T),
            "surface_emission": jnp.asarray(se),
        }
    chap = None
    if chapman:
        chap = np.tril(rng.uniform(1.0, 3.0, (P, P)))

    ref = disco.solve_plane_parallel(
        jnp.asarray(dtau), jnp.asarray(omega), jnp.asarray(beta),
        jnp.asarray(albedo), tables, user_up, user_azi,
        include_ss=include_ss, chapman=chap, f0=1.3,
        num_azimuth=num_azimuth, **kw,
    )  # [W, U]
    got = solve_nstream(
        jnp.asarray(dtau.T), jnp.asarray(omega.T),
        jnp.asarray(np.transpose(beta, (2, 1, 0))),
        jnp.asarray(albedo), tables, user_up, user_azi,
        include_ss=include_ss, chapman=chap, f0=1.3,
        num_azimuth=num_azimuth, **kw_t,
    )  # [U, W]
    np.testing.assert_allclose(np.asarray(got).T, np.asarray(ref),
                               rtol=rtol, atol=1e-12)


@pytest.mark.parametrize("nstr", [2, 4, 6, 8, 10, 16])
def test_nstream_matches_generic(nstr):
    # odd nstr/2 (6, 10) exercises the odd-n Jacobi pad path
    _compare(nstr)


def test_nstream_thermal():
    _compare(8, thermal=True)


def test_nstream_no_ss_chapman():
    _compare(4, include_ss=False, chapman=True, mu0=0.4)


def test_nstream_forced_azimuth():
    _compare(8, num_azimuth=2)


def test_nstream_gradients_match():
    """VJP through the wavelength-minor solver matches the generic one.
    (nstr=4/P=7: the comparison is layout-vs-layout at identical physics,
    so small sizes fully exercise it; sized for compile time.)"""
    rng = np.random.default_rng(7)
    W, P, nstr = 3, 7, 4
    dtau, omega, beta, albedo = _random_problem(rng, W, P, nstr=nstr)
    user_mu = np.array([0.7])
    user_up = np.array([True])
    user_azi = np.array([0.8])
    tables = disco.build_mode_tables(nstr, beta.shape[-1], 0.6, user_mu)

    def loss_ref(d, o, b, a):
        r = disco.solve_plane_parallel(
            d, o, b, a, tables, user_up, user_azi
        )
        return jnp.sum(r * jnp.arange(1.0, r.size + 1).reshape(r.shape))

    def loss_min(d, o, b, a):
        r = solve_nstream(
            d.T, o.T, jnp.transpose(b, (2, 1, 0)), a, tables,
            user_up, user_azi,
        ).T
        return jnp.sum(r * jnp.arange(1.0, r.size + 1).reshape(r.shape))

    args = (jnp.asarray(dtau), jnp.asarray(omega), jnp.asarray(beta),
            jnp.asarray(albedo))
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    g_min = jax.grad(loss_min, argnums=(0, 1, 2, 3))(*args)
    for gr, gm in zip(g_ref, g_min):
        np.testing.assert_allclose(np.asarray(gm), np.asarray(gr),
                                   rtol=1e-7, atol=1e-12)


@pytest.mark.parametrize("nstr", [4, 16])
def test_engine_nstream_fast_path_matches_generic(nstr):
    """The engine's wavelength-minor N-stream fast path (DiscreteOrdinates
    MS at nstr>2) reproduces the generic per-wavelength path, including
    WFs (same structure as the two-stream engine parity test)."""
    import sasktran2_tpu as sk
    from sasktran2_tpu.climatology import add_us76_standard_atmosphere

    config = sk.Config(
        num_streams=nstr,
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
            engine._twostream_fast_ok = lambda: False
        else:
            assert engine._twostream_fast_ok()
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
        # same formulation-difference bound rationale as the two-stream
        # engine parity test (tests/test_twostream.py)
        np.testing.assert_allclose(
            a, b, rtol=1e-6, atol=1e-4 * np.abs(b).max(), err_msg=key,
        )


# ---- lane primitives ----------------------------------------------------

def test_lane_cholesky_and_solves():
    rng = np.random.default_rng(0)
    B, N, W = 5, 6, 4
    a = rng.normal(size=(B, N, N, W))
    spd = np.einsum("bikw,bjkw->bijw", a, a) + 3.0 * np.eye(N)[:, :, None]
    ell = lanes.lane_cholesky(jnp.asarray(spd))
    rec = lanes.lane_mm(ell, lanes.lane_t(ell))
    np.testing.assert_allclose(np.asarray(rec), spd, rtol=1e-10, atol=1e-10)

    b = rng.normal(size=(B, N, 3, W))
    x = lanes.lane_solve_lower(ell, jnp.asarray(b))
    np.testing.assert_allclose(
        np.asarray(lanes.lane_mm(ell, x)), b, rtol=1e-9, atol=1e-10
    )
    xu = lanes.lane_solve_upper(lanes.lane_t(ell), jnp.asarray(b))
    np.testing.assert_allclose(
        np.asarray(lanes.lane_mm(lanes.lane_t(ell), xu)), b,
        rtol=1e-9, atol=1e-10,
    )


def test_lane_gauss_solve():
    rng = np.random.default_rng(1)
    B, K, W = 3, 7, 5
    a = rng.normal(size=(B, K, K, W)) + 4.0 * np.eye(K)[:, :, None]
    b = rng.normal(size=(B, K, 2, W))
    x = lanes.lane_gauss_solve(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(
        np.asarray(lanes.lane_mm(jnp.asarray(a), x)), b,
        rtol=1e-8, atol=1e-9,
    )


@pytest.mark.parametrize(
    "solver", [lanes.lane_jacobi_eigh, lanes.lane_jacobi_eigh_scan]
)
@pytest.mark.parametrize("N", [3, 5, 7, 8])
def test_lane_jacobi_eigh(N, solver):
    # odd N exercises the isolated-pad path (advisor round-2 finding: the
    # pad diagonal must never rotate into the live block); both the
    # fully-unrolled and the sweep-scan (production) variants are covered
    rng = np.random.default_rng(2)
    B, W = 4, 3
    a = rng.normal(size=(B, N, N, W))
    sym = 0.5 * (a + np.swapaxes(a, -3, -2))
    wv, v = solver(jnp.asarray(sym))
    # A v_a = w_a v_a
    av = lanes.lane_mm(jnp.asarray(sym), v)
    wv_b = np.asarray(wv)[..., None, :, :] * np.asarray(v)
    np.testing.assert_allclose(np.asarray(av), wv_b, rtol=1e-8, atol=1e-8)
    # eigenvalues match numpy (sorted)
    for b in range(B):
        for w_ in range(W):
            expect = np.linalg.eigvalsh(sym[b, :, :, w_])
            got = np.sort(np.asarray(wv)[b, :, w_])
            np.testing.assert_allclose(got, expect, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize(
    "solver",
    [lanes.lane_block_tridiag_solve, lanes.lane_block_thomas_solve],
)
def test_lane_block_tridiag(solver):
    # covers both the cyclic-reduction variant and the custom-VJP Thomas
    # scan (the production BVP path)
    rng = np.random.default_rng(3)
    P, K, W = 11, 4, 6
    lo = rng.normal(size=(P, K, K, W)) * 0.3
    up = rng.normal(size=(P, K, K, W)) * 0.3
    di = rng.normal(size=(P, K, K, W)) + 5.0 * np.eye(K)[:, :, None]
    r = rng.normal(size=(P, K, W))
    x = solver(
        jnp.asarray(lo), jnp.asarray(di), jnp.asarray(up), jnp.asarray(r)
    )
    x_np = np.asarray(x)
    # verify residual per lane with a dense reconstruction
    for w_ in range(W):
        big = np.zeros((P * K, P * K))
        for p in range(P):
            big[p * K:(p + 1) * K, p * K:(p + 1) * K] = di[p, :, :, w_]
            if p > 0:
                big[p * K:(p + 1) * K, (p - 1) * K:p * K] = lo[p, :, :, w_]
            if p < P - 1:
                big[p * K:(p + 1) * K, (p + 1) * K:(p + 2) * K] = (
                    up[p, :, :, w_]
                )
        expect = np.linalg.solve(big, r[:, :, w_].ravel())
        np.testing.assert_allclose(
            x_np[:, :, w_].ravel(), expect, rtol=1e-8, atol=1e-9
        )


@pytest.mark.parametrize("nstr", [4, 16])
def test_engine_limb_fast_path_matches_generic(nstr):
    """Limb scans through the wavelength-minor N-stream path (internals +
    ms_source_along_rays_minor) reproduce the generic per-wavelength limb
    path, including WFs — the round-2 gap where limb always fell back to
    the padded generic route."""
    import sasktran2_tpu as sk
    from sasktran2_tpu.climatology import add_us76_standard_atmosphere

    config = sk.Config(
        num_streams=nstr,
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
            engine._twostream_fast_ok = lambda: False
        else:
            assert engine._twostream_fast_ok()
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
