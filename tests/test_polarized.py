"""Polarized (I,Q,U) DISCO solver validation.

Oracle values are the reference engine's executed Coulson-table run
(``/root/reference/docs/performance_book/source/external_validation/
coulsen.ipynb`` cell 1 output: tau=0.5 Rayleigh, ssa=1, mu0=0.2, albedo=0,
40 streams, radiance * pi), plus scalar-consistency and parity checks.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from sasktran2_tpu.rt import disco, disco_vec


def _rayleigh_greek(L=3):
    a1 = np.zeros(L); a1[0] = 1.0; a1[2] = 0.5
    a2 = np.zeros(L); a2[2] = 3.0
    a3 = np.zeros(L)
    b1 = np.zeros(L); b1[2] = np.sqrt(6.0) / 2.0
    return a1, a2, a3, b1


# First 14 rows of the notebook output: (mu, phi_deg) x (I, Q, U) * pi
COULSON_MUS = [0.02] * 7 + [0.06] * 7
COULSON_PHIS = [1e-4, 30, 60, 90, 120, 150, 180] * 2
COULSON_IQU_PI = np.array([
    [4.41293240e-01, 1.75261058e-02, 1.55014156e-07],
    [3.94444790e-01, 6.48478175e-02, 4.39036280e-02],
    [3.00907330e-01, 1.59650679e-01, 7.36552548e-02],
    [2.54653913e-01, 2.07567424e-01, 8.12829559e-02],
    [3.02532989e-01, 1.61276339e-01, 6.71309546e-02],
    [3.97260515e-01, 6.76635417e-02, 3.73793279e-02],
    [4.44544558e-01, 2.07774240e-02, 0.0],
    [3.92505813e-01, 1.77156658e-02, 1.59193697e-07],
    [3.52229443e-01, 5.94372415e-02, 4.42873579e-02],
    [2.72097636e-01, 1.43301327e-01, 7.04698002e-02],
    [2.33392212e-01, 1.86593849e-01, 7.15317627e-02],
    [2.76389542e-01, 1.47593233e-01, 5.34268472e-02],
    [3.59663242e-01, 6.68710404e-02, 2.72444048e-02],
    [4.01089625e-01, 2.62994773e-02, 0.0],
])


def test_vector_reduces_to_scalar():
    """With a2=a3=b1=0 the I channel must equal the scalar solver and
    Q=U=0."""
    rng = np.random.default_rng(5)
    P, L, nstr = 5, 6, 8
    dtau = rng.uniform(0.05, 0.3, P)
    omega = rng.uniform(0.4, 0.95, P)
    g = 0.5
    ls = np.arange(L)
    a1 = np.broadcast_to((2 * ls + 1) * g**ls, (P, L)).copy()
    zeros = np.zeros((P, L))
    mu0 = 0.55
    user_mu = np.array([0.8, 0.45])
    user_up = np.array([True, False])
    user_azi = np.array([0.9, 2.0])
    albedo = 0.4

    t_s = disco.build_mode_tables(nstr, L, mu0, user_mu)
    rad_s = np.asarray(disco.solve_plane_parallel(
        jnp.asarray(dtau)[None], jnp.asarray(omega)[None],
        jnp.asarray(a1)[None], jnp.asarray([albedo]), t_s, user_up, user_azi,
    ))[0]

    t_v = disco_vec.build_vector_mode_tables(nstr, L, mu0, user_mu)
    rad_v = np.asarray(disco_vec.solve_plane_parallel_vector(
        jnp.asarray(dtau)[None], jnp.asarray(omega)[None],
        jnp.asarray(a1)[None], jnp.asarray(zeros)[None],
        jnp.asarray(zeros)[None], jnp.asarray(zeros)[None],
        jnp.asarray([albedo]), t_v, user_up, user_azi,
    ))[0]

    np.testing.assert_allclose(rad_v[:, 0], rad_s, rtol=1e-10)
    np.testing.assert_allclose(rad_v[:, 1:], 0.0, atol=1e-12)


def test_coulson_tables():
    """Polarized Rayleigh vs the reference's executed Coulson run."""
    nstr = 40
    L = 3
    a1, a2, a3, b1 = _rayleigh_greek(L)
    tau = 0.5
    mu0 = 0.2

    user_mu = np.array(COULSON_MUS)
    user_up = np.ones(len(user_mu), dtype=bool)
    user_azi = np.pi - np.deg2rad(np.array(COULSON_PHIS))

    # only m <= 2 modes are nonzero for L = 3 Rayleigh (both MS and the
    # DO single scatter use the truncated expansion)
    tables = disco_vec.build_vector_mode_tables(nstr, L, mu0, user_mu,
                                                num_azimuth=3)
    rad = np.asarray(disco_vec.solve_plane_parallel_vector(
        jnp.asarray([[tau]]), jnp.asarray([[1.0]]),
        jnp.asarray(a1)[None, None], jnp.asarray(a2)[None, None],
        jnp.asarray(a3)[None, None], jnp.asarray(b1)[None, None],
        jnp.asarray([0.0]), tables, user_up, user_azi,
    ))[0] * np.pi

    np.testing.assert_allclose(
        rad[:, 0], COULSON_IQU_PI[:, 0], rtol=3e-4
    )
    np.testing.assert_allclose(
        np.abs(rad[:, 1]), np.abs(COULSON_IQU_PI[:, 1]), rtol=2e-3,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.abs(rad[:, 2]), np.abs(COULSON_IQU_PI[:, 2]), rtol=2e-3,
        atol=1e-6,
    )
    # exact sign conventions
    np.testing.assert_allclose(rad[:, 1], COULSON_IQU_PI[:, 1], rtol=2e-3,
                               atol=1e-6)
    np.testing.assert_allclose(rad[:, 2], COULSON_IQU_PI[:, 2], rtol=2e-3,
                               atol=1e-6)


@pytest.mark.parametrize("thick", [False, True])
def test_polarized_vs_brute_force(thick):
    """Polarized DO vs the independent matrix-exponential oracle
    (bruteforce.solve_brute_vector): same mode formulation, completely
    different solver (expm + pivoted global BVP + trapezoid source
    integration vs Cholesky/Jacobi eigensolve + Green's functions +
    block-tridiagonal elimination). Complements the single-OD Coulson
    anchor with arbitrary greeks at two optical-depth regimes."""
    from .bruteforce import solve_brute_vector

    rng = np.random.default_rng(5 + thick)
    P, L, nstr = 4, 4, 8
    dtau = rng.uniform(0.5, 1.2, P) if thick else rng.uniform(0.1, 0.6, P)
    omega = rng.uniform(0.4, 0.95, P)
    a1 = np.zeros((P, L)); a1[:, 0] = 1.0; a1[:, 2] = 0.5
    a2 = np.zeros((P, L)); a2[:, 2] = 3.0 * rng.uniform(0.5, 1.0, P)
    a3 = np.zeros((P, L))
    b1 = np.zeros((P, L)); b1[:, 2] = np.sqrt(6) / 2 * rng.uniform(0.5, 1.0, P)
    albedo, mu0 = 0.3, 0.55
    user_mu = np.array([0.75, 0.4, 0.6])
    user_up = np.array([True, True, False])
    user_azi = np.array([0.7, 2.1, 1.3])

    tables = disco_vec.build_vector_mode_tables(
        nstr, L, mu0, user_mu, num_azimuth=3
    )
    r_vec = np.asarray(disco_vec.solve_plane_parallel_vector(
        jnp.asarray(dtau)[None], jnp.asarray(omega)[None],
        jnp.asarray(a1)[None], jnp.asarray(a2)[None],
        jnp.asarray(a3)[None], jnp.asarray(b1)[None],
        jnp.asarray([albedo]), tables, user_up, user_azi,
    ))[0]
    r_brute = solve_brute_vector(
        dtau, omega, a1, a2, a3, b1, albedo, mu0, nstr,
        user_mu, user_up, user_azi, num_azimuth=3, nsub=400,
    )
    np.testing.assert_allclose(r_vec, r_brute, rtol=2e-5, atol=1e-7)
