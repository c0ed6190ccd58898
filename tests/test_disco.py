"""DISCO N-stream solver vs an independent brute-force oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from sasktran2_tpu.rt import disco
from .bruteforce import solve_brute


def _case(nlyr=6, L=8, seed=0):
    rng = np.random.default_rng(seed)
    dtau = rng.uniform(0.02, 0.35, nlyr)
    omega = rng.uniform(0.3, 0.95, nlyr)
    # random but physically-admissible phase moments: mixture of HG phases
    g = rng.uniform(0.0, 0.7, nlyr)
    ls = np.arange(L)
    beta = (2 * ls + 1)[None, :] * g[:, None] ** ls[None, :]
    return dtau, omega, beta


@pytest.mark.parametrize(
    ("nstr", "mu0"), [(2, 0.8), (4, 0.35), (8, 0.8), (16, 0.35)]
)
def test_disco_vs_bruteforce(nstr, mu0):
    dtau, omega, beta = _case(L=max(4, nstr))
    albedo = 0.3
    user_mu = np.array([0.9, 0.6, 0.4])
    user_up = np.array([True, True, False])
    user_azi = np.array([0.0, 1.1, 2.2])

    tables = disco.build_mode_tables(nstr, beta.shape[1], mu0, user_mu)
    rad = disco.solve_plane_parallel(
        jnp.asarray(dtau)[None, :],
        jnp.asarray(omega)[None, :],
        jnp.asarray(beta)[None, :, :],
        jnp.asarray([albedo]),
        tables,
        user_up,
        user_azi,
    )
    rad = np.asarray(rad)[0]

    ref = solve_brute(
        dtau, omega, beta, albedo, mu0, nstr, user_mu, user_up, user_azi
    )
    np.testing.assert_allclose(rad, ref, rtol=2e-5, atol=1e-9)


def test_disco_no_ss_term():
    """include_ss=False must remove the direct-beam scattering and direct
    ground reflection but keep the diffuse field."""
    nstr, mu0 = 8, 0.7
    dtau, omega, beta = _case(L=8, seed=3)
    albedo = 0.5
    user_mu = np.array([0.75])
    user_up = np.array([True])
    user_azi = np.array([0.4])
    tables = disco.build_mode_tables(nstr, beta.shape[1], mu0, user_mu)

    args = (
        jnp.asarray(dtau)[None, :],
        jnp.asarray(omega)[None, :],
        jnp.asarray(beta)[None, :, :],
        jnp.asarray([albedo]),
        tables,
        user_up,
        user_azi,
    )
    rad_no_ss = np.asarray(
        disco.solve_plane_parallel(*args, include_ss=False)
    )[0]
    ref = solve_brute(
        dtau, omega, beta, albedo, mu0, nstr, user_mu, user_up, user_azi,
        include_ss=False,
    )
    np.testing.assert_allclose(rad_no_ss, ref, rtol=2e-5, atol=1e-10)


def test_wavelength_batch_consistency():
    """Batched solve must equal per-wavelength solves (the reference's
    threading/batching invariance tests, tests/engine/test_1d_solver_regression.py)."""
    nstr, mu0 = 8, 0.6
    user_mu = np.array([0.8, 0.5])
    user_up = np.array([True, False])
    user_azi = np.array([0.0, 0.7])
    cases = [_case(seed=s) for s in range(4)]
    dtau = jnp.asarray(np.stack([c[0] for c in cases]))
    omega = jnp.asarray(np.stack([c[1] for c in cases]))
    beta = jnp.asarray(np.stack([c[2] for c in cases]))
    albedo = jnp.asarray([0.1, 0.3, 0.5, 0.9])
    tables = disco.build_mode_tables(nstr, beta.shape[-1], mu0, user_mu)

    batched = np.asarray(
        disco.solve_plane_parallel(
            dtau, omega, beta, albedo, tables, user_up, user_azi
        )
    )
    for i in range(4):
        single = np.asarray(
            disco.solve_plane_parallel(
                dtau[i : i + 1],
                omega[i : i + 1],
                beta[i : i + 1],
                albedo[i : i + 1],
                tables,
                user_up,
                user_azi,
            )
        )
        np.testing.assert_allclose(batched[i], single[0], rtol=1e-12)
