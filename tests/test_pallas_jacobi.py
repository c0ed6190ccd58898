"""Pallas tournament-Jacobi eigensolve kernel vs numpy eigvalsh, run in
interpreter mode on the CPU test backend (the production TPU eigensolve
path for the wavelength-minor solvers)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sasktran2_tpu.ops import lanes
from sasktran2_tpu.ops.pallas_jacobi import jacobi_eigh_pallas


@pytest.mark.parametrize(("P", "n", "W"), [(3, 4, 8), (2, 8, 130),
                                           (2, 16, 128)])
def test_pallas_jacobi_matches_numpy(P, n, W):
    rng = np.random.default_rng(P + n)
    a = rng.normal(size=(P, n, n, W)).astype(np.float32)
    sym = 0.5 * (a + np.swapaxes(a, -3, -2))
    wv, v = jacobi_eigh_pallas(jnp.asarray(sym), sweeps=7, interpret=True)
    wv = np.asarray(wv)
    v = np.asarray(v)
    # A v_a = w_a v_a. 5e-4: the f32 7-sweep residual at n=16 is
    # 2.45e-4 for BOTH this kernel and the XLA scan variant (identical
    # algorithm, identical convergence).
    av = np.einsum("pijw,pjaw->piaw", sym, v)
    np.testing.assert_allclose(
        av, wv[:, None, :, :] * v, rtol=5e-4, atol=5e-4
    )
    for p in range(P):
        for w_ in range(0, W, max(1, W // 5)):
            expect = np.linalg.eigvalsh(sym[p, :, :, w_].astype(np.float64))
            got = np.sort(wv[p, :, w_])
            np.testing.assert_allclose(got, expect, rtol=2e-5, atol=2e-5)


def test_pallas_jacobi_matches_scan_variant():
    """Bit-level algorithm parity with the XLA scan formulation (same
    rotations, same order) at f32."""
    rng = np.random.default_rng(0)
    P, n, W = 2, 8, 64
    a = rng.normal(size=(P, n, n, W)).astype(np.float32)
    sym = jnp.asarray(0.5 * (a + np.swapaxes(a, -3, -2)))
    w_ref, v_ref = lanes._lane_jacobi_scan_impl(sym, sweeps=7)
    w_got, v_got = jacobi_eigh_pallas(sym, sweeps=7, interpret=True)
    # not bit-identical: FMA fusion differs between the interpreter and
    # XLA (measured max 5e-6 abs); the algorithm/rotation order is the
    # same
    np.testing.assert_allclose(np.asarray(w_got), np.asarray(w_ref),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v_got), np.asarray(v_ref),
                               rtol=1e-4, atol=2e-5)
