"""Pallas TPU kernel for the block-tridiagonal Thomas solve.

Round-5 roofline: the XLA ``lax.scan`` Thomas solve is the 16-stream hot
spot at ~24 GB/s and ~6.5 GFLOP/s — latency-bound by 2 x P sequential
scan steps whose bodies are tiny kernels, each paying launch/fusion
overhead. This kernel runs the whole forward elimination as ONE Pallas
program with the carry (c_p, y_p) resident in VMEM scratch across the
sequential layer grid dimension, and the back substitution as a second
program iterating the layer grid in reverse. Layer blocks stream through
Pallas' automatic double-buffered pipeline, so the cost is the
irreducible HBM traffic (read lo/di/up/rhs once, write c/y once, read
them back once) instead of 200 kernel launches.

Same contract as ``lanes.lane_block_thomas_solve``'s batched core: lo /
di / up [P, K, K, W] (layer axis leading), rhs [P, K, W], ``lower[0]`` /
``upper[P-1]`` ignored, no pivoting (well-scaled BVP assumption guarded
by the brute-force oracle tests). Used automatically on the TPU backend
by ``lanes._thomas_batched``; the scan path remains for CPU/f64 and is
the parity oracle (``tests/test_pallas_thomas.py`` runs this kernel in
interpreter mode against it).

Reference analog: the banded LAPACK ``dgbsv`` BVP solve in
``cpp/lib/sktran_disco/sktran_do_rte.cpp:1640-1810`` — redesigned here
as a lane-minor streaming kernel rather than a translation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_w_tile(K: int, W: int) -> int:
    """Lane-tile width: large enough to amortize the sequential layer
    loop, small enough that ~12 buffers of [K, K, Wt] f32 fit VMEM."""
    budget = 8 * 1024 * 1024  # bytes, conservative half of VMEM
    per_lane = 12 * K * K * 4
    wt = budget // per_lane
    wt = max(128, min(512, (wt // 128) * 128))
    return wt


def _fwd_kernel(lo_ref, di_ref, up_ref, r_ref, c_ref, y_ref,
                c_carry, y_carry):
    p = pl.program_id(1)
    K = lo_ref.shape[1]

    @pl.when(p == 0)
    def _():
        c_carry[...] = jnp.zeros_like(c_carry)
        y_carry[...] = jnp.zeros_like(y_carry)

    lo = lo_ref[0]            # [K, K, Wt]
    di = di_ref[0]
    up = up_ref[0]
    r = r_ref[0]              # [K, Wt]
    cp = c_carry[...]         # [K, K, Wt]
    yp = y_carry[...]         # [K, Wt]

    # denom = di - lo @ cp ; rhs = r - lo @ yp   (contractions unrolled)
    denom = di
    rhs = r
    for k in range(K):
        denom = denom - lo[:, k : k + 1, :] * cp[k][None]
        rhs = rhs - lo[:, k : k + 1, :][:, 0, :] * yp[k : k + 1]

    # Gauss solve denom @ [c | y] = [up | rhs], unrolled, no pivoting.
    # Row lists keep every operand 2-D ([K+1, Wt] / [1, Wt]).
    rows_a = [denom[i] for i in range(K)]                  # [K, Wt]
    rows_b = [
        jnp.concatenate([up[i], rhs[i : i + 1]], axis=0)   # [K+1, Wt]
        for i in range(K)
    ]
    for i in range(K):
        inv = 1.0 / rows_a[i][i : i + 1]                   # [1, Wt]
        ra = rows_a[i] * inv
        rb = rows_b[i] * inv
        for j in range(i + 1, K):
            f = rows_a[j][i : i + 1]                       # [1, Wt]
            rows_a[j] = rows_a[j] - f * ra
            rows_b[j] = rows_b[j] - f * rb
        rows_a[i] = ra
        rows_b[i] = rb
    for i in range(K - 1, -1, -1):
        for j in range(i + 1, K):
            rows_b[i] = rows_b[i] - rows_a[i][j : j + 1] * rows_b[j]

    sol = jnp.stack(rows_b, axis=0)                        # [K, K+1, Wt]
    c_i = sol[:, :K, :]
    y_i = sol[:, K, :]
    c_ref[0] = c_i
    y_ref[0] = y_i
    c_carry[...] = c_i
    y_carry[...] = y_i


def _bwd_kernel(c_ref, y_ref, x_ref, x_carry):
    p = pl.program_id(1)
    K = c_ref.shape[1]

    @pl.when(p == 0)
    def _():
        x_carry[...] = jnp.zeros_like(x_carry)

    c = c_ref[0]              # [K, K, Wt]
    y = y_ref[0]              # [K, Wt]
    xn = x_carry[...]
    x = y
    for j in range(K):
        x = x - c[:, j, :] * xn[j : j + 1]
    x_ref[0] = x
    x_carry[...] = x


@functools.partial(jax.jit, static_argnames=("interpret",))
def thomas_solve_pallas(lower, diag, upper, rhs, interpret: bool = False):
    """Block-tridiagonal solve [P, K, K, W] x [P, K, W] -> [P, K, W]."""
    P, K, _, W = diag.shape
    wt = _pick_w_tile(K, W)
    pad = (-W) % wt
    if pad:
        widths4 = [(0, 0), (0, 0), (0, 0), (0, pad)]
        widths3 = [(0, 0), (0, 0), (0, pad)]
        lower = jnp.pad(lower, widths4)
        # padded lanes get an identity diagonal so the unpivoted
        # elimination never divides by zero there
        eye = jnp.zeros((P, K, K, pad), diag.dtype) + jnp.eye(
            K, dtype=diag.dtype
        )[None, :, :, None]
        diag = jnp.concatenate([diag, eye], axis=-1)
        upper = jnp.pad(upper, widths4)
        rhs = jnp.pad(rhs, widths3)
    Wp = W + pad
    nwt = Wp // wt

    grid = (nwt, P)
    spec4 = pl.BlockSpec(
        (1, K, K, wt), lambda w, p: (p, 0, 0, w), memory_space=pltpu.VMEM
    )
    spec3 = pl.BlockSpec(
        (1, K, wt), lambda w, p: (p, 0, w), memory_space=pltpu.VMEM
    )
    c_all, y_all = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[spec4, spec4, spec4, spec3],
        out_specs=[spec4, spec3],
        out_shape=[
            jax.ShapeDtypeStruct((P, K, K, Wp), diag.dtype),
            jax.ShapeDtypeStruct((P, K, Wp), diag.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((K, K, wt), diag.dtype),
            pltpu.VMEM((K, wt), diag.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lower, diag, upper, rhs)

    # back substitution, layer grid reversed
    rspec4 = pl.BlockSpec(
        (1, K, K, wt), lambda w, p: (P - 1 - p, 0, 0, w),
        memory_space=pltpu.VMEM,
    )
    rspec3 = pl.BlockSpec(
        (1, K, wt), lambda w, p: (P - 1 - p, 0, w),
        memory_space=pltpu.VMEM,
    )
    x = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[rspec4, rspec3],
        out_specs=rspec3,
        out_shape=jax.ShapeDtypeStruct((P, K, Wp), diag.dtype),
        scratch_shapes=[pltpu.VMEM((K, wt), diag.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(c_all, y_all)

    if pad:
        x = x[..., :W]
    return x
