"""Pallas TPU kernel for the tournament-Jacobi symmetric eigensolve.

The XLA scan formulation re-materializes the [P, n, n, W] work matrix
and eigenvector accumulator through HBM on every one of the
sweeps x (n-1) tournament rounds (~7.3 GB of traffic for the 16-stream
bench case — measured bandwidth-bound in the round-5 roofline). This
kernel runs ALL sweeps for a (layer, lane-tile) block inside VMEM: HBM
traffic drops to one read of the input block plus one write of the
eigenvalues and eigenvectors.

Same math as ``lanes._lane_jacobi_scan_impl`` (the parity oracle —
``tests/test_pallas_jacobi.py`` runs this kernel in interpreter mode):
static tournament round tables, arctan2 rotation angles, exactly-zero
pivots suppressed (odd-n pad isolation is handled by the caller's pad
logic, which feeds this kernel an even n). Differentiation uses the
SAME implicit eigh adjoint (``lanes._lane_jacobi_bwd``) — only the
forward evaluation changes backend.

Reference analog: LAPACK ``dgeev`` per layer per wavelength
(``cpp/lib/sktran_disco/sktran_do_rte.cpp:435-541``); this design has no
reference counterpart.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .eigen import _tournament_schedule


def _round_tables(npad: int):
    rounds = _tournament_schedule(npad)
    out = []
    for pairs in rounds:
        p = np.array([pp for pp, _ in pairs])
        q = np.array([qq for _, qq in pairs])
        perm = np.empty(npad, dtype=np.int64)
        sign = np.empty(npad)
        pair_of = np.empty(npad, dtype=np.int64)
        for k, (pp, qq) in enumerate(pairs):
            perm[pp], perm[qq] = qq, pp
            sign[pp], sign[qq] = 1.0, -1.0
            pair_of[pp] = pair_of[qq] = k
        out.append((p, q, perm, sign, pair_of))
    return out


def _make_kernel(n: int, sweeps: int):
    tables = _round_tables(n)

    def kernel(a_ref, w_ref, v_ref):
        a = a_ref[0]                                   # [n, n, Wt]
        wt = a.shape[-1]
        eye = jnp.broadcast_to(
            jnp.eye(n, dtype=a.dtype)[:, :, None], (n, n, wt)
        )
        v = eye

        def sweep(_, carry):
            a, v = carry
            for p, q, perm, sign, pair_of in tables:
                app = jnp.stack([a[pp, pp] for pp in p])      # [n/2, Wt]
                aqq = jnp.stack([a[qq, qq] for qq in q])
                apq = jnp.stack([a[pp, qq] for pp, qq in zip(p, q)])
                # rotation by theta = 0.5*atan2(2 apq, aqq - app) without
                # trig (Mosaic has no atan2): with x = aqq - app,
                # y = 2 apq, r = |(x, y)|, the half-angle tangent is
                #   tan(theta) = y / (r + x)   (stable for x >= 0)
                #              = (r - x) / y   (stable for x < 0)
                # — the same angle atan2 produces, with no cancellation
                # in either branch (the sqrt((1 -/+ x/r)/2) form loses
                # the small-pivot rotations that late sweeps need).
                # Exactly-zero pivots must not rotate (odd-n pad
                # isolation, same as the XLA scan variant).
                x = aqq - app
                y = 2.0 * apq
                r = jnp.sqrt(x * x + y * y)
                safe_y = jnp.where(y == 0.0, 1.0, y)
                t_pos = y / jnp.where(r + x == 0.0, 1.0, r + x)
                t_neg = (r - x) / safe_y
                t = jnp.where(x >= 0.0, t_pos, t_neg)
                t = jnp.where(apq == 0.0, 0.0, t)
                c_h = 1.0 / jnp.sqrt(1.0 + t * t)             # [n/2, Wt]
                s_h = t * c_h
                c_full = jnp.stack([c_h[pair_of[i]] for i in range(n)])
                # float(sign) keeps the scalar weakly typed — an
                # np.float64 here would promote the whole carry to f64
                coeff = jnp.stack([
                    -float(sign[i]) * s_h[pair_of[i]] for i in range(n)
                ])                                            # [n, Wt]
                # columns (axis -2), rows (axis -3), eigvec columns
                a_cperm = jnp.stack([a[:, perm[j]] for j in range(n)],
                                    axis=1)
                a = a * c_full[None] + a_cperm * coeff[None]
                a_rperm = jnp.stack([a[perm[i]] for i in range(n)])
                a = a * c_full[:, None] + a_rperm * coeff[:, None]
                v_cperm = jnp.stack([v[:, perm[j]] for j in range(n)],
                                    axis=1)
                v = v * c_full[None] + v_cperm * coeff[None]
            a = 0.5 * (a + jnp.swapaxes(a, 0, 1))
            return a, v

        a, v = jax.lax.fori_loop(0, sweeps, sweep, (a, v))
        w_ref[0] = jnp.stack([a[i, i] for i in range(n)])
        v_ref[0] = v

    return kernel


@functools.partial(
    jax.jit, static_argnames=("sweeps", "interpret")
)
def jacobi_eigh_pallas(a, sweeps: int, interpret: bool = False):
    """Symmetric eigensolve of [P, n, n, W] (n EVEN) -> (eigvals
    [P, n, W] unsorted, eigvecs [P, n, n, W])."""
    P, n, _, W = a.shape
    wt = 256 if n <= 16 else 128
    wt = min(wt, max(128, W))
    pad = (-W) % wt
    if pad:
        a = jnp.pad(a, [(0, 0), (0, 0), (0, 0), (0, pad)])
    Wp = W + pad
    grid = (P, Wp // wt)
    w_out, v_out = pl.pallas_call(
        _make_kernel(n, sweeps),
        grid=grid,
        in_specs=[pl.BlockSpec(
            (1, n, n, wt), lambda p, w: (p, 0, 0, w),
            memory_space=pltpu.VMEM,
        )],
        out_specs=[
            pl.BlockSpec((1, n, wt), lambda p, w: (p, 0, w),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n, wt), lambda p, w: (p, 0, 0, w),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P, n, Wp), a.dtype),
            jax.ShapeDtypeStruct((P, n, n, Wp), a.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(a)
    if pad:
        w_out = w_out[..., :W]
        v_out = v_out[..., :W]
    return w_out, v_out
