"""Wavelength-minor ("lane layout") linear-algebra primitives.

The generic DISCO solver (``rt/disco.py``) keeps wavelength as the LEADING
batch axis, which leaves the small stream/layer dims trailing — on TPU the
(8, 128) register tiling then pads every [..., N, N] temporary 16-64x for
N = nstr/2 <= 16 (measured in the round-2 bench sweeps; it forced small
lax.map chunks + rematerialization and still OOM'd at 16 streams).

These primitives keep the wavelength axis LAST so it packs into the 128
vector lanes, and treat the small matrix dims with fully unrolled static
loops: every operation is an elementwise FMA on [..., W] vectors, which is
exactly what the VPU wants. They replace LAPACK ``dgeev``/``dgbsv`` in the
reference (``cpp/lib/sktran_disco/sktran_do_rte.cpp:435-541,1640-1810``)
for the wavelength-minor fast path.

Conventions: matrix operands are ``[..., N, M, W]`` with W the lane axis;
"mm"/"mv" contract the inner matrix dims and broadcast everything else.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .eigen import _round_masks, _tournament_schedule  # noqa: F401


def lane_mm(a, b):
    """Matrix-matrix product with lane-minor layout.

    a [..., I, J, W] @ b [..., J, K, W] -> [..., I, K, W], unrolled over the
    contraction dim so XLA emits a fused chain of broadcast FMAs instead of
    transposing to a batched matmul (which would re-introduce the padded
    W-leading layout).
    """
    J = a.shape[-2]
    out = a[..., :, 0, None, :] * b[..., None, 0, :, :]
    for j in range(1, J):
        out = out + a[..., :, j, None, :] * b[..., None, j, :, :]
    return out


def lane_mv(a, v):
    """a [..., I, J, W] @ v [..., J, W] -> [..., I, W]."""
    return jnp.sum(a * v[..., None, :, :], axis=-2)


def lane_t(a):
    """Transpose the matrix dims of a lane-minor matrix [..., I, J, W]."""
    return jnp.swapaxes(a, -3, -2)


def lane_cholesky(a):
    """Cholesky factor of SPD matrices in lane-minor layout.

    a [..., N, N, W] -> lower-triangular L with L @ L^T = a. Fully unrolled
    Cholesky-Banachiewicz on [..., W] vectors (N <= ~16 in the DO solver).
    """
    N = a.shape[-2]
    # rows of the factor as lists of [..., W] vectors
    ell = [[None] * N for _ in range(N)]
    for j in range(N):
        s = a[..., j, j, :]
        for k in range(j):
            s = s - ell[j][k] * ell[j][k]
        ljj = jnp.sqrt(s)
        ell[j][j] = ljj
        inv = 1.0 / ljj
        for i in range(j + 1, N):
            s = a[..., i, j, :]
            for k in range(j):
                s = s - ell[i][k] * ell[j][k]
            ell[i][j] = s * inv
    zero = jnp.zeros_like(a[..., 0, 0, :])
    rows = [
        jnp.stack(
            [ell[i][j] if j <= i else zero for j in range(N)], axis=-2
        )
        for i in range(N)
    ]
    return jnp.stack(rows, axis=-3)


def lane_solve_lower(ell, b):
    """Solve L x = b with L [..., N, N, W] lower-triangular,
    b [..., N, M, W]. Unrolled forward substitution."""
    N = ell.shape[-2]
    xs = []
    for i in range(N):
        s = b[..., i, :, :]
        for k in range(i):
            s = s - ell[..., i, k, None, :] * xs[k]
        xs.append(s / ell[..., i, i, None, :])
    return jnp.stack(xs, axis=-3)


def lane_solve_upper(u, b):
    """Solve U x = b with U [..., N, N, W] upper-triangular,
    b [..., N, M, W]. Unrolled back substitution."""
    N = u.shape[-2]
    xs = [None] * N
    for i in range(N - 1, -1, -1):
        s = b[..., i, :, :]
        for k in range(i + 1, N):
            s = s - u[..., i, k, None, :] * xs[k]
        xs[i] = s / u[..., i, i, None, :]
    return jnp.stack(xs, axis=-3)


def lane_gauss_solve(a, b):
    """Batched small-matrix solve, lane-minor: a [..., K, K, W],
    b [..., K, M, W].

    K <= 24: unrolled Gauss-Jordan elimination without pivoting (same
    well-scaled-BVP assumption as ``linalg.gauss_solve``, guarded by the
    brute-force oracle tests). Larger K (the nstr=40 scalar and
    polarized nstr>=16 BVP blocks): the unrolled form emits O(K) large
    dynamic-update-slices per solve, which at K=40-48 inside the Thomas
    scan made the XLA TPU compile blow host memory (round-5: the axon
    compile helper died with SIGKILL) — and at that size the lane-minor
    layout has no register-tiling advantage left, so the solve runs as a
    transposed batched ``jnp.linalg.solve`` (pivoted LU, compact HLO)
    instead.
    """
    K = a.shape[-2]
    if K > 24:
        at = jnp.moveaxis(a, -1, -3)        # [..., W, K, K]
        bt = jnp.moveaxis(b, -1, -3)        # [..., W, K, M]
        xt = jnp.linalg.solve(at, bt)
        return jnp.moveaxis(xt, -3, -1)
    for i in range(K):
        inv_p = 1.0 / a[..., i, i, :]
        row_a = a[..., i, None, :, :] * inv_p[..., None, None, :]
        row_b = b[..., i, None, :, :] * inv_p[..., None, None, :]
        col = a[..., :, i, None, :]
        mask = (jnp.arange(K) != i)[:, None, None]
        col = jnp.where(mask, col, 0.0)
        a = a - col * row_a
        b = b - col * row_b
        a = a.at[..., i, :, :].set(row_a[..., 0, :, :])
        b = b.at[..., i, :, :].set(row_b[..., 0, :, :])
    return b


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def lane_jacobi_eigh(a, sweeps: int | None = None):
    """Eigendecomposition of symmetric matrices in lane-minor layout.

    a [..., n, n, W] symmetric in the (-3, -2) dims. Returns
    (eigenvalues [..., n, W] UNSORTED, eigenvectors [..., n, n, W]).
    Same tournament-Jacobi scheme as ``ops.eigen.jacobi_eigh`` (rotations
    are gathers + FMAs along the matrix dims, elementwise over lanes) and
    the same implicit eigh adjoint for differentiation.
    """
    return _lane_jacobi_impl(a, sweeps)


def _lane_jacobi_fwd(a, sweeps):
    out = _lane_jacobi_impl(a, sweeps)
    return out, out


def _lane_jacobi_bwd(sweeps, res, cotangents):
    w, v = res
    wbar, vbar = cotangents
    vtvbar = lane_mm(lane_t(v), vbar)
    dw = w[..., None, :, :] - w[..., :, None, :]  # F_ij = 1/(w_j - w_i)
    small = jnp.abs(dw) < 1e-30
    f = jnp.where(small, 0.0, 1.0 / jnp.where(small, 1.0, dw))
    mid = f * vtvbar
    idx = jnp.arange(w.shape[-2])
    mid = mid.at[..., idx, idx, :].set(wbar)
    abar = lane_mm(lane_mm(v, mid), lane_t(v))
    abar = 0.5 * (abar + lane_t(abar))
    return (abar,)


def _lane_jacobi_impl(a, sweeps=None):
    n = a.shape[-2]
    if n == 1:
        return a[..., 0, :], jnp.ones_like(a)
    odd = n % 2 == 1
    if odd:
        pad_val = 2.0 * jnp.max(
            jnp.abs(a), axis=(-3, -2), keepdims=True
        )
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 3) + [(0, 1), (0, 1), (0, 0)])
        a = a.at[..., n, n, :].set(pad_val[..., 0, 0, :])
        npad = n + 1
    else:
        npad = n

    if sweeps is None:
        sweeps = 7 if a.dtype == jnp.float32 else 10

    rounds = _tournament_schedule(npad)
    eye = jnp.eye(npad, dtype=a.dtype)[..., None]
    v = jnp.broadcast_to(eye, a.shape)

    perms = []
    signs = []
    pair_of = []
    for pairs in rounds:
        perm = np.empty(npad, dtype=np.int32)
        sign = np.empty(npad, dtype=np.float64)
        pidx = np.empty(npad, dtype=np.int32)
        for k, (p, q) in enumerate(pairs):
            perm[p], perm[q] = q, p
            sign[p], sign[q] = 1.0, -1.0
            pidx[p] = pidx[q] = k
        perms.append(perm)
        signs.append(sign)
        pair_of.append(pidx)

    for _sweep in range(sweeps):
        for r, pairs in enumerate(rounds):
            p = np.array([pp for pp, _ in pairs])
            q = np.array([qq for _, qq in pairs])
            perm = perms[r]
            sign = jnp.asarray(signs[r], dtype=a.dtype)[:, None]
            app = a[..., p, p, :]  # [..., n/2, W]
            aqq = a[..., q, q, :]
            apq = a[..., p, q, :]
            theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
            # Exactly-zero pivots must not rotate (see ops/eigen.py: the
            # odd-n pad entry would otherwise get swapped into the live
            # block by an arctan2(0, negative) = pi rotation).
            theta = jnp.where(apq == 0.0, 0.0, theta)
            c_full = jnp.cos(theta)[..., pair_of[r], :]  # [..., n, W]
            s_full = jnp.sin(theta)[..., pair_of[r], :]
            coeff = -sign * s_full
            # columns then rows then eigenvector columns (gather + FMA)
            a = (
                a * c_full[..., None, :, :]
                + jnp.take(a, perm, axis=-2) * coeff[..., None, :, :]
            )
            a = (
                a * c_full[..., :, None, :]
                + jnp.take(a, perm, axis=-3) * coeff[..., :, None, :]
            )
            v = (
                v * c_full[..., None, :, :]
                + jnp.take(v, perm, axis=-2) * coeff[..., None, :, :]
            )
        a = 0.5 * (a + jnp.swapaxes(a, -3, -2))

    idx = jnp.arange(npad)
    eigvals = a[..., idx, idx, :]
    if odd:
        eigvals = eigvals[..., :n, :]
        v = v[..., :n, :n, :]
    return eigvals, v


lane_jacobi_eigh.defvjp(_lane_jacobi_fwd, _lane_jacobi_bwd)


# ---------------------------------------------------------------------------
# Scan-based variants: O(1) HLO size in sweeps/rounds/layers.
#
# The fully unrolled primitives above emit HLO proportional to
# sweeps x rounds (Jacobi) and log2(P) x K (cyclic reduction); at nstr=16,
# P=100 the N-stream solver graph grew so large that XLA could not finish
# compiling within 10 minutes (round-2 verdict). These variants express the
# same math with lax.scan / lax.fori_loop so the traced graph stays small
# and compile time is flat in problem size; the per-step bodies still
# operate on full [..., n, n, W] lane-minor tiles, so the device work is
# identical.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _stacked_round_tables(npad: int):
    """Stack the tournament round tables into [R, ...] numpy arrays for use
    as lax.scan inputs: (p [R, n/2], q [R, n/2], perm [R, n], sign [R, n],
    pair_of [R, n])."""
    rounds = _tournament_schedule(npad)
    R = len(rounds)
    p_t = np.empty((R, npad // 2), dtype=np.int32)
    q_t = np.empty((R, npad // 2), dtype=np.int32)
    perm_t = np.empty((R, npad), dtype=np.int32)
    sign_t = np.empty((R, npad), dtype=np.float64)
    pair_t = np.empty((R, npad), dtype=np.int32)
    for r, pairs in enumerate(rounds):
        for k, (p, q) in enumerate(pairs):
            p_t[r, k] = p
            q_t[r, k] = q
            perm_t[r, p], perm_t[r, q] = q, p
            sign_t[r, p], sign_t[r, q] = 1.0, -1.0
            pair_t[r, p] = pair_t[r, q] = k
    return p_t, q_t, perm_t, sign_t, pair_t


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def lane_jacobi_eigh_scan(a, sweeps: int | None = None):
    """Same contract as ``lane_jacobi_eigh`` (symmetric [..., n, n, W] ->
    unsorted eigenvalues [..., n, W] + eigenvectors [..., n, n, W]) with the
    sweep/round loops as lax.scan, so the HLO graph is O(1) in n and
    sweeps. Backward pass is the same implicit eigh adjoint."""
    return _lane_jacobi_scan_impl(a, sweeps)


def _lane_jacobi_scan_fwd(a, sweeps):
    out = _lane_jacobi_scan_impl(a, sweeps)
    return out, out


lane_jacobi_eigh_scan.defvjp(_lane_jacobi_scan_fwd, _lane_jacobi_bwd)


def _lane_jacobi_scan_impl(a, sweeps=None):
    n = a.shape[-2]
    if n == 1:
        return a[..., 0, :], jnp.ones_like(a)
    odd = n % 2 == 1
    if odd:
        pad_val = 2.0 * jnp.max(jnp.abs(a), axis=(-3, -2), keepdims=True)
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 3) + [(0, 1), (0, 1), (0, 0)])
        a = a.at[..., n, n, :].set(pad_val[..., 0, 0, :])
        npad = n + 1
    else:
        npad = n

    if sweeps is None:
        sweeps = 7 if a.dtype == jnp.float32 else 10

    # TPU: single fused Pallas kernel — all sweeps execute in VMEM per
    # (layer, lane-tile) block instead of re-materializing [P, n, n, W]
    # through HBM every tournament round (round-5 roofline: the scan
    # formulation ran at ~30 GB/s / 7.7 GFLOP/s, an order of magnitude
    # under both measured ceilings). Same rotations, same order; parity
    # pinned by tests/test_pallas_jacobi.py.
    import os

    if (
        a.ndim == 4
        and a.dtype == jnp.float32
        and npad <= 32  # VMEM: ~12 x n^2 x 128-lane f32 buffers
        and not os.environ.get("SASKTRAN2_TPU_NO_PALLAS")
        and jax.default_backend() == "tpu"
    ):
        from .pallas_jacobi import jacobi_eigh_pallas

        eigvals, v = jacobi_eigh_pallas(a, sweeps)
        if odd:
            eigvals = eigvals[..., :n, :]
            v = v[..., :n, :n, :]
        return eigvals, v

    p_t, q_t, perm_t, sign_t, pair_t = _stacked_round_tables(npad)
    eye = jnp.eye(npad, dtype=a.dtype)[..., None]
    v0 = jnp.broadcast_to(eye, a.shape)

    # one SWEEP per scan step, with the n-1 rounds unrolled inside the
    # body using STATIC index tables: the gathers become compile-time
    # permutations (cheap slices/concats on TPU, vs dynamic gathers when
    # the round tables are scanned in), and the HLO stays O(rounds) —
    # small for n <= 32
    def sweep_body(carry, _):
        a_c, v_c = carry
        for r in range(len(p_t)):
            p, q = p_t[r], q_t[r]
            perm = perm_t[r]
            sign = jnp.asarray(sign_t[r], dtype=a_c.dtype)[:, None]
            pair = pair_t[r]
            app = a_c[..., p, p, :]                         # [..., n/2, W]
            aqq = a_c[..., q, q, :]
            apq = a_c[..., p, q, :]
            theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
            # exactly-zero pivots must not rotate (odd-n pad isolation)
            theta = jnp.where(apq == 0.0, 0.0, theta)
            c_full = jnp.cos(theta)[..., pair, :]           # [..., n, W]
            s_full = jnp.sin(theta)[..., pair, :]
            coeff = -sign * s_full
            a_c = (
                a_c * c_full[..., None, :, :]
                + jnp.take(a_c, perm, axis=-2) * coeff[..., None, :, :]
            )
            a_c = (
                a_c * c_full[..., :, None, :]
                + jnp.take(a_c, perm, axis=-3) * coeff[..., :, None, :]
            )
            v_c = (
                v_c * c_full[..., None, :, :]
                + jnp.take(v_c, perm, axis=-2) * coeff[..., None, :, :]
            )
        a_c = 0.5 * (a_c + jnp.swapaxes(a_c, -3, -2))
        return (a_c, v_c), None

    (a, v), _ = jax.lax.scan(sweep_body, (a, v0), None, length=sweeps)

    idx = jnp.arange(npad)
    eigvals = a[..., idx, idx, :]
    if odd:
        eigvals = eigvals[..., :n, :]
        v = v[..., :n, :n, :]
    return eigvals, v


def _thomas_forward(lo, di, up, r):
    """Block-Thomas forward elimination + back substitution via lax.scan.

    lo/di/up [P, K, K, W] (layer axis LEADING — scan axis), r [P, K, W].
    No pivoting (same well-scaled-BVP assumption as lane_gauss_solve).
    Returns x [P, K, W].
    """
    K = di.shape[-3]

    def fwd(carry, x):
        c_prev, y_prev = carry
        lo_i, di_i, up_i, r_i = x
        denom = di_i - lane_mm(lo_i, c_prev)
        rhs_i = r_i - lane_mv(lo_i, y_prev)
        stacked = jnp.concatenate([up_i, rhs_i[..., None, :]], axis=-2)
        sol = lane_gauss_solve(denom, stacked)
        c_i = sol[..., :K, :]
        y_i = sol[..., K, :]
        return (c_i, y_i), (c_i, y_i)

    c0 = jnp.zeros_like(di[0])
    y0 = jnp.zeros_like(r[0])
    _, (cs, ys) = jax.lax.scan(fwd, (c0, y0), (lo, di, up, r))

    def back(x_next, x):
        c_i, y_i = x
        x_i = y_i - lane_mv(c_i, x_next)
        return x_i, x_i

    _, xs = jax.lax.scan(back, jnp.zeros_like(y0), (cs, ys), reverse=True)
    return xs


@jax.custom_vjp
def lane_block_thomas_solve(lower, diag, upper, rhs):
    """Block-tridiagonal solve, scan-based (compile-time O(1) in P).

    Same contract as ``lane_block_tridiag_solve``: lower/diag/upper
    [..., P, K, K, W] with the layer axis at -4, rhs [..., P, K, W];
    ``lower[0]`` / ``upper[P-1]`` ignored. Backward pass uses the linear-
    system adjoint (one transposed Thomas solve + outer products) instead of
    differentiating through the scans, so AD holds no per-step residuals.
    """
    lo, di, up, r = _thomas_broadcast(lower, diag, upper, rhs)
    return _thomas_batched(lo, di, up, r)


def _thomas_broadcast(lower, diag, upper, rhs):
    P, K, _, W = diag.shape[-4:]
    batch = jnp.broadcast_shapes(diag.shape[:-4], rhs.shape[:-3])
    dt = jnp.result_type(diag.dtype, rhs.dtype)
    lo = jnp.broadcast_to(lower, batch + (P, K, K, W)).astype(dt)
    di = jnp.broadcast_to(diag, batch + (P, K, K, W)).astype(dt)
    up = jnp.broadcast_to(upper, batch + (P, K, K, W)).astype(dt)
    r = jnp.broadcast_to(rhs, batch + (P, K, W)).astype(dt)
    return lo, di, up, r


def _pallas_thomas_ok(di, r):
    """The Pallas streaming kernel applies on the TPU backend for plain
    f32 [P, K, K, W] solves (no extra batch dims) with K <= 24: at K=40
    (the nstr=40 BVP) the fully unrolled K-pivot Gauss elimination made
    the Mosaic compile blow host memory (the axon compile helper died
    with SIGKILL, round-5 measurement), and the polarized nstr=16 blocks
    at K=48 would additionally outgrow VMEM — those shapes keep the scan
    path. Kill switch: SASKTRAN2_TPU_NO_PALLAS=1."""
    import os

    if os.environ.get("SASKTRAN2_TPU_NO_PALLAS"):
        return False
    return (
        di.ndim == 4
        and r.ndim == 3
        and di.shape[-2] <= 24
        and di.dtype == jnp.float32
        and jax.default_backend() == "tpu"
    )


def _thomas_batched(lo, di, up, r, use_cr: bool = False):
    """Block-tridiagonal solve used by both the primal and the adjoint of
    ``lane_block_thomas_solve``. On the TPU backend the solve runs as a
    streaming Pallas kernel (``ops/pallas_thomas.py``) — the round-5
    roofline measured the scan formulation latency-bound at ~24 GB/s /
    6.5 GFLOP/s because 2 x P sequential scan steps each pay kernel
    overhead, while the Pallas kernel keeps the recursion carry in VMEM
    and streams layer blocks through the double-buffered pipeline. The
    scan path remains for CPU/f64/batched shapes and is the parity
    oracle; ``use_cr`` keeps the log-depth cyclic-reduction variant
    available."""
    if use_cr:
        return lane_block_tridiag_solve(lo, di, up, r)
    if _pallas_thomas_ok(di, r):
        from .pallas_thomas import thomas_solve_pallas

        return thomas_solve_pallas(lo, di, up, r)
    x = _thomas_forward(
        jnp.moveaxis(lo, -4, 0),
        jnp.moveaxis(di, -4, 0),
        jnp.moveaxis(up, -4, 0),
        jnp.moveaxis(r, -3, 0),
    )
    return jnp.moveaxis(x, 0, -3)


def _thomas_fwd(lower, diag, upper, rhs):
    lo, di, up, r = _thomas_broadcast(lower, diag, upper, rhs)
    x = _thomas_batched(lo, di, up, r)
    return x, (lo, di, up, x, (lower.shape, diag.shape, upper.shape,
                               rhs.shape))


def _thomas_bwd(res, xbar):
    lo, di, up, x, in_shapes = res
    lo_s, di_s, up_s, r_s = in_shapes
    # T^T lam = xbar:  (T^T)_{i,i-1} = up_{i-1}^T, (T^T)_{i,i+1} = lo_{i+1}^T
    lo_t = jnp.roll(lane_t(up), 1, axis=-4)
    up_t = jnp.roll(lane_t(lo), -1, axis=-4)
    lam = _thomas_batched(lo_t, lane_t(di), up_t, xbar)
    rbar = lam
    # block cotangents: A_bar = -lam_i x_j^T for block (i, j)
    di_bar = -lam[..., :, None, :] * x[..., None, :, :]
    x_prev = jnp.roll(x, 1, axis=-3)
    x_next = jnp.roll(x, -1, axis=-3)
    lo_bar = -lam[..., :, None, :] * x_prev[..., None, :, :]
    up_bar = -lam[..., :, None, :] * x_next[..., None, :, :]
    # first/last blocks are ignored by the primal — zero their cotangents
    P = x.shape[-3]
    idx = jnp.arange(P)
    lo_bar = jnp.where((idx == 0)[:, None, None, None], 0.0, lo_bar)
    up_bar = jnp.where((idx == P - 1)[:, None, None, None], 0.0, up_bar)

    def unbcast(g, shape):
        extra = g.ndim - len(shape)
        axes = tuple(range(extra)) + tuple(
            i + extra for i, s in enumerate(shape) if s == 1 and
            g.shape[i + extra] != 1
        )
        g = jnp.sum(g, axis=axes, keepdims=False)
        return g.reshape(shape)

    return (
        unbcast(lo_bar, lo_s),
        unbcast(di_bar, di_s),
        unbcast(up_bar, up_s),
        unbcast(rbar, r_s),
    )


lane_block_thomas_solve.defvjp(_thomas_fwd, _thomas_bwd)


def lane_block_tridiag_solve(lower, diag, upper, rhs):
    """Block-tridiagonal solve in lane-minor layout via block cyclic
    reduction (mirrors ``linalg.block_tridiag_solve_cr``).

    lower/diag/upper [..., P, K, K, W], rhs [..., P, K, W] with the layer
    axis at -4 (vectors: -3). ``lower[0]`` / ``upper[P-1]`` ignored.
    Returns x [..., P, K, W].
    """
    P = diag.shape[-4]
    K = diag.shape[-2]
    W = diag.shape[-1]
    batch = jnp.broadcast_shapes(diag.shape[:-4], rhs.shape[:-3])
    dt = jnp.result_type(diag.dtype, rhs.dtype)

    lo = jnp.broadcast_to(lower, batch + (P, K, K, W)).astype(dt)
    di = jnp.broadcast_to(diag, batch + (P, K, K, W)).astype(dt)
    up = jnp.broadcast_to(upper, batch + (P, K, K, W)).astype(dt)
    r = jnp.broadcast_to(rhs, batch + (P, K, W)).astype(dt)

    P2 = 1 << (P - 1).bit_length()
    if P2 != P:
        pad = P2 - P
        eye = jnp.broadcast_to(
            jnp.eye(K, dtype=dt)[..., None], batch + (pad, K, K, W)
        )
        zkk = jnp.zeros(batch + (pad, K, K, W), dtype=dt)
        zk = jnp.zeros(batch + (pad, K, W), dtype=dt)
        lo = jnp.concatenate([lo, zkk], axis=-4)
        di = jnp.concatenate([di, eye], axis=-4)
        up = jnp.concatenate([up, zkk], axis=-4)
        r = jnp.concatenate([r, zk], axis=-3)

    levels = []
    n = P2
    while n > 1:
        lo_o = lo[..., 1::2, :, :, :]
        di_o = di[..., 1::2, :, :, :]
        up_o = up[..., 1::2, :, :, :]
        r_o = r[..., 1::2, :, :]
        stacked = jnp.concatenate(
            [lo_o, up_o, r_o[..., None, :]], axis=-2
        )
        sol = lane_gauss_solve(di_o, stacked)
        dinv_l = sol[..., :K, :]
        dinv_u = sol[..., K : 2 * K, :]
        dinv_r = sol[..., 2 * K, :]
        levels.append((dinv_l, dinv_u, dinv_r))

        lo_e = lo[..., 0::2, :, :, :]
        di_e = di[..., 0::2, :, :, :]
        up_e = up[..., 0::2, :, :, :]
        r_e = r[..., 0::2, :, :]
        zkk1 = jnp.zeros_like(dinv_l[..., :1, :, :, :])
        zk1 = jnp.zeros_like(dinv_r[..., :1, :, :])
        dinv_l_b = jnp.concatenate(
            [zkk1, dinv_l[..., :-1, :, :, :]], axis=-4
        )
        dinv_u_b = jnp.concatenate(
            [zkk1, dinv_u[..., :-1, :, :, :]], axis=-4
        )
        dinv_r_b = jnp.concatenate([zk1, dinv_r[..., :-1, :, :]], axis=-3)

        di = di_e - lane_mm(lo_e, dinv_u_b) - lane_mm(up_e, dinv_l)
        r = r_e - lane_mv(lo_e, dinv_r_b) - lane_mv(up_e, dinv_r)
        lo = -lane_mm(lo_e, dinv_l_b)
        up = -lane_mm(up_e, dinv_u)
        n //= 2

    x = lane_gauss_solve(di, r[..., None, :])[..., 0, :]  # [..., 1, K, W]

    for dinv_l, dinv_u, dinv_r in reversed(levels):
        m = x.shape[-3]
        x_above = jnp.concatenate(
            [x[..., 1:, :, :], jnp.zeros_like(x[..., :1, :, :])], axis=-3
        )
        x_odd = dinv_r - lane_mv(dinv_l, x) - lane_mv(dinv_u, x_above)
        inter = jnp.stack([x, x_odd], axis=-3)  # [..., m, 2, K, W]
        x = inter.reshape(x.shape[:-3] + (2 * m, K, W))

    return x[..., :P, :, :]
