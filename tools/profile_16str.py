"""Roofline profile of the 16-stream wavelength-minor solver.

Answers the round-4 verdict's top item: which bound (HBM bandwidth, VPU
issue rate, MXU, host) does each hot bench case sit at?  Datasheet bf16
MXU peak (197 TFLOP/s) is the wrong denominator for a deliberately
VPU-shaped f32 code, so this script first measures EMPIRICAL device
ceilings on the attached chip:

  * f32 matmul TFLOP/s     (MXU ceiling at the precision we actually use)
  * f32 elementwise-FMA TFLOP/s  (VPU ceiling)
  * HBM copy bandwidth GB/s

then times the 16-stream solve in nested stage prefixes (assemble ->
eigensolve -> BVP -> postprocess -> +vjp), reads XLA cost-analysis flops
and bytes for each prefix, and reports achieved GFLOP/s and GB/s against
the measured ceilings.  Stage attribution is by prefix differencing, so
fusion across stage boundaries shows up as negative/small deltas rather
than double counting.

Run:  python tools/profile_16str.py [--w 1024] [--json OUT]
(Reference analog: Tracy zones per solver stage,
cpp/lib/sktran_disco/sktran_do_rte.cpp:380,434,1641.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _enable_compile_cache():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync(x):
    """Scalar-only host transfer per leaf (NEVER np.asarray the full
    array: through the axon tunnel a 64 MB fetch dwarfs the compute and
    corrupts the measurement)."""
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    return sum(float(l.ravel()[0]) for l in leaves)


def _median_time(fn, inputs, repeats=5, perturb_key="dtau"):
    _sync(fn(inputs))
    times = []
    for i in range(repeats):
        inp = dict(inputs)
        inp[perturb_key] = inputs[perturb_key] * (1.0 + 1e-4 * (i + 1))
        _ = float(inp[perturb_key].ravel()[0])
        t0 = time.perf_counter()
        out = fn(inp)
        _sync(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def _cost(fn, inputs):
    try:
        c = fn.lower(inputs).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))
    except Exception:
        return None, None


# ---------------------------------------------------------------------------
# Empirical device ceilings
#
# Every dispatch through the axon tunnel costs ~20-35 ms of round-trip
# latency, so each probe amortizes over enough on-device work that the
# overhead is <5% — and the measured dispatch overhead itself is reported
# so solver numbers can be interpreted.
# ---------------------------------------------------------------------------


def measure_ceilings():
    import jax
    import jax.numpy as jnp

    out = {}

    # dispatch overhead: jitted identity on a 4-byte array
    tiny = jnp.zeros((1,), jnp.float32)
    idf = jax.jit(lambda x: x + 1.0)
    dt = _median_time(lambda i: idf(i["x"]), {"x": tiny}, perturb_key="x")
    out["dispatch_overhead_ms"] = dt * 1e3

    # MXU f32 (highest precision — what the solver uses): 64 chained
    # 4096^3 matmuls = 8.8 TFLOP per dispatch
    n = 4096
    iters = 64
    a = jnp.full((n, n), 1e-3, jnp.float32)

    @jax.jit
    def mm(x):
        with jax.default_matmul_precision("highest"):
            for _ in range(iters):
                x = x @ a
            return x

    dt = _median_time(lambda i: mm(i["x"]), {"x": a}, perturb_key="x")
    out["mxu_f32_tflops"] = iters * 2 * n**3 / dt / 1e12

    ab = jnp.full((n, n), 1e-3, jnp.bfloat16)

    @jax.jit
    def mmb(x):
        for _ in range(iters):
            x = x @ ab
        return x

    dt = _median_time(lambda i: mmb(i["x"]), {"x": ab}, perturb_key="x")
    out["mxu_bf16_tflops"] = iters * 2 * n**3 / dt / 1e12

    # VPU f32: 8 INDEPENDENT chains x 64 dependent FMAs per loop pass on
    # 8 MB of data — 16 flops/byte of loop-carry traffic, so the number
    # reflects VPU issue throughput (one dependent chain alone measures
    # pipeline latency; one FMA per pass measures HBM bandwidth)
    m = 2 * 1024 * 1024
    v = jnp.full((m,), 1.000001, jnp.float32)
    K = 16
    NCH = 8
    INNER = 64

    def fma_body(x):
        ys = tuple(x * (1.0 + 1e-7 * j) for j in range(NCH))

        def step(_, ys):
            ys = tuple(ys)
            for _i in range(INNER):
                ys = tuple(y * 1.0000001 + x for y in ys)
            return ys

        ys = jax.lax.fori_loop(0, K, step, ys)
        return sum(ys)

    fma = jax.jit(fma_body)
    dt = _median_time(lambda i: fma(i["x"]), {"x": v}, perturb_key="x")
    out["vpu_f32_tflops"] = 2 * K * NCH * INNER * m / dt / 1e12

    # HBM read bandwidth: K full passes over a 1 GiB array. Each
    # iteration's jnp.sum(x * c_i) must re-read x (the scale depends on
    # the loop index, so XLA cannot fuse the passes together).
    big = jnp.ones((256, 1024, 1024), jnp.float32)  # 1 GiB
    KH = 16

    def bw_body(x):
        def step(i, acc):
            return acc + jnp.sum(x * (1.0 + i.astype(jnp.float32)))

        return jax.lax.fori_loop(0, KH, step, jnp.float32(0.0))

    bw = jax.jit(bw_body)
    dt = _median_time(lambda i: bw(i["x"]), {"x": big}, perturb_key="x")
    out["hbm_read_gbps"] = KH * big.size * 4 / dt / 1e9
    return out


# ---------------------------------------------------------------------------
# Stage prefixes of the 16-stream solve (mirrors disco_nstream._mode_radiance)
# ---------------------------------------------------------------------------


def build_stage_fns(nstr, W, P=100, L=40, num_azimuth=2):
    import jax
    import jax.numpy as jnp

    from sasktran2_tpu.ops.lanes import (
        lane_block_thomas_solve,
        lane_cholesky,
        lane_jacobi_eigh_scan,
        lane_mm,
        lane_solve_upper,
        lane_t,
    )
    from sasktran2_tpu.rt import disco
    from sasktran2_tpu.rt.disco import KMIN, clamp_ssa
    from sasktran2_tpu.rt.disco_nstream import (
        _contract_legendre,
        solve_nstream,
    )

    dtype = jnp.float32
    rng = np.random.default_rng(1)
    alts = np.linspace(0, 100000, P + 1)
    ext_prof = 7e-5 * np.exp(-alts / 7000.0)
    dtau_prof = (0.5 * (ext_prof[:-1] + ext_prof[1:]) * np.diff(alts))[::-1]
    dtau = (
        np.broadcast_to(dtau_prof, (W, P)) * rng.uniform(0.8, 1.2, (W, 1))
    ).T
    ls = np.arange(L)
    beta = np.broadcast_to(((2 * ls + 1) * 0.5**ls)[:, None, None], (L, P, W))
    tables = disco.build_mode_tables(
        nstr, L, 0.6, np.array([0.8]), num_azimuth=num_azimuth
    )
    inputs = {
        "dtau": jnp.asarray(dtau, dtype=dtype),
        "omega": jnp.full((P, W), 0.9, dtype=dtype),
        "beta": jnp.asarray(beta, dtype=dtype),
        "albedo": jnp.full((W,), 0.3, dtype=dtype),
    }

    mu = np.asarray(tables.mu)
    w_quad = np.asarray(tables.w)
    N = len(mu)
    M = num_azimuth
    luse = min(L, max(nstr, 1))

    lam_t = jnp.asarray(np.asarray(tables.lam_stream[:M, :luse]), dtype)
    par_t = jnp.asarray(np.asarray(tables.parity[:M, :luse]), dtype)

    def _modes_prefix(x, depth):
        """Scan the same M azimuth modes as the real solver, computing the
        mode body only up to ``depth`` (assemble | eig | bvp)."""
        omega = clamp_ssa(x["omega"])
        beta_u = x["beta"][:luse]

        def body(acc, t):
            lam, parity = t
            dt_ = x["dtau"].dtype
            even = (parity > 0).astype(dt_)
            ll = lam[:, :, None] * lam[:, None, :]
            cb = _contract_legendre(ll * even[:, None, None], beta_u)
            ca = _contract_legendre(ll * (1.0 - even)[:, None, None], beta_u)
            s = np.sqrt(w_quad / mu)
            scale = jnp.asarray(s[:, None] * s[None, :], dt_)[None, :, :, None]
            diag = jnp.asarray(np.diag(1.0 / mu), dt_)[None, :, :, None]
            om = omega[:, None, None, :]
            a_hat = diag - om * ca * scale
            b_hat = diag - om * cb * scale
            if depth == "assemble":
                return acc + jnp.sum(a_hat[..., 0, 0, :], axis=0) + jnp.sum(
                    b_hat[..., 0, 0, :], axis=0
                ), None
            chol = lane_cholesky(b_hat)
            m_sym = lane_mm(lane_mm(lane_t(chol), a_hat), chol)
            m_sym = 0.5 * (m_sym + lane_t(m_sym))
            k2, v = lane_jacobi_eigh_scan(m_sym)
            k = jnp.sqrt(jnp.maximum(k2, KMIN * KMIN))
            f_hat = lane_solve_upper(lane_t(chol), v)
            g_hat = lane_mm(chol, v) / k[..., None, :, :]
            dinv = jnp.asarray(1.0 / np.sqrt(w_quad * mu), dt_)[
                None, :, None, None
            ]
            xx = 0.5 * dinv * (f_hat - g_hat)
            yy = 0.5 * dinv * (f_hat + g_hat)
            if depth == "eig":
                return acc + jnp.sum(xx[..., 0, 0, :], axis=0) + jnp.sum(
                    yy[..., 0, 0, :], axis=0
                ), None
            # minimal BVP with the real block structure (rhs from eig
            # outputs; boundary detail does not change the cost shape)
            d1 = x["dtau"][:, None, :]
            e = jnp.exp(-k * d1)
            xe = xx * e[:, None, :, :]
            ye = yy * e[:, None, :, :]
            idx = jnp.arange(P)
            first_m = (idx == 0)[:, None, None, None]
            zero_n = jnp.zeros_like(xx)

            def two_by_two(tl, tr, bl, br):
                top = jnp.concatenate([tl, tr], axis=-2)
                bot = jnp.concatenate([bl, br], axis=-2)
                return jnp.concatenate([top, bot], axis=-3)

            diag_b = two_by_two(
                jnp.where(first_m, yy, -yy), jnp.where(first_m, xe, -xe),
                xe, yy,
            )
            upper = two_by_two(
                zero_n, zero_n, -jnp.roll(xx, -1, 0), -jnp.roll(ye, -1, 0)
            )
            lower = two_by_two(
                jnp.roll(ye, 1, 0), jnp.roll(xx, 1, 0), zero_n, zero_n
            )
            rhs = jnp.concatenate(
                [jnp.sum(xx, axis=-2), jnp.sum(yy, axis=-2)], axis=-2
            )
            sol = lane_block_thomas_solve(lower, diag_b, upper, rhs)
            return acc + jnp.sum(sol[..., 0, :], axis=0), None

        acc0 = jnp.zeros((W,), dtype=x["dtau"].dtype)
        out, _ = jax.lax.scan(body, acc0, (lam_t, par_t))
        return out

    def full_solve(x):
        return solve_nstream(
            x["dtau"], x["omega"], x["beta"], x["albedo"], tables,
            np.array([True]), np.array([0.0]), num_azimuth=num_azimuth,
        )

    AMORT_K = 8

    def amortize(f):
        """One dispatch = AMORT_K perturbed evaluations, so the ~20-35 ms
        tunnel round-trip is <5% of the measurement. The loop index feeds
        the perturbation, so XLA cannot share work between iterations."""

        def g(x):
            def step(i, acc):
                xx = dict(x)
                eps = 1e-6 * i.astype(x["dtau"].dtype)
                # perturb BOTH dtau and omega: omega feeds every stage
                # (assemble/eig don't read dtau — perturbing dtau alone
                # lets XLA hoist those stages out of the loop)
                xx["dtau"] = x["dtau"] * (1.0 + eps)
                xx["omega"] = x["omega"] * (1.0 - eps)
                with jax.default_matmul_precision("highest"):
                    return acc + jnp.sum(f(xx))

            return jax.lax.fori_loop(
                0, AMORT_K, step, jnp.zeros((), x["dtau"].dtype)
            )

        return jax.jit(g)

    def with_grad(f):
        def g(x):
            val, vjp = jax.vjp(f, x)
            grads = vjp(jnp.ones_like(val))[0]
            return jnp.sum(val) + sum(
                jnp.sum(v) for v in jax.tree_util.tree_leaves(grads)
            )

        return g

    stages = {
        "assemble": amortize(lambda x: _modes_prefix(x, "assemble")),
        "eig": amortize(lambda x: _modes_prefix(x, "eig")),
        "bvp": amortize(lambda x: _modes_prefix(x, "bvp")),
        "full_fwd": amortize(full_solve),
        "assemble_vjp": amortize(
            with_grad(lambda x: _modes_prefix(x, "assemble"))
        ),
        "eig_vjp": amortize(with_grad(lambda x: _modes_prefix(x, "eig"))),
        "bvp_vjp": amortize(with_grad(lambda x: _modes_prefix(x, "bvp"))),
        "full_fwd_vjp": amortize(with_grad(full_solve)),
    }
    return stages, inputs, AMORT_K


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=1024)
    ap.add_argument("--nstr", type=int, default=16)
    ap.add_argument("--modes", type=int, default=2)
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--skip-ceilings", action="store_true")
    args = ap.parse_args()

    _enable_compile_cache()
    import jax

    print(f"# devices: {jax.devices()}", flush=True)

    report = {"W": args.w, "nstr": args.nstr, "modes": args.modes}
    if not args.skip_ceilings:
        print("# measuring device ceilings...", flush=True)
        report["ceilings"] = measure_ceilings()
        print(json.dumps(report["ceilings"], indent=2), flush=True)

    stages, inputs, amort_k = build_stage_fns(
        args.nstr, args.w, num_azimuth=args.modes
    )
    report["amortize_k"] = amort_k
    report["stages"] = {}
    for name, fn in stages.items():
        t0 = time.perf_counter()
        dt_total = _median_time(fn, inputs)
        compile_s = time.perf_counter() - t0 - 6 * dt_total
        dt = dt_total / amort_k  # per-evaluation
        flops, bytes_ = _cost(fn, inputs)
        entry = {
            "time_s": dt,
            "compile_s": round(max(compile_s, 0.0), 1),
        }
        if flops is not None:
            entry["gflops_per_s"] = flops / amort_k / dt / 1e9
            entry["flops"] = flops / amort_k
        if bytes_ is not None:
            entry["gbytes_per_s"] = bytes_ / amort_k / dt / 1e9
            entry["bytes"] = bytes_ / amort_k
        report["stages"][name] = entry
        print(f"{name}: {json.dumps(entry)}", flush=True)

    if "full_fwd_vjp" in report["stages"]:
        dt = report["stages"]["full_fwd_vjp"]["time_s"]
        report["solves_per_sec"] = args.w / dt
        print(f"# solves/s (fwd+vjp, amortized): {args.w / dt:.1f}",
              flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)
        print(f"# wrote {args.json}", flush=True)


if __name__ == "__main__":
    main()
