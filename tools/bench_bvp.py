"""Microbenchmark of the block-tridiagonal BVP solve variants on TPU.

The round-5 roofline showed the Thomas scan is the 16-stream hot spot at
~24 GB/s and ~6.5 GFLOP/s — latency-bound by 2 x P sequential scan steps
of tiny kernels, not bandwidth or compute. This tool times the
alternatives with the amortized protocol (one dispatch = K loop
evaluations, scalar output) at the production shape [P=100, K=16,
W=1024]:

  thomas      production lane_block_thomas_solve (scan fwd + back)
  cr          block cyclic reduction (log2 P levels of bigger kernels)
  thomas_m    Thomas with the M azimuth modes batched into the blocks
              (same latency, M x the work per step)

Run: python tools/bench_bvp.py [--w 1024] [--p 100] [--k 16]
"""

from __future__ import annotations

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=1024)
    ap.add_argument("--p", type=int, default=100)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--modes", type=int, default=2)
    ap.add_argument("--amort", type=int, default=8)
    ap.add_argument("--grad", action="store_true",
                    help="also time fwd+vjp variants")
    args = ap.parse_args()
    _enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from sasktran2_tpu.ops.lanes import (
        lane_block_thomas_solve,
        lane_block_tridiag_solve,
    )

    P, K, W, M = args.p, args.k, args.w, args.modes
    rng = np.random.default_rng(0)
    lo = jnp.asarray(rng.normal(size=(P, K, K, W)) * 0.3, jnp.float32)
    up = jnp.asarray(rng.normal(size=(P, K, K, W)) * 0.3, jnp.float32)
    di = jnp.asarray(
        rng.normal(size=(P, K, K, W)) + 5.0 * np.eye(K)[:, :, None],
        jnp.float32,
    )
    r = jnp.asarray(rng.normal(size=(P, K, W)), jnp.float32)
    lo_m = jnp.broadcast_to(lo, (M,) + lo.shape)
    up_m = jnp.broadcast_to(up, (M,) + up.shape)
    di_m = jnp.broadcast_to(di, (M,) + di.shape)
    r_m = jnp.broadcast_to(r, (M,) + r.shape)

    def amortize(solver):
        """Operands are ARGUMENTS (closing over them would embed 315 MB
        of constants in the HLO and blow the remote-compile size cap)."""

        def g(ll, dd, uu, rr):
            def step(i, acc):
                scale = 1.0 + 1e-6 * i.astype(jnp.float32)
                return acc + jnp.sum(solver(ll, dd, uu, rr * scale))

            return jax.lax.fori_loop(
                0, args.amort, step, jnp.zeros((), jnp.float32)
            )

        return jax.jit(g)

    def timeit(name, fn, ops):
        ll, dd, uu, rr = ops
        fn(ll, dd, uu, rr).block_until_ready()
        times = []
        for i in range(5):
            rr2 = rr * (1.0 + 1e-5 * (i + 1))
            _ = float(rr2.ravel()[0])
            t0 = time.perf_counter()
            out = fn(ll, dd, uu, rr2)
            _ = float(out)
            times.append(time.perf_counter() - t0)
        times.sort()
        dt = times[len(times) // 2] / args.amort
        print(f"{name}: {dt * 1e3:.3f} ms/eval", flush=True)
        return dt

    cases = {
        "thomas": (amortize(lane_block_thomas_solve), (lo, di, up, r)),
        "cr": (amortize(lane_block_tridiag_solve), (lo, di, up, r)),
        "thomas_m": (
            amortize(lane_block_thomas_solve), (lo_m, di_m, up_m, r_m)
        ),
    }
    for name, (fn, ops) in cases.items():
        try:
            timeit(name, fn, ops)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    if args.grad:
        def gradded(solver):
            def f(ll, dd, uu, rr):
                def loss(l_, d_, u_, r_):
                    return jnp.sum(solver(l_, d_, u_, r_))

                val, grads = jax.value_and_grad(
                    loss, argnums=(0, 1, 2, 3)
                )(ll, dd, uu, rr)
                return val + sum(jnp.sum(g) for g in grads)

            return f

        def amortize_g(f):
            def g(ll, dd, uu, rr):
                def step(i, acc):
                    scale = 1.0 + 1e-6 * i.astype(jnp.float32)
                    return acc + f(ll, dd, uu, rr * scale)

                return jax.lax.fori_loop(
                    0, args.amort, step, jnp.zeros((), jnp.float32)
                )

            return jax.jit(g)

        gcases = {
            "thomas_vjp": amortize_g(gradded(lane_block_thomas_solve)),
            "cr_vjp": amortize_g(gradded(lane_block_tridiag_solve)),
        }
        for name, fn in gcases.items():
            try:
                timeit(name, fn, (lo, di, up, r))
            except Exception as e:  # noqa: BLE001
                print(f"{name}: FAILED {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
