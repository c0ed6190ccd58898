"""nstr-sweep timing of the wavelength-minor N-stream solver with full
Jacobians (the shape family of the reference's LIDORT timing notebook,
``docs/performance_book/source/external_validation/lidort/timing.ipynb``,
and its ASV ``DOLarge`` sweep).

The book executes on CPU (f64) so the table reproduces anywhere; the
committed TPU numbers live in ``BENCH_r*.json`` (bench.py cases
``16str_1k`` / ``40str_200lyr_128``) and docs/performance.md.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from common import setup_backend, write_report  # noqa: E402

NSTRS = [2, 4, 8, 16, 32, 40]
W = 8  # wavelength batch per solve (CPU-sized)
P = 100


def run():
    backend = setup_backend()
    import jax
    import jax.numpy as jnp

    from sasktran2_tpu.rt import disco
    from sasktran2_tpu.rt.disco_nstream import solve_nstream

    rng = np.random.default_rng(1)
    lines = [
        "# nstr sweep — wavelength-minor solver, full Jacobians",
        "",
        f"{P} layers, wavelength batch {W}, 2 azimuth modes, "
        f"backend = {backend} (f64); per-wavelength-solve time = "
        "batch wall time / batch size. CPU numbers are for shape "
        "scaling only — the production chip numbers are in "
        "BENCH_r*.json.",
        "",
        "| nstr | compile (s) | ms / wavelength solve | solves/s |",
        "|---|---|---|---|",
    ]
    for nstr in NSTRS:
        L = max(4, nstr)
        dtau = rng.uniform(0.01, 0.3, (P, W))
        omega = rng.uniform(0.5, 0.95, (P, W))
        ls = np.arange(L)
        beta = np.broadcast_to(
            ((2 * ls + 1) * 0.6**ls)[:, None, None], (L, P, W)
        )
        tables = disco.build_mode_tables(
            nstr, L, 0.6, np.array([0.8]), num_azimuth=2
        )
        inputs = {
            "dtau": jnp.asarray(dtau),
            "omega": jnp.asarray(omega),
            "beta": jnp.asarray(beta),
            "albedo": jnp.full((W,), 0.3),
        }

        def rad_fn(x, tables=tables):
            return solve_nstream(
                x["dtau"], x["omega"], x["beta"], x["albedo"], tables,
                np.array([True]), np.array([0.0]), num_azimuth=2,
            )

        @jax.jit
        def full(x, rad_fn=rad_fn):
            rad, vjp = jax.vjp(rad_fn, x)
            return rad, vjp(jnp.ones_like(rad))[0]

        t0 = time.perf_counter()
        jax.block_until_ready(full(inputs))
        compile_s = time.perf_counter() - t0
        times = []
        for i in range(3):
            inp = dict(inputs)
            inp["dtau"] = inputs["dtau"] * (1.0 + 1e-5 * (i + 1))
            t0 = time.perf_counter()
            jax.block_until_ready(full(inp))
            times.append(time.perf_counter() - t0)
        times.sort()
        dt = times[len(times) // 2] / W
        lines.append(
            f"| {nstr} | {compile_s:.1f} | {dt * 1e3:.2f} | "
            f"{1.0 / dt:.1f} |"
        )
        print(f"nstr={nstr}: {dt * 1e3:.2f} ms/solve", flush=True)

    lines += [
        "",
        "Reference CPU anchors (BASELINE.md): 58.4 ms/solve at nstr=2 / "
        "100 layers with Jacobians; 3.61 s/solve at nstr=40 / 200 "
        "layers.",
    ]
    path = write_report("nstr_sweep", lines)
    return path, []


if __name__ == "__main__":
    p, _ = run()
    print(f"wrote {p}")
