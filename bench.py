"""Benchmark: wavelength-solves/sec on one TPU chip.

Headline config matches the reference's published timing anchor
(``BASELINE.md``): plane-parallel discrete ordinates, 100 layers,
2 streams, 40 single-scatter moments, forced 2 azimuth modes, 1 LOS,
WITH full Jacobians (d radiance / d extinction, ssa, albedo, ...) —
reference: 58.4 ms per wavelength on one CPU thread (~17 solves/s).

We run the identical physics on one TPU chip with the wavelength axis as
the batch dimension, Jacobians by reverse-mode autodiff, and report
wavelength-solves/sec. ``vs_baseline`` is the speedup over the reference's
17 solves/s/thread. A 16-stream north-star number is included in "extra".
"""

from __future__ import annotations

import json
import time

import numpy as np


def _build_twostream(W, P=100, L=40, dtype=None):
    """Wavelength-minor two-stream fast path (rt/twostream.py): same
    physics and Jacobians as the generic solver (validated to 1e-10 in
    tests/test_twostream.py) with wavelengths in the TPU lane axis, so no
    chunking or remat is needed. Per-wavelength Jacobians come from ONE
    broadcast vjp (outputs are wavelength-diagonal in the inputs)."""
    import jax
    import jax.numpy as jnp

    from sasktran2_tpu.rt import disco
    from sasktran2_tpu.rt.twostream import solve_twostream

    dtype = dtype or jnp.float32
    rng = np.random.default_rng(1)
    alts = np.linspace(0, 100000, P + 1)
    ext_prof = 7e-5 * np.exp(-alts / 7000.0)
    dtau_prof = (0.5 * (ext_prof[:-1] + ext_prof[1:])
                 * np.diff(alts))[::-1]
    dtau = (
        np.broadcast_to(dtau_prof, (W, P)) * rng.uniform(0.8, 1.2, (W, 1))
    ).T  # [P, W]
    ls = np.arange(L)
    beta = np.broadcast_to(
        ((2 * ls + 1) * 0.5**ls)[:, None, None], (L, P, W)
    )
    tables = disco.build_mode_tables(2, L, 0.6, np.array([0.8]),
                                     num_azimuth=2)
    inputs = {
        "dtau": jnp.asarray(dtau, dtype=dtype),
        "omega": jnp.full((P, W), 0.9, dtype=dtype),
        "beta": jnp.asarray(beta, dtype=dtype),
        "albedo": jnp.full((W,), 0.3, dtype=dtype),
    }

    def rad_fn(x):
        return solve_twostream(
            x["dtau"], x["omega"], x["beta"], x["albedo"], tables,
            np.array([True]), np.array([0.0]),
        )

    def full(x):
        with jax.default_matmul_precision("highest"):
            rad, vjp = jax.vjp(rad_fn, x)
            return rad, vjp(jnp.ones_like(rad))[0]

    return jax.jit(full), inputs


def _build(nstr, W, P=100, L=40, chunk=None, dtype=None):
    """Jitted fn computing radiance + full per-wavelength Jacobians.

    ``chunk`` bounds peak HBM: the wavelength batch is processed in
    sequential ``lax.map`` slices of that size, and the per-wavelength
    solve is wrapped in ``jax.checkpoint`` so the VJP recomputes the
    forward instead of storing every cyclic-reduction intermediate
    (round-1 lesson: the unchunked 16-stream case OOM'd a 16 GB v5e).
    """
    import jax
    import jax.numpy as jnp

    from sasktran2_tpu.rt import disco

    dtype = dtype or jnp.float32
    rng = np.random.default_rng(1)
    alts = np.linspace(0, 100000, P + 1)
    ext_prof = 7e-5 * np.exp(-alts / 7000.0)

    # layer inputs direct (TOA first)
    k_lo = ext_prof[:-1]
    k_hi = ext_prof[1:]
    dz = np.diff(alts)
    dtau_prof = (0.5 * (k_lo + k_hi) * dz)[::-1]
    dtau = np.broadcast_to(dtau_prof, (W, P)) * rng.uniform(0.8, 1.2, (W, 1))
    omega = np.full((W, P), 0.9)
    ls = np.arange(L)
    beta = np.broadcast_to(
        (2 * ls + 1) * 0.5**ls, (W, P, L)
    )
    albedo = np.full((W,), 0.3)

    mu0 = 0.6
    user_mu = np.array([0.8])
    user_up = np.array([True])
    user_azi = np.array([0.0])
    tables = disco.build_mode_tables(nstr, L, mu0, user_mu, num_azimuth=2)

    inputs = {
        "dtau": jnp.asarray(dtau, dtype=dtype),
        "omega": jnp.asarray(omega, dtype=dtype),
        "beta": jnp.asarray(beta, dtype=dtype),
        "albedo": jnp.asarray(albedo, dtype=dtype),
    }

    @jax.checkpoint
    def rad_fn(x):
        return disco.solve_plane_parallel(
            x["dtau"][None],
            x["omega"][None],
            x["beta"][None],
            x["albedo"][None],
            tables,
            user_up,
            user_azi,
        )[0]

    def per_wavelength(inp):
        rad, vjp = jax.vjp(rad_fn, inp)
        seeds = jnp.eye(rad.shape[0], dtype=rad.dtype)
        grads = jax.vmap(vjp)(seeds)[0]
        return rad, grads

    vm = jax.vmap(per_wavelength)

    if chunk is not None and chunk < W:
        if W % chunk:
            msg = f"W={W} not divisible by chunk={chunk}"
            raise ValueError(msg)

        def core(inp):
            resh = jax.tree_util.tree_map(
                lambda a: a.reshape((W // chunk, chunk) + a.shape[1:]), inp
            )
            out = jax.lax.map(vm, resh)
            return jax.tree_util.tree_map(
                lambda a: a.reshape((W,) + a.shape[2:]), out
            )
    else:
        core = vm

    def with_precision(inp):
        with jax.default_matmul_precision("highest"):
            return core(inp)

    fn = jax.jit(with_precision)
    return fn, inputs


def _checksum(out):
    """Host-transfer a scalar derived from every output — the only reliable
    synchronization through the device tunnel (block_until_ready can return
    before remote execution completes, and identical-input executions are
    cached)."""
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    total = 0.0
    for leaf in leaves:
        total += float(leaf.ravel()[0])
    return total


def _time_solves(fn, inputs, repeats=5):
    """Median wall time per call with fresh input values every call and a
    host-sync on the result."""
    import time as _t

    _checksum(fn(inputs))
    times = []
    for i in range(repeats):
        inp = dict(inputs)
        inp["dtau"] = inputs["dtau"] * (1.0 + 1e-4 * (i + 1))
        _ = float(inp["dtau"].ravel()[0])
        t0 = _t.perf_counter()
        out = fn(inp)
        _checksum(out)
        times.append(_t.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def _case_twostream(W):
    fn, inputs = _build_twostream(W)
    dt = _time_solves(fn, inputs)
    return W / dt


def _case_generic(nstr, W, chunk):
    fn, inputs = _build(nstr, W, chunk=chunk)
    dt = _time_solves(fn, inputs)
    return W / dt


CASES = {
    # name -> (thunk, timeout_s). Sizes/chunks from on-device sweeps;
    # timeouts cover compile (cold, through the device tunnel) + 6 runs.
    "2str_fast_32k": (lambda: _case_twostream(32768), 300),
    "2str_fast_16k": (lambda: _case_twostream(16384), 240),
    "2str_generic_4k": (lambda: _case_generic(2, 4096, 512), 240),
    "16str_1k": (lambda: _case_generic(16, 1024, 16), 420),
}


def _run_case_subprocess(name):
    """Run one case in a child process with a hard timeout so a
    pathological compile or OOM can never hang/zero the whole bench
    (round-2 lesson: the 65k-wavelength compile hung >10 min)."""
    import os
    import subprocess
    import sys

    timeout = CASES[name][1]
    try:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--case", name],
            capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        print(f"# case {name}: timed out after {timeout}s", flush=True)
        return None
    for line in res.stdout.splitlines():
        if line.startswith("CASE_RESULT "):
            return float(line.split()[1])
    tail = (res.stdout + res.stderr)[-2000:]
    print(f"# case {name}: failed rc={res.returncode}\n{tail}", flush=True)
    return None


def main():
    # Headline: the wavelength-minor two-stream fast path (rt/twostream.py,
    # wavelengths in the TPU lane axis; validated vs the generic solver at
    # 1e-10). The generic wavelength-leading path is reported in "extra"
    # with the chunk sizes found by on-device sweeps.
    W = 32768
    solves2 = _run_case_subprocess("2str_fast_32k")
    if solves2 is None:
        W = 16384
        solves2 = _run_case_subprocess("2str_fast_16k")
    if solves2 is None:  # fall back to the generic chunked path
        W = 4096
        solves2 = _run_case_subprocess("2str_generic_4k")

    solves2_generic = _run_case_subprocess("2str_generic_4k")
    W16 = 1024
    solves16 = _run_case_subprocess("16str_1k")

    baseline_2str = 17.0  # ref CPU thread, 100 lyr, 2 str, with Jacobians
    print(
        json.dumps(
            {
                "metric": "wavelength-solves/sec/chip (100 layers, 2 streams, Jacobians)",
                "value": round(solves2, 1) if solves2 else 0.0,
                "unit": "solves/s",
                "vs_baseline": (
                    round(solves2 / baseline_2str, 2) if solves2 else 0.0
                ),
                "extra": {
                    "solves_per_sec_16stream_jac": (
                        round(solves16, 1) if solves16 else None
                    ),
                    "solves_per_sec_2str_generic_path": (
                        round(solves2_generic, 1)
                        if solves2_generic else None
                    ),
                    "batch_2str": W,
                    "batch_16str": W16,
                },
            }
        )
    )


if __name__ == "__main__":
    import sys

    if len(sys.argv) >= 3 and sys.argv[1] == "--case":
        solves = CASES[sys.argv[2]][0]()
        print(f"CASE_RESULT {solves}", flush=True)
    else:
        main()
