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
import os
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compile cache for the bench subprocesses: the axon
    compile helper's latency varies a lot over a session (95 s -> 385 s
    observed for an identical 16-stream graph), and fallback cases would
    otherwise pay a full recompile. Serialized executables are keyed by
    HLO + compiler version, so this never changes results."""
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".bench_jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


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


def _build_nstream_minor(nstr, W, P=100, L=40, dtype=None):
    """Wavelength-minor N-stream path (rt/disco_nstream.py): scan-based
    Jacobi eigensolve + block-Thomas BVP + scan over azimuth modes, so the
    HLO graph is O(1) in layers/streams/modes and compile stays ~100 s at
    nstr=16, P=100 (the round-2 lane-unrolled formulation did not compile
    in 10 min). Per-wavelength Jacobians from one broadcast vjp."""
    import jax
    import jax.numpy as jnp

    from sasktran2_tpu.rt import disco
    from sasktran2_tpu.rt.disco_nstream import solve_nstream

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
    tables = disco.build_mode_tables(nstr, L, 0.6, np.array([0.8]),
                                     num_azimuth=2)
    inputs = {
        "dtau": jnp.asarray(dtau, dtype=dtype),
        "omega": jnp.full((P, W), 0.9, dtype=dtype),
        "beta": jnp.asarray(beta, dtype=dtype),
        "albedo": jnp.full((W,), 0.3, dtype=dtype),
    }

    def rad_fn(x):
        return solve_nstream(
            x["dtau"], x["omega"], x["beta"], x["albedo"], tables,
            np.array([True]), np.array([0.0]), num_azimuth=2,
        )

    def full(x):
        with jax.default_matmul_precision("highest"):
            rad, vjp = jax.vjp(rad_fn, x)
            return rad, vjp(jnp.ones_like(rad))[0]

    return jax.jit(full), inputs


def _build_polarized_minor(nstr, W, P=100, L=None, dtype=None):
    """Wavelength-minor POLARIZED (I, Q, U) path (rt/disco_vec_minor.py):
    the sign-transform reduction on flattened (stream x stokes) blocks,
    wavelength in the lane axis. Rayleigh-like greeks with a2/a3/b1
    populated; per-wavelength Jacobians from one broadcast vjp."""
    import jax
    import jax.numpy as jnp

    from sasktran2_tpu.rt.disco_vec_minor import (
        build_vector_minor_tables,
        solve_nstream_vector,
    )

    dtype = dtype or jnp.float32
    L = L or max(nstr, 4)
    rng = np.random.default_rng(1)
    alts = np.linspace(0, 100000, P + 1)
    ext_prof = 7e-5 * np.exp(-alts / 7000.0)
    dtau_prof = (0.5 * (ext_prof[:-1] + ext_prof[1:])
                 * np.diff(alts))[::-1]
    dtau = (
        np.broadcast_to(dtau_prof, (W, P)) * rng.uniform(0.8, 1.2, (W, 1))
    ).T  # [P, W]
    ls = np.arange(L)
    a1 = np.broadcast_to(
        ((2 * ls + 1) * 0.5**ls)[:, None, None], (L, P, W)
    )
    a2 = 0.7 * a1 * (ls >= 2)[:, None, None]
    a3 = 0.5 * a1 * (ls >= 2)[:, None, None]
    b1 = 0.3 * a1 * (ls >= 2)[:, None, None]
    tables = build_vector_minor_tables(nstr, L, 0.6, np.array([0.8]),
                                       num_azimuth=2)
    inputs = {
        "dtau": jnp.asarray(dtau, dtype=dtype),
        "omega": jnp.full((P, W), 0.9, dtype=dtype),
        "a1": jnp.asarray(a1, dtype=dtype),
        "a2": jnp.asarray(a2, dtype=dtype),
        "a3": jnp.asarray(a3, dtype=dtype),
        "b1": jnp.asarray(b1, dtype=dtype),
        "albedo": jnp.full((W,), 0.3, dtype=dtype),
    }

    def rad_fn(x):
        return solve_nstream_vector(
            x["dtau"], x["omega"], x["a1"], x["a2"], x["a3"], x["b1"],
            x["albedo"], tables, np.array([True]), np.array([0.0]),
            num_azimuth=2,
        )

    def full(x):
        with jax.default_matmul_precision("highest"):
            rad, vjp = jax.vjp(rad_fn, x)
            return rad, vjp(jnp.ones_like(rad))[0]

    return jax.jit(full), inputs


def _build_engine_2str(W, nalt=101):
    """End-to-end ENGINE path: public API (Config/Geometry/Atmosphere ->
    Engine.calculate_radiance) with US76 + Rayleigh + surface, WFs on.
    Exercises geometry tracing, constituent pipeline, the wavelength-minor
    fast path and the WF mapping — the full user-visible stack."""
    import sasktran2_tpu as sk
    from sasktran2_tpu.climatology import add_us76_standard_atmosphere

    config = sk.Config(
        num_streams=2,
        multiple_scatter_source=sk.MultipleScatterSource.TwoStream,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
        num_singlescatter_moments=4,
        dtype="float32",
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 100000, nalt),
        geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, 0.3, 0.8, 2e5))
    engine = sk.Engine(config, geometry, viewing)
    wavel = np.linspace(280.0, 800.0, W)

    def run(scale):
        atmo = sk.Atmosphere(geometry, config, wavelengths_nm=wavel)
        add_us76_standard_atmosphere(atmo)
        atmo.pressure_pa = atmo.pressure_pa * scale
        atmo["rayleigh"] = sk.constituent.Rayleigh()
        atmo["surface"] = sk.constituent.LambertianSurface(0.3)
        out = engine.calculate_radiance(atmo)
        return float(out["radiance"].to_numpy().ravel()[0])

    return run


def _build_engine_limb16(W, nalt=101, nlos=20, nstr=16):
    """Flagship limb workload end-to-end: 16-stream spherical limb scan
    (SZA-interpolated DO source on the wavelength-minor fast path) with
    full Jacobians through the public API. The round-2 formulation could
    not even compile this configuration."""
    import sasktran2_tpu as sk
    from sasktran2_tpu.climatology import add_us76_standard_atmosphere

    config = sk.Config(
        num_streams=nstr,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.Exact,
        num_singlescatter_moments=nstr,
        num_do_sza=2,
        dtype="float32",
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 100000, nalt),
        geometry_type=sk.GeometryType.Spherical,
    )
    viewing = sk.ViewingGeometry()
    for talt in np.linspace(10000, 80000, nlos):
        viewing.add_ray(sk.TangentAltitudeSolar(float(talt), 0.4, 2e5, 0.6))
    engine = sk.Engine(config, geometry, viewing)
    wavel = np.linspace(280.0, 800.0, W)

    def run(scale):
        atmo = sk.Atmosphere(geometry, config, wavelengths_nm=wavel)
        add_us76_standard_atmosphere(atmo)
        atmo.pressure_pa = atmo.pressure_pa * scale
        atmo["rayleigh"] = sk.constituent.Rayleigh()
        atmo["surface"] = sk.constituent.LambertianSurface(0.3)
        out = engine.calculate_radiance(atmo)
        return float(out["radiance"].to_numpy().ravel()[0])

    return run, nlos


def _case_engine_limb16(W):
    import time as _t

    run, nlos = _build_engine_limb16(W)
    run(1.0)  # compile
    times = []
    for i in range(3):
        t0 = _t.perf_counter()
        run(1.0 + 1e-5 * (i + 1))
        times.append(_t.perf_counter() - t0)
    times.sort()
    # wavelength-LOS solves/s (each wavelength solves nlos limb outputs
    # with full Jacobians)
    return W * nlos / times[len(times) // 2]


def _case_engine_2str(W):
    import time as _t

    run = _build_engine_2str(W)
    run(1.0)  # compile
    times = []
    for i in range(3):
        t0 = _t.perf_counter()
        run(1.0 + 1e-5 * (i + 1))
        times.append(_t.perf_counter() - t0)
    times.sort()
    return W / times[len(times) // 2]


def _checksum(out):
    """Host-transfer a scalar derived from every output — the only reliable
    synchronization through the device tunnel (block_until_ready can return
    before remote execution completes, and identical-input executions are
    cached). ONE combined fetch: each per-leaf ``float(...)`` costs a full
    ~36 ms tunnel round trip (round-5 measurement), which at 5 leaves used
    to double the reported per-call time of the solver cases."""
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    total = jax.jit(lambda ls: sum(l.ravel()[0] for l in ls))(leaves)
    return float(total)


AMORT_K = 8


def _amortized(fn, inputs):
    """One dispatch = AMORT_K perturbed evaluations of ``fn`` with a single
    scalar output. The ~36 ms dispatch + fetch round trip through the axon
    tunnel is paid once per AMORT_K solves instead of once per solve, so
    the measurement reflects chip throughput, not tunnel latency. Each
    leaf is fully reduced (jnp.sum) into the accumulator so XLA cannot
    dead-code-eliminate any part of the solve; the loop index feeds the
    perturbation so iterations cannot be shared."""
    import jax
    import jax.numpy as jnp

    def g(x):
        def step(i, acc):
            xx = dict(x)
            eps = 1e-5 * i.astype(x["dtau"].dtype)
            xx["dtau"] = x["dtau"] * (1.0 + eps)
            if "omega" in xx:
                xx["omega"] = x["omega"] * (1.0 - 0.1 * eps)
            out = fn(xx)
            return acc + sum(
                jnp.sum(leaf)
                for leaf in jax.tree_util.tree_leaves(out)
            )

        return jax.lax.fori_loop(
            0, AMORT_K, step, jnp.zeros((), x["dtau"].dtype)
        )

    return jax.jit(g)


def _time_solves(fn, inputs, repeats=5, _amortized_already=False):
    """Median wall time per evaluation: amortized in-graph loop (AMORT_K
    evaluations per dispatch), fresh input values every call, one scalar
    host-sync per dispatch."""
    import time as _t

    gn = fn if _amortized_already else _amortized(fn, inputs)
    float(gn(inputs))
    times = []
    for i in range(repeats):
        inp = dict(inputs)
        inp["dtau"] = inputs["dtau"] * (1.0 + 1e-4 * (i + 1))
        _ = float(inp["dtau"].ravel()[0])
        t0 = _t.perf_counter()
        out = gn(inp)
        _ = float(out)
        times.append(_t.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2] / AMORT_K


def _flops_of(fn, inputs):
    """XLA cost-analysis FLOP count of the jitted case (SURVEY §5
    profiling requirement: each case reports achieved GFLOP/s and
    %-of-peak so optimization effort goes where it pays)."""
    try:
        cost = fn.lower(inputs).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def _case_lane(builder, W):
    """Run a solver-level lane case: median-time solves/s plus FLOP and
    wall-time telemetry lines for the parent process. The amortized
    wrapper is built ONCE (one tunnel compile) and reused for both the
    timing and the cost analysis."""
    fn, inputs = builder(W)
    gn = _amortized(fn, inputs)
    dt = _time_solves(gn, inputs, _amortized_already=True)
    flops = _flops_of(gn, inputs)
    if flops:
        print(f"CASE_FLOPS {flops / AMORT_K}", flush=True)
    print(f"CASE_TIME {dt}", flush=True)
    return W / dt


def _case_twostream(W):
    return _case_lane(_build_twostream, W)


def _case_nstream_minor(nstr, W):
    return _case_lane(lambda w: _build_nstream_minor(nstr, w), W)


def _case_polarized_minor(nstr, W):
    return _case_lane(lambda w: _build_polarized_minor(nstr, w), W)


def _case_nstream_200lyr(nstr, W):
    """BASELINE.md flagship anchor shape: 200 layers, 40 streams, full
    Jacobians (reference: 3.61 s/solve on one CPU thread).

    Runs with the Pallas kernels disabled: at nstr=40 the n=20 Jacobi
    kernel inflated the XLA TPU compile past the compile helper's memory
    (SIGKILL, round-5 measurement); the scan formulation compiles —
    slowly (~1 h cold through the tunnel, hence the persistent cache and
    the generous case timeout) but reliably."""
    import os

    os.environ["SASKTRAN2_TPU_NO_PALLAS"] = "1"
    return _case_lane(lambda w: _build_nstream_minor(nstr, w, P=200), W)


CASES = {
    # name -> (thunk, timeout_s). Sizes from on-device sweeps; timeouts
    # cover compile (cold, through the device tunnel) + 6 runs.
    "2str_fast_32k": (lambda: _case_twostream(32768), 420),
    "2str_fast_16k": (lambda: _case_twostream(16384), 360),
    "2str_engine_1k": (lambda: _case_engine_2str(1024), 360),
    "16str_1k": (lambda: _case_nstream_minor(16, 1024), 480),
    "16str_512": (lambda: _case_nstream_minor(16, 512), 480),
    "16str_256": (lambda: _case_nstream_minor(16, 256), 420),
    # 40-stream: the XLA TPU compile of the 200-layer/40-stream
    # Jacobian graph kills this environment's remote compile helper with
    # SIGKILL (host OOM) after ~30-65 min, with or without the Pallas
    # kernels (three independent round-5 attempts). The case stays —
    # on an environment whose compile host has the memory it will run
    # and cache — but with timeouts sized so a failing compile cannot
    # eat the whole bench budget. nstr=40 correctness is covered by the
    # CPU suite (expm oracle) and docs/book/nstr_sweep.md.
    "40str_200lyr_128": (lambda: _case_nstream_200lyr(40, 128), 480),
    "40str_200lyr_64": (lambda: _case_nstream_200lyr(40, 64), 360),
    "pol3_4str_1k": (lambda: _case_polarized_minor(4, 1024), 480),
    "pol3_4str_256": (lambda: _case_polarized_minor(4, 256), 420),
    # polarized-16 cold compile took ~40 min through the tunnel (it
    # succeeded and is cached in .bench_jax_cache); generous timeout
    "pol3_16str_256": (lambda: _case_polarized_minor(16, 256), 2400),
    "pol3_16str_128": (lambda: _case_polarized_minor(16, 128), 1200),
    "16str_limb_256": (lambda: _case_engine_limb16(256), 900),
    "16str_limb_128": (lambda: _case_engine_limb16(128), 700),
}

_case_cache = {}
_case_mfu = {}


def _run_case_subprocess(name):
    """Run one case in a child process with a hard timeout so a
    pathological compile or OOM can never hang/zero the whole bench
    (round-2 lesson: the 65k-wavelength compile hung >10 min). Results are
    memoized so a case reused as a fallback is never timed twice."""
    import os
    import subprocess
    import sys

    if name in _case_cache:
        return _case_cache[name]
    timeout = CASES[name][1]
    try:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--case", name],
            capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        print(f"# case {name}: timed out after {timeout}s", flush=True)
        _case_cache[name] = None
        return None
    result = None
    flops = None
    dt = None
    for line in res.stdout.splitlines():
        if line.startswith("CASE_RESULT "):
            result = float(line.split()[1])
        elif line.startswith("CASE_FLOPS "):
            flops = float(line.split()[1])
        elif line.startswith("CASE_TIME "):
            dt = float(line.split()[1])
    if result is None:
        tail = (res.stdout + res.stderr)[-2000:]
        print(f"# case {name}: failed rc={res.returncode}\n{tail}",
              flush=True)
        _case_cache[name] = None
        return None
    if flops is not None and dt:
        # v5e peak: 197 TFLOP/s bf16 (394 int8 TOPS). The solvers run
        # f32 HIGHEST-precision, so this is a conservative utilization
        # reference; it makes rounds comparable.
        _case_mfu[name] = {
            "gflops_per_s": round(flops / dt / 1e9, 1),
            "pct_of_v5e_bf16_peak": round(
                100.0 * flops / dt / 197e12, 2
            ),
        }
    _case_cache[name] = result
    return result


def main():
    # Headline: the wavelength-minor two-stream fast path (rt/twostream.py,
    # wavelengths in the TPU lane axis; validated vs the generic solver at
    # 1e-10). Extras: the 16-stream north-star (wavelength-minor scan
    # solver) and the full public-API engine path.
    W = 32768
    solves2 = _run_case_subprocess("2str_fast_32k")
    if solves2 is None:
        W = 16384
        solves2 = _run_case_subprocess("2str_fast_16k")

    solves_engine = _run_case_subprocess("2str_engine_1k")
    # 16-stream north star with a fallback chain: a compile-variance
    # blowout on the big case must degrade to a smaller measured batch,
    # never to a null (rounds 2 and 3 both shipped nulls here)
    W16 = 1024
    solves16 = _run_case_subprocess("16str_1k")
    if solves16 is None:
        W16 = 512
        solves16 = _run_case_subprocess("16str_512")
    if solves16 is None:
        W16 = 256
        solves16 = _run_case_subprocess("16str_256")

    W40 = 128
    solves40 = _run_case_subprocess("40str_200lyr_128")
    if solves40 is None:
        W40 = 64
        solves40 = _run_case_subprocess("40str_200lyr_64")

    Wp = 1024
    solves_pol = _run_case_subprocess("pol3_4str_1k")
    if solves_pol is None:
        Wp = 256
        solves_pol = _run_case_subprocess("pol3_4str_256")

    Wp16 = 256
    solves_pol16 = _run_case_subprocess("pol3_16str_256")
    if solves_pol16 is None:
        Wp16 = 128
        solves_pol16 = _run_case_subprocess("pol3_16str_128")

    solves_limb = _run_case_subprocess("16str_limb_256")
    if solves_limb is None:
        solves_limb = _run_case_subprocess("16str_limb_128")

    baseline_2str = 17.0  # ref CPU thread, 100 lyr, 2 str, with Jacobians
    # 16-stream CPU anchor DERIVED from BASELINE.md's two measured
    # Jacobian-inclusive points (timing.ipynb cells 4/5):
    #   t(nstr=2,  100 layers) = 58.4 ms
    #   t(nstr=40, 200 layers) = 3.61 s  -> /2 for 100 layers (cost is
    #   linear in layer count for both the per-layer eigensolves and the
    #   block-tridiagonal BVP) = 1.805 s
    # Power-law interpolation in nstr between the two points:
    #   b = ln(1805/58.4)/ln(40/2) = 1.145;  t(16) = 58.4 ms * 8^1.145
    #     = 631 ms  ->  1.585 solves/s.
    t2, t40_100lyr = 58.4e-3, 3.61 / 2.0
    b_exp = np.log(t40_100lyr / t2) / np.log(40.0 / 2.0)
    baseline_16str = 1.0 / (t2 * (16.0 / 2.0) ** b_exp)
    # 200-layer/40-stream flagship anchor is measured directly: 0.28
    # solves/s (BASELINE.md row 5; no interpolation needed).
    baseline_40str_200lyr = 0.28
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
                    "speedup_16stream_vs_cpu": (
                        round(solves16 / baseline_16str, 1)
                        if solves16 else None
                    ),
                    "solves_per_sec_40str_200lyr_jac": (
                        round(solves40, 2) if solves40 else None
                    ),
                    "speedup_40str_200lyr_vs_cpu": (
                        round(solves40 / baseline_40str_200lyr, 1)
                        if solves40 else None
                    ),
                    "solves_per_sec_polarized_4str_jac": (
                        round(solves_pol, 1) if solves_pol else None
                    ),
                    "solves_per_sec_polarized_16str_jac": (
                        round(solves_pol16, 1) if solves_pol16 else None
                    ),
                    "solves_per_sec_engine_path_2str": (
                        round(solves_engine, 1) if solves_engine else None
                    ),
                    "limb16_wavelength_los_solves_per_sec_jac": (
                        round(solves_limb, 1) if solves_limb else None
                    ),
                    "batch_2str": W,
                    "batch_16str": W16,
                    "batch_40str": W40,
                    "batch_pol3": Wp,
                    "batch_pol3_16str": Wp16,
                    "flops": _case_mfu,
                },
            }
        )
    )


if __name__ == "__main__":
    import sys

    if len(sys.argv) >= 3 and sys.argv[1] == "--case":
        _enable_compile_cache()
        solves = CASES[sys.argv[2]][0]()
        print(f"CASE_RESULT {solves}", flush=True)
    else:
        main()
