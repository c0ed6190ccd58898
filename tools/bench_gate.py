"""Benchmark regression gate (the reference's ASV factor-1.05 gate,
``.github/workflows/benchmark.yml:23-60``, as a standalone tool).

Compares two bench result files (the driver's ``BENCH_r{N}.json`` capture
or raw ``bench.py`` JSON lines) metric by metric and fails when any
throughput metric regresses by more than the factor.

Usage::

    python tools/bench_gate.py BENCH_r03.json BENCH_r04.json --factor 1.05
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

# metrics where larger is better (solves/s family); anything ending in
# one of these suffixes is gated
THROUGHPUT_KEYS = ("solves_per_sec", "solves/s", "value",
                   "_jac", "_2str", "gflops_per_s")


def load_metrics(path):
    """Flatten a bench capture into {metric_name: float}."""
    raw = json.loads(Path(path).read_text())
    if "parsed" in raw:  # driver BENCH_r{N}.json capture
        raw = raw["parsed"]
    out = {}

    def walk(prefix, obj):
        if isinstance(obj, dict):
            for k, v in obj.items():
                walk(f"{prefix}{k}." if prefix else f"{k}.", v) if isinstance(
                    v, dict
                ) else walk_leaf(f"{prefix}{k}", v)
        else:
            walk_leaf(prefix.rstrip("."), obj)

    def walk_leaf(name, v):
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            out[name] = float(v)

    walk("", raw)
    return out


class BatchMismatch(RuntimeError):
    """Raised when two rounds measured different fallback batch sizes: a
    round that fell back to a smaller wavelength batch must not be
    compared against a full-batch round on a noise margin (round-4
    verdict weak #5)."""


def check_batches(base, cont):
    mismatches = []
    for name, b in sorted(base.items()):
        if "batch" in name and name in cont and cont[name] != b:
            mismatches.append((name, b, cont[name]))
    return mismatches


def gate(base_path, contender_path, factor=1.05,
         allow_batch_mismatch=False):
    base = load_metrics(base_path)
    cont = load_metrics(contender_path)
    mismatches = check_batches(base, cont)
    if mismatches and not allow_batch_mismatch:
        raise BatchMismatch(
            "fallback batch sizes differ between rounds: "
            + ", ".join(f"{n}: {b:g} vs {c:g}" for n, b, c in mismatches)
            + " (rerun, or pass --allow-batch-mismatch to compare anyway)"
        )
    regressions = []
    improvements = []
    for name, b in sorted(base.items()):
        if name not in cont or b <= 0:
            continue
        if not any(s in name for s in THROUGHPUT_KEYS):
            continue
        if "batch" in name or "vs_baseline" in name or "pct" in name:
            continue
        if ".flops." in name:
            # cost-analysis telemetry, not a throughput target: XLA's
            # flop count cannot see inside Pallas custom calls, so the
            # round-5 kernels made reported GFLOP/s drop while actual
            # solves/s rose 2-4x — gating it would punish real speedups
            continue
        c = cont[name]
        ratio = c / b
        if ratio < 1.0 / factor:
            regressions.append((name, b, c, ratio))
        elif ratio > factor:
            improvements.append((name, b, c, ratio))
    return regressions, improvements


def main(argv):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("base")
    ap.add_argument("contender")
    ap.add_argument("--factor", type=float, default=1.05)
    ap.add_argument("--allow-batch-mismatch", action="store_true")
    args = ap.parse_args(argv)
    try:
        regressions, improvements = gate(
            args.base, args.contender, args.factor,
            allow_batch_mismatch=args.allow_batch_mismatch,
        )
    except BatchMismatch as e:
        print(f"REFUSED: {e}")
        return 2
    for name, b, c, r in improvements:
        print(f"IMPROVED  {name}: {b:.1f} -> {c:.1f} ({r:.2f}x)")
    for name, b, c, r in regressions:
        print(f"REGRESSED {name}: {b:.1f} -> {c:.1f} ({r:.2f}x)")
    if regressions:
        print(f"{len(regressions)} metric(s) regressed beyond "
              f"{args.factor}x")
        return 1
    print("benchmark gate passed")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
