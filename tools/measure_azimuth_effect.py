"""Before/after measurement of the static azimuth-mode truncation on the
flagship 16-stream limb workload (round-5 item: the reference exits its
azimuth loop on convergence, do_source.cpp:47-57; the engine instead
derives an exact static mode count from the phase expansion's support).

Runs the bench limb case twice through the public API on the attached
TPU — once with num_forced_azimuth=16 (truncation disabled, all 16
modes) and once automatic (Rayleigh -> 3 modes) — and reports
wavelength-LOS solves/s plus the radiance agreement between the two.

Run: python tools/measure_azimuth_effect.py [--w 128]
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


def run_limb(W, nlos, forced):
    import sasktran2_tpu as sk
    from sasktran2_tpu.climatology import add_us76_standard_atmosphere

    nstr = 16
    config = sk.Config(
        num_streams=nstr,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.Exact,
        num_singlescatter_moments=nstr,
        num_do_sza=2,
        num_forced_azimuth=forced,
        dtype="float32",
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 100000, 101),
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
        return engine.calculate_radiance(atmo)

    out = run(1.0)  # compile
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        out = run(1.0 + 1e-5 * (i + 1))
        times.append(time.perf_counter() - t0)
    times.sort()
    dt = times[len(times) // 2]
    return W * nlos / dt, out["radiance"].to_numpy(), engine._num_azi_eff


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=128)
    ap.add_argument("--nlos", type=int, default=20)
    args = ap.parse_args()
    _enable_compile_cache()

    sps_full, rad_full, m_full = run_limb(args.w, args.nlos, forced=16)
    print(f"forced 16 modes: {sps_full:.1f} wavelength-LOS solves/s "
          f"(m_eff={m_full})", flush=True)
    sps_auto, rad_auto, m_auto = run_limb(args.w, args.nlos, forced=0)
    print(f"auto ({m_auto} modes): {sps_auto:.1f} wavelength-LOS solves/s",
          flush=True)
    denom = np.abs(rad_full).max()
    maxrel = float(np.abs(rad_auto - rad_full).max() / denom)
    print(json.dumps({
        "solves_per_sec_forced16": round(sps_full, 1),
        "solves_per_sec_auto": round(sps_auto, 1),
        "speedup": round(sps_auto / sps_full, 2),
        "auto_mode_count": int(m_auto),
        "max_rel_radiance_diff": maxrel,
    }))


if __name__ == "__main__":
    main()
