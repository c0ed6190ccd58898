"""DISORT test case 7a (thermal emission): engine radiance vs the
reference's hard-coded DISORT oracles
(``/root/reference/tests/engine/thermal_emissions/test_disort.py``).
Scenario matches ``tests/test_thermal.py``.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from common import setup_backend, write_report  # noqa: E402

CASES = [
    # (optical depth, surface emission?, expected, ref line)
    (100.0, False, 7.93075833e-06, "test_disort.py:55"),
    (1.0, True, 1.02396134e-05, "test_disort.py:111"),
]
TOL = 1e-5


def _run_case(od, with_surface):
    import sasktran2_tpu as sk

    config = sk.Config(
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
        emission_source=sk.EmissionSource.DiscreteOrdinates,
        num_streams=16,
        num_singlescatter_moments=17,
        delta_m_scaling=True,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.array([0.0, 1000.0]),
        geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, 0.0, 1.0, 200000.0))
    atmosphere = sk.Atmosphere(
        geometry, config, numwavel=1, calculate_derivatives=False
    )
    atmosphere.storage.total_extinction[:] = od / 1000.0
    atmosphere.storage.ssa[:] = 0.95
    atmosphere.storage.solar_irradiance[:] = 0.0
    atmosphere.storage.emission_source[:] = 1.09657540e-05
    if with_surface:
        atmosphere.surface.emission[:] = 1.09657540e-05
    for l_idx in range(17):
        atmosphere.leg_coeff.a1[l_idx][:] = 0.75**l_idx * (2 * l_idx + 1)
    engine = sk.Engine(config, geometry, viewing)
    return float(
        engine.calculate_radiance(atmosphere)["radiance"].to_numpy()[
            0, 0, 0
        ]
    )


def run():
    backend = setup_backend()
    lines = [
        "# DISORT test case 7a — thermal emission",
        "",
        "ssa = 0.95, g = 0.75 HG phase (17 moments, delta-m), nstr = 16, "
        f"nadir viewing, backend = {backend} (f64).",
        "",
        "| optical depth | surface emission | computed | DISORT oracle "
        "| rel diff | oracle source |",
        "|---|---|---|---|---|---|",
    ]
    drift = []
    for od, with_surface, expected, src in CASES:
        got = _run_case(od, with_surface)
        rel = abs(got - expected) / expected
        lines.append(
            f"| {od:g} | {'yes' if with_surface else 'no'} | "
            f"{got:.8e} | {expected:.8e} | {rel:.2e} | {src} |"
        )
        if rel > TOL:
            drift.append(f"OD={od:g}: rel diff {rel:.2e} > {TOL}")
    lines += ["", f"Tolerance: {TOL} relative."]
    path = write_report("disort7a", lines)
    return path, drift


if __name__ == "__main__":
    p, drift = run()
    print(f"wrote {p}")
    if drift:
        print("DRIFT: " + "; ".join(drift))
        sys.exit(1)
