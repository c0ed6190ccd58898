"""Korkin conservative Rayleigh slab: tau = 0.25, ssa = 1, dark surface,
sza = 0.76 deg, vza = 40.76 deg — cross-validated between the engine's
two INDEPENDENT multiple-scatter formulations (successive orders vs
discrete ordinates) plus the polarized DOLP. The reference's own
korkin.ipynb is an unexecuted stub producing NaN; this report executes
the scenario (``tests/test_external_validation.py``).

The book runs the nstr = 8 configuration to keep the CPU compile small;
the suite additionally validates the polarized scenario at nstr = 16
through the wavelength-minor fast path.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from common import setup_backend, write_report  # noqa: E402


def _scenario(ms_source, num_stokes=1, nstr=8):
    import sasktran2_tpu as sk

    sza, vza = 0.76, 40.76
    top_alt = 100000.0
    config = sk.Config(
        num_streams=nstr,
        num_stokes=num_stokes,
        multiple_scatter_source=ms_source,
        single_scatter_source=sk.SingleScatterSource.Exact,
        num_singlescatter_moments=4,
        num_successive_orders_iterations=50,
        init_successive_orders_with_discrete_ordinates=False,
    )
    if ms_source == sk.MultipleScatterSource.DiscreteOrdinates:
        config.single_scatter_source = (
            sk.SingleScatterSource.DiscreteOrdinates
        )
    geometry = sk.Geometry1D(
        cos_sza=float(np.cos(np.deg2rad(sza))), solar_azimuth=0.0,
        earth_radius_m=6371000.0,
        altitude_grid_m=np.linspace(0, top_alt, 50),
        geometry_type=sk.GeometryType.Spherical,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(
        float(np.cos(np.deg2rad(sza))), 0.0,
        float(np.cos(np.deg2rad(vza))), 2 * top_alt,
    ))
    engine = sk.Engine(config, geometry, viewing)
    atmo = sk.Atmosphere(geometry, config, numwavel=1)
    atmo.storage.total_extinction[:] = 0.25 / top_alt
    atmo.storage.ssa[:] = 1.0
    atmo.leg_coeff.a1[0] = 1.0
    atmo.leg_coeff.a1[2] = 0.5
    if num_stokes == 3:
        atmo.leg_coeff.a2[2] = 3.0
        atmo.leg_coeff.b1[2] = np.sqrt(6.0) / 2.0
    atmo.surface.albedo[:] = 0.0
    return engine, atmo


def run():
    import sasktran2_tpu as sk

    backend = setup_backend()
    e_so, a_so = _scenario(sk.MultipleScatterSource.SuccessiveOrders)
    e_do, a_do = _scenario(sk.MultipleScatterSource.DiscreteOrdinates)
    i_so = float(
        e_so.calculate_radiance(a_so)["radiance"].to_numpy()[0, 0, 0]
    )
    i_do = float(
        e_do.calculate_radiance(a_do)["radiance"].to_numpy()[0, 0, 0]
    )
    rel = abs(i_so - i_do) / i_do

    e_v, a_v = _scenario(
        sk.MultipleScatterSource.DiscreteOrdinates, num_stokes=3
    )
    i, q, u = e_v.calculate_radiance(a_v)["radiance"].to_numpy()[0, 0]
    dolp = float(np.hypot(q, u) / i)

    drift = []
    if rel > 1.5e-2:
        drift.append(f"SO vs DO rel diff {rel:.2e} > 1.5e-2")
    if not (0.07 < np.pi * i_do < 0.14):
        drift.append(f"pi*I = {np.pi * i_do:.4f} outside [0.07, 0.14]")
    if not (0.1 < dolp < 0.7):
        drift.append(f"DOLP = {dolp:.3f} outside [0.1, 0.7]")
    if not abs(u) < 0.05 * abs(q):
        drift.append(f"|U| = {abs(u):.2e} not << |Q| = {abs(q):.2e}")

    lines = [
        "# Korkin conservative Rayleigh slab",
        "",
        "tau = 0.25, ssa = 1, dark surface, sza = 0.76 deg, vza = 40.76 "
        f"deg, backend = {backend} (f64).",
        "",
        "| quantity | value |",
        "|---|---|",
        f"| pi * I (discrete ordinates) | {np.pi * i_do:.6f} |",
        f"| pi * I (successive orders) | {np.pi * i_so:.6f} |",
        f"| SO vs DO relative difference | {rel:.2e} |",
        f"| I, Q, U (polarized DO) | {i:.6e}, {q:.6e}, {u:.6e} |",
        f"| degree of linear polarization | {dolp:.4f} |",
        "",
        "Checks: SO-vs-DO agreement < 1.5e-2; pi*I in the Coulson-regime "
        "bound [0.07, 0.14]; DOLP in [0.1, 0.7] with |U| << |Q| "
        "(principal-plane symmetry).",
    ]
    path = write_report("korkin", lines)
    return path, drift


if __name__ == "__main__":
    p, drift = run()
    print(f"wrote {p}")
    if drift:
        print("DRIFT: " + "; ".join(drift))
        sys.exit(1)
