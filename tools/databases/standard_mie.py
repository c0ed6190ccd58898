"""Standard Mie scattering-table builder.

Role of the reference's ``tools/databases/standard_mie.py``: generate the
shipped lognormal-ensemble Mie databases (sulfate fine/coarse/strat,
water cloud, ice, dust) over a (median radius x wavelength) grid with
Wigner-projected greek coefficients, ready for the generic scatterer
database loader. Built on the repo's own cached Mie machinery
(``sasktran2_tpu.database.mie.MieDatabase`` — batched JAX Mie
recurrences + size-distribution quadrature), so one command reproduces a
distributable table.

Usage::

    python tools/databases/standard_mie.py sulfate_fine OUT_DIR
    python tools/databases/standard_mie.py water_cloud OUT_DIR \
        --wavelengths 250 800 50
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

# reference standard_mie.py:80-113 recipes
RECIPES = {
    "sulfate_fine": {"distribution": ("lognormal", 1.6),
                     "refractive": "h2so4",
                     "radii": np.arange(10.0, 400.0, 10.0)},
    "sulfate_coarse": {"distribution": ("lognormal", 1.3),
                       "refractive": "h2so4",
                       "radii": np.array([120.0])},
    "sulfate_strat": {"distribution": ("lognormal", 1.6),
                      "refractive": "h2so4",
                      "radii": np.array([80.0])},
    "water_cloud": {"distribution": ("lognormal", 1.2),
                    "refractive": "water",
                    "radii": np.array([8000.0 / np.exp(
                        5 / 2 * np.log(1.2) ** 2)])},
    "ice_cloud": {"distribution": ("lognormal", 1.4),
                  "refractive": "ice",
                  "radii": np.array([10000.0])},
    "dust": {"distribution": ("lognormal", 1.5),
             "refractive": "dust",
             "radii": np.arange(100.0, 1000.0, 100.0)},
}


def build(name, out_dir, wavelengths_nm=None, max_moments=64,
          refractive=None):
    """``refractive`` overrides the recipe's refractive-index dataset
    (the OSIRIS datasets are external files the zero-egress image lacks;
    tests inject a synthetic index)."""
    from sasktran2_tpu.mie.distribution import LogNormalDistribution
    from sasktran2_tpu.mie.refractive import (
        Dust,
        H2SO4,
        Ice,
        Water,
    )
    from sasktran2_tpu.database.mie import MieDatabase

    recipe = RECIPES[name]
    if wavelengths_nm is None:
        wavelengths_nm = np.arange(250.0, 801.0, 50.0)
    refr = refractive if refractive is not None else {
        "h2so4": H2SO4,
        "water": Water,
        "ice": Ice,
        "dust": Dust,
    }[recipe["refractive"]]()
    _, width = recipe["distribution"]
    dist = LogNormalDistribution().freeze(mode_width=width)
    db = MieDatabase(
        dist,
        refr,
        wavelengths_nm,
        db_root=Path(out_dir),
        max_legendre_moments=max_moments,
        median_radius=recipe["radii"],
    )
    return db.data_file


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", choices=sorted(RECIPES))
    ap.add_argument("out_dir")
    ap.add_argument("--wavelengths", nargs=3, type=float,
                    metavar=("START", "STOP", "STEP"))
    ap.add_argument("--max-moments", type=int, default=64)
    args = ap.parse_args()
    wl = (
        np.arange(args.wavelengths[0], args.wavelengths[1] + 0.1,
                  args.wavelengths[2])
        if args.wavelengths else None
    )
    print(build(args.name, args.out_dir, wl, args.max_moments))
