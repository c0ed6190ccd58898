"""Baum V3.6 ice-crystal database converter.

Role of the reference's ``tools/databases/baum_ice_crystals.py``: the Baum
files store P11 as an absolutely-normalized phase function and the other
five matrix elements as RATIOS to P11; this converter restores the
absolute phase matrix, projects the six Greek-coefficient families with
the repo's split-Gauss Wigner projection
(``sasktran2_tpu.legendre.compute_greek_coefficients``), and writes a
rectangular zero-padded database in the ``_load_dataset`` npz layout the
runtime ``optical.baum.BaumIceCrystal`` loader consumes (variables
xs_total/xs_scattering/lm_a1..lm_b2 over particle_model x wavelength_nm x
effective_diameter x legendre).

Input: per-habit dicts of raw Baum arrays — from the original NetCDF
files when netCDF4/h5py is importable (``read_baum_netcdf``), or any
pre-extracted npz with the same keys. A ``--default-output`` second copy
capped at ``--default-moments`` mirrors the reference's lightweight
runtime database.

Usage::

    python tools/databases/baum_ice_crystals.py IN1.nc [IN2.nc ...] \
        OUT.npz --default-output OUT_SMALL.npz --default-moments 256
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

RAW_KEYS = (
    "wavelengths",           # [W] um in the Baum files
    "effective_diameter",    # [D] um
    "extinction_efficiency",  # [W, D] or cross sections
    "single_scattering_albedo",  # [W, D]
    "phase_angles",          # [A] degrees
    "p11", "p21", "p22", "p33", "p43", "p44",  # [W, D, A]; p21.. ratios
)


def read_baum_netcdf(path):
    """Raw arrays from an original Baum V3.6 NetCDF file (requires
    h5py or scipy-readable classic NetCDF)."""
    from sasktran2_tpu.optical.database import _load_dataset

    ds = _load_dataset(db_filepath=path)
    out = {}
    names = {
        "wavelengths": ("wavelengths", "wavelength"),
        "effective_diameter": ("effective_diameter",),
        "extinction_efficiency": (
            "extinction_efficiency", "extinction_cross_section",
        ),
        "single_scattering_albedo": ("single_scattering_albedo",),
        "phase_angles": ("phase_angles", "scattering_angle"),
        "p11": ("p11_phase_function", "p11"),
        "p21": ("p21_phase_function_ratio", "p21"),
        "p22": ("p22_phase_function_ratio", "p22"),
        "p33": ("p33_phase_function_ratio", "p33"),
        "p43": ("p43_phase_function_ratio", "p43"),
        "p44": ("p44_phase_function_ratio", "p44"),
    }
    available = dict(ds["data_vars"])
    available.update(
        {k: ((k,), v) for k, v in ds["coords"].items()}
    )
    for key, candidates in names.items():
        for c in candidates:
            if c in available:
                out[key] = np.asarray(available[c][1])
                break
        else:
            msg = f"Baum input missing {key} (tried {candidates})"
            raise KeyError(msg)
    return out


def read_baum_npz(path):
    raw = dict(np.load(path))
    missing = [k for k in RAW_KEYS if k not in raw]
    if missing:
        msg = f"Baum npz input missing keys: {missing}"
        raise KeyError(msg)
    return raw


def convert_habit(raw, num_moments=512):
    """One habit's raw arrays -> greek families + cross sections.

    Returns dict with xs_total/xs_scattering [W, D] (um^2 -> m^2 scaling
    is left to the input; the reference stores efficiencies times area)
    and lm_* [W, D, num_moments].
    """
    from sasktran2_tpu.legendre import compute_greek_coefficients

    wl = np.asarray(raw["wavelengths"], dtype=np.float64)
    de = np.asarray(raw["effective_diameter"], dtype=np.float64)
    ang = np.asarray(raw["phase_angles"], dtype=np.float64)
    W, D = len(wl), len(de)

    p11 = np.asarray(raw["p11"], dtype=np.float64)
    # restore the absolute matrix from the stored ratios; P12 = P21 and
    # P34 = -P43 (reference baum_ice_crystals.py:124-131, 798-801)
    p12 = np.asarray(raw["p21"]) * p11
    p22 = np.asarray(raw["p22"]) * p11
    p33 = np.asarray(raw["p33"]) * p11
    p34 = -np.asarray(raw["p43"]) * p11
    p44 = np.asarray(raw["p44"]) * p11

    out = {
        "xs_total": np.asarray(raw["extinction_efficiency"],
                               dtype=np.float64),
        "xs_scattering": (
            np.asarray(raw["extinction_efficiency"], dtype=np.float64)
            * np.asarray(raw["single_scattering_albedo"], dtype=np.float64)
        ),
    }
    lm = {k: np.zeros((W, D, num_moments)) for k in
          ("lm_a1", "lm_a2", "lm_a3", "lm_a4", "lm_b1", "lm_b2")}
    for d in range(D):
        a1, a2, a3, a4, b1, b2 = compute_greek_coefficients(
            p11[:, d], p12[:, d], p22[:, d], p33[:, d], p34[:, d],
            p44[:, d], ang, num_moments,
        )
        lm["lm_a1"][:, d] = a1
        lm["lm_a2"][:, d] = a2
        lm["lm_a3"][:, d] = a3
        lm["lm_a4"][:, d] = a4
        lm["lm_b1"][:, d] = b1
        lm["lm_b2"][:, d] = b2
    out.update(lm)
    out["wavelength_nm"] = wl * 1e3  # um -> nm
    out["effective_diameter"] = de
    return out


def write_database(habits: dict, out_path, num_moments=512):
    """``habits``: {model_name: converted dict}; writes the runtime npz."""
    models = sorted(habits)
    first = habits[models[0]]
    W = len(first["wavelength_nm"])
    D = len(first["effective_diameter"])
    arrays = {}
    for var in ("xs_total", "xs_scattering"):
        arrays[var] = np.stack([habits[m][var] for m in models])
    for var in ("lm_a1", "lm_a2", "lm_a3", "lm_a4", "lm_b1", "lm_b2"):
        # rectangular zero-padded moments
        stacked = np.zeros((len(models), W, D, num_moments))
        for i, m in enumerate(models):
            src = habits[m][var]
            stacked[i, :, :, : src.shape[-1]] = src[..., :num_moments]
        arrays[var] = stacked
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "coord_particle_model": np.array(models),
        "coord_wavelength_nm": first["wavelength_nm"],
        "coord_effective_diameter": first["effective_diameter"],
        "coord_legendre": np.arange(num_moments),
    }
    for var in ("xs_total", "xs_scattering"):
        payload[var] = arrays[var]
        payload[f"dims_{var}"] = np.array(
            ["particle_model", "wavelength_nm", "effective_diameter"]
        )
    for var in ("lm_a1", "lm_a2", "lm_a3", "lm_a4", "lm_b1", "lm_b2"):
        payload[var] = arrays[var]
        payload[f"dims_{var}"] = np.array(
            ["particle_model", "wavelength_nm", "effective_diameter",
             "legendre"]
        )
    np.savez(out_path, **payload)
    return out_path


def convert(inputs, out_path, num_moments=512, default_output=None,
            default_moments=256):
    habits = {}
    for p in inputs:
        p = Path(p)
        raw = (
            read_baum_npz(p) if p.suffix == ".npz" else read_baum_netcdf(p)
        )
        name = raw.get("model_name", p.stem)
        if isinstance(name, np.ndarray):
            name = str(name)
        habits[str(name)] = convert_habit(raw, num_moments)
    written = [write_database(habits, out_path, num_moments)]
    if default_output:
        written.append(
            write_database(habits, default_output, default_moments)
        )
    return written


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("output")
    ap.add_argument("--num-moments", type=int, default=512)
    ap.add_argument("--default-output")
    ap.add_argument("--default-moments", type=int, default=256)
    args = ap.parse_args()
    for p in convert(args.inputs, args.output, args.num_moments,
                     args.default_output, args.default_moments):
        print(p)
