"""Bulk HITRAN ``.xsc`` cross-section converter.

Role of the reference's ``tools/databases/convert_all_hitran.py``: walk a
directory tree of per-gas folders of HITRAN ``.xsc`` files (header line =
molecule, wavenumber range, point count, temperature; body = flattened
cross sections in cm^2) and emit one absorber database per gas in the
``_load_dataset`` npz layout consumed by
``optical.database.OpticalDatabaseGenericAbsorber``.

Air-referenced gases (NO2 in the reference) get the Edlen air->vacuum
wavelength conversion. Usage::

    python tools/databases/hitran_xsc.py INPUT_DIR OUTPUT_DIR
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from xs_convert import build_xs_grid, save_xs_npz

# gases whose HITRAN .xsc wavelengths are air-referenced (reference
# convert_all_hitran.py:31-32 applies the conversion for no2)
AIR_REFERENCED = {"no2"}


def parse_xsc_file(path):
    """One HITRAN .xsc file -> (temperature_k, wavelength_nm, xs_cm2).

    Header: molecule, nu_min [cm^-1], nu_max, npoints, T [K], ...;
    body: whitespace-separated cross sections, row-major, npoints total
    (reference convert_all_hitran.py:20-40).
    """
    text = Path(path).read_text().splitlines()
    header = text[0].split()
    nu_min = float(header[1])
    nu_max = float(header[2])
    npoints = int(header[3])
    temperature = float(header[4])
    body = " ".join(text[1:]).split()
    xs = np.asarray([float(v) for v in body[:npoints]])
    wavenumber = np.linspace(nu_min, nu_max, npoints)
    wavelength_nm = 1e7 / wavenumber
    # ascending wavelength
    order = np.argsort(wavelength_nm)
    return temperature, wavelength_nm[order], xs[order]


def convert_gas_folder(folder, out_path, air_wavelengths=None):
    """All .xsc files of one gas -> a (temperature x wavelength) npz."""
    folder = Path(folder)
    name = folder.stem.lower()
    if air_wavelengths is None:
        air_wavelengths = name in AIR_REFERENCED
    samples = [parse_xsc_file(f) for f in sorted(folder.glob("*.xsc"))]
    if not samples:
        msg = f"no .xsc files in {folder}"
        raise FileNotFoundError(msg)
    grid = build_xs_grid(samples, air_wavelengths=air_wavelengths)
    return save_xs_npz(out_path, grid)


def convert_all(input_dir, output_dir):
    input_dir = Path(input_dir)
    output_dir = Path(output_dir)
    written = []
    for folder in sorted(input_dir.iterdir()):
        if not folder.is_dir():
            continue
        out = output_dir / folder.stem.lower() / "hitran.npz"
        written.append(convert_gas_folder(folder, out))
    return written


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input_dir")
    ap.add_argument("output_dir")
    args = ap.parse_args()
    for p in convert_all(args.input_dir, args.output_dir):
        print(p)
