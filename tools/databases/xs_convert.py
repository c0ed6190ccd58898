"""Offline cross-section database builders.

Role of the reference's ``tools/databases/{o3_dbm,no2_vandaele}.py``:
convert raw per-temperature laboratory cross-section files into the
standard database layout consumed by the named optical classes
(``cross_sections/o3/dbm``, ``cross_sections/no2/vandaele``). The
reference writes netCDF via xarray from hard-coded OneDrive paths; this
zero-egress build takes input/output directories as arguments and writes
the ``.npz`` dataset layout that ``optical.database._load_dataset``
reads (``coord_*`` arrays + ``dims_*`` name vectors + data variables).

Shared semantics (mirroring ``o3_dbm.py:44-90``):

* every input file contributes (wavelength, xs[cm^2]) samples at one
  temperature;
* the output grid is the union of all wavelengths x sorted temperatures,
  padded with clamp rows at 0 K and 1000 K (copies of the coldest /
  warmest measurements) so temperature interpolation never extrapolates;
* gaps where a temperature's measurement does not cover a wavelength are
  filled by linear interpolation ACROSS temperature (endpoint-clamped);
* cross sections convert cm^2 -> m^2; air wavelengths convert to vacuum.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def air_to_vacuum_wavelength(wavelength_nm):
    """Edlen (1966) air -> vacuum conversion (reference
    ``sk.optical.air_wavelength_to_vacuum_wavelength``)."""
    wl = np.asarray(wavelength_nm, dtype=np.float64)
    s2 = (1e3 / wl) ** 2  # (1/um)^2
    n = 1.0 + 1e-8 * (
        8342.13 + 2406030.0 / (130.0 - s2) + 15997.0 / (38.9 - s2)
    )
    return wl * n


def build_xs_grid(samples, air_wavelengths: bool = True):
    """(temperature, wavelength, xs) measurement sets -> regular grid.

    samples: list of (temp_k, wavelength_nm [n], xs_cm2 [n]).
    Returns dict with ``temperature`` [T], ``wavelength_nm`` [W] (vacuum),
    ``xs`` [T, W] in m^2.
    """
    all_T = [float(t) for t, _, _ in samples]
    all_wv = [np.asarray(w, dtype=np.float64) for _, w, _ in samples]
    all_xs = [np.asarray(x, dtype=np.float64) for _, _, x in samples]

    combined_wv = np.sort(np.unique(np.hstack(all_wv)))

    # clamp rows (reference o3_dbm.py:47-54)
    idx_min = int(np.argmin(all_T))
    idx_max = int(np.argmax(all_T))
    all_T += [0.0, 1000.0]
    all_wv += [all_wv[idx_min], all_wv[idx_max]]
    all_xs += [all_xs[idx_min], all_xs[idx_max]]

    order = np.argsort(all_T)
    grid = np.full((len(all_T), len(combined_wv)), np.nan)
    for i in range(len(all_T)):
        srt = np.argsort(all_wv[i])
        grid[i] = np.interp(
            combined_wv, all_wv[i][srt], all_xs[i][srt],
            left=np.nan, right=np.nan,
        )
    temps = np.asarray(all_T)[order]
    grid = grid[order]

    # fill coverage gaps across the temperature axis (o3_dbm.py:70-79)
    for j in range(grid.shape[1]):
        isna = np.isnan(grid[:, j])
        if isna.any() and not isna.all():
            grid[isna, j] = np.interp(
                temps[isna], temps[~isna], grid[~isna, j],
                left=grid[~isna, j][0], right=grid[~isna, j][-1],
            )

    wl_out = (
        air_to_vacuum_wavelength(combined_wv)
        if air_wavelengths else combined_wv
    )
    return {
        "temperature": temps,
        "wavelength_nm": wl_out,
        "xs": grid * 1e-4,  # cm^2 -> m^2
    }


def save_xs_npz(path, grid: dict):
    """Write the ``_load_dataset`` npz layout for an absorber database."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        path,
        coord_temperature=grid["temperature"],
        coord_wavelength_nm=grid["wavelength_nm"],
        xs=grid["xs"],
        dims_xs=np.array(["temperature", "wavelength_nm"]),
    )
    return path


def parse_dbm_file(path):
    """One Daumont-Brion-Malicet ascii file: 3 header lines, rows of
    '{wavelength_nm} {xs_cm2}' (brace-wrapped columns, footer line;
    temperature encoded in the filename stem characters 7:10 —
    reference o3_dbm.py:16-37)."""
    path = Path(path)
    wv, xs = [], []
    lines = path.read_text().splitlines()[4:]
    for line in lines:
        clean = line.replace("{", " ").replace("}", " ").split()
        if len(clean) < 2:
            continue
        try:
            wv.append(float(clean[0]))
            xs.append(float(clean[1]))
        except ValueError:
            continue  # footer
    temp_k = float(path.stem[7:10])
    return temp_k, np.asarray(wv), np.asarray(xs)


def parse_vandaele_file(path):
    """One Vandaele NO2 ascii file: whitespace table with a header row;
    column 1 = wavenumber [cm^-1], column 2 = xs [cm^2]; files with 'c'
    in the stem are the 220 K set, otherwise 294 K (reference
    no2_vandaele.py:16-30)."""
    path = Path(path)
    rows = []
    for i, line in enumerate(path.read_text().splitlines()):
        if i == 0:
            continue
        parts = line.split()
        if len(parts) >= 3:
            try:
                rows.append((float(parts[1]), float(parts[2])))
            except ValueError:
                continue
    arr = np.asarray(rows)
    wavelength_nm = 1e7 / arr[:, 0]
    temp_k = 220.0 if "c" in path.stem else 294.0
    return temp_k, wavelength_nm, arr[:, 1]


def convert_o3_dbm(input_dir, output_root):
    """DBM ascii directory -> ``cross_sections/o3/dbm.npz``."""
    samples = [parse_dbm_file(p) for p in sorted(Path(input_dir).iterdir())]
    grid = build_xs_grid(samples, air_wavelengths=True)
    return save_xs_npz(
        Path(output_root) / "cross_sections" / "o3" / "dbm.npz", grid
    )


def convert_no2_vandaele(input_dir, output_root):
    """Vandaele ascii directory -> ``cross_sections/no2/vandaele.npz``."""
    samples = [
        parse_vandaele_file(p) for p in sorted(Path(input_dir).iterdir())
    ]
    # the reference stores these on the measured (vacuum) wavenumber grid
    grid = build_xs_grid(samples, air_wavelengths=False)
    return save_xs_npz(
        Path(output_root) / "cross_sections" / "no2" / "vandaele.npz", grid
    )
