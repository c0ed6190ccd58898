"""HITRAN collision-induced-absorption (``.cia``) converter.

Role of the reference's ``tools/databases/o2o2_hitran.py`` (which
hard-codes the block line numbers of the 2018b O2-O2 file): parse ANY
HITRAN ``.cia`` file by scanning for its self-describing block headers
(``label nu_min nu_max npts T ...`` followed by ``npts`` data rows of
``wavenumber  xs[cm^5 molecule^-2]``), regrid all blocks of each
temperature onto the union wavenumber grid with zero padding between
bands (so interpolation returns 0 outside measured bands, reference
o2o2_hitran.py pad() convention), and write the ``_load_dataset`` npz
layout with xs in m^5.

Usage::

    python tools/databases/o2o2_cia.py O2-O2_2018b.cia out/o2o2/hitran_cia.npz
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def parse_cia_blocks(path):
    """Scan a .cia file into blocks of (temperature, wavenumber, xs_cm5)."""
    lines = Path(path).read_text().splitlines()
    blocks = []
    i = 0
    while i < len(lines):
        tokens = lines[i].split()
        # header: label nu_min nu_max npts T [...]; the label is
        # non-numeric, data rows are two floats
        is_header = (
            len(tokens) >= 5
            and not _is_float(tokens[0])
            and _is_float(tokens[1])
            and _is_float(tokens[2])
            and float(tokens[3]) == int(float(tokens[3]))
        )
        if not is_header:
            i += 1
            continue
        npts = int(float(tokens[3]))
        temperature = float(tokens[4])
        data = np.array(
            [
                [float(v) for v in lines[j].split()[:2]]
                for j in range(i + 1, i + 1 + npts)
            ]
        )
        blocks.append((temperature, data[:, 0], data[:, 1]))
        i += 1 + npts
    if not blocks:
        msg = f"no CIA blocks found in {path}"
        raise ValueError(msg)
    return blocks


def _is_float(s):
    try:
        float(s)
    except ValueError:
        return False
    return True


def build_cia_grid(blocks):
    """Blocks -> union wavenumber grid x sorted temperatures, with a
    zero-pad point just outside every band edge."""
    def pad(v):
        return np.unique(np.concatenate([[v.min() - 0.01], v,
                                         [v.max() + 0.01]]))

    all_wn = np.unique(np.concatenate([pad(wn) for _, wn, _ in blocks]))
    all_t = np.unique([t for t, _, _ in blocks])
    xs = np.zeros((len(all_t), len(all_wn)))
    for t, wn, x in blocks:
        ti = int(np.searchsorted(all_t, t))
        srt = np.argsort(wn)
        xs[ti] += np.interp(all_wn, wn[srt], x[srt], left=0.0, right=0.0)
    return {"temperature": all_t, "wavenumber_cminv": all_wn,
            "xs": xs * 1e-10}  # cm^5 -> m^5


def convert(in_path, out_path):
    grid = build_cia_grid(parse_cia_blocks(in_path))
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        out_path,
        coord_temperature=grid["temperature"],
        coord_wavenumber_cminv=grid["wavenumber_cminv"],
        xs=grid["xs"],
        dims_xs=np.array(["temperature", "wavenumber_cminv"]),
    )
    return out_path


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input_cia")
    ap.add_argument("output_npz")
    args = ap.parse_args()
    print(convert(args.input_cia, args.output_npz))
