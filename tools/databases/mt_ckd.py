"""MT-CKD water-vapor continuum database assembler.

Role of the reference's ``tools/databases/mt-ckd/generate_continuum.py``:
drive the (externally distributed) AER MT-CKD Fortran executable over a
(pressure x temperature) grid — with the H2O VMR taken from the MIPAS
climatology at the US76 altitude of each pressure — and assemble the
self+foreign continuum coefficients into one ``xs[pressure_pa,
temperature_k, wavenumber_cminv]`` absorber database.

The executable is a separate AER distribution this zero-egress build
cannot ship, so the two halves are split:

* ``mtckd_grid_configs(...)`` emits the per-(P, T) namelist configs the
  executable consumes (identical &mt_ckd_input contents to the
  reference), plus the H2O VMR chain US76-pressure -> altitude -> MIPAS
  VMR computed with the repo's own climatologies.
* ``assemble(...)`` collects the executable's per-run outputs (given as
  ``self_absorption``/``frgn_absorption`` spectra in .npz or classic
  netCDF files named ``p{i}_t{j}``) into the final npz database
  (cm^2 -> m^2, reference generate_continuum.py:180).

Usage::

    python tools/databases/mt_ckd.py configs OUT_DIR    # emit configs
    python tools/databases/mt_ckd.py assemble RUN_DIR OUT.npz
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

# Reference grids (generate_continuum.py:14-117): ~US76 pressure levels
# [Pa] from the surface to ~80 km and a 190-310 K temperature sweep
TEMP_GRID_K = np.arange(190, 311, 10).astype(np.float64)
WVNUM_RANGE = np.arange(1e7 / 100000, 1e7 / 1000 + 0.01, 1.0)


def us76_pressure_grid(n=64):
    """US76 pressures on a uniform altitude grid 0-80 km (the reference
    hard-codes the equivalent table)."""
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    from sasktran2_tpu.climatology import us76_pressure_temperature

    alts = np.linspace(0.0, 80000.0, n)
    p, _ = us76_pressure_temperature(alts)
    return alts, p


def h2o_vmr_at_pressure(pressure_pa):
    """US76 pressure -> altitude -> MIPAS H2O VMR (reference
    generate_continuum.py:159-164)."""
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    from sasktran2_tpu.climatology import us76_pressure_temperature
    from sasktran2_tpu.climatology.mipas import _atm_path, read_atm

    alts = np.linspace(0.0, 80000.0, 161)
    p_us, _ = us76_pressure_temperature(alts)
    alt = np.interp(
        pressure_pa, p_us[::-1], alts[::-1], left=alts[-1], right=alts[0]
    )
    try:
        data = read_atm(_atm_path("fascode", "std.atm"))
        vmr = data["H2O"] / 1.0e6
        heights_m = data["HGT"] * 1000.0
    except (FileNotFoundError, OSError):
        # zero-egress fallback when the RFM .atm files are absent: a
        # standard midlatitude H2O shape (7.75e3 ppm surface, 2 km scale
        # height in the troposphere, 5 ppm stratospheric floor)
        heights_m = np.linspace(0.0, 80000.0, 81)
        vmr = np.maximum(7.75e-3 * np.exp(-heights_m / 2000.0), 5e-6)
    return float(
        np.interp(alt, heights_m, vmr, left=vmr[0], right=vmr[-1])
    )


def namelist(pressure_pa, temperature_k, h2o_vmr,
             wv1=None, wv2=None, dwv=1.0):
    """The &mt_ckd_input namelist the AER executable reads (reference
    gen_config, generate_continuum.py:122-140; pressure in hPa)."""
    wv1 = WVNUM_RANGE[0] if wv1 is None else wv1
    wv2 = WVNUM_RANGE[-1] if wv2 is None else wv2
    return (
        "&mt_ckd_input\n"
        f"    p_atm={pressure_pa / 100:.2f}\n"
        f"    t_atm={temperature_k:.2f}\n"
        f"    h2o_frac={h2o_vmr:.2f}\n"
        f"    wv1={wv1:.2f}\n"
        f"    wv2={wv2:.2f}\n"
        f"    dwv={dwv:.2f}\n"
        "/\n"
    )


def emit_configs(out_dir, n_pressure=64):
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    _, pressures = us76_pressure_grid(n_pressure)
    written = []
    for i, p in enumerate(pressures):
        vmr = h2o_vmr_at_pressure(p)
        for j, t in enumerate(TEMP_GRID_K):
            f = out_dir / f"p{i}_t{j}.config"
            f.write_text(namelist(p, t, vmr))
            written.append(f)
    np.savez(out_dir / "grid.npz", pressure_pa=pressures,
             temperature_k=TEMP_GRID_K, wavenumber_cminv=WVNUM_RANGE)
    return written


def _read_run_output(path):
    """One executable output: .npz with self_absorption/frgn_absorption
    (or classic netCDF via scipy)."""
    path = Path(path)
    if path.suffix == ".npz":
        d = np.load(path)
        return np.asarray(d["self_absorption"]), np.asarray(
            d["frgn_absorption"]
        )
    from scipy.io import netcdf_file

    with netcdf_file(str(path), mmap=False) as f:
        return (
            np.array(f.variables["self_absorption"][...]),
            np.array(f.variables["frgn_absorption"][...]),
        )


def assemble(run_dir, out_path):
    """Collect p{i}_t{j} outputs into the continuum database npz."""
    run_dir = Path(run_dir)
    grid = np.load(run_dir / "grid.npz")
    pressures = grid["pressure_pa"]
    temps = grid["temperature_k"]
    wvnum = grid["wavenumber_cminv"]
    xs = np.zeros((len(pressures), len(temps), len(wvnum)))
    for i in range(len(pressures)):
        for j in range(len(temps)):
            matches = sorted(run_dir.glob(f"p{i}_t{j}.*")) or sorted(
                run_dir.glob(f"p{i}_t{j}_output.*")
            )
            matches = [m for m in matches if m.suffix != ".config"]
            if not matches:
                msg = f"missing run output p{i}_t{j} in {run_dir}"
                raise FileNotFoundError(msg)
            self_xs, frgn_xs = _read_run_output(matches[0])
            xs[i, j] = (self_xs + frgn_xs)[: len(wvnum)]
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        out_path,
        coord_pressure_pa=pressures,
        coord_temperature_k=temps,
        coord_wavenumber_cminv=wvnum,
        xs=xs * 1e-4,  # cm^2 -> m^2
        dims_xs=np.array(
            ["pressure_pa", "temperature_k", "wavenumber_cminv"]
        ),
    )
    return out_path


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("configs")
    c.add_argument("out_dir")
    c.add_argument("--n-pressure", type=int, default=64)
    a = sub.add_parser("assemble")
    a.add_argument("run_dir")
    a.add_argument("out_npz")
    args = ap.parse_args()
    if args.cmd == "configs":
        for f in emit_configs(args.out_dir, args.n_pressure):
            pass
        print(args.out_dir)
    else:
        print(assemble(args.run_dir, args.out_npz))
