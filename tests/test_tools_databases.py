"""Offline database-converter tools (tools/databases/*): HITRAN .xsc
bulk conversion, O2-O2 CIA, MT-CKD assembly, Baum ice crystals — the
reference's converter suite (``/root/reference/tools/databases/``)
rebuilt as argument-driven zero-egress tools, validated on synthetic
inputs."""

import sys
from pathlib import Path

import numpy as np
import pytest

TOOLS = Path(__file__).resolve().parents[1] / "tools" / "databases"
sys.path.insert(0, str(TOOLS))


def test_hitran_xsc_roundtrip(tmp_path):
    import hitran_xsc

    # two synthetic .xsc files at different temperatures
    gas = tmp_path / "in" / "so2"
    gas.mkdir(parents=True)
    nu = np.linspace(20000.0, 25000.0, 51)
    for t, scale in ((250.0, 1.0), (290.0, 2.0)):
        xs = scale * 1e-20 * np.exp(-((nu - 22000.0) / 1000.0) ** 2)
        header = f"SO2 {nu[0]:.1f} {nu[-1]:.1f} {len(nu)} {t:.1f} extra"
        body = " ".join(f"{v:.6e}" for v in xs)
        (gas / f"so2_{int(t)}.xsc").write_text(header + "\n" + body + "\n")

    out = hitran_xsc.convert_all(tmp_path / "in", tmp_path / "out")
    assert len(out) == 1
    raw = dict(np.load(out[0]))
    temps = raw["coord_temperature"]
    wl = raw["coord_wavelength_nm"]
    xs = raw["xs"]
    # clamp rows at 0 and 1000 K + the two measurements
    assert temps[0] == 0.0 and temps[-1] == 1000.0
    assert xs.shape == (4, len(wl))
    # wavelength = 1e7/nu, ascending; peak near 1e7/22000 ~ 454.5 nm
    peak_wl = wl[np.argmax(xs[1])]
    np.testing.assert_allclose(peak_wl, 1e7 / 22000.0, rtol=1e-3)
    # cm^2 -> m^2 and the 290 K row is 2x the 250 K row
    np.testing.assert_allclose(xs.max(), 2e-24, rtol=1e-6)
    np.testing.assert_allclose(xs[2], 2 * xs[1], rtol=1e-5)


def test_o2o2_cia_blocks(tmp_path):
    import o2o2_cia

    nu1 = np.linspace(1000.0, 1010.0, 11)
    nu2 = np.linspace(2000.0, 2020.0, 21)
    lines = []
    for nu, t, scale in ((nu1, 200.0, 1.0), (nu2, 200.0, 2.0),
                         (nu1, 300.0, 3.0)):
        lines.append(
            f"O2-O2 {nu[0]:.4f} {nu[-1]:.4f} {len(nu)} {t:.1f} -.999"
        )
        for v in nu:
            lines.append(f"{v:.4f} {scale * 1e-46:.6e}")
    f = tmp_path / "o2o2.cia"
    f.write_text("\n".join(lines) + "\n")

    out = o2o2_cia.convert(f, tmp_path / "out" / "cia.npz")
    raw = dict(np.load(out))
    t = raw["coord_temperature"]
    wn = raw["coord_wavenumber_cminv"]
    xs = raw["xs"]
    np.testing.assert_allclose(t, [200.0, 300.0])
    # zero padding between the two bands
    mid = np.searchsorted(wn, 1500.0)
    assert xs[0, mid] == 0.0
    # in-band values: cm^5 -> m^5
    i1 = np.searchsorted(wn, 1005.0)
    np.testing.assert_allclose(xs[0, i1], 1e-56, rtol=1e-6)
    i2 = np.searchsorted(wn, 2010.0)
    np.testing.assert_allclose(xs[0, i2], 2e-56, rtol=1e-6)
    np.testing.assert_allclose(xs[1, i1], 3e-56, rtol=1e-6)
    assert xs[1, i2] == 0.0  # 300 K block only covers band 1


def test_mt_ckd_configs_and_assembly(tmp_path):
    import mt_ckd

    run_dir = tmp_path / "run"
    configs = mt_ckd.emit_configs(run_dir, n_pressure=3)
    assert len(configs) == 3 * len(mt_ckd.TEMP_GRID_K)
    text = configs[0].read_text()
    assert "&mt_ckd_input" in text and "p_atm=" in text

    grid = np.load(run_dir / "grid.npz")
    nw = len(grid["wavenumber_cminv"])
    # synthetic per-run outputs: self+foreign spectra
    for i in range(3):
        for j in range(len(mt_ckd.TEMP_GRID_K)):
            np.savez(
                run_dir / f"p{i}_t{j}.npz",
                self_absorption=np.full(nw, (i + 1) * 1e-24),
                frgn_absorption=np.full(nw, (j + 1) * 1e-24),
            )
    out = mt_ckd.assemble(run_dir, tmp_path / "db" / "mt_ckd_h2o.npz")
    raw = dict(np.load(out))
    xs = raw["xs"]
    assert xs.shape == (3, len(mt_ckd.TEMP_GRID_K), nw)
    # cm^2 -> m^2: (self + foreign) * 1e-4
    np.testing.assert_allclose(xs[1, 2, 0], (2 + 3) * 1e-24 * 1e-4,
                               rtol=1e-12)


def test_baum_converter_rayleigh_oracle(tmp_path):
    """A Rayleigh phase matrix in the Baum ratio storage format must
    convert to the known Rayleigh greek coefficients, and the written
    database must load through the runtime BaumIceCrystal class."""
    import baum_ice_crystals as bic

    from sasktran2_tpu.optical.baum import BaumIceCrystal

    ang = np.linspace(0.0, 180.0, 721)
    mu = np.cos(np.deg2rad(ang))
    # Rayleigh: P11 = 3/4 (1 + mu^2); P12 = -3/4 (1 - mu^2);
    # P33 = 3/2 mu; P34 = 0; P22 = P11, P44 = P33
    p11 = 0.75 * (1 + mu**2)
    p12 = -0.75 * (1 - mu**2)
    p33 = 1.5 * mu
    W, D = 2, 2
    raw = {
        "wavelengths": np.array([0.5, 0.7]),        # um
        "effective_diameter": np.array([10.0, 20.0]),
        "extinction_efficiency": np.full((W, D), 2.0),
        "single_scattering_albedo": np.full((W, D), 0.6),
        "phase_angles": ang,
        "p11": np.broadcast_to(p11, (W, D, len(ang))).copy(),
        "p21": np.broadcast_to(p12 / p11, (W, D, len(ang))).copy(),
        "p22": np.ones((W, D, len(ang))),
        "p33": np.broadcast_to(p33 / p11, (W, D, len(ang))).copy(),
        "p43": np.zeros((W, D, len(ang))),
        "p44": np.broadcast_to(p33 / p11, (W, D, len(ang))).copy(),
    }
    conv = bic.convert_habit(raw, num_moments=8)
    # Rayleigh a1 moments: [1, 0, 1/2]
    np.testing.assert_allclose(
        conv["lm_a1"][0, 0, :3], [1.0, 0.0, 0.5], atol=2e-6
    )
    # b1 moment l=2: sqrt(6)/2 * a1_2 convention -> -(p12 projection)
    assert abs(conv["lm_b1"][0, 0, 2]) > 0.1
    np.testing.assert_allclose(conv["xs_scattering"], 1.2)

    out = bic.write_database(
        {"general_habit_mixture": conv}, tmp_path / "baum.npz",
        num_moments=8,
    )
    baum = BaumIceCrystal(
        particle_model="general_habit_mixture", db_filepath=out,
        max_moments=4,
    )
    assert baum.loaded_moments == 4


def test_standard_mie_tool(tmp_path):
    """The standard-Mie table builder produces a loadable scatterer
    database (synthetic refractive index: the OSIRIS datasets are
    external files)."""
    import standard_mie

    from sasktran2_tpu.mie.refractive import RefractiveIndex

    refr = RefractiveIndex(
        lambda wl: np.full_like(
            np.asarray(wl, dtype=np.float64), 1.44 - 0.0j, dtype=complex
        ),
        "test_const",
    )
    p = standard_mie.build(
        "sulfate_strat", tmp_path,
        wavelengths_nm=np.array([450.0, 550.0]), max_moments=16,
        refractive=refr,
    )
    raw = dict(np.load(p))
    var_names = {
        k for k in raw if not k.startswith(("coord_", "dims_"))
    }
    assert {"xs_total", "xs_scattering", "lm_a1"} <= var_names
    xt = raw["xs_total"]
    assert np.all(np.isfinite(xt)) and np.all(xt > 0)
    # non-absorbing index: scattering == total
    np.testing.assert_allclose(raw["xs_scattering"], xt, rtol=1e-10)


def test_bench_gate(tmp_path):
    """The ASV-factor-gate analog flags regressions and passes
    improvements."""
    sys.path.insert(0, str(TOOLS.parent))
    import bench_gate

    import json

    import pytest

    base = {"metric": "m", "value": 100.0,
            "extra": {"solves_per_sec_16stream_jac": 50.0,
                      "batch_16str": 1024}}
    worse = {"metric": "m", "value": 90.0,
             "extra": {"solves_per_sec_16stream_jac": 55.0,
                       "batch_16str": 1024}}
    pb = tmp_path / "base.json"
    pc = tmp_path / "cont.json"
    pb.write_text(json.dumps(base))
    pc.write_text(json.dumps(worse))
    regressions, improvements = bench_gate.gate(pb, pc, factor=1.05)
    assert [r[0] for r in regressions] == ["value"]
    assert [i[0] for i in improvements] == [
        "extra.solves_per_sec_16stream_jac"
    ]
    # batch sizes are bookkeeping, never gated as throughput
    assert all("batch" not in n for n, *_ in regressions + improvements)

    # differing fallback batches must REFUSE the comparison (a round
    # that fell back to a smaller wavelength batch cannot pass the gate
    # against a full-batch round on a noise margin) unless explicitly
    # overridden
    shrunk = dict(worse)
    shrunk["extra"] = dict(worse["extra"], batch_16str=512)
    pc.write_text(json.dumps(shrunk))
    with pytest.raises(bench_gate.BatchMismatch):
        bench_gate.gate(pb, pc, factor=1.05)
    regressions, _ = bench_gate.gate(pb, pc, factor=1.05,
                                     allow_batch_mismatch=True)
    assert [r[0] for r in regressions] == ["value"]
