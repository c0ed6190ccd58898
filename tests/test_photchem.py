"""Photochemistry regression tests (reference: rust/sasktran2-rs/src/
photchem/). Covers the background-vs-state classification (excited states
must be solved for even when their base molecule is a background density)
and the HITRAN-based emission-band line weights."""

import numpy as np
import pytest

from sasktran2_tpu.photchem import (
    PhotoReaction,
    Yankovsky,
    calculate_photolysis_rate,
)
from sasktran2_tpu.photchem.types import Molecule


def _standard_backgrounds(nz):
    # crude 60-90 km profiles, m^-3
    return {
        "O2": np.full(nz, 4.0e20),
        "O3": np.full(nz, 1.0e14),
        "O": np.full(nz, 1.0e17),
        "N2": np.full(nz, 1.6e21),
        "CO2": np.full(nz, 6.0e17),
    }


def test_molecule_ground_state_classification():
    assert Molecule.parse("O2").is_ground
    assert Molecule.parse("O(3P)").is_ground
    assert Molecule.parse("O").is_ground
    assert not Molecule.parse("O(1D)").is_ground
    assert not Molecule.parse("O2(b, v=0)").is_ground
    assert not Molecule.parse("O2(X, v=1)").is_ground
    assert Molecule.parse("CO2").is_ground


def test_yankovsky_solves_excited_states_with_standard_backgrounds():
    """Regression: excited states sharing a base with a background density
    (O2(b,v=*), O2(a,v=*), O(1D), ...) must be solved for, not silently
    classified as background (reference types.rs: exact-name match)."""
    model = Yankovsky()
    nz = 5
    t = np.full(nz, 220.0)
    bg = _standard_backgrounds(nz)
    rates = {name: np.full(nz, 1.0e-9)
             for name in model.required_photolysis_rates()}
    pops = model.solve(t, bg, rates)

    assert pops, "Yankovsky model returned no excited-state populations"
    for state in ["O(1D)", "O2(b, v=0)", "O2(a, v=0)"]:
        assert state in pops, f"missing {state}"
        assert np.all(np.isfinite(pops[state]))
        assert np.all(pops[state] > 0), f"{state} population not positive"
    # background species must NOT appear in the solved set
    for name in bg:
        assert name not in pops


def test_yankovsky_o1d_balance():
    """O(1D) population should obey production/loss balance against the
    dominant quenching channels (hand-computed steady state)."""
    model = Yankovsky()
    t = np.array([200.0])
    bg = _standard_backgrounds(1)
    rates = {name: np.zeros(1) for name in model.required_photolysis_rates()}
    # single production channel: O3 + hv -> O2(a, v=0) + O(1D), q=0.441
    key = "J_O3_"
    assert key in rates
    rates[key] = np.array([1.0e-2])
    pops = model.solve(t, bg, rates)
    o1d = pops["O(1D)"][0]

    # production into O(1D): all six O3 Hartley branches share J_O3_
    q_total = 0.045 + 0.072 + 0.072 + 0.135 + 0.135 + 0.441
    production = q_total * 1.0e-2 * bg["O3"][0]
    # losses: A=9.0e-3; O2 3.2e-11 exp(67/T); N2 2.0e-11 exp(107/T);
    # O(3P) 4e-12; O3 2.4e-10  (cm^3/s against cm^-3 densities)
    loss = (
        9.0e-3
        + 3.2e-11 * np.exp(67.0 / 200.0) * bg["O2"][0] / 1e6
        + 2.0e-11 * np.exp(107.0 / 200.0) * bg["N2"][0] / 1e6
        + 4.0e-12 * bg["O"][0] / 1e6
        + 2.4e-10 * bg["O3"][0] / 1e6
    )
    np.testing.assert_allclose(o1d, production / loss, rtol=1e-10)


def test_photolysis_rate_toa_renormalization():
    r = (
        PhotoReaction.parse("O2 + hv(SRC) -> O(3P) + O(1D)")
        .with_toa_rate_constant(2.6e-6)
        .with_wavelength_range_nm(130.0, 202.0)
    )
    wl = np.linspace(120.0, 300.0, 181)
    flux = np.ones((181, 4)) * np.linspace(0.2, 1.0, 4)  # increasing to TOA
    xs = np.full((181, 4), 1e-24)
    j = calculate_photolysis_rate(r, wl, flux, xs)
    assert j.shape == (4,)
    # TOA (last column) anchored to the published rate
    np.testing.assert_allclose(j[-1], 2.6e-6, rtol=1e-12)
    # shape preserved: ratio of profile = ratio of flux
    np.testing.assert_allclose(j[0] / j[-1], 0.2, rtol=1e-12)


def _write_par(tmp_path):
    """Two-line fake O2 .par file with full 160-char records: a P and R
    branch sharing one upper level (same E' = E'' + nu0) plus one line from
    a different level."""

    def record(iso, nu0, s, a, elower, gp, gpp):
        line = (
            f"{7:2d}{iso:1d}{nu0:12.6f}{s:10.3E}{a:10.3E}"
            f"{0.05:5.3f}{0.04:5.3f}{elower:10.4f}{0.70:4.2f}{0.0:8.6f}"
        )
        line += " " * (146 - len(line))
        line += f"{gp:7.1f}{gpp:7.1f}"
        assert len(line) == 160
        return line

    # upper level E' = 13122.0 reached from E''=2.0 (nu0=13120) and
    # E''=10.0 (nu0=13112); second level E' = 13135.0
    rows = [
        record(1, 13120.0, 1e-25, 0.06, 2.0, 5.0, 3.0),
        record(1, 13112.0, 2e-25, 0.02, 10.0, 5.0, 7.0),
        record(1, 13125.0, 1e-25, 0.08, 10.0, 9.0, 7.0),
    ]
    p = tmp_path / "o2_fake.par"
    p.write_text("\n".join(rows) + "\n")
    return p


def test_emission_band_weights_from_par(tmp_path):
    from sasktran2_tpu.optical.line_absorber import load_hitran_par
    from sasktran2_tpu.photchem.emission import EmissionBand

    cat = load_hitran_par(_write_par(tmp_path), 0.032)
    assert cat.g_upper is not None
    np.testing.assert_allclose(cat.g_upper, [5.0, 5.0, 9.0])
    assert cat.iso_id is not None

    band = EmissionBand.from_catalogue(
        "test", "O2(b, v=0)", "O2(X)", 0.0758, cat, 750.0, 775.0
    )
    # static weights: A * abundance, normalized -> proportional to A.
    # Lines sort by wavelength: nu0 13125, 13120, 13112 -> A 0.08,0.06,0.02
    np.testing.assert_allclose(
        band.weights, np.array([0.08, 0.06, 0.02]) / 0.16, rtol=1e-12
    )
    # branching ratios within the shared upper level (A=0.06 and A=0.02)
    order = np.argsort(band.einstein_a_line_s)
    br = band.upper_branching[order]  # sorted by A: 0.02, 0.06, 0.08
    np.testing.assert_allclose(br, [0.25, 0.75, 1.0], rtol=1e-12)

    # LTE weights: abundance * g' * exp(-c2 dE'/T) * branching, normalized
    t = 250.0
    c2 = 1.4387768775039339
    eup = band.upper_energy_cminv
    raw = (
        band.iso_abundance
        * band.g_upper
        * np.exp(-c2 * (eup - eup.min()) / t)
        * band.upper_branching
    )
    np.testing.assert_allclose(
        band.lte_weights(t), raw / raw.sum(), rtol=1e-12
    )
    # g' genuinely matters: weights differ from the A-only model
    assert not np.allclose(band.lte_weights(t), band.weights, rtol=1e-3)


def test_lte_weights_requires_g_upper(tmp_path):
    from sasktran2_tpu.optical.line_absorber import LineCatalogue
    from sasktran2_tpu.photchem.emission import EmissionBand

    cat = LineCatalogue(
        nu0=np.array([13120.0, 13125.0]),
        intensity=np.array([1e-25, 1e-25]),
        gamma_air=np.array([0.05, 0.05]),
        gamma_self=np.array([0.04, 0.04]),
        n_air=np.array([0.7, 0.7]),
        delta_air=np.array([0.0, 0.0]),
        elower=np.array([2.0, 10.0]),
        molar_mass=0.032,
        einstein_a=np.array([0.06, 0.08]),
    )
    band = EmissionBand.from_catalogue(
        "test", "O2(b, v=0)", "O2(X)", 0.0758, cat, 750.0, 775.0
    )
    with pytest.raises(ValueError, match="statistical weights"):
        band.lte_weights(250.0)
