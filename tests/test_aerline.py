"""AER line-file loading and first-order line mixing (reference
src/sasktran2/optical/aerline.py, database/aer_line.py)."""

import numpy as np
import pytest

from sasktran2_tpu.optical.line_absorber import (
    AERLineAbsorber,
    LineAbsorber,
    load_aer_line_file,
)


def _f100_record(iso, nu, s, gair, gself, elower, nair, dair,
                 couple=False):
    f = (
        f"{7:2d}{iso:1d}{nu:12.6f}{s:10.3E}{1e-3:10.3E}"
        f"{gair:5.3f}{gself:5.3f}{elower:10.4f}{nair:4.2f}{dair:8.5f}"
    )
    f += " " * (3 + 3 + 9 + 9 + 3)  # quanta + local quanta + error codes
    f += (" 5 -1" if couple else " 5  1").rjust(6)
    assert len(f) == 100
    return f


def _coupling_record(y, g):
    line = " " * 3
    for yi, gi in zip(y, g):
        line += f"{yi:12.4E}{gi:11.4E}"[:23].ljust(23)
    # exact AER layout: Y/G pairs at 200/250/296/340 K in fixed columns
    line = (
        " " * 3
        + f"{y[0]:12.4E}" + f"{g[0]:11.4E}"
        + f"{y[1]:13.4E}" + f"{g[1]:11.4E}"
        + f"{y[2]:13.4E}" + f"{g[2]:11.4E}"
        + f"{y[3]:13.4E}" + f"{g[3]:11.4E}"
    )
    return line


def _write_aer(tmp_path, couple):
    rows = [
        "> header comment",
        _f100_record(1, 13100.0, 1e-24, 0.05, 0.06, 10.0, 0.7, 0.001,
                     couple=couple),
    ]
    if couple:
        rows.append(_coupling_record(
            [0.01, 0.008, 0.006, 0.005], [1e-4, 8e-5, 6e-5, 5e-5]
        ))
    rows.append(
        _f100_record(1, 13105.0, 2e-24, 0.04, 0.05, 20.0, 0.65, -0.002)
    )
    p = tmp_path / "o2_aer.txt"
    p.write_text("\n".join(rows) + "\n")
    return p


def test_load_aer_line_file(tmp_path):
    cat = load_aer_line_file(_write_aer(tmp_path, couple=True), 0.032)
    assert cat.nu0.size == 2
    np.testing.assert_allclose(cat.nu0, [13100.0, 13105.0])
    np.testing.assert_allclose(cat.intensity, [1e-24, 2e-24])
    np.testing.assert_allclose(cat.gamma_air, [0.05, 0.04])
    np.testing.assert_allclose(cat.elower, [10.0, 20.0])
    assert cat.y_coupling.shape == (4, 2)
    np.testing.assert_allclose(
        cat.y_coupling[:, 0], [0.01, 0.008, 0.006, 0.005]
    )
    assert np.all(np.isnan(cat.y_coupling[:, 1]))
    np.testing.assert_allclose(cat.coupling_temps, [200, 250, 296, 340])


def test_aer_uncoupled_matches_plain_voigt(tmp_path):
    """Without coupling records the AER absorber reduces to the plain
    Voigt line absorber."""
    p = _write_aer(tmp_path, couple=False)
    cat = load_aer_line_file(p, 31.98983e-3)
    assert cat.y_coupling is None
    aer = AERLineAbsorber("O2", p)
    plain = LineAbsorber(cat)
    grid = np.linspace(13095.0, 13110.0, 301)
    xs_a = aer.cross_section_grid(grid, np.array([5e4]), np.array([230.0]))
    xs_p = plain.cross_section_grid(grid, np.array([5e4]),
                                    np.array([230.0]))
    np.testing.assert_allclose(xs_a, xs_p, rtol=1e-12)


def test_line_mixing_changes_wings_antisymmetrically(tmp_path):
    """First-order mixing (Y) redistributes absorption between the line
    wings without changing the integrated strength to first order."""
    p = _write_aer(tmp_path, couple=True)
    aer = AERLineAbsorber("O2", p)
    cat = load_aer_line_file(p, 31.98983e-3)
    plain = LineAbsorber(cat)

    grid = np.linspace(13090.0, 13110.0, 4001)
    pres, temp = np.array([8e4]), np.array([250.0])
    xs_mix = aer.cross_section_grid(grid, pres, temp)[0]
    xs_v = plain.cross_section_grid(grid, pres, temp)[0]

    diff = xs_mix - xs_v
    assert np.abs(diff).max() > 0
    # the Y-term dispersion profile integrates to ~zero: total intensity
    # preserved to the small P^2 G correction
    rel_total = abs(np.trapezoid(diff, grid)) / np.trapezoid(xs_v, grid)
    assert rel_total < 1e-3
    # antisymmetric redistribution about the first line center
    i0 = np.argmin(np.abs(grid - 13100.0))
    lo = diff[:i0][::-1]
    hi = diff[i0 + 1:]
    n = min(lo.size, hi.size, 500)
    assert np.sign(np.sum(lo[:n])) != np.sign(np.sum(hi[:n]))

    # mixing strength scales with pressure
    xs_mix_lo = aer.cross_section_grid(grid, np.array([1e4]), temp)[0]
    xs_v_lo = plain.cross_section_grid(grid, np.array([1e4]), temp)[0]
    assert (
        np.abs(xs_mix_lo - xs_v_lo).max() < np.abs(diff).max()
    )


def test_aer_molar_mass_table(tmp_path):
    p = _write_aer(tmp_path, couple=False)
    with pytest.raises(ValueError, match="molar mass"):
        AERLineAbsorber("XYZ", p)
    # explicit molar mass accepted
    AERLineAbsorber("XYZ", p, molar_mass_kg_mol=0.04)
