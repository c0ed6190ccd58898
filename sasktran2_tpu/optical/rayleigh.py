"""Bates Rayleigh scattering cross sections.

Parameterization from the reference
(``/root/reference/rust/sasktran2-rs/src/optical/rayleigh.rs``), which
implements Bates (1984): per-gas refractivities (n-1)*1e8 and King factors,
combined with composition percentages into (cross-section [m^2], effective
King factor).
"""

from __future__ import annotations

import numpy as np


def _o2_refrac(wl_um):
    wl = np.asarray(wl_um, dtype=np.float64)
    out = np.zeros_like(wl)
    ranges = [
        ((0.0, 0.221), 23796.7, 168988.4),
        ((0.221, 0.288), 22120.4, 203187.6),
        ((0.288, 0.546), 20564.8, 248089.9),
        ((0.546, np.inf), 21351.1, 218567.0),
    ]
    for (lo, hi), c0, c1 in ranges:
        sel = (wl > lo) & (wl <= hi)
        out = np.where(sel, c0 + c1 / (40.9 - wl**-2.0), out)
    return out


def _n2_refrac(wl_um):
    wl = np.asarray(wl_um, dtype=np.float64)
    out = np.zeros_like(wl)
    ranges = [
        ((0.0, 0.254), 6998.749, 3233582.0),
        ((0.254, 0.468), 5989.242, 3363266.3),
        ((0.468, np.inf), 6855.200, 3243157.0),
    ]
    dl = 0.468 - wl
    wiggle = 2.27684009 * np.sign(dl) * np.exp(-np.abs(dl) / 0.003)
    for (lo, hi), c0, c1 in ranges:
        sel = (wl > lo) & (wl <= hi)
        out = np.where(sel, c0 + c1 / (144.0 - wl**-2.0) + wiggle, out)
    return out


def _ar_refrac(wl_um):
    wl = np.asarray(wl_um, dtype=np.float64)
    nsq_m_1 = 5.547e-4 * (1.0 + 5.15e-3 * wl**-2.0 + 4.19e-5 * wl**-4.0)
    return (np.sqrt(nsq_m_1 + 1.0) - 1.0) * 1.0e8


def _co2_refrac(wl_um):
    wl = np.asarray(wl_um, dtype=np.float64)
    return (
        22822.1
        + 117.8 * wl**-2.0
        + 2406030.0 / (130.0 - wl**-2.0)
        + 15997.0 / (38.9 - wl**-2.0)
    )


def _o2_king(wl_um):
    wl = np.asarray(wl_um, dtype=np.float64)
    return 1.096 + 1.385e-3 * wl**-2.0 + 1.448e-4 * wl**-4.0


def _n2_king(wl_um):
    wl = np.asarray(wl_um, dtype=np.float64)
    return 1.034 + 3.17e-4 * wl**-2.0


def rayleigh_cross_section_bates(
    wavelength_um,
    n2_percentage: float = 78.084,
    o2_percentage: float = 20.946,
    ar_percentage: float = 0.934,
    co2_percentage: float = 0.036,
):
    """(cross-section [m^2/molecule], effective King factor)."""
    wl = np.asarray(wavelength_um, dtype=np.float64)
    lorenz = (
        o2_percentage / 100.0 * _o2_refrac(wl) ** 2 * _o2_king(wl)
        + n2_percentage / 100.0 * _n2_refrac(wl) ** 2 * _n2_king(wl)
        + ar_percentage / 100.0 * _ar_refrac(wl) ** 2 * 1.0
        + co2_percentage / 100.0 * _co2_refrac(wl) ** 2 * 1.15
    )
    eff_king = (
        o2_percentage / 100.0 * _o2_king(wl)
        + n2_percentage / 100.0 * _n2_king(wl)
        + ar_percentage / 100.0
        + co2_percentage / 100.0 * 1.15
    )
    num_dens = 2.686780111798444e25
    xs = (
        32.0
        * np.pi**3
        / (3.0 * num_dens**2 * wl**4)
        * lorenz
        * 1e8
    )
    return xs, eff_king
