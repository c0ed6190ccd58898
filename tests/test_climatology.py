"""Climatology tables: atomic oxygen (NTRS 19910018329) and GloSSAC
loader plumbing."""

import datetime

import numpy as np
import pytest

from sasktran2_tpu.climatology import atomic_oxygen, glossac


def test_atomic_oxygen_basic_profile():
    alts = np.arange(40000.0, 131000.0, 5000.0)
    n = atomic_oxygen.number_density(alts, 6, 0.0)
    assert n.shape == alts.shape
    assert np.all(np.isfinite(n)) and np.all(n >= 0)
    # peak density near ~95-100 km
    peak_alt = alts[np.argmax(n)]
    assert 85000.0 <= peak_alt <= 105000.0
    # typical peak magnitude ~1e17-1e18 m^-3
    assert 1e16 < n.max() < 1e19


def test_atomic_oxygen_fill_values():
    alts = np.array([10000.0, 95000.0, 140000.0])
    n = atomic_oxygen.number_density(alts, 1, 40.0)
    assert n[0] == 0.0  # default lower fill
    assert n[2] == atomic_oxygen.number_density(
        np.array([130000.0]), 1, 40.0
    )[0]  # default upper fill = edge
    n2 = atomic_oxygen.number_density(
        alts, 1, 40.0, lower_fill_value=1e6, upper_fill_value=2e6
    )
    np.testing.assert_allclose([n2[0], n2[2]], [1e6, 2e6])


def test_atomic_oxygen_time_handling():
    alts = np.array([95000.0])
    n_jan = atomic_oxygen.number_density(alts, 1, 0.0)[0]
    n_date = atomic_oxygen.number_density(
        alts, datetime.date(2020, 1, 1), 0.0
    )[0]
    np.testing.assert_allclose(n_jan, n_date)
    # December fraction wraps toward January
    n_wrap = atomic_oxygen.number_density(alts, 12.99, 0.0)[0]
    n_dec = atomic_oxygen.number_density(alts, 12, 0.0)[0]
    assert min(n_dec, n_jan) <= n_wrap <= max(n_dec, n_jan)
    with pytest.raises(ValueError):
        atomic_oxygen.number_density(alts, 0.5, 0.0)
    with pytest.raises(ValueError):
        atomic_oxygen.number_density(alts, 6, 85.0)


def test_atomic_oxygen_latitude_interpolation():
    alts = np.array([95000.0])
    n_m10 = atomic_oxygen.number_density(alts, 6, -10.0)[0]
    n_0 = atomic_oxygen.number_density(alts, 6, 0.0)[0]
    n_m5 = atomic_oxygen.number_density(alts, 6, -5.0)[0]
    np.testing.assert_allclose(n_m5, 0.5 * (n_m10 + n_0), rtol=1e-12)


def test_glossac_from_synthetic_dataset():
    """Drive the GloSSAC accessor with an in-memory dataset dict."""
    alts_km = np.arange(5.0, 40.0, 1.0)
    lats = np.arange(-77.5, 78, 5.0)
    months = np.arange(1, 13)
    wavels = np.array([525.0, 1020.0])
    table = np.ones((months.size, alts_km.size, lats.size, wavels.size))
    table[:, :, :, 1] = 2.0
    ds = {
        "coords": {
            "month": months, "alt": alts_km, "lat": lats,
            "wavelengths_glossac": wavels,
        },
        "data_vars": {
            "Stratospheric_Background": (
                ("month", "alt", "lat", "wavelengths_glossac"), table
            )
        },
    }
    out = glossac.stratospheric_background(
        6, 10.0, np.array([20000.0, 100000.0]), 1020.0, dataset=ds
    )
    np.testing.assert_allclose(out, [2.0 / 1e3, 0.0])
    with pytest.raises(ValueError, match="wavelength"):
        glossac.stratospheric_background(
            6, 10.0, np.array([20000.0]), 600.0, dataset=ds
        )
