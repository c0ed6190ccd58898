"""Numeric-vs-analytic weighting function validation harness.

Same contract as the reference ``src/sasktran2/test_util/wf.py:10-60``:
perturb each element of an input array with central finite differences,
recompute the radiance, and compare against the engine's analytic ``wf_*``
output with a per-altitude-normalized relative tolerance.
"""

from __future__ import annotations

import numpy as np


def numeric_wf(
    input_var: np.ndarray,
    fractional_change: float,
    engine,
    atmosphere,
    analytic_wf_name: str,
):
    """Adds ``<analytic_wf_name>_numeric`` to the base radiance Dataset."""
    base = engine.calculate_radiance(atmosphere)
    analytic = base[analytic_wf_name]
    central = np.zeros_like(analytic.to_numpy())

    for i in range(len(input_var)):
        dx = input_var[i] * fractional_change
        if dx == 0:
            dx = np.nanmean(input_var) * fractional_change
        input_var[i] += dx
        above = engine.calculate_radiance(atmosphere)["radiance"].to_numpy()
        if input_var[i] >= dx:
            input_var[i] -= 2 * dx
            below = engine.calculate_radiance(atmosphere)["radiance"].to_numpy()
            input_var[i] += dx
            central[i] = (above - below) / (2 * dx)
        else:
            central[i] = (above - base["radiance"].to_numpy()) / dx
            input_var[i] -= dx

    from ..dataset import DataArray

    base[analytic_wf_name + "_numeric"] = DataArray(central, analytic.dims)
    return base


def validate_wf(analytic, numeric, wf_dim="altitude", decimal=6):
    """Normalized comparison (reference ``wf.py:10-24``)."""
    a = analytic.to_numpy()
    n = numeric.to_numpy()
    ax = analytic.dims.index(wf_dim)
    max_by = np.abs(a).max(axis=ax, keepdims=True)
    max_by[max_by == 0] = 1e99
    rel = (a - n) / max_by
    sel = (np.abs(a) > 1e-99) & (np.abs(n) > 1e-99)
    np.testing.assert_array_almost_equal(rel[sel], 0, decimal=decimal)
