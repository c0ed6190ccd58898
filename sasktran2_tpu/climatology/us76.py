"""U.S. Standard Atmosphere 1976 (analytic seven-layer form).

Role of the reference's ``src/sasktran2/climatology/us76.py:106`` —
pressure/temperature profiles for test scenarios and quick-start examples.
Implemented from the published US76 layer definitions (geopotential
altitudes, lapse rates, base temperatures/pressures), valid to 86 km.
"""

from __future__ import annotations

import numpy as np

_G0 = 9.80665  # m/s^2
_R = 8.31432  # J/(mol K) (US76 value)
_M = 28.9644e-3  # kg/mol
_RE = 6356766.0  # US76 earth radius for geopotential conversion [m]

# (base geopotential altitude [m], lapse rate [K/m], base temperature [K])
_LAYERS = [
    (0.0, -0.0065, 288.15),
    (11000.0, 0.0, 216.65),
    (20000.0, 0.0010, 216.65),
    (32000.0, 0.0028, 228.65),
    (47000.0, 0.0, 270.65),
    (51000.0, -0.0028, 270.65),
    (71000.0, -0.0020, 214.65),
    (84852.0, 0.0, 186.946),
]
_P0 = 101325.0


def _base_pressures():
    ps = [_P0]
    for i in range(1, len(_LAYERS)):
        h0, lr, t0 = _LAYERS[i - 1]
        h1 = _LAYERS[i][0]
        if lr == 0.0:
            p = ps[-1] * np.exp(-_G0 * _M * (h1 - h0) / (_R * t0))
        else:
            t1 = t0 + lr * (h1 - h0)
            p = ps[-1] * (t1 / t0) ** (-_G0 * _M / (_R * lr))
        ps.append(p)
    return ps


_PBASE = _base_pressures()


def us76_pressure_temperature(altitude_m):
    """(pressure [Pa], temperature [K]) at geometric altitudes [m]."""
    z = np.asarray(altitude_m, dtype=np.float64)
    # geometric -> geopotential
    h = _RE * z / (_RE + z)
    p = np.empty_like(h)
    t = np.empty_like(h)
    for i, (h0, lr, t0) in enumerate(_LAYERS):
        h1 = _LAYERS[i + 1][0] if i + 1 < len(_LAYERS) else np.inf
        sel = (h >= h0) & (h < h1)
        if not np.any(sel):
            continue
        dh = h[sel] - h0
        if lr == 0.0:
            t[sel] = t0
            p[sel] = _PBASE[i] * np.exp(-_G0 * _M * dh / (_R * t0))
        else:
            t[sel] = t0 + lr * dh
            p[sel] = _PBASE[i] * (t[sel] / t0) ** (-_G0 * _M / (_R * lr))
    # clamp above 86 km: isothermal extension
    sel = h >= _LAYERS[-1][0]
    if np.any(sel):
        h0, _, t0 = _LAYERS[-1]
        t[sel] = t0
        p[sel] = _PBASE[-1] * np.exp(-_G0 * _M * (h[sel] - h0) / (_R * t0))
    return p, t


def add_us76_standard_atmosphere(atmosphere):
    """Populate ``atmosphere.pressure_pa`` / ``temperature_k`` from US76
    (reference ``sk.climatology.us76.add_us76_standard_atmosphere``)."""
    alts = atmosphere.model_geometry.altitudes()
    p, t = us76_pressure_temperature(alts)
    atmosphere.pressure_pa = p
    atmosphere.temperature_k = t
    return atmosphere
