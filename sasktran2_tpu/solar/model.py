"""Solar irradiance model.

Role of the reference ``src/sasktran2/solar/model.py:10-60`` (HSRS 2022
spectrum with sample / average modes). The HSRS data files are downloaded
at runtime by the reference; in this zero-egress build the default is an
analytic blackbody approximation of the top-of-atmosphere spectrum
(5772 K photosphere scaled to the 1361 W/m^2 solar constant, accurate to
~10-20% in the visible; worse in the UV Fraunhofer structure). Users can
supply a measured spectrum (wavelength_nm, irradiance) to get full
fidelity — the sample/average machinery is identical.
"""

from __future__ import annotations

import numpy as np

from ..constituent.emission import planck_blackbody_radiance

T_SUN = 5772.0
SOLAR_CONSTANT = 1361.0  # W / m^2


class SolarModel:
    def __init__(self, wavelengths_nm=None, irradiance=None,
                 mode: str = "sample", resolution_nm: float = 0.0):
        """mode: "sample" (point values) or "average" (boxcar average over
        ``resolution_nm``)."""
        self.mode = mode
        self.resolution_nm = resolution_nm
        if irradiance is not None:
            self._wl = np.asarray(wavelengths_nm, dtype=np.float64)
            self._irr = np.asarray(irradiance, dtype=np.float64)
        else:
            self._wl = None
            self._irr = None

    def _point(self, wl_nm):
        if self._irr is not None:
            return np.interp(wl_nm, self._wl, self._irr)
        wl_m = np.asarray(wl_nm, dtype=np.float64) * 1e-9
        b = planck_blackbody_radiance(wl_m, T_SUN)
        # irradiance at 1 AU: pi B (Rsun/AU)^2, normalized to the solar
        # constant for consistency
        geo = np.pi * (6.957e8 / 1.495978707e11) ** 2
        e = b * geo  # W / (m^2 m)
        # normalize total to the solar constant
        norm = SOLAR_CONSTANT / (
            5.670374419e-8 * T_SUN**4 * geo / np.pi
        )
        return e * norm * 1e-9  # W / (m^2 nm)

    def irradiance(self, wavelengths_nm):
        """Irradiance [W / (m^2 nm)] at the given wavelengths."""
        wl = np.atleast_1d(np.asarray(wavelengths_nm, dtype=np.float64))
        if self.mode == "sample" or self.resolution_nm <= 0:
            return self._point(wl)
        # boxcar average
        out = np.empty_like(wl)
        for i, w in enumerate(wl):
            grid = np.linspace(w - self.resolution_nm / 2,
                               w + self.resolution_nm / 2, 21)
            out[i] = np.mean(self._point(grid))
        return out
