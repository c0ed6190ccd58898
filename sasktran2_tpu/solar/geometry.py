"""Solar position geometry (role of the reference's astropy-based solar
angles). Low-precision analytic ephemeris (Meeus) — sufficient for
radiative transfer solar zenith/azimuth (~0.01 deg)."""

from __future__ import annotations

import numpy as np


def solar_angles_from_times(mjd, latitude_deg, longitude_deg):
    """(cos_sza, solar_azimuth_rad) for modified Julian dates at a
    location. Azimuth measured east of north."""
    mjd = np.atleast_1d(np.asarray(mjd, dtype=np.float64))
    # julian centuries from J2000
    t = (mjd - 51544.5) / 36525.0
    # mean longitude / anomaly [deg]
    L0 = (280.46646 + 36000.76983 * t) % 360.0
    M = np.deg2rad((357.52911 + 35999.05029 * t) % 360.0)
    # equation of center
    C = (
        (1.914602 - 0.004817 * t) * np.sin(M)
        + (0.019993 - 0.000101 * t) * np.sin(2 * M)
        + 0.000289 * np.sin(3 * M)
    )
    true_lon = np.deg2rad(L0 + C)
    eps = np.deg2rad(23.439291 - 0.0130042 * t)
    # declination & right ascension
    dec = np.arcsin(np.sin(eps) * np.sin(true_lon))
    ra = np.arctan2(np.cos(eps) * np.sin(true_lon), np.cos(true_lon))
    # greenwich mean sidereal time [deg]
    gmst = (280.46061837 + 360.98564736629 * (mjd - 51544.5)) % 360.0
    ha = np.deg2rad(gmst) + np.deg2rad(longitude_deg) - ra
    lat = np.deg2rad(latitude_deg)
    cos_sza = np.sin(lat) * np.sin(dec) + np.cos(lat) * np.cos(dec) * np.cos(ha)
    az = np.arctan2(
        -np.sin(ha) * np.cos(dec),
        np.sin(dec) * np.cos(lat) - np.cos(dec) * np.sin(lat) * np.cos(ha),
    )
    return cos_sza, az % (2 * np.pi)
