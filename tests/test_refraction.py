"""Refraction: Ciddor index + refracted LOS/solar ray tracing.

Mirrors the reference test strategy (``tests/optical/test_ciddor_refraction
.py``, ``tests/engine/test_refraction.py``): published Ciddor check values,
refractive-index-of-one parity with the straight tracer, and
refraction-enabled results differing from straight ones.
"""

from __future__ import annotations

import numpy as np
import pytest

import sasktran2_tpu as sk
from sasktran2_tpu.optical.refraction import ciddor_index_of_refraction


def test_ciddor_published_values():
    # Ciddor (1996) check values (also used by the reference test)
    n = ciddor_index_of_refraction(293.15, 101325.0, 0.0, 450.0, 633.0)
    np.testing.assert_allclose(n, 1.0002718, atol=5e-8)
    n = ciddor_index_of_refraction(293.15, 60000.0, 0.0, 450.0, 633.0)
    np.testing.assert_allclose(n, 1.000160924, atol=5e-9)
    n = ciddor_index_of_refraction(323.15, 100000.0, 0.0, 450.0, 633.0)
    np.testing.assert_allclose(n, 1.000243285, atol=5e-9)
    n = ciddor_index_of_refraction(293.15, 101325.0, 0.0, 450.0, 1700.0)
    np.testing.assert_allclose(n, 1.000268479, atol=5e-9)
    # moist air: x_w = 0.023483 (RH 100% at 20 C, 100 kPa) -> Ciddor's
    # published moist check value, with the physically correct q <-> x_w
    # conversion
    eps = 18.01528 / 28.9647
    p = 100e3
    f = 1.00062 + 3.14e-8 * p + 5.60e-7 * 400.0
    xv = f * 2339.0 / p
    q = xv * eps / (xv * eps + (1.0 - xv))
    n = ciddor_index_of_refraction(293.15, p, q, 450.0, 633.0)
    np.testing.assert_allclose(n, 1.000267394, atol=5e-9)


def _engine_radiance(los_refr, solar_refr, refractive_index, ms, alts):
    config = sk.Config(
        num_streams=2,
        single_scatter_source=(
            sk.SingleScatterSource.NoSource
            if ms != sk.MultipleScatterSource.NoSource
            else sk.SingleScatterSource.Exact
        ),
        multiple_scatter_source=ms,
        num_singlescatter_moments=4,
        los_refraction=los_refr,
        solar_refraction=solar_refr,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6,
        solar_azimuth=0.0,
        earth_radius_m=6372000.0,
        altitude_grid_m=alts,
        geometry_type=sk.GeometryType.Spherical,
    )
    if refractive_index is not None:
        geometry.refractive_index = refractive_index
    viewing = sk.ViewingGeometry()
    for alt in (10000.0, 20000.0, 30000.0, 40000.0):
        viewing.add_ray(
            sk.TangentAltitudeSolar(
                tangent_altitude_m=alt,
                relative_azimuth=0.1,
                observer_altitude_m=200000.0,
                cos_sza=0.6,
            )
        )
    atmosphere = sk.Atmosphere(
        geometry, config, wavelengths_nm=np.array([350.0, 550.0])
    )
    sk.climatology.us76.add_us76_standard_atmosphere(atmosphere)
    atmosphere["rayleigh"] = sk.constituent.Rayleigh()
    engine = sk.Engine(config, geometry, viewing)
    return engine.calculate_radiance(atmosphere)["radiance"].to_numpy()


@pytest.mark.parametrize("flags", [(True, False), (False, True), (True, True)])
def test_refraction_refractive_one_parity(flags):
    """With n == 1 the refracted path must match the straight one
    (reference ``test_refraction.py::test_los_refraction_refractive_one``)."""
    alts = np.arange(0, 65001, 2500.0)
    base = _engine_radiance(
        False, False, None, sk.MultipleScatterSource.NoSource, alts
    )
    refr = _engine_radiance(
        *flags, np.ones_like(alts), sk.MultipleScatterSource.NoSource, alts
    )
    np.testing.assert_allclose(refr, base, rtol=1e-4)


def test_refraction_changes_results():
    """With a Ciddor profile, refraction must change the radiance, most at
    the lowest tangent altitudes (reference ``test_refraction_enabling``)."""
    alts = np.arange(0, 65001, 2500.0)
    t = 288.15 - 6.5e-3 * np.minimum(alts, 11000.0)
    p = 101325.0 * np.exp(-alts / 7500.0)
    n_prof = ciddor_index_of_refraction(t, p, 0.0, 450.0, 550.0)
    base = _engine_radiance(
        False, False, None, sk.MultipleScatterSource.NoSource, alts
    )
    refr = _engine_radiance(
        True, True, n_prof, sk.MultipleScatterSource.NoSource, alts
    )
    rel = np.abs(refr / base - 1.0)
    assert rel.max() > 1e-3
    # low tangent rays are bent the most
    assert rel[:, 0].max() > rel[:, 3].max()


def test_solar_refraction_do_refractive_one_parity():
    """Solar refraction with n == 1 leaves the DO (pseudo-spherical chapman)
    solution unchanged."""
    alts = np.arange(0, 65001, 5000.0)
    base = _engine_radiance(
        False, False, None, sk.MultipleScatterSource.DiscreteOrdinates, alts
    )
    refr = _engine_radiance(
        False, True, np.ones_like(alts),
        sk.MultipleScatterSource.DiscreteOrdinates, alts,
    )
    np.testing.assert_allclose(refr, base, rtol=1e-4)


def test_ground_viewing_refraction_parity_and_effect():
    alts = np.arange(0, 65001, 2500.0)
    config_kwargs = dict(
        num_streams=2,
        single_scatter_source=sk.SingleScatterSource.Exact,
        multiple_scatter_source=sk.MultipleScatterSource.NoSource,
        num_singlescatter_moments=4,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=alts, geometry_type=sk.GeometryType.Spherical,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(
        sk.GroundViewingSolar(
            cos_sza=0.6, relative_azimuth=0.5,
            observer_altitude_m=200000.0, cos_viewing_zenith=0.3,
        )
    )

    def run(cfg, n_prof):
        geo = sk.Geometry1D(
            cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
            altitude_grid_m=alts, geometry_type=sk.GeometryType.Spherical,
        )
        if n_prof is not None:
            geo.refractive_index = n_prof
        atmo = sk.Atmosphere(geo, cfg, wavelengths_nm=np.array([450.0]))
        sk.climatology.us76.add_us76_standard_atmosphere(atmo)
        atmo["rayleigh"] = sk.constituent.Rayleigh()
        atmo["surface"] = sk.constituent.LambertianSurface(0.3)
        eng = sk.Engine(cfg, geo, viewing)
        return eng.calculate_radiance(atmo)["radiance"].to_numpy()

    base = run(sk.Config(**config_kwargs), None)
    one = run(
        sk.Config(**config_kwargs, los_refraction=True),
        np.ones_like(alts),
    )
    np.testing.assert_allclose(one, base, rtol=1e-4)
    n_prof = 1.0 + 2.7e-4 * np.exp(-alts / 8000.0)
    bent = run(sk.Config(**config_kwargs, los_refraction=True), n_prof)
    assert np.abs(bent / base - 1.0).max() > 1e-5
