"""ECEF viewing containers, LimbVertical scan builder, solar handlers
(reference: ``src/sasktran2/viewinggeo/{ecef,limbverticalimage}.py``,
``src/sasktran2/solar/__init__.py``)."""

from __future__ import annotations

import numpy as np

import sasktran2_tpu as sk
from sasktran2_tpu.geodetic import Geodetic
from sasktran2_tpu.solar import (
    SolarGeometryHandlerEphemeris,
    SolarGeometryHandlerForced,
)
from sasktran2_tpu.viewinggeo import (
    GroundViewingSolar,
    LimbVertical,
    TangentAltitudeSolar,
    ecef_to_sasktran2_ray,
)


def test_ecef_limb_ray():
    geo = Geodetic()
    obs = geo.from_lat_lon_alt(0.0, 0.0, 600000.0).location
    # look toward a 25 km tangent point
    look = geo.from_tangent_altitude(25000.0, obs, np.array([0.0, 1.0, 0.1]))
    ray = ecef_to_sasktran2_ray(
        obs, look, None, solar_handler=SolarGeometryHandlerForced(60.0, 0.0)
    )
    assert isinstance(ray, TangentAltitudeSolar)
    np.testing.assert_allclose(ray.tangent_altitude_m, 25000.0, atol=5.0)
    np.testing.assert_allclose(ray.cos_sza, 0.5, atol=1e-10)
    np.testing.assert_allclose(ray.observer_altitude_m, 600000.0, atol=1.0)


def test_ecef_ground_ray():
    geo = Geodetic()
    obs = geo.from_lat_lon_alt(0.0, 0.0, 600000.0).location
    look = -geo.local_up  # pure nadir
    ray = ecef_to_sasktran2_ray(
        obs, look, None, solar_handler=SolarGeometryHandlerForced(45.0, 90.0)
    )
    assert isinstance(ray, GroundViewingSolar)
    np.testing.assert_allclose(ray.cos_viewing_zenith, 1.0, atol=1e-9)
    np.testing.assert_allclose(ray.cos_sza, np.cos(np.deg2rad(45.0)))


def test_limb_vertical_scan_and_engine():
    tanalts = np.arange(10000.0, 45001.0, 5000.0)
    container = LimbVertical.from_tangent_parameters(
        SolarGeometryHandlerForced(60.0, 30.0),
        tanalts,
        tangent_latitude=20.0,
        tangent_longitude=40.0,
        time=None,
        observer_altitude=500000.0,
        viewing_azimuth=90.0,
        reference_altitude=25000.0,
    )
    # each ray is limb with ~the requested tangent altitude
    got = np.array([r.tangent_altitude_m for r in container.observer_rays])
    np.testing.assert_allclose(got, tanalts, atol=1.0)
    assert 0.45 < container.recommended_cos_sza() < 0.55
    assert 6.3e6 < container.recommended_earth_radius() < 6.42e6

    geometry = container.model_geometry(np.arange(0, 65001, 5000.0))
    config = sk.Config(
        num_streams=2,
        single_scatter_source=sk.SingleScatterSource.Exact,
        multiple_scatter_source=sk.MultipleScatterSource.NoSource,
        num_singlescatter_moments=4,
    )
    atmosphere = sk.Atmosphere(
        geometry, config, wavelengths_nm=np.array([450.0])
    )
    sk.climatology.us76.add_us76_standard_atmosphere(atmosphere)
    atmosphere["rayleigh"] = sk.constituent.Rayleigh()
    engine = sk.Engine(config, geometry, container)
    out = engine.calculate_radiance(atmosphere)
    # radiance present and geometry metadata merged
    assert np.all(out["radiance"].to_numpy() > 0)
    np.testing.assert_allclose(
        out["tangent_altitude"].to_numpy(), tanalts, atol=1.0
    )
    assert "viewing_zenith" in out


def test_ephemeris_handler_equinox_noon():
    import pandas as pd

    handler = SolarGeometryHandlerEphemeris()
    zen, azi = handler.target_solar_angles(
        0.0, 0.0, 0.0, pd.Timestamp("2024-03-20 12:07:00")
    )
    # sun nearly overhead at the equator at solar noon on the equinox
    assert zen < 1.0
