"""Polarized engine path: Rayleigh sky through the public API."""

import numpy as np

import sasktran2_tpu as sk
from sasktran2_tpu.test_util.wf import numeric_wf, validate_wf


def _setup():
    config = sk.Config(
        num_streams=8,
        num_stokes=3,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
        num_singlescatter_moments=8,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 60000, 21),
        geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    for mu, azi in ((0.8, 0.3), (0.5, 1.5)):
        viewing.add_ray(sk.GroundViewingSolar(0.6, azi, mu, 200000.0))
    return config, geometry, viewing


def test_polarized_rayleigh_engine():
    config, geometry, viewing = _setup()
    engine = sk.Engine(config, geometry, viewing)
    atmo = sk.Atmosphere(geometry, config, wavelengths_nm=np.array([450.0]))
    atmo.pressure_pa = 101325 * np.exp(-np.linspace(0, 60000, 21) / 7500)
    atmo.temperature_k = np.full(21, 250.0)
    atmo["rayleigh"] = sk.constituent.Rayleigh()
    atmo["surface"] = sk.constituent.LambertianSurface(0.2)
    out = engine.calculate_radiance(atmo)
    rad = out["radiance"].to_numpy()
    assert rad.shape == (1, 2, 3)
    I = rad[0, :, 0]
    q = rad[0, :, 1]
    u = rad[0, :, 2]
    assert np.all(I > 0)
    # Rayleigh sky is strongly polarized: |Q|+|U| should be a noticeable
    # fraction of I for these geometries
    dolp = np.sqrt(q**2 + u**2) / I
    assert np.all(dolp > 0.02)
    assert np.all(dolp < 1.0)


def test_polarized_wf_extinction():
    config, geometry, viewing = _setup()
    engine = sk.Engine(config, geometry, viewing)
    atmo = sk.Atmosphere(geometry, config, numwavel=1)
    alts = np.linspace(0, 60000, 21)
    atmo.storage.total_extinction[:] = (7e-5 * np.exp(-alts / 7000))[:, None]
    atmo.storage.ssa[:] = 0.9
    a1 = atmo.leg_coeff.a1
    a1[0] = 1.0
    a1[2] = 0.5
    atmo.leg_coeff.a2[2] = 3.0
    atmo.leg_coeff.b1[2] = np.sqrt(6.0) / 2
    atmo.surface.albedo[:] = 0.3
    ds = numeric_wf(
        atmo.storage.total_extinction[:, 0], 0.001, engine, atmo,
        "wf_extinction",
    )
    validate_wf(ds["wf_extinction"], ds["wf_extinction_numeric"],
                wf_dim="altitude", decimal=5)
