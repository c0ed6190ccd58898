"""End-to-end engine tests: nadir viewing, single scatter + DO, weighting
functions vs finite differences (mirrors reference
``tests/weightingfunctions/test_wf_basic.py`` patterns)."""

import numpy as np
import pytest

import sasktran2_tpu as sk
from sasktran2_tpu.test_util import default_pure_scattering_atmosphere
from sasktran2_tpu.test_util.wf import numeric_wf, validate_wf


def _engine_setup(nstr=4, ms=sk.MultipleScatterSource.DiscreteOrdinates,
                  ss=sk.SingleScatterSource.DiscreteOrdinates,
                  geometry_type=sk.GeometryType.PlaneParallel,
                  nalt=20, cos_sza=0.6):
    config = sk.Config(
        num_streams=nstr,
        multiple_scatter_source=ms,
        single_scatter_source=ss,
        num_singlescatter_moments=4,
    )
    geometry = sk.Geometry1D(
        cos_sza=cos_sza,
        solar_azimuth=0.0,
        earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 100000, nalt),
        geometry_type=geometry_type,
    )
    viewing = sk.ViewingGeometry()
    for mu in (0.6, 0.9):
        viewing.add_ray(
            sk.GroundViewingSolar(
                cos_sza=cos_sza,
                relative_azimuth=0.5,
                cos_viewing_zenith=mu,
                observer_altitude_m=200000.0,
            )
        )
    return config, geometry, viewing


def test_nadir_do_radiance_physical():
    config, geometry, viewing = _engine_setup()
    engine = sk.Engine(config, geometry, viewing)
    atmo = default_pure_scattering_atmosphere(
        config, geometry, ssa=0.95, albedo=0.3
    )
    out = engine.calculate_radiance(atmo)
    rad = out["radiance"].to_numpy()
    assert rad.shape == (1, 2, 1)
    assert np.all(rad > 0)
    assert np.all(np.isfinite(rad))

    # more albedo -> more radiance
    atmo2 = default_pure_scattering_atmosphere(
        config, geometry, ssa=0.95, albedo=0.8
    )
    rad2 = engine.calculate_radiance(atmo2)["radiance"].to_numpy()
    assert np.all(rad2 > rad)


def test_wf_extinction_vs_numeric():
    config, geometry, viewing = _engine_setup()
    engine = sk.Engine(config, geometry, viewing)
    atmo = default_pure_scattering_atmosphere(
        config, geometry, ssa=0.9, albedo=0.3
    )
    ds = numeric_wf(
        atmo.storage.total_extinction[:, 0], 0.001, engine, atmo,
        "wf_extinction",
    )
    validate_wf(ds["wf_extinction"], ds["wf_extinction_numeric"],
                wf_dim="altitude", decimal=5)


def test_wf_ssa_vs_numeric():
    config, geometry, viewing = _engine_setup()
    engine = sk.Engine(config, geometry, viewing)
    atmo = default_pure_scattering_atmosphere(
        config, geometry, ssa=0.9, albedo=0.3
    )
    ds = numeric_wf(
        atmo.storage.ssa[:, 0], 0.001, engine, atmo, "wf_ssa"
    )
    validate_wf(ds["wf_ssa"], ds["wf_ssa_numeric"], wf_dim="altitude",
                decimal=5)


def test_wf_albedo_vs_numeric():
    config, geometry, viewing = _engine_setup()
    engine = sk.Engine(config, geometry, viewing)
    atmo = default_pure_scattering_atmosphere(
        config, geometry, ssa=0.9, albedo=0.3
    )
    base = engine.calculate_radiance(atmo)
    analytic = base["wf_albedo"].to_numpy()
    h = 1e-4
    atmo.surface.albedo[:] = 0.3 + h
    above = engine.calculate_radiance(atmo)["radiance"].to_numpy()
    atmo.surface.albedo[:] = 0.3 - h
    below = engine.calculate_radiance(atmo)["radiance"].to_numpy()
    numeric = (above - below) / (2 * h)
    np.testing.assert_allclose(analytic, numeric, rtol=1e-5)


def test_ss_exact_vs_ss_do_close():
    """Exact (spherical path) and DO (plane-parallel) single scatter should
    agree reasonably for near-nadir geometry."""
    config, geometry, viewing = _engine_setup(
        ss=sk.SingleScatterSource.DiscreteOrdinates)
    e1 = sk.Engine(config, geometry, viewing)
    config2, _, _ = _engine_setup(ss=sk.SingleScatterSource.Exact)
    e2 = sk.Engine(config2, geometry, viewing)
    atmo = default_pure_scattering_atmosphere(
        config, geometry, ssa=0.9, albedo=0.3
    )
    r1 = e1.calculate_radiance(atmo)["radiance"].to_numpy()
    atmo2 = default_pure_scattering_atmosphere(
        config2, geometry, ssa=0.9, albedo=0.3
    )
    r2 = e2.calculate_radiance(atmo2)["radiance"].to_numpy()
    np.testing.assert_allclose(r1, r2, rtol=3e-2)


def test_occultation_transmission():
    config = sk.Config(
        single_scatter_source=sk.SingleScatterSource.NoSource,
        multiple_scatter_source=sk.MultipleScatterSource.NoSource,
        occultation_source=sk.OccultationSource.Standard,
        output_los_optical_depth=True,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 100000, 30),
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.TangentAltitudeSolar(
        tangent_altitude_m=20000.0, relative_azimuth=0.0,
        observer_altitude_m=200000.0, cos_sza=0.6,
    ))
    engine = sk.Engine(config, geometry, viewing)
    atmo = default_pure_scattering_atmosphere(config, geometry, ssa=0.5)
    out = engine.calculate_radiance(atmo)
    od = out["los_optical_depth"].to_numpy()
    rad = out["radiance"].to_numpy()
    assert od.shape == (1, 1)
    np.testing.assert_allclose(rad[..., 0], np.exp(-od), rtol=1e-10)
