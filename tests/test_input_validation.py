"""Input-validation family mirroring the reference
``tests/input_validation/`` (atmosphere NaN/negative rejection, emission
source configuration rules, validation modes)."""

import numpy as np
import pytest

import sasktran2_tpu as sk
from sasktran2_tpu.util.validation import ValidationError


def _default_settings():
    config = sk.Config(
        num_streams=2,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.arange(0, 65001, 5000.0),
        geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, 0.0, 0.8, 200000.0))
    atmo = sk.Atmosphere(
        geometry, config, wavelengths_nm=np.array([500.0, 600.0]),
        calculate_derivatives=False,
    )
    atmo.storage.ssa[:] = 0.9
    atmo.storage.total_extinction[:] = 1e-5
    atmo.leg_coeff.a1[0] = 1.0
    return config, geometry, viewing, atmo


def test_nan_extinction():
    config, geometry, viewing, atmo = _default_settings()
    atmo.storage.total_extinction[3, 1] = np.nan
    engine = sk.Engine(config, geometry, viewing)
    with pytest.raises(ValidationError):
        engine.calculate_radiance(atmo)


def test_negative_extinction():
    config, geometry, viewing, atmo = _default_settings()
    atmo.storage.total_extinction[0, 0] = -0.1
    engine = sk.Engine(config, geometry, viewing)
    with pytest.raises(ValidationError):
        engine.calculate_radiance(atmo)


def test_nan_ssa():
    config, geometry, viewing, atmo = _default_settings()
    atmo.storage.ssa[3, 1] = np.nan
    engine = sk.Engine(config, geometry, viewing)
    with pytest.raises(ValidationError):
        engine.calculate_radiance(atmo)


def test_negative_ssa():
    config, geometry, viewing, atmo = _default_settings()
    atmo.storage.ssa[0, 0] = -0.1
    engine = sk.Engine(config, geometry, viewing)
    with pytest.raises(ValidationError):
        engine.calculate_radiance(atmo)


def test_ssa_above_one():
    config, geometry, viewing, atmo = _default_settings()
    atmo.storage.ssa[0, 0] = 1.5
    engine = sk.Engine(config, geometry, viewing)
    with pytest.raises(ValidationError):
        engine.calculate_radiance(atmo)


def test_wrong_altitude_count():
    config, geometry, viewing, atmo = _default_settings()
    engine = sk.Engine(config, geometry, viewing)
    atmo.storage.total_extinction = atmo.storage.total_extinction[:-1]
    with pytest.raises(ValidationError):
        engine.calculate_radiance(atmo)


def test_validation_disabled_accepts_bad_input():
    config, geometry, viewing, atmo = _default_settings()
    config.input_validation_mode = sk.InputValidationMode.Disabled
    atmo.storage.ssa[0, 0] = -0.1
    engine = sk.Engine(config, geometry, viewing)
    out = engine.calculate_radiance(atmo)  # must not raise
    assert out["radiance"].to_numpy().shape[0] == 2


# ---- emission source configuration rules (reference
# tests/input_validation/test_emission_validation.py) ----------------------

def _emission_config(geometry_type, ss, ms):
    config = sk.Config(
        num_streams=2,
        emission_source=sk.EmissionSource.DiscreteOrdinates,
        single_scatter_source=ss,
        multiple_scatter_source=ms,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.arange(0, 65001, 5000.0),
        geometry_type=geometry_type,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, 0.0, 1.0, 200000.0))
    return config, geometry, viewing


def test_emission_do_requires_single_scatter_do():
    config, geometry, viewing = _emission_config(
        sk.GeometryType.PlaneParallel,
        sk.SingleScatterSource.Exact,
        sk.MultipleScatterSource.DiscreteOrdinates,
    )
    with pytest.raises(ValueError):
        sk.Engine(config, geometry, viewing)


def test_emission_do_requires_multiple_scatter_do():
    config, geometry, viewing = _emission_config(
        sk.GeometryType.PlaneParallel,
        sk.SingleScatterSource.DiscreteOrdinates,
        sk.MultipleScatterSource.NoSource,
    )
    with pytest.raises(ValueError):
        sk.Engine(config, geometry, viewing)


@pytest.mark.parametrize(
    "geometry_type",
    [
        sk.GeometryType.PlaneParallel,
        sk.GeometryType.Spherical,
        sk.GeometryType.PseudoSpherical,
    ],
)
def test_emission_do_valid_configurations(geometry_type):
    config, geometry, viewing = _emission_config(
        geometry_type,
        sk.SingleScatterSource.DiscreteOrdinates,
        sk.MultipleScatterSource.DiscreteOrdinates,
    )
    sk.Engine(config, geometry, viewing)  # must not raise


# ---- config rules --------------------------------------------------------

def test_odd_num_streams_rejected():
    with pytest.raises(ValueError):
        sk.Config(num_streams=3).validate()


def test_bad_num_stokes_rejected():
    with pytest.raises(ValueError):
        sk.Config(num_stokes=2).validate()


def test_bad_cos_sza_rejected():
    with pytest.raises(ValueError):
        sk.Geometry1D(
            cos_sza=1.5, solar_azimuth=0.0, earth_radius_m=6372000.0,
            altitude_grid_m=np.arange(0, 10001, 1000.0),
        )


def test_decreasing_altitude_grid_rejected():
    with pytest.raises(ValueError):
        sk.Geometry1D(
            cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
            altitude_grid_m=np.array([0.0, 2000.0, 1000.0]),
        )
