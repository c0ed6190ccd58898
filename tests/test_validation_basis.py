"""Input validation + spectral basis tests."""

import numpy as np
import pytest

import sasktran2_tpu as sk
from sasktran2_tpu.basis import Grid, mapping_matrix
from sasktran2_tpu.util.validation import ValidationError


def _engine_atmo(**cfg):
    config = sk.Config(
        num_streams=4,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
        num_singlescatter_moments=4,
        **cfg,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 10000, 6),
        geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, 0.0, 0.8, 2e5))
    engine = sk.Engine(config, geometry, viewing)
    atmo = sk.Atmosphere(geometry, config, numwavel=1,
                         calculate_derivatives=False)
    atmo.storage.total_extinction[:] = 1e-5
    atmo.storage.ssa[:] = 0.5
    atmo.leg_coeff.a1[0] = 1.0
    return engine, atmo


def test_validation_rejects_nan_extinction():
    engine, atmo = _engine_atmo()
    atmo.storage.total_extinction[2] = np.nan
    with pytest.raises(ValidationError):
        engine.calculate_radiance(atmo)


def test_validation_rejects_bad_ssa():
    engine, atmo = _engine_atmo()
    atmo.storage.ssa[:] = 1.5
    with pytest.raises(ValidationError):
        engine.calculate_radiance(atmo)


def test_validation_disabled_passes():
    engine, atmo = _engine_atmo(
        input_validation_mode=sk.InputValidationMode.Disabled)
    atmo.storage.ssa[:] = 1.2  # clamped internally; result still finite
    out = engine.calculate_radiance(atmo)
    assert np.isfinite(out["radiance"].to_numpy()).all()


def test_basis_mapping_matrix():
    src = Grid.from_deltas(np.linspace(0, 10, 21))
    dst = Grid.from_triangles(np.array([2.0, 5.0, 8.0]), 1.0)
    M = mapping_matrix(src, dst)
    # resampling a linear function is exact for symmetric bases
    f = 3.0 + 0.5 * src.centers
    np.testing.assert_allclose(M @ f, 3.0 + 0.5 * dst.centers, rtol=1e-10)
    # rows are normalized averages
    np.testing.assert_allclose(M.sum(axis=1), 1.0, rtol=1e-12)


def test_basis_gaussian_smooths():
    src = Grid.from_deltas(np.linspace(0, 10, 101))
    dst = Grid.from_gaussians(np.array([5.0]), np.array([2.0]))
    M = mapping_matrix(src, dst)
    f = np.zeros(101)
    f[50] = 1.0  # spike at 5.0
    out = (M @ f)[0]
    assert 0 < out < 1.0
