"""Baum ice-crystal optical database wrapper (reference
src/sasktran2/optical/baum.py)."""

import numpy as np
import pytest

from sasktran2_tpu.optical.baum import BaumIceCrystal


def _write_db(tmp_path, nleg=8):
    wl = np.array([500.0, 1000.0, 2000.0])
    deff = np.array([10.0, 60.0, 120.0])
    models = np.array(
        ["general_habit_mixture", "solid_columns"], dtype="U32"
    )
    M, D, W, L = models.size, deff.size, wl.size, nleg
    xs_total = np.ones((M, D, W))
    xs_total[1] = 2.0
    xs_total[:, :, 2] = 0.5 * xs_total[:, :, 2]
    xs_scattering = 0.9 * xs_total
    lm = np.zeros((L, M, D, W))
    lm[0] = 1.0
    lm[1] = 1.5  # g = 0.5
    arrays = {
        "coord_wavelength_nm": wl,
        "coord_effective_diameter_um": deff,
        "coord_particle_model": models,
        "coord_legendre": np.arange(L),
    }
    dims4 = np.array(["legendre", "particle_model",
                      "effective_diameter_um", "wavelength_nm"])
    dims3 = np.array(["particle_model", "effective_diameter_um",
                      "wavelength_nm"])
    for name in ("xs_total", "xs_scattering"):
        arrays[name] = {"xs_total": xs_total,
                        "xs_scattering": xs_scattering}[name]
        arrays[f"dims_{name}"] = dims3
    for name in ("lm_a1", "lm_a2", "lm_a3", "lm_a4", "lm_b1", "lm_b2"):
        arrays[name] = lm if name == "lm_a1" else 0.1 * lm
        arrays[f"dims_{name}"] = dims4
    p = tmp_path / "baum_test.npz"
    np.savez(p, **arrays)
    return p


def test_baum_model_selection_and_interpolation(tmp_path):
    p = _write_db(tmp_path)
    ghm = BaumIceCrystal("general_habit_mixture", max_moments=4,
                         db_filepath=p)
    sc = BaumIceCrystal("solid_columns", max_moments=4, db_filepath=p)
    assert ghm.loaded_moments == 4

    props = ghm.scattering_properties(
        np.array([750.0]), altitudes_m=np.array([0.0, 1.0]),
        effective_diameter_um=np.array([35.0, 60.0]),
    )
    np.testing.assert_allclose(props["xs_total"], 1.0)
    np.testing.assert_allclose(props["ssa"], 0.9)
    np.testing.assert_allclose(props["legendre"][1], 1.5)
    props_sc = sc.scattering_properties(
        np.array([750.0]), altitudes_m=np.array([0.0]),
        effective_diameter_um=np.array([35.0]),
    )
    np.testing.assert_allclose(props_sc["xs_total"], 2.0)


def test_baum_validation(tmp_path):
    p = _write_db(tmp_path)
    with pytest.raises(ValueError, match="Unknown Baum particle model"):
        BaumIceCrystal("plates", db_filepath=p)
    with pytest.raises(TypeError, match="integer"):
        BaumIceCrystal(max_moments=2.5, db_filepath=p)
    with pytest.raises(ValueError, match="positive"):
        BaumIceCrystal(max_moments=0, db_filepath=p)
    with pytest.raises(ValueError, match="only contains"):
        BaumIceCrystal(max_moments=100, db_filepath=p)
    with pytest.raises(ValueError, match="not present"):
        BaumIceCrystal("aggregate_solid_columns", max_moments=4,
                       db_filepath=p)
    with pytest.raises(OSError, match="does not exist"):
        BaumIceCrystal(db_filepath=tmp_path / "missing.npz")


def test_baum_in_constituent(tmp_path):
    """BaumIceCrystal drives a NumberDensityScatterer with per-altitude
    effective diameter."""
    from sasktran2_tpu.constituent import NumberDensityScatterer
    import sasktran2_tpu as sk
    from sasktran2_tpu.climatology import add_us76_standard_atmosphere

    p = _write_db(tmp_path)
    ice = BaumIceCrystal("general_habit_mixture", max_moments=4,
                         db_filepath=p)
    config = sk.Config(
        num_streams=2,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
        num_singlescatter_moments=4,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 20000, 6),
        geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, 0.3, 0.8, 2e5))
    engine = sk.Engine(config, geometry, viewing)
    atmo = sk.Atmosphere(geometry, config,
                         wavelengths_nm=np.array([750.0]))
    add_us76_standard_atmosphere(atmo)
    atmo["rayleigh"] = sk.constituent.Rayleigh()
    alts = np.linspace(0, 20000, 6)
    atmo["ice"] = NumberDensityScatterer(
        ice, alts, np.full(6, 1e-7),
        param_values={"effective_diameter_um": np.full(6, 40.0)},
    )
    out = engine.calculate_radiance(atmo)
    rad = out["radiance"].to_numpy()
    assert np.isfinite(rad).all() and (rad > 0).all()
