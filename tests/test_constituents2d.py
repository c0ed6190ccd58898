"""Native-grid 2D constituents (reference
src/sasktran2/constituent/vmrabsorber2d.py, numdenscatterer2d.py)."""

import numpy as np
import pytest

import sasktran2_tpu as sk
from sasktran2_tpu.constituent import (
    HGScatteringOptical,
    NumberDensityScatterer2D,
    VMRAbsorber2D,
)


class _FlatXS:
    """Constant cross-section optical property."""

    def __init__(self, xs):
        self.xs = xs

    def cross_sections(self, wavelengths_nm, altitudes_m=None, **kwargs):
        W = len(np.atleast_1d(wavelengths_nm))
        A = len(np.atleast_1d(altitudes_m))
        return np.full((A, W), self.xs)


def _setup2d(nh=5, nalt=9):
    config = sk.Config(
        single_scatter_source=sk.SingleScatterSource.NoSource,
        multiple_scatter_source=sk.MultipleScatterSource.NoSource,
        occultation_source=sk.OccultationSource.Standard,
        output_los_optical_depth=True,
        num_streams=2,
    )
    geometry = sk.Geometry2D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 80000, nalt),
        horizontal_angle_grid_radians=np.linspace(-0.5, 0.5, nh),
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.TangentAltitude(20000.0, 2e5, 0.0, 0.0))
    return config, geometry, viewing


def test_vmr_absorber_2d_extinction():
    config, geometry, viewing = _setup2d()
    nh, nalt = geometry.num_horizontal, geometry.num_altitudes
    atmo = sk.Atmosphere(geometry, config,
                         wavelengths_nm=np.array([550.0, 600.0]))
    alts = geometry.altitudes()
    atmo.pressure_pa = 101325.0 * np.exp(-alts / 8000.0)
    atmo.temperature_k = np.full(nalt, 250.0)

    vmr = np.outer(np.linspace(0.5, 1.5, nh), np.full(nalt, 1e-6))
    con = VMRAbsorber2D(_FlatXS(1e-25), vmr)
    atmo["gas"] = con
    atmo.internal_object()

    k = np.asarray(atmo.storage.total_extinction)  # [H*A, W]
    from sasktran2_tpu.util.state import EquationOfState

    eos = EquationOfState(atmo.pressure_pa, atmo.temperature_k, None)
    nd = eos.air_numberdensity["N"]
    expected = (vmr.ravel() * np.tile(nd, nh)) * 1e-25
    np.testing.assert_allclose(k[:, 0], expected, rtol=1e-12)
    assert "wf_gas" in atmo.storage.derivative_mappings


def test_vmr_absorber_2d_validation():
    config, geometry, viewing = _setup2d()
    with pytest.raises(ValueError, match="horizontal, altitude"):
        VMRAbsorber2D(_FlatXS(1e-25), np.ones(5))
    atmo = sk.Atmosphere(geometry, config,
                         wavelengths_nm=np.array([550.0]))
    atmo.pressure_pa = np.full(geometry.num_altitudes, 1e5)
    atmo.temperature_k = np.full(geometry.num_altitudes, 250.0)
    atmo["gas"] = VMRAbsorber2D(_FlatXS(1e-25), np.ones((3, 4)) * 1e-6)
    with pytest.raises(ValueError, match="does not match"):
        atmo.internal_object()

    # 1D geometry rejected
    g1 = sk.Geometry1D(0.6, 0.0, 6372000.0,
                       np.linspace(0, 80000, 9),
                       geometry_type=sk.GeometryType.Spherical)
    atmo1 = sk.Atmosphere(g1, config, wavelengths_nm=np.array([550.0]))
    atmo1.pressure_pa = np.full(9, 1e5)
    atmo1.temperature_k = np.full(9, 250.0)
    atmo1["gas"] = VMRAbsorber2D(
        _FlatXS(1e-25),
        np.ones((geometry.num_horizontal, geometry.num_altitudes)) * 1e-6,
    )
    with pytest.raises(TypeError, match="Geometry2D"):
        atmo1.internal_object()


def test_uniform_2d_vmr_matches_1d_los_od():
    """Horizontally-uniform VMRAbsorber2D transmission equals the 1D
    spherical result."""
    config, geometry, viewing = _setup2d(nh=11, nalt=17)
    engine = sk.Engine(config, geometry, viewing)
    nalt = geometry.num_altitudes
    alts = geometry.altitudes()
    atmo = sk.Atmosphere(geometry, config, numwavel=1,
                         calculate_derivatives=False,
                         wavelengths_nm=np.array([550.0]))
    atmo.pressure_pa = 101325.0 * np.exp(-alts / 8000.0)
    atmo.temperature_k = np.full(nalt, 250.0)
    vmr2d = np.tile(np.full(nalt, 1e-6), (geometry.num_horizontal, 1))
    atmo["gas"] = VMRAbsorber2D(_FlatXS(1e-21), vmr2d)
    od2d = engine.calculate_radiance(atmo)["los_optical_depth"].to_numpy()

    g1 = sk.Geometry1D(0.6, 0.0, 6372000.0, alts,
                       geometry_type=sk.GeometryType.Spherical)
    v1 = sk.ViewingGeometry()
    v1.add_ray(sk.TangentAltitudeSolar(20000.0, 0.0, 2e5, 0.6))
    e1 = sk.Engine(config, g1, v1)
    atmo1 = sk.Atmosphere(g1, config, numwavel=1,
                          calculate_derivatives=False,
                          wavelengths_nm=np.array([550.0]))
    atmo1.pressure_pa = atmo.pressure_pa
    atmo1.temperature_k = atmo.temperature_k
    atmo1["gas"] = sk.constituent.VMRAltitudeAbsorber(
        _FlatXS(1e-21), alts, np.full(nalt, 1e-6)
    )
    od1d = e1.calculate_radiance(atmo1)["los_optical_depth"].to_numpy()
    np.testing.assert_allclose(od2d, od1d, rtol=2e-4)


def test_number_density_scatterer_2d():
    config, geometry, viewing = _setup2d()
    nh, nalt = geometry.num_horizontal, geometry.num_altitudes
    atmo = sk.Atmosphere(geometry, config,
                         wavelengths_nm=np.array([550.0]))
    nd = np.outer(np.linspace(1.0, 2.0, nh), np.full(nalt, 1e7))
    con = NumberDensityScatterer2D(
        HGScatteringOptical(xs_total=1e-13, ssa=0.9, g=0.5, nleg=4), nd
    )
    atmo["aero"] = con
    atmo.internal_object()
    k = np.asarray(atmo.storage.total_extinction)
    np.testing.assert_allclose(k[:, 0], nd.ravel() * 1e-13, rtol=1e-12)
    # ssa normalized to 0.9 everywhere after pipeline
    np.testing.assert_allclose(
        np.asarray(atmo.storage.ssa)[:, 0], 0.9, rtol=1e-12
    )
    assert "wf_aero" in atmo.storage.derivative_mappings

    with pytest.raises(TypeError):
        g1 = sk.Geometry1D(0.6, 0.0, 6372000.0, geometry.altitudes(),
                           geometry_type=sk.GeometryType.Spherical)
        atmo1 = sk.Atmosphere(g1, config,
                              wavelengths_nm=np.array([550.0]))
        atmo1["aero"] = con
        atmo1.internal_object()
