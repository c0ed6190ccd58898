"""2D emission sources (standard thermal + volume emission rate).

Mirrors the reference's ``tests/engine/test_geometry2d_emission.py``
family: analytic path integral, occultation+emission consistency,
horizontally-uniform-2D-matches-1D, and native FD-validated weighting
functions (reference capability set ``src/sasktran2/engine.py:89-93``).
"""

import numpy as np
import pytest

import sasktran2_tpu as sk

EARTH_RADIUS_M = 6_372_000.0
ALTITUDES_M = np.array([0.0, 10_000.0, 30_000.0])
HORIZONTAL_ANGLES = np.array([-0.5, 0.0, 0.5])
WAVELENGTHS_NM = np.array([8_000.0, 10_000.0])


def _config(source):
    return sk.Config(
        single_scatter_source=sk.SingleScatterSource.NoSource,
        multiple_scatter_source=sk.MultipleScatterSource.NoSource,
        occultation_source=sk.OccultationSource.NoSource,
        emission_source=source,
    )


def _geometry2d():
    return sk.Geometry2D(
        cos_sza=0.6,
        solar_azimuth=0.0,
        earth_radius_m=EARTH_RADIUS_M,
        altitude_grid_m=ALTITUDES_M,
        horizontal_angle_grid_radians=HORIZONTAL_ANGLES,
    )


def _geometry1d():
    return sk.Geometry1D(
        cos_sza=0.6,
        solar_azimuth=0.0,
        earth_radius_m=EARTH_RADIUS_M,
        altitude_grid_m=ALTITUDES_M,
        geometry_type=sk.GeometryType.Spherical,
    )


def _tangent_ray(tangent_altitude_m=15_000.0):
    return sk.TangentAltitudeSolar(
        tangent_altitude_m, 0.0, 100_000.0, 0.6
    )


def _viewing():
    v = sk.ViewingGeometry()
    v.add_ray(_tangent_ray())
    return v


def _path_length(tangent_altitude_m=15_000.0):
    top = EARTH_RADIUS_M + ALTITUDES_M[-1]
    rt = EARTH_RADIUS_M + tangent_altitude_m
    return 2.0 * np.sqrt(top**2 - rt**2)


def test_constant_ver_matches_analytic_path_integral():
    config = _config(sk.EmissionSource.VolumeEmissionRate)
    geometry = _geometry2d()
    atmo = sk.Atmosphere(
        geometry, config, wavelengths_nm=WAVELENGTHS_NM,
        calculate_derivatives=False,
    )
    emission = np.array([2.0e-6, 3.0e-6])
    atmo.storage.total_extinction[:] = 0.0
    atmo.storage.ssa[:] = 0.0
    atmo.storage.emission_source[:] = emission

    out = sk.Engine(config, geometry, _viewing()).calculate_radiance(atmo)
    np.testing.assert_allclose(
        out["radiance"].to_numpy()[:, 0, 0],
        emission * _path_length(),
        rtol=2e-9,
    )


def test_standard_emission_analytic_and_wfs():
    config = _config(sk.EmissionSource.Standard)
    geometry = _geometry2d()

    def make():
        atmo = sk.Atmosphere(
            geometry, config, wavelengths_nm=WAVELENGTHS_NM,
        )
        atmo.storage.total_extinction[:] = extinction
        atmo.storage.ssa[:] = 0.0
        atmo.storage.emission_source[:] = emission
        return atmo

    extinction = np.array([1.0e-6, 3.0e-6])
    emission = np.array([2.0, 3.0])
    engine = sk.Engine(config, geometry, _viewing())
    base = engine.calculate_radiance(make())

    L = _path_length()
    np.testing.assert_allclose(
        base["radiance"].to_numpy()[:, 0, 0],
        emission * (1.0 - np.exp(-extinction * L)),
        rtol=2e-9,
    )

    # native FD weighting functions at a mid-grid location
    nloc = len(ALTITUDES_M) * len(HORIZONTAL_ANGLES)
    loc = 1 * len(ALTITUDES_M) + 1  # horizontal index 1, altitude index 1
    wf_ext = base["wf_extinction"].to_numpy()
    wf_emis = base["wf_emission"].to_numpy()
    assert wf_ext.shape[0] == nloc

    dk = 1e-10
    atmo_p = make()
    atmo_p.storage.total_extinction[loc, 0] += dk
    pert = engine.calculate_radiance(atmo_p)
    numeric = (
        pert["radiance"].to_numpy()[0, 0, 0]
        - base["radiance"].to_numpy()[0, 0, 0]
    ) / dk
    np.testing.assert_allclose(numeric, wf_ext[loc, 0, 0, 0], rtol=5e-5)

    de = 1e-6
    atmo_p = make()
    atmo_p.storage.emission_source[loc, 0] += de
    pert = engine.calculate_radiance(atmo_p)
    numeric = (
        pert["radiance"].to_numpy()[0, 0, 0]
        - base["radiance"].to_numpy()[0, 0, 0]
    ) / de
    np.testing.assert_allclose(numeric, wf_emis[loc, 0, 0, 0], rtol=2e-6)


def test_occultation_and_standard_emission_add_consistently():
    config = _config(sk.EmissionSource.Standard)
    config.occultation_source = sk.OccultationSource.Standard
    geometry = _geometry2d()
    atmo = sk.Atmosphere(
        geometry, config, wavelengths_nm=WAVELENGTHS_NM,
        calculate_derivatives=False,
    )
    extinction = np.array([1.0e-6, 3.0e-6])
    emission = np.array([2.0, 3.0])
    atmo.storage.total_extinction[:] = extinction
    atmo.storage.ssa[:] = 0.0
    atmo.storage.emission_source[:] = emission

    out = sk.Engine(config, geometry, _viewing()).calculate_radiance(atmo)
    transmission = np.exp(-extinction * _path_length())
    expected = transmission + emission * (1.0 - transmission)
    np.testing.assert_allclose(
        out["radiance"].to_numpy()[:, 0, 0], expected, rtol=2e-9
    )


@pytest.mark.parametrize(
    "source",
    [sk.EmissionSource.Standard, sk.EmissionSource.VolumeEmissionRate],
)
def test_horizontally_uniform_2d_emission_matches_1d(source):
    config = _config(source)
    geometry_1d = _geometry1d()
    geometry_2d = _geometry2d()
    viewing = sk.ViewingGeometry()
    viewing.add_ray(_tangent_ray(12_000.0))
    viewing.add_ray(_tangent_ray(22_000.0))

    extinction = np.array([[1.0e-6, 2.0e-6], [2.0e-6, 1.0e-6],
                           [0.5e-6, 0.7e-6]])
    emission = np.array([[1.0, 4.0], [2.0, 3.0], [5.0, 2.0]])
    ssa = (
        np.array([[0.1, 0.2], [0.3, 0.1], [0.2, 0.4]])
        if source == sk.EmissionSource.Standard
        else np.zeros_like(extinction)
    )

    atmo_1d = sk.Atmosphere(
        geometry_1d, config, wavelengths_nm=WAVELENGTHS_NM,
        calculate_derivatives=False,
    )
    atmo_2d = sk.Atmosphere(
        geometry_2d, config, wavelengths_nm=WAVELENGTHS_NM,
        calculate_derivatives=False,
    )
    atmo_1d.storage.total_extinction[:] = extinction
    atmo_1d.storage.ssa[:] = ssa
    atmo_1d.storage.emission_source[:] = emission
    atmo_2d.storage.total_extinction[:] = np.tile(extinction, (3, 1))
    atmo_2d.storage.ssa[:] = np.tile(ssa, (3, 1))
    atmo_2d.storage.emission_source[:] = np.tile(emission, (3, 1))

    r1 = sk.Engine(config, geometry_1d, viewing).calculate_radiance(atmo_1d)
    r2 = sk.Engine(config, geometry_2d, viewing).calculate_radiance(atmo_2d)
    np.testing.assert_allclose(
        r2["radiance"].to_numpy(), r1["radiance"].to_numpy(), rtol=1e-8
    )


def test_ground_surface_emission_attenuated_and_matches_1d():
    """Ground-viewing ray through a 2D atmosphere: the surface emission
    is attenuated by the slant path and matches the equivalent 1D run
    (reference test_geometry2d_emission.py ground test)."""
    config = _config(sk.EmissionSource.Standard)
    geometry_1d = _geometry1d()
    geometry_2d = _geometry2d()
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, 0.0, 0.5, 100_000.0))

    extinction = np.full((3, 2), 1.0e-6)
    surface_emission = np.array([2.0, 3.0])

    def make(geometry, tile):
        atmo = sk.Atmosphere(
            geometry, config, wavelengths_nm=WAVELENGTHS_NM,
            calculate_derivatives=False,
        )
        ext = np.tile(extinction, (tile, 1))
        atmo.storage.total_extinction[:] = ext
        atmo.storage.ssa[:] = 0.0
        atmo.storage.emission_source[:] = 0.0
        atmo.surface.emission[:] = surface_emission
        return atmo

    r1 = sk.Engine(config, geometry_1d, viewing).calculate_radiance(
        make(geometry_1d, 1)
    )["radiance"].to_numpy()
    r2 = sk.Engine(config, geometry_2d, viewing).calculate_radiance(
        make(geometry_2d, 3)
    )["radiance"].to_numpy()

    assert np.all(r2 > 0.0)
    assert np.all(r2[:, 0, 0] < surface_emission)
    np.testing.assert_allclose(r2, r1, rtol=1e-8)
