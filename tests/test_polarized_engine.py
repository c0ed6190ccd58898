"""Polarized engine path: Rayleigh sky through the public API."""

import numpy as np

import sasktran2_tpu as sk
from sasktran2_tpu.test_util.wf import numeric_wf, validate_wf


def _setup():
    # nstr=4 / 13 levels: DOLP and analytic-vs-FD assertions compare the
    # engine against itself or robust bounds; sized for compile time
    config = sk.Config(
        num_streams=4,
        num_stokes=3,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
        num_singlescatter_moments=4,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 60000, 13),
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
    atmo.pressure_pa = 101325 * np.exp(-np.linspace(0, 60000, 13) / 7500)
    atmo.temperature_k = np.full(13, 250.0)
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


def _thin_rayleigh_atmo(geometry, config, nlvl=21, ssa=1e-4):
    atmo = sk.Atmosphere(geometry, config, numwavel=1,
                         calculate_derivatives=False)
    alts = geometry.altitudes()
    atmo.storage.total_extinction[:] = (7e-5 * np.exp(-alts / 7000))[:, None]
    atmo.storage.ssa[:] = ssa
    a1 = atmo.leg_coeff.a1
    a1[0] = 1.0
    a1[2] = 0.5
    atmo.leg_coeff.a2[2] = 3.0
    atmo.leg_coeff.b1[2] = np.sqrt(6.0) / 2
    atmo.surface.albedo[:] = 0.0
    return atmo


def test_polarized_ss_exact_matches_do():
    """Exact polarized single scatter vs the (Coulson-validated) polarized
    DO solver in the plane-parallel limit, at near-zero SSA so multiple
    scatter is negligible. Residual is layer discretization (2nd order:
    1.4% at 21 levels, 0.09% at 81)."""
    alts = np.linspace(0, 60000, 21)
    rays = ((0.8, 0.3), (0.5, 1.5), (0.9, 2.7), (0.6, 4.0), (0.7, 0.0))

    def run(ss_source, ms_source):
        config = sk.Config(
            num_streams=6,
            num_stokes=3,
            multiple_scatter_source=ms_source,
            single_scatter_source=ss_source,
            num_singlescatter_moments=6,
        )
        geometry = sk.Geometry1D(
            cos_sza=0.6, solar_azimuth=0.0,
            earth_radius_m=6372000.0 * 1000,
            altitude_grid_m=alts,
            geometry_type=sk.GeometryType.PlaneParallel,
        )
        viewing = sk.ViewingGeometry()
        for mu, azi in rays:
            viewing.add_ray(sk.GroundViewingSolar(0.6, azi, mu, 200000.0))
        engine = sk.Engine(config, geometry, viewing)
        atmo = _thin_rayleigh_atmo(geometry, config)
        return engine.calculate_radiance(atmo)["radiance"].to_numpy()[0]

    r_do = run(sk.SingleScatterSource.DiscreteOrdinates,
               sk.MultipleScatterSource.DiscreteOrdinates)
    r_ex = run(sk.SingleScatterSource.Exact,
               sk.MultipleScatterSource.NoSource)
    # I, Q and (where nonzero) U to 2%; U = 0 rays stay zero
    np.testing.assert_allclose(r_ex[:, 0], r_do[:, 0], rtol=2e-2)
    np.testing.assert_allclose(r_ex[:, 1], r_do[:, 1], rtol=2e-2)
    nz = np.abs(r_do[:, 2]) > 1e-12
    np.testing.assert_allclose(r_ex[nz, 2], r_do[nz, 2], rtol=2e-2)
    assert np.all(np.abs(r_ex[~nz, 2]) < 1e-12)


def test_polarized_limb_rayleigh_90deg():
    """Limb single scatter with the sun perpendicular to the LOS
    (cos_sza=0, relazi=90 deg): every point on the straight ray scatters at
    90 deg. For pure Rayleigh (depolarization 0) the scattered light is
    fully polarized; in the tangent-point meridian basis Q/I = +1, U = 0."""
    config = sk.Config(
        num_stokes=3,
        multiple_scatter_source=sk.MultipleScatterSource.NoSource,
        single_scatter_source=sk.SingleScatterSource.Exact,
        num_singlescatter_moments=4,
    )
    alts = np.linspace(0, 60000, 31)
    geometry = sk.Geometry1D(
        cos_sza=0.0, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=alts,
        geometry_type=sk.GeometryType.Spherical,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(
        sk.TangentAltitudeSolar(25000.0, np.pi / 2, 200000.0, 0.0)
    )
    # control ray in the solar plane: U must vanish
    viewing.add_ray(sk.TangentAltitudeSolar(25000.0, 0.0, 200000.0, 0.3))
    engine = sk.Engine(config, geometry, viewing)
    atmo = _thin_rayleigh_atmo(geometry, config, ssa=1.0)
    rad = engine.calculate_radiance(atmo)["radiance"].to_numpy()[0]
    i0, q0, u0 = rad[0]
    assert i0 > 0
    np.testing.assert_allclose(q0 / i0, 1.0, atol=5e-3)
    assert abs(u0 / i0) < 1e-10
    assert abs(rad[1, 2] / rad[1, 0]) < 1e-10


def test_polarized_ss_exact_wf_extinction():
    """Autodiff WFs through the polarized exact-SS path vs finite
    differences."""
    config = sk.Config(
        num_stokes=3,
        multiple_scatter_source=sk.MultipleScatterSource.NoSource,
        single_scatter_source=sk.SingleScatterSource.Exact,
        num_singlescatter_moments=4,
    )
    alts = np.linspace(0, 60000, 11)
    geometry = sk.Geometry1D(
        cos_sza=0.4, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=alts,
        geometry_type=sk.GeometryType.Spherical,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.4, 0.9, 0.7, 200000.0))
    viewing.add_ray(sk.TangentAltitudeSolar(20000.0, 2.0, 200000.0, 0.45))
    engine = sk.Engine(config, geometry, viewing)
    atmo = sk.Atmosphere(geometry, config, numwavel=1)
    atmo.storage.total_extinction[:] = (7e-5 * np.exp(-alts / 7000))[:, None]
    atmo.storage.ssa[:] = 0.85
    atmo.leg_coeff.a1[0] = 1.0
    atmo.leg_coeff.a1[2] = 0.5
    atmo.leg_coeff.a2[2] = 3.0
    atmo.leg_coeff.b1[2] = np.sqrt(6.0) / 2
    atmo.surface.albedo[:] = 0.3
    ds = numeric_wf(
        atmo.storage.total_extinction[:, 0], 0.001, engine, atmo,
        "wf_extinction",
    )
    validate_wf(ds["wf_extinction"], ds["wf_extinction_numeric"],
                wf_dim="altitude", decimal=5)


def test_polarized_wf_extinction():
    config, geometry, viewing = _setup()
    engine = sk.Engine(config, geometry, viewing)
    atmo = sk.Atmosphere(geometry, config, numwavel=1)
    alts = np.linspace(0, 60000, 13)
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
