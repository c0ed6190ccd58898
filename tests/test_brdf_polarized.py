"""Polarized (I, Q, U) BRDF surfaces: the scalar kernel couples into the
(1,1) = I-I block of the polarized surface operator (reference NSTOKES-
templated surface, ``cpp/include/sasktran2/atmosphere/surface.h:246-617``).
Previously the polarized engine route was Lambertian-only.
"""

import numpy as np

import sasktran2_tpu as sk
from sasktran2_tpu.climatology import add_us76_standard_atmosphere


def _engine(nstr=4):
    config = sk.Config(
        num_streams=nstr,
        num_stokes=3,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
        num_singlescatter_moments=nstr,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 40000, 11),
        geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, 0.7, 0.85, 2e5))
    return sk.Engine(config, geometry, viewing), config, geometry


def _atmo(config, geometry, surface):
    atmo = sk.Atmosphere(geometry, config, wavelengths_nm=np.array([550.0]))
    add_us76_standard_atmosphere(atmo)
    atmo["rayleigh"] = sk.constituent.Rayleigh()
    atmo["surface"] = surface
    return atmo


def test_polarized_modis_radiance_physical():
    engine, config, geometry = _engine()
    out = engine.calculate_radiance(
        _atmo(config, geometry, sk.constituent.MODIS(0.25, 0.15, 0.05))
    )
    rad = out["radiance"].to_numpy()
    assert rad.shape == (1, 1, 3)
    assert np.isfinite(rad).all()
    assert rad[0, 0, 0] > 0
    # the Rayleigh sky stays polarized over a scalar-reflecting surface
    dolp = np.hypot(rad[0, 0, 1], rad[0, 0, 2]) / rad[0, 0, 0]
    assert 0.005 < dolp < 1.0


def test_polarized_modis_lambertian_limit():
    """A MODIS surface with zero volumetric/geometric weights IS a
    Lambertian surface of the same isotropic weight — all Stokes
    components must agree with the Lambertian engine run."""
    engine, config, geometry = _engine()
    out_modis = engine.calculate_radiance(
        _atmo(config, geometry, sk.constituent.MODIS(0.3, 0.0, 0.0))
    )
    engine2, config2, geometry2 = _engine()
    out_lamb = engine2.calculate_radiance(
        _atmo(config2, geometry2, sk.constituent.LambertianSurface(0.3))
    )
    np.testing.assert_allclose(
        out_modis["radiance"].to_numpy(),
        out_lamb["radiance"].to_numpy(),
        rtol=1e-8, atol=1e-12,
    )


def test_polarized_modis_wf_vs_fd():
    """Polarized MODIS kernel-weight WF vs central finite differences,
    on every Stokes component (VERDICT round-3 'done' criterion)."""
    engine, config, geometry = _engine()

    def run(f_vol):
        return engine.calculate_radiance(
            _atmo(config, geometry,
                  sk.constituent.MODIS(0.25, f_vol, 0.05))
        )

    base = run(0.15)
    analytic = base["wf_surface_volumetric"].to_numpy()[0, 0]  # [stokes]
    h = 4e-3
    up = run(0.15 + h)["radiance"].to_numpy()
    dn = run(0.15 - h)["radiance"].to_numpy()
    numeric = (up - dn)[0, 0] / (2 * h)
    np.testing.assert_allclose(analytic, numeric, rtol=1e-4, atol=1e-10)
