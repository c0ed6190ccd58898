"""Limb-viewing multiple scatter: the DO source evaluated along spherical
rays must reproduce plane-parallel postprocessing in the large-Earth limit,
and limb weighting functions must match finite differences."""

import numpy as np
import jax.numpy as jnp

import sasktran2_tpu as sk
from sasktran2_tpu.rt import disco, do_source
from sasktran2_tpu.rt.raytrace import trace_spherical
from sasktran2_tpu.rt.singlescatter import integrate_od_source
from sasktran2_tpu.test_util import default_pure_scattering_atmosphere
from sasktran2_tpu.test_util.wf import numeric_wf, validate_wf


def test_ms_source_along_ray_matches_pp_postprocess():
    """Up-looking ray in a quasi-plane-parallel (huge Earth) atmosphere:
    integrating the DO source along the traced ray must equal the DO
    plane-parallel postprocessed downwelling radiance."""
    nstr, mu0, P = 8, 0.6, 20
    alts = np.linspace(0, 100000, P + 1)
    re = 6.372e9  # 1000x Earth: spherical -> plane-parallel limit

    ext_levels = 7e-5 * np.exp(-alts / 7000.0)
    ssa = 0.9
    W = 1
    ext = jnp.asarray(ext_levels)[None, :]
    ssa_arr = jnp.full((W, P + 1), ssa)
    L = nstr
    leg = jnp.zeros((W, P + 1, L)).at[..., 0].set(1.0).at[..., 2].set(0.5)

    # layer quantities (reuse engine logic by hand)
    dz = np.diff(alts)
    k_avg = 0.5 * (ext_levels[:-1] + ext_levels[1:])
    dtau = jnp.asarray((k_avg * dz)[::-1])[None, :]
    omega = jnp.full((W, P), ssa)
    beta = jnp.zeros((W, P, L)).at[..., 0].set(1.0).at[..., 2].set(0.5)

    mu_u = 0.6
    relazi = 0.7
    tables = disco.build_mode_tables(nstr, L, mu0, np.array([mu_u]))

    rad_pp, internal = disco.solve_plane_parallel(
        dtau, omega, beta, jnp.asarray([0.3]), tables,
        np.array([False]), np.array([relazi]),
        include_ss=True, return_internal=True,
    )

    ray = sk.SolarAnglesObserverLocation(
        cos_sza=mu0, relative_azimuth=relazi,
        cos_viewing_zenith=+mu_u, observer_altitude_m=0.0,
    )
    traced = trace_spherical(alts, re, mu0, [ray])
    ray_tables = do_source.build_ray_angular_tables(traced, L, nstr)
    j_in, j_out = do_source.ms_source_along_rays(
        internal, traced, ray_tables, include_ss=True
    )
    rad_ray = integrate_od_source(ext, j_in, j_out, traced)

    np.testing.assert_allclose(
        float(rad_ray[0, 0]), float(rad_pp[0, 0]), rtol=5e-3
    )


def _limb_setup(nstr=4, tangents=(10000.0, 20000.0, 30000.0)):
    config = sk.Config(
        num_streams=nstr,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.Exact,
        num_singlescatter_moments=4,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6,
        solar_azimuth=0.0,
        earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 100000, 21),
        geometry_type=sk.GeometryType.Spherical,
    )
    viewing = sk.ViewingGeometry()
    for t in tangents:
        viewing.add_ray(sk.TangentAltitudeSolar(
            tangent_altitude_m=t, relative_azimuth=0.3,
            observer_altitude_m=200000.0, cos_sza=0.6,
        ))
    return config, geometry, viewing


def test_limb_radiance_physical():
    config, geometry, viewing = _limb_setup()
    engine = sk.Engine(config, geometry, viewing)
    atmo = default_pure_scattering_atmosphere(config, geometry, ssa=0.9,
                                              albedo=0.3)
    out = engine.calculate_radiance(atmo)
    rad = out["radiance"].to_numpy()[0, :, 0]
    assert np.all(rad > 0)
    assert np.all(np.isfinite(rad))
    # higher tangent altitude -> less airmass -> dimmer limb
    assert rad[0] > rad[1] > rad[2]

    # multiple scatter must increase radiance vs single-scatter only
    config_ss = sk.Config(
        num_streams=4,
        multiple_scatter_source=sk.MultipleScatterSource.NoSource,
        single_scatter_source=sk.SingleScatterSource.Exact,
        num_singlescatter_moments=4,
    )
    e_ss = sk.Engine(config_ss, geometry, viewing)
    atmo2 = default_pure_scattering_atmosphere(config_ss, geometry, ssa=0.9,
                                               albedo=0.3)
    rad_ss = e_ss.calculate_radiance(atmo2)["radiance"].to_numpy()[0, :, 0]
    assert np.all(rad > rad_ss)


def test_limb_wf_extinction_vs_numeric():
    config, geometry, viewing = _limb_setup(tangents=(15000.0, 25000.0))
    engine = sk.Engine(config, geometry, viewing)
    atmo = default_pure_scattering_atmosphere(config, geometry, ssa=0.9,
                                              albedo=0.3)
    ds = numeric_wf(
        atmo.storage.total_extinction[:, 0], 0.001, engine, atmo,
        "wf_extinction",
    )
    validate_wf(ds["wf_extinction"], ds["wf_extinction_numeric"],
                wf_dim="altitude", decimal=5)


def test_limb_sza_grid_consistent():
    """num_do_sza > 1 must agree with the single-SZA solve when the SZA
    varies little, and produce finite physical output when it varies a lot."""
    config, geometry, viewing = _limb_setup(tangents=(15000.0, 25000.0))
    atmo_args = dict(ssa=0.9, albedo=0.3)
    e1 = sk.Engine(config, geometry, viewing)
    a1 = default_pure_scattering_atmosphere(config, geometry, **atmo_args)
    r1 = e1.calculate_radiance(a1)["radiance"].to_numpy()[0, :, 0]

    import dataclasses
    c2 = dataclasses.replace(config, num_do_sza=4)
    e2 = sk.Engine(c2, geometry, viewing)
    a2 = default_pure_scattering_atmosphere(c2, geometry, **atmo_args)
    r2 = e2.calculate_radiance(a2)["radiance"].to_numpy()[0, :, 0]
    # the SZA range across these rays is modest; fields agree to ~1%
    np.testing.assert_allclose(r2, r1, rtol=2e-2)
    assert np.all(np.isfinite(r2))


def test_limb_pt_wf_finite_and_matches_fd():
    """Regression: padded limb-ray boundaries used to produce NaN in the
    backward pass of the boundary-phase safe division, wiping out every
    pressure/temperature weighting function (autodiff-unsafe
    ``maximum(x, 1e-300)`` guard)."""
    import sasktran2_tpu as sk

    alts = np.arange(0, 65001, 2500.0)
    config = sk.Config(
        num_streams=2,
        single_scatter_source=sk.SingleScatterSource.Exact,
        multiple_scatter_source=sk.MultipleScatterSource.NoSource,
        num_singlescatter_moments=4,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=alts, geometry_type=sk.GeometryType.Spherical,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.TangentAltitudeSolar(
        tangent_altitude_m=15000.0, relative_azimuth=0.3,
        observer_altitude_m=200000.0, cos_sza=0.6,
    ))

    def run(dp):
        atmo = sk.Atmosphere(
            geometry, config, wavelengths_nm=np.array([450.0])
        )
        sk.climatology.us76.add_us76_standard_atmosphere(atmo)
        atmo.pressure_pa[6] += dp
        atmo["rayleigh"] = sk.constituent.Rayleigh()
        return sk.Engine(config, geometry, viewing).calculate_radiance(atmo)

    out = run(0.0)
    wf_p = out["wf_rayleigh_pressure_pa"].to_numpy()
    wf_t = out["wf_rayleigh_temperature_k"].to_numpy()
    assert np.all(np.isfinite(wf_p))
    assert np.all(np.isfinite(wf_t))
    h = 50.0
    fd = (
        run(h)["radiance"].to_numpy()[0, 0, 0]
        - run(-h)["radiance"].to_numpy()[0, 0, 0]
    ) / (2 * h)
    np.testing.assert_allclose(wf_p.squeeze()[6], fd, rtol=1e-4)
