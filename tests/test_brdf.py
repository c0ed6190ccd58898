"""BRDF azimuth-expansion ground coupling in the DO solver."""

import numpy as np
import jax.numpy as jnp

from sasktran2_tpu.rt import disco
from sasktran2_tpu.rt.brdf import (
    LambertianKernel,
    MODISKernel,
    SnowKokhanovskyKernel,
)


def _solve(albedo=0.3, brdf=None, brdf_args=None, dtau_val=1e-4,
           user_azi=0.4, mu_u=0.75, mu0=0.6, nstr=8):
    """Single thin layer: radiance ~ direct ground reflection."""
    P, L = 2, 4
    dtau = jnp.full((1, P), dtau_val)
    omega = jnp.full((1, P), 0.5)
    beta = jnp.zeros((1, P, L)).at[..., 0].set(1.0)
    tables = disco.build_mode_tables(nstr, L, mu0, np.array([mu_u]),
                                     num_azimuth=nstr)
    kwargs = {}
    if brdf is not None:
        kwargs = {"brdf": brdf, "brdf_args": jnp.asarray([brdf_args])}
    return float(
        disco.solve_plane_parallel(
            dtau, omega, beta, jnp.asarray([albedo]), tables,
            np.array([True]), np.array([user_azi]),
            **kwargs,
        )[0, 0]
    )


def test_lambertian_kernel_matches_builtin():
    """The Lambertian kernel through the general BRDF path must match the
    built-in Lambertian rank-one operator."""
    r_builtin = _solve(albedo=0.4)
    r_kernel = _solve(albedo=0.4, brdf=LambertianKernel(),
                      brdf_args=[0.4])
    np.testing.assert_allclose(r_kernel, r_builtin, rtol=1e-10)


def test_modis_direct_reflection_limit():
    """Nearly-transparent atmosphere: radiance -> mu0 * rho(mu_v, mu0, dphi)
    (the direct beam reflecting once off the surface)."""
    mu_u, mu0, azi = 0.75, 0.6, 0.9
    args = [0.3, 0.15, 0.05]
    r = _solve(brdf=MODISKernel(), brdf_args=args, dtau_val=1e-7,
               user_azi=azi, mu_u=mu_u, mu0=mu0, nstr=16)
    # the mode synthesis reconstructs the kernel at the ray's geometric
    # relative azimuth (see the convention pinning in disco.py)
    kern = MODISKernel().kernel(
        jnp.asarray([[[mu_u]]]), jnp.asarray([[[mu0]]]),
        jnp.asarray([[[azi]]]), jnp.asarray([args]),
    )
    expected = mu0 * float(kern[0, 0, 0, 0])
    np.testing.assert_allclose(r, expected, rtol=2e-3)


def test_kokhanovsky_bounded_and_positive():
    r = _solve(brdf=SnowKokhanovskyKernel(), brdf_args=[1e-6],
               dtau_val=1e-6, nstr=8)
    # snow: bright surface, reflectance-like radiance below ~mu0
    assert 0.1 < r < 1.0
    # stronger absorption -> darker
    r2 = _solve(brdf=SnowKokhanovskyKernel(), brdf_args=[1e-4],
                dtau_val=1e-6, nstr=8)
    assert r2 < r


def test_modis_engine_wf():
    """MODIS surface through the engine with kernel-weight WFs vs FD."""
    import sasktran2_tpu as sk
    from sasktran2_tpu.climatology import add_us76_standard_atmosphere

    config = sk.Config(
        num_streams=8,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
        num_singlescatter_moments=8,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 40000, 11),
        geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, 0.7, 0.85, 2e5))
    engine = sk.Engine(config, geometry, viewing)

    def make_atmo(f_vol):
        atmo = sk.Atmosphere(geometry, config,
                             wavelengths_nm=np.array([550.0]))
        add_us76_standard_atmosphere(atmo)
        atmo["rayleigh"] = sk.constituent.Rayleigh()
        atmo["surface"] = sk.constituent.MODIS(0.25, f_vol, 0.05)
        return atmo

    base = engine.calculate_radiance(make_atmo(0.15))
    analytic = base["wf_surface_volumetric"].to_numpy()[0, 0, 0]
    # radiance is nearly linear in the kernel weight, so a large step
    # suppresses the ~1e-11 absolute roundoff noise of each solve without
    # incurring truncation error (probed: error 8e-7 at h=4e-3)
    h = 4e-3
    up = engine.calculate_radiance(make_atmo(0.15 + h))["radiance"].to_numpy()
    dn = engine.calculate_radiance(make_atmo(0.15 - h))["radiance"].to_numpy()
    numeric = (up - dn)[0, 0, 0] / (2 * h)
    np.testing.assert_allclose(analytic, numeric, rtol=1e-5)


def test_weighted_brdf_engine():
    """WeightedBRDF: 1.0x(Lambertian 0.3) through the weighted path equals
    the plain Lambertian surface, and weight/member WFs match FD
    (reference surface.h:99 WeightedBRDF — declared but unimplemented
    there; functional here)."""
    import sasktran2_tpu as sk
    from sasktran2_tpu.climatology import add_us76_standard_atmosphere

    config = sk.Config(
        num_streams=4,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
        num_singlescatter_moments=4,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 40000, 9),
        geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, 0.7, 0.85, 2e5))
    engine = sk.Engine(config, geometry, viewing)

    def make_atmo(surface):
        atmo = sk.Atmosphere(geometry, config,
                             wavelengths_nm=np.array([550.0]))
        add_us76_standard_atmosphere(atmo)
        atmo["rayleigh"] = sk.constituent.Rayleigh()
        atmo["surface"] = surface
        return atmo

    r_plain = engine.calculate_radiance(
        make_atmo(sk.constituent.LambertianSurface(0.3))
    )["radiance"].to_numpy()

    def weighted(w_lam, w_modis=0.0):
        members = {"lam": (sk.constituent.LambertianSurface(0.3), w_lam)}
        if w_modis:
            members["modis"] = (
                sk.constituent.MODIS(0.25, 0.15, 0.05), w_modis
            )
        return engine.calculate_radiance(
            make_atmo(sk.constituent.WeightedBRDF(members))
        )

    out_w = weighted(1.0)
    np.testing.assert_allclose(
        out_w["radiance"].to_numpy(), r_plain, rtol=1e-8
    )

    # mixture WF vs FD on the Lambertian weight
    out_mix = weighted(0.6, 0.4)
    analytic = out_mix["wf_surface_lam_weight"].to_numpy()[0, 0, 0]
    h = 4e-3
    up = weighted(0.6 + h, 0.4)["radiance"].to_numpy()
    dn = weighted(0.6 - h, 0.4)["radiance"].to_numpy()
    np.testing.assert_allclose(
        analytic, (up - dn)[0, 0, 0] / (2 * h), rtol=1e-4
    )
    # member-parameter WF (MODIS volumetric through the mixture) vs FD
    an_vol = out_mix["wf_surface_modis_volumetric"].to_numpy()[0, 0, 0]

    def mix_vol(f_vol):
        return engine.calculate_radiance(make_atmo(
            sk.constituent.WeightedBRDF({
                "lam": (sk.constituent.LambertianSurface(0.3), 0.6),
                "modis": (sk.constituent.MODIS(0.25, f_vol, 0.05), 0.4),
            })
        ))["radiance"].to_numpy()

    fd_vol = (mix_vol(0.15 + h) - mix_vol(0.15 - h))[0, 0, 0] / (2 * h)
    np.testing.assert_allclose(an_vol, fd_vol, rtol=1e-4)


def test_brdf_engine_fast_path_matches_generic():
    """Scalar BRDF ground/nadir groups now ride the wavelength-minor
    N-stream fast path (shared azimuth-moment quadrature); parity with
    the generic per-wavelength route, including the kernel-weight WF."""
    import sasktran2_tpu as sk
    from sasktran2_tpu.climatology import add_us76_standard_atmosphere

    config = sk.Config(
        num_streams=4,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
        num_singlescatter_moments=4,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 40000, 11),
        geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, 0.7, 0.85, 2e5))
    viewing.add_ray(sk.GroundViewingSolar(0.6, 1.9, 0.45, 2e5))

    def run(force_generic):
        engine = sk.Engine(config, geometry, viewing)
        if force_generic:
            engine._twostream_fast_ok = lambda: False
        atmo = sk.Atmosphere(geometry, config,
                             wavelengths_nm=np.array([450.0, 550.0]))
        add_us76_standard_atmosphere(atmo)
        atmo["rayleigh"] = sk.constituent.Rayleigh()
        atmo["surface"] = sk.constituent.MODIS(0.25, 0.15, 0.05)
        out = engine.calculate_radiance(atmo)
        if not force_generic:
            assert engine._twostream_fast_ok()
        return out

    out_fast = run(False)
    out_gen = run(True)
    for key in out_gen.keys():
        a = out_fast[key].to_numpy()
        b = out_gen[key].to_numpy()
        np.testing.assert_allclose(
            a, b, rtol=1e-6, atol=1e-4 * np.abs(b).max(), err_msg=key,
        )
