"""Polarized (I, Q, U) multiple scatter along limb rays.

Validation strategy (reference: polarized interpolated DO source,
``/root/reference/cpp/lib/sktran_disco/source_term/do_source_diffuse_storage.cpp``
NSTOKES=3):

1. The vector DO source evaluated along a traced (non-limb) ray and
   integrated must reproduce the Coulson-pinned plane-parallel user-angle
   postprocessing in the plane-parallel limit — this pins the magnitude and
   the Q/U sign conventions of the ray-source machinery.
2. With all polarizing greek coefficients zero the polarized limb engine
   must agree with the scalar limb engine exactly.
3. Mirroring the sun about the ray plane flips U and preserves I, Q.
"""

import numpy as np
import pytest

import sasktran2_tpu as sk


def _layer_optical(alts, ext, ssa, *legs):
    """Replicates Engine._layer_optical for [A] inputs and [A, L] greeks."""
    dz = alts[1:] - alts[:-1]
    k_lo, k_hi = ext[:-1], ext[1:]
    ks_lo, ks_hi = k_lo * ssa[:-1], k_hi * ssa[1:]
    k_avg = 0.5 * (k_lo + k_hi)
    ks_avg = 0.5 * (ks_lo + ks_hi)
    dtau = (k_avg * dz)[::-1]
    omega = (ks_avg / k_avg)[::-1]
    out = []
    for lc in legs:
        beta = 0.5 * (lc[:-1] * ks_lo[:, None] + lc[1:] * ks_hi[:, None])
        out.append((beta / ks_avg[:, None])[::-1])
    return dtau, omega, out


def test_vector_ray_source_matches_pp_postprocessing():
    """Integrate the polarized DO source along a traced slant ray (huge
    earth radius -> plane-parallel limit) and compare against the
    plane-parallel user-angle postprocessing for the same direction."""
    import jax
    import jax.numpy as jnp

    from sasktran2_tpu.rt import disco_vec, do_source
    from sasktran2_tpu.rt.raytrace import trace_spherical
    from sasktran2_tpu.rt.singlescatter import integrate_od_source
    from sasktran2_tpu.viewinggeo import SolarAnglesObserverLocation

    alts = np.linspace(0.0, 60000.0, 21)
    nstr, L = 6, 6
    mu0, mu_u, azi = 0.6, 0.7, 1.2

    # upward-looking ground observer: downwelling radiance, no ground hit
    ray = SolarAnglesObserverLocation(
        cos_sza=mu0, relative_azimuth=azi, cos_viewing_zenith=mu_u,
        observer_altitude_m=0.0,
    )
    re = 6372000.0 * 2000.0  # plane-parallel limit
    traced = trace_spherical(alts, re, mu0, [ray])

    # polarizing atmosphere (Rayleigh-like greeks, strong scattering)
    ext = 7e-5 * np.exp(-alts / 10000.0)
    ssa = np.full_like(ext, 0.9)
    a1 = np.zeros((len(alts), L)); a1[:, 0] = 1.0; a1[:, 2] = 0.5
    a2 = np.zeros_like(a1); a2[:, 2] = 3.0
    a3 = np.zeros_like(a1)
    b1 = np.zeros_like(a1); b1[:, 2] = np.sqrt(6.0) / 2.0
    dtau, omega, (la1, la2, la3, lb1) = _layer_optical(
        alts, ext, ssa, a1, a2, a3, b1
    )
    args = [jnp.asarray(v)[None] for v in (dtau, omega, la1, la2, la3, lb1)]
    albedo = jnp.zeros((1,))

    tables = disco_vec.build_vector_mode_tables(
        nstr, L, mu0, np.array([mu_u]), num_azimuth=nstr
    )
    with jax.default_matmul_precision("highest"):
        rad_pp, internal = disco_vec.solve_plane_parallel_vector(
            *args, albedo, tables,
            np.array([False]), np.array([azi]),
            include_ss=True, return_internal=True,
        )
        vtab = do_source.build_ray_vector_tables(traced, L, nstr)
        ji, jo = do_source.ms_source_along_rays_vec(
            internal, traced, vtab, include_ss=True
        )
        extj = jnp.asarray(ext)[None]
        rad_ray = jax.vmap(
            lambda a, b: integrate_od_source(extj, a, b, traced),
            in_axes=-1, out_axes=-1,
        )(ji, jo)

    rad_pp = np.asarray(rad_pp)[0, 0]    # [3]
    rad_ray = np.asarray(rad_ray)[0, 0]  # [3]
    assert abs(rad_pp[2]) > 1e-5  # geometry really produces U
    # layer-discretization-level agreement (the ray integration uses the
    # endpoint-blended source model, the PP solve is analytic per layer)
    np.testing.assert_allclose(rad_ray, rad_pp, rtol=2e-2, atol=1e-8)


def _limb_setup(num_stokes, relazi=1.0, cos_sza=0.3, num_stk_moments=4):
    # nstr=4 / 12 levels: these are qualitative consistency tests (scalar
    # equivalence, physicality) — resolution chosen for compile time, not
    # convergence (round-3 suite-time reduction)
    config = sk.Config(
        num_streams=4,
        num_stokes=num_stokes,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.Exact,
        num_singlescatter_moments=num_stk_moments,
        num_do_sza=2,
    )
    alts = np.linspace(0, 60000, 12)
    geometry = sk.Geometry1D(
        cos_sza=cos_sza, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=alts,
        geometry_type=sk.GeometryType.Spherical,
    )
    viewing = sk.ViewingGeometry()
    for talt in (15000.0, 30000.0):
        viewing.add_ray(
            sk.TangentAltitudeSolar(talt, relazi, 200000.0, cos_sza)
        )
    return config, geometry, viewing, alts


def test_polarized_limb_scalar_consistency():
    """With a2 = a3 = b1 = 0 polarization never gets sourced: the polarized
    limb multiple-scatter I must equal the scalar result and Q = U = 0."""
    outs = {}
    for ns in (1, 3):
        config, geometry, viewing, alts = _limb_setup(ns)
        engine = sk.Engine(config, geometry, viewing)
        atmo = sk.Atmosphere(geometry, config, numwavel=1,
                             calculate_derivatives=False)
        atmo.storage.total_extinction[:] = (
            7e-5 * np.exp(-alts / 8000.0)
        )[:, None]
        atmo.storage.ssa[:] = 0.8
        atmo.leg_coeff.a1[0] = 1.0
        atmo.leg_coeff.a1[2] = 0.5
        atmo.surface.albedo[:] = 0.3
        outs[ns] = engine.calculate_radiance(atmo)["radiance"].to_numpy()
    scalar_i = outs[1][0, :, 0]
    pol = outs[3][0]
    np.testing.assert_allclose(pol[:, 0], scalar_i, rtol=1e-8)
    assert np.all(np.abs(pol[:, 1:]) < 1e-12 * np.abs(pol[:, :1]) + 1e-14)


def test_polarized_limb_rayleigh_ms():
    """Full Rayleigh polarized limb: MS changes I and the polarization
    state relative to single scatter alone; results stay physical."""
    config, geometry, viewing, alts = _limb_setup(3)
    engine = sk.Engine(config, geometry, viewing)
    atmo = sk.Atmosphere(geometry, config, wavelengths_nm=np.array([450.0]))
    atmo.pressure_pa = 101325 * np.exp(-alts / 7500)
    atmo.temperature_k = np.full(len(alts), 250.0)
    atmo["rayleigh"] = sk.constituent.Rayleigh()
    atmo["surface"] = sk.constituent.LambertianSurface(0.3)
    out = engine.calculate_radiance(atmo)["radiance"].to_numpy()[0]

    config2, geometry2, viewing2, _ = _limb_setup(3)
    config2.multiple_scatter_source = sk.MultipleScatterSource.NoSource
    engine2 = sk.Engine(config2, geometry2, viewing2)
    out_ss = engine2.calculate_radiance(atmo)["radiance"].to_numpy()[0]

    assert np.all(out[:, 0] > out_ss[:, 0])  # MS adds radiance
    dolp = np.sqrt(out[:, 1] ** 2 + out[:, 2] ** 2) / out[:, 0]
    assert np.all(dolp > 0.0)
    assert np.all(dolp < 1.0)
    # MS is depolarizing relative to pure single scatter
    dolp_ss = np.sqrt(out_ss[:, 1] ** 2 + out_ss[:, 2] ** 2) / out_ss[:, 0]
    assert np.all(dolp < dolp_ss)


def test_polarized_fluxes():
    """Polarized fluxes follow the reference convention (I-component stream
    sums, ``do_source_planeparallel.cpp`` h_lidx = l*NSTOKES): with no
    polarizing greeks they equal the scalar fluxes exactly; with Rayleigh
    polarization they stay close to (but differ from) the scalar result."""
    alts = np.linspace(0, 60000, 21)

    def run(ns, polarizing):
        config = sk.Config(
            num_streams=4,
            num_stokes=ns,
            multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
            single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
            num_singlescatter_moments=4,
            flux_types=[sk.FluxType.Upwelling, sk.FluxType.Downwelling],
        )
        geometry = sk.Geometry1D(
            cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
            altitude_grid_m=alts,
            geometry_type=sk.GeometryType.PlaneParallel,
        )
        viewing = sk.ViewingGeometry()
        viewing.add_ray(sk.GroundViewingSolar(0.6, 0.0, 0.8, 200000.0))
        viewing.add_flux_observer(sk.FluxObserverSolar(0.6, 0.0))
        viewing.add_flux_observer(sk.FluxObserverSolar(0.6, 60000.0))
        engine = sk.Engine(config, geometry, viewing)
        atmo = sk.Atmosphere(geometry, config, numwavel=1,
                             calculate_derivatives=False)
        atmo.storage.total_extinction[:] = (
            7e-5 * np.exp(-alts / 8000.0)
        )[:, None]
        atmo.storage.ssa[:] = 0.9
        atmo.leg_coeff.a1[0] = 1.0
        atmo.leg_coeff.a1[2] = 0.5
        if polarizing and ns == 3:
            atmo.leg_coeff.a2[2] = 3.0
            atmo.leg_coeff.b1[2] = np.sqrt(6.0) / 2.0
        atmo.surface.albedo[:] = 0.3
        out = engine.calculate_radiance(atmo)
        return (
            out["upwelling_flux"].to_numpy()[0],
            out["downwelling_flux"].to_numpy()[0],
        )

    up1, dn1 = run(1, False)
    up3, dn3 = run(3, False)
    np.testing.assert_allclose(up3, up1, rtol=1e-10)
    np.testing.assert_allclose(dn3, dn1, rtol=1e-10)
    # TOA downwelling = direct beam only: mu0 * F0
    np.testing.assert_allclose(dn1[1], 0.6, rtol=1e-10)

    up3p, dn3p = run(3, True)
    assert not np.allclose(up3p, up1, rtol=1e-6)
    np.testing.assert_allclose(up3p, up1, rtol=0.1)
    np.testing.assert_allclose(dn3p, dn1, rtol=0.1)


def test_polarized_limb_u_mirror_symmetry():
    """Mirroring the sun about the ray plane (relazi -> -relazi) flips the
    sign of U and preserves I and Q."""
    outs = {}
    for relazi in (1.0, -1.0):
        config, geometry, viewing, alts = _limb_setup(3, relazi=relazi)
        engine = sk.Engine(config, geometry, viewing)
        atmo = sk.Atmosphere(geometry, config, numwavel=1,
                             calculate_derivatives=False)
        atmo.storage.total_extinction[:] = (
            7e-5 * np.exp(-alts / 8000.0)
        )[:, None]
        atmo.storage.ssa[:] = 0.9
        atmo.leg_coeff.a1[0] = 1.0
        atmo.leg_coeff.a1[2] = 0.5
        atmo.leg_coeff.a2[2] = 3.0
        atmo.leg_coeff.b1[2] = np.sqrt(6.0) / 2.0
        atmo.surface.albedo[:] = 0.0
        outs[relazi] = engine.calculate_radiance(atmo)["radiance"].to_numpy()[0]
    p, m = outs[1.0], outs[-1.0]
    assert np.all(np.abs(p[:, 2]) > 1e-10)
    np.testing.assert_allclose(p[:, 0], m[:, 0], rtol=1e-10)
    np.testing.assert_allclose(p[:, 1], m[:, 1], rtol=1e-10)
    np.testing.assert_allclose(p[:, 2], -m[:, 2], rtol=1e-10)
