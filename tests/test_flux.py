"""Flux outputs: energy conservation and finite-difference WFs."""

import numpy as np

import sasktran2_tpu as sk
from sasktran2_tpu.test_util import default_pure_scattering_atmosphere


def _setup(albedo=0.0, ssa=1.0):
    config = sk.Config(
        num_streams=8,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
        num_singlescatter_moments=8,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 60000, 31),
        geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, 0.0, 0.8, 200000.0))
    for alt in (0.0, 10000.0, 60000.0):
        viewing.add_flux_observer(sk.FluxObserverSolar(0.6, alt))
    engine = sk.Engine(config, geometry, viewing)
    atmo = default_pure_scattering_atmosphere(
        config, geometry, ssa=ssa, albedo=albedo
    )
    return engine, atmo


def test_flux_energy_conservation():
    """Conservative scattering, black surface: net flux (down - up) at TOA
    equals the absorbed-at-ground flux; with ssa=1 and albedo=0 the net
    downward flux is constant... simplest strong check: at TOA,
    F_dn = mu0 (direct only), and F_dn - F_up must equal the flux absorbed
    by the ground = F_dn(ground) * (1 - albedo)."""
    engine, atmo = _setup(albedo=0.0, ssa=1.0)
    out = engine.calculate_radiance(atmo)
    f_up = out["upwelling_flux"].to_numpy()[0]
    f_dn = out["downwelling_flux"].to_numpy()[0]
    # observers: ground, 10km, TOA
    mu0 = 0.6
    # TOA downwelling = direct beam only
    np.testing.assert_allclose(f_dn[2], mu0, rtol=1e-8)
    # conservative atmosphere + black ground: net flux is height-independent
    net = f_dn - f_up
    np.testing.assert_allclose(net, net[0], rtol=2e-4)


def test_flux_reflective_surface():
    """With albedo=1 and no absorption, the ground absorbs nothing: net flux
    ~ 0 everywhere."""
    engine, atmo = _setup(albedo=1.0, ssa=1.0)
    out = engine.calculate_radiance(atmo)
    f_up = out["upwelling_flux"].to_numpy()[0]
    f_dn = out["downwelling_flux"].to_numpy()[0]
    np.testing.assert_allclose(f_up, f_dn, rtol=2e-3)


def test_flux_wf_albedo():
    """Flux WFs vs finite differences for the surface albedo."""
    engine, atmo = _setup(albedo=0.3, ssa=0.9)
    base = engine.calculate_radiance(atmo)
    analytic = base["wf_albedo_upwelling_flux"].to_numpy()
    h = 1e-4
    atmo.surface.albedo[:] = 0.3 + h
    above = engine.calculate_radiance(atmo)["upwelling_flux"].to_numpy()
    atmo.surface.albedo[:] = 0.3 - h
    below = engine.calculate_radiance(atmo)["upwelling_flux"].to_numpy()
    numeric = (above - below) / (2 * h)
    np.testing.assert_allclose(analytic, numeric, rtol=1e-5, atol=1e-12)


def test_flux_divergence_energy_conservation():
    """Divergence flux type: k_abs * F_actinic must equal d(F_dn - F_up)/dz
    (energy conservation).  The reference declares FluxType.divergence but
    has no native implementation; ours is defined as the absorbed power
    density and validated against the net-flux derivative."""
    config = sk.Config(
        num_streams=8,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
        num_singlescatter_moments=8,
        flux_types=(
            sk.FluxType.Upwelling,
            sk.FluxType.Downwelling,
            sk.FluxType.Actinic,
            sk.FluxType.Divergence,
        ),
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 60000, 61),
        geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, 0.0, 0.8, 200000.0))
    z0, dz = 20000.0, 1000.0
    for alt in (z0 - dz, z0, z0 + dz):
        viewing.add_flux_observer(sk.FluxObserverSolar(0.6, alt))
    engine = sk.Engine(config, geometry, viewing)
    atmo = default_pure_scattering_atmosphere(
        config, geometry, ssa=0.7, albedo=0.3
    )
    out = engine.calculate_radiance(atmo)
    f_up = out["upwelling_flux"].to_numpy()[0]
    f_dn = out["downwelling_flux"].to_numpy()[0]
    f_div = out["divergence_flux"].to_numpy()[0]
    net = f_dn - f_up
    dnet_dz = (net[2] - net[0]) / (2 * dz)
    assert f_div[1] > 0
    np.testing.assert_allclose(f_div[1], dnet_dz, rtol=2e-2)


def test_flux_fast_path_matches_generic():
    """The wavelength-minor flux path (solve_nstream_m0_levels) reproduces
    the generic per-wavelength flux assembly, including flux WFs."""
    engine, atmo = _setup(albedo=0.3, ssa=0.9)
    assert engine._twostream_fast_ok()
    out_fast = engine.calculate_radiance(atmo)

    engine._twostream_fast_ok = lambda: False
    engine._compute_jit = None
    out_gen = engine.calculate_radiance(atmo)
    for key in out_gen.keys():
        a = out_fast[key].to_numpy()
        b = out_gen[key].to_numpy()
        # formulation-difference bound (see tests/test_twostream.py)
        np.testing.assert_allclose(
            a, b, rtol=1e-6, atol=1e-4 * np.abs(b).max(), err_msg=key,
        )
