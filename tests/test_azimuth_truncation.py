"""Static azimuth-mode truncation (engine analog of the reference's
azimuth convergence early-exit, ``do_source.cpp:47-57``): a Rayleigh
atmosphere (moments l <= 2) at nstr=16 must solve only 3 azimuth modes
with radiance and WFs invariant vs the full 16-mode solve."""

import numpy as np
import pytest

import sasktran2_tpu as sk
from sasktran2_tpu.climatology import add_us76_standard_atmosphere


def _setup(geometry_type, nstr=16):
    config = sk.Config(
        num_streams=nstr,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=(
            sk.SingleScatterSource.Exact
            if geometry_type == sk.GeometryType.Spherical
            else sk.SingleScatterSource.DiscreteOrdinates
        ),
        num_singlescatter_moments=nstr,
        num_do_sza=2 if geometry_type == sk.GeometryType.Spherical else 1,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 60000, 11),
        geometry_type=geometry_type,
    )
    viewing = sk.ViewingGeometry()
    if geometry_type == sk.GeometryType.Spherical:
        for talt in (15000.0, 30000.0):
            viewing.add_ray(sk.TangentAltitudeSolar(talt, 0.4, 2e5, 0.6))
    else:
        viewing.add_ray(sk.GroundViewingSolar(0.6, 0.3, 0.8, 2e5))
        viewing.add_ray(sk.GroundViewingSolar(0.6, 1.1, 0.5, 2e5))
    return config, geometry, viewing


def _run(config, geometry, viewing, forced):
    config.num_forced_azimuth = forced
    engine = sk.Engine(config, geometry, viewing)
    atmo = sk.Atmosphere(
        geometry, config, wavelengths_nm=np.array([350.0, 550.0]),
    )
    add_us76_standard_atmosphere(atmo)
    atmo["rayleigh"] = sk.constituent.Rayleigh()
    atmo["surface"] = sk.constituent.LambertianSurface(0.3)
    out = engine.calculate_radiance(atmo)
    return engine, out


@pytest.mark.parametrize(
    "geometry_type",
    [sk.GeometryType.PlaneParallel, sk.GeometryType.Spherical],
)
def test_truncated_modes_match_full(geometry_type):
    config, geometry, viewing = _setup(geometry_type)
    # automatic: Rayleigh has moments l <= 2 -> 3 modes
    eng_auto, out_auto = _run(config, geometry, viewing, forced=0)
    assert eng_auto._num_azi_eff == 3
    # forced full mode count (truncation disabled)
    eng_full, out_full = _run(config, geometry, viewing, forced=16)
    assert eng_full._num_azi_eff is None
    for key in out_full.keys():
        a = out_auto[key].to_numpy()
        b = out_full[key].to_numpy()
        # modes 3..15 are EXACTLY zero (their kernels and beam sources
        # contract only vanishing moments); the only difference is
        # accumulation order of zeros
        np.testing.assert_allclose(
            a, b, rtol=1e-10, atol=1e-12 * max(np.abs(b).max(), 1e-30),
            err_msg=key,
        )


def test_truncation_respects_higher_moments():
    """An atmosphere with a genuinely anisotropic phase function (moments
    up to l=7) must keep 8 modes — truncation follows the data, not the
    constituent type. Manual storage (no constituents, which would
    rebuild leg_coeff)."""
    config, geometry, viewing = _setup(sk.GeometryType.PlaneParallel)
    config.num_forced_azimuth = 0
    engine = sk.Engine(config, geometry, viewing)
    atmo = sk.Atmosphere(geometry, config, numwavel=2)
    atmo.storage.total_extinction[:] = 1e-5
    atmo.storage.ssa[:] = 0.9
    atmo.leg_coeff.a1[0] = 1.0
    atmo.leg_coeff.a1[2] = 0.5
    atmo.leg_coeff.a1[7] = 1e-3
    atmo.surface.albedo[:] = 0.3
    engine.calculate_radiance(atmo)
    assert engine._num_azi_eff == 8
