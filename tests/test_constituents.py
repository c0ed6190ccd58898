"""Constituent pipeline tests: aerosol scatterer WFs, thermal emission,
solar irradiance, manual inputs."""

import numpy as np

import sasktran2_tpu as sk
from sasktran2_tpu.climatology import add_us76_standard_atmosphere
from sasktran2_tpu.constituent import (
    HGScatteringOptical,
    NumberDensityScatterer,
    Rayleigh,
    SolarIrradiance,
    ThermalEmission,
    planck_blackbody_radiance,
)
from sasktran2_tpu.test_util import test_aerosol_constituent as aerosol_profile
from sasktran2_tpu.test_util.wf import numeric_wf, validate_wf


def _setup(nalt=16, **cfg_kwargs):
    config = sk.Config(
        num_streams=4,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
        num_singlescatter_moments=8,
        **cfg_kwargs,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 60000, nalt),
        geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, 0.3, 0.8, 2e5))
    return config, geometry, viewing


def test_aerosol_number_density_wf():
    """wf for aerosol number density vs finite differences (reference
    tests/weightingfunctions patterns for NumberDensityScatterer)."""
    config, geometry, viewing = _setup()
    engine = sk.Engine(config, geometry, viewing)
    atmo = sk.Atmosphere(geometry, config, wavelengths_nm=np.array([550.0]))
    add_us76_standard_atmosphere(atmo)
    aero_alts = np.linspace(0, 40000, 9)
    nd = np.full(9, 1e7)
    atmo["rayleigh"] = Rayleigh()
    atmo["aerosol"] = NumberDensityScatterer(
        HGScatteringOptical(xs_total=1e-13, ssa=0.9, g=0.7, nleg=8),
        aero_alts, nd,
    )
    atmo["surface"] = sk.constituent.LambertianSurface(0.2)

    ds = numeric_wf(
        atmo["aerosol"].number_density, 0.005, engine, atmo, "wf_aerosol"
    )
    validate_wf(ds["wf_aerosol"], ds["wf_aerosol_numeric"],
                wf_dim="aerosol_altitude", decimal=5)


def test_thermal_emission_constituent():
    config, geometry, viewing = _setup(
        emission_source=sk.EmissionSource.DiscreteOrdinates)
    engine = sk.Engine(config, geometry, viewing)
    atmo = sk.Atmosphere(geometry, config,
                         wavelengths_nm=np.array([10000.0]))
    add_us76_standard_atmosphere(atmo)
    atmo["rayleigh"] = Rayleigh()
    atmo["thermal"] = ThermalEmission()
    atmo.storage.solar_irradiance[:] = 0.0
    # solar irradiance reset happens via constituent ordering; force zero
    out = engine.calculate_radiance(atmo)
    rad = out["radiance"].to_numpy()[0, 0, 0]
    b_max = planck_blackbody_radiance(1e-5, 288.0)
    assert 0 < rad < b_max
    assert "wf_thermal_temperature_k" in out.keys()


def test_solar_irradiance_scales_radiance():
    config, geometry, viewing = _setup()
    engine = sk.Engine(config, geometry, viewing)

    def run(irr):
        atmo = sk.Atmosphere(geometry, config,
                             wavelengths_nm=np.array([450.0]))
        add_us76_standard_atmosphere(atmo)
        atmo["rayleigh"] = Rayleigh()
        if irr is not None:
            atmo["solar"] = SolarIrradiance(irradiance=irr)
        return engine.calculate_radiance(atmo)["radiance"].to_numpy()[0, 0, 0]

    base = run(None)
    doubled = run(np.array([2.0]))
    np.testing.assert_allclose(doubled / base, 2.0 / run(np.array([1.0])) * base / base * 2.0 / 2.0, rtol=1)
    np.testing.assert_allclose(doubled, 2.0 * run(np.array([1.0])), rtol=1e-10)


def test_gaussian_height_extinction_wfs():
    """Height / width / vertical-OD weighting functions of the gaussian
    aerosol layer vs finite differences (reference
    src/sasktran2/constituent/gaussianheight.py)."""
    from sasktran2_tpu.constituent import GaussianHeightExtinction

    config, geometry, viewing = _setup()
    engine = sk.Engine(config, geometry, viewing)

    # weak background absorber (~0.1% of Rayleigh) keeps ssa below the
    # solver's conservative-scattering ceiling everywhere: an FD that
    # straddles the ssa clamp disagrees with the straight-through
    # analytic gradient by construction (see rt/disco.clamp_ssa)
    probe = sk.Atmosphere(geometry, config, wavelengths_nm=np.array([550.0]))
    add_us76_standard_atmosphere(probe)
    probe["rayleigh"] = Rayleigh()
    probe.internal_object()
    background = 1e-3 * probe.storage.total_extinction[:, 0].copy()
    from sasktran2_tpu.constituent.misc import ManualOpticalProperties

    atmo = sk.Atmosphere(geometry, config, wavelengths_nm=np.array([550.0]))
    add_us76_standard_atmosphere(atmo)
    atmo["rayleigh"] = Rayleigh()
    atmo["background"] = ManualOpticalProperties(extinction=background)
    gauss = GaussianHeightExtinction(
        HGScatteringOptical(xs_total=1e-13, ssa=0.9, g=0.7, nleg=8),
        height_m=22000.0, width_fwhm_m=8000.0,
        vertical_optical_depth=0.05,
        vertical_optical_depth_wavel_nm=550.0,
        altitudes_m=np.linspace(0, 60000, 61),
    )
    atmo["gauss"] = gauss
    atmo["surface"] = sk.constituent.LambertianSurface(0.2)

    # Height/width WFs are residuals of cancelling positive/negative
    # dn/dp lobes, which amplifies finite-difference noise ~30x over the
    # per-altitude nd WF (the analytic value matches the chain
    # wf_nd . dn/dp to 1e-12); OD is cancellation-free. Reference
    # test_gaussian_extinction.py validates at decimal=4.
    for param, wf_name, frac, decimal in (
        (gauss.height_m, "wf_gauss_height_m", 1e-3, 3),
        (gauss.width_fwhm_m, "wf_gauss_width_fwhm_m", 1e-3, 2),
        (gauss.vertical_optical_depth,
         "wf_gauss_vertical_optical_depth", 5e-3, 4),
    ):
        ds = numeric_wf(param, frac, engine, atmo, wf_name)
        validate_wf(ds[wf_name], ds[wf_name + "_numeric"],
                    wf_dim=wf_name.removeprefix("wf_"), decimal=decimal)

    # exact chain identity: wf_height == wf_nd . dn/dh through a separate
    # NumberDensityScatterer with the derived profile
    from sasktran2_tpu.constituent import NumberDensityScatterer

    atmo2 = sk.Atmosphere(geometry, config,
                          wavelengths_nm=np.array([550.0]))
    add_us76_standard_atmosphere(atmo2)
    atmo2["rayleigh"] = Rayleigh()
    atmo2["background"] = ManualOpticalProperties(extinction=background)
    atmo2["aero"] = NumberDensityScatterer(
        HGScatteringOptical(xs_total=1e-13, ssa=0.9, g=0.7, nleg=8),
        gauss._altitudes, gauss.number_density.copy(),
    )
    atmo2["surface"] = sk.constituent.LambertianSurface(0.2)
    wf_nd = engine.calculate_radiance(atmo2)["wf_aero"].to_numpy().ravel()
    z = gauss._altitudes
    g_prof, dg_dh, dg_dw = gauss._gaussian_terms()
    big_g = np.trapezoid(g_prof, z)
    out = engine.calculate_radiance(atmo)
    for dg, wf_name in ((dg_dh, "wf_gauss_height_m"),
                        (dg_dw, "wf_gauss_width_fwhm_m")):
        dn = 0.05 / (big_g * 1e-13) * (
            dg - g_prof * np.trapezoid(dg, z) / big_g
        )
        wf = out[wf_name].to_numpy().ravel()[0]
        np.testing.assert_allclose(wf_nd @ dn, wf, rtol=1e-10)


def test_gaussian_height_extinction_total_od():
    """The implied extinction profile integrates to the requested vertical
    optical depth at the reference wavelength."""
    from sasktran2_tpu.constituent import GaussianHeightExtinction

    alts = np.linspace(0, 60000, 121)
    gauss = GaussianHeightExtinction(
        HGScatteringOptical(xs_total=2e-13, ssa=0.9, g=0.7),
        height_m=20000.0, width_fwhm_m=5000.0,
        vertical_optical_depth=0.1,
        vertical_optical_depth_wavel_nm=550.0,
        altitudes_m=alts,
    )
    k = gauss.number_density * 2e-13
    np.testing.assert_allclose(np.trapezoid(k, alts), 0.1, rtol=1e-12)


def test_extinction_scatterer_wf():
    """ExtinctionScatterer: extinction-space WF vs finite differences and
    equivalence with the NumberDensityScatterer it derives from."""
    from sasktran2_tpu.constituent import ExtinctionScatterer

    config, geometry, viewing = _setup()
    engine = sk.Engine(config, geometry, viewing)
    alts = np.linspace(0, 40000, 11)
    ext = 2e-7 * np.exp(-alts / 10000.0)
    opt = HGScatteringOptical(xs_total=1e-13, ssa=0.9, g=0.7, nleg=8)

    atmo = sk.Atmosphere(geometry, config, wavelengths_nm=np.array([550.0]))
    add_us76_standard_atmosphere(atmo)
    atmo["rayleigh"] = Rayleigh()
    scat = ExtinctionScatterer(opt, alts, ext, 550.0)
    atmo["aero"] = scat
    atmo["surface"] = sk.constituent.LambertianSurface(0.2)

    # equivalent number-density constituent gives the same radiance
    atmo2 = sk.Atmosphere(geometry, config,
                          wavelengths_nm=np.array([550.0]))
    add_us76_standard_atmosphere(atmo2)
    atmo2["rayleigh"] = Rayleigh()
    atmo2["aero"] = NumberDensityScatterer(opt, alts, ext / 1e-13)
    atmo2["surface"] = sk.constituent.LambertianSurface(0.2)
    r1 = engine.calculate_radiance(atmo)["radiance"].to_numpy()
    r2 = engine.calculate_radiance(atmo2)["radiance"].to_numpy()
    np.testing.assert_allclose(r1, r2, rtol=1e-12)

    ds = numeric_wf(scat.extinction_per_m, 0.005, engine, atmo, "wf_aero")
    validate_wf(ds["wf_aero"], ds["wf_aero_numeric"],
                wf_dim="aero_altitude", decimal=5)


def test_extinction_scatterer_2d():
    from sasktran2_tpu.constituent import ExtinctionScatterer2D

    config = sk.Config(
        single_scatter_source=sk.SingleScatterSource.NoSource,
        multiple_scatter_source=sk.MultipleScatterSource.NoSource,
        occultation_source=sk.OccultationSource.Standard,
        num_streams=2,
    )
    geometry = sk.Geometry2D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 80000, 9),
        horizontal_angle_grid_radians=np.linspace(-0.5, 0.5, 5),
    )
    atmo = sk.Atmosphere(geometry, config,
                         wavelengths_nm=np.array([550.0]))
    ext = np.outer(np.linspace(1.0, 2.0, 5), np.full(9, 1e-6))
    atmo["aero"] = ExtinctionScatterer2D(
        HGScatteringOptical(xs_total=1e-13, ssa=0.9, g=0.5, nleg=4),
        ext, 550.0,
    )
    atmo.internal_object()
    k = np.asarray(atmo.storage.total_extinction)
    np.testing.assert_allclose(k[:, 0], ext.ravel(), rtol=1e-12)
    assert "wf_aero" in atmo.storage.derivative_mappings


def test_gaussian_aerosol_profile_helper():
    prof = aerosol_profile(np.linspace(0, 40000, 41))
    assert prof.max() == prof[22]


def test_rayleigh_manual_matches_bates():
    """Rayleigh('manual') with the Bates cross sections/King factors fed
    back in must reproduce the Bates constituent exactly (reference
    constituent/rayleigh.py manual mode)."""
    from sasktran2_tpu.optical.rayleigh import rayleigh_cross_section_bates

    config, geometry, viewing = _setup()
    engine = sk.Engine(config, geometry, viewing)
    wl = np.array([350.0, 550.0])
    xs, king = rayleigh_cross_section_bates(wl / 1000.0)

    def run(constituent):
        atmo = sk.Atmosphere(geometry, config, wavelengths_nm=wl)
        add_us76_standard_atmosphere(atmo)
        atmo["rayleigh"] = constituent
        atmo["surface"] = sk.constituent.LambertianSurface(0.3)
        return engine.calculate_radiance(atmo)["radiance"].to_numpy()

    r_bates = run(Rayleigh())
    r_manual = run(Rayleigh("manual", wavelengths_nm=wl, xs=xs,
                            king_factor=king))
    np.testing.assert_allclose(r_manual, r_bates, rtol=1e-12)

    import pytest

    with pytest.raises(ValueError, match="manual"):
        Rayleigh("manual")
