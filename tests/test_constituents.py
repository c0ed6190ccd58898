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


def test_gaussian_aerosol_profile_helper():
    prof = aerosol_profile(np.linspace(0, 40000, 41))
    assert prof.max() == prof[22]
