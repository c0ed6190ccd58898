"""MIPAS/FASCODE reference-atmosphere climatology tests (reference:
src/sasktran2/climatology/mipas.py). Uses synthetic RFM .atm content —
the real files are a zero-egress download."""

import numpy as np
import pytest

from sasktran2_tpu.climatology import mipas

ATM_TEXT = """! Synthetic RFM-format reference atmosphere for tests
! comment lines start with !
         5 ! No. levels in profiles
*HGT [km]
   0.0,  10.0,  20.0,
  30.0,  40.0
*PRE [mb]
 1013.25, 264.99, 55.29,
 11.97, 2.87
*TEM [K]
 288.15, 223.25, 216.65,
 226.51, 250.35
*O3 [ppmv]
 0.03, 0.1, 4.5,
 8.0, 7.5
*H2O [ppmv]
 7000.0, 50.0, 4.0,
 4.5, 5.5
*END
"""

MINOR_TEXT = """! minor species file
         5
*HGT [km]
 0.0 10.0 20.0 30.0 40.0
*NO2 [ppmv]
 1e-5 2e-5 1e-3 4e-3 2e-3
*END
"""


def test_read_atm_parses_profiles():
    data = mipas.read_atm(ATM_TEXT)
    assert set(data) == {"HGT", "PRE", "TEM", "O3", "H2O"}
    np.testing.assert_allclose(data["HGT"], [0, 10, 20, 30, 40])
    np.testing.assert_allclose(data["PRE"][0], 1013.25)
    assert data["O3"].size == 5


def test_constituent_and_minor_fallback():
    from sasktran2_tpu.constituent import VMRAltitudeAbsorber
    from sasktran2_tpu.optical.tabulated import TabulatedCrossSectionAbsorber

    xs = TabulatedCrossSectionAbsorber(
        np.array([300.0, 600.0]), np.array([1e-24, 1e-25])
    )
    data = mipas.read_atm(ATM_TEXT)
    minor = mipas.read_atm(MINOR_TEXT)

    c = mipas.constituent("O3", xs, atm_data=data)
    assert isinstance(c, VMRAltitudeAbsorber)
    np.testing.assert_allclose(c.altitudes_m, [0, 1e4, 2e4, 3e4, 4e4])
    np.testing.assert_allclose(c.vmr[2], 4.5e-6)

    c2 = mipas.constituent("NO2", xs, atm_data=data, minor_data=minor)
    np.testing.assert_allclose(c2.vmr[2], 1e-9)

    with pytest.raises(KeyError):
        mipas.constituent("CH4", xs, atm_data=data, minor_data=minor)


def test_add_to_atmosphere_engine_chain():
    """Full chain: climatology -> atmosphere -> engine radiance."""
    import sasktran2_tpu as sk
    from sasktran2_tpu.optical.tabulated import TabulatedCrossSectionAbsorber

    config = sk.Config(
        num_streams=2,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 40000, 9),
        geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, 0.7, 0.85, 2e5))
    engine = sk.Engine(config, geometry, viewing)

    atmo = sk.Atmosphere(
        geometry, config, wavelengths_nm=np.array([330.0, 550.0]),
        calculate_derivatives=False,
    )
    xs = TabulatedCrossSectionAbsorber(
        np.array([300.0, 600.0]), np.array([1e-24, 1e-25])
    )
    data = mipas.read_atm(ATM_TEXT)
    mipas.add_to_atmosphere(atmo, {"O3": xs}, atm_data=data)

    # pressure/temperature came from the climatology
    np.testing.assert_allclose(atmo.temperature_k[0], 288.15)
    assert abs(atmo.pressure_pa[0] - 101325.0) / 101325.0 < 1e-6
    # log-space pressure interpolation between levels
    p15 = np.exp(0.5 * (np.log(264.99e2) + np.log(55.29e2)))
    i15 = np.argmin(np.abs(geometry.altitudes() - 15000.0))
    np.testing.assert_allclose(atmo.pressure_pa[i15], p15, rtol=1e-10)

    atmo["rayleigh"] = sk.constituent.Rayleigh()
    rad = engine.calculate_radiance(atmo)["radiance"].to_numpy()
    assert rad.shape[0] == 2
    assert np.all(np.isfinite(rad)) and np.all(rad > 0)

    # more absorber -> less radiance at the absorbing wavelength
    atmo2 = sk.Atmosphere(
        geometry, config, wavelengths_nm=np.array([330.0, 550.0]),
        calculate_derivatives=False,
    )
    data_hi = dict(data)
    data_hi["O3"] = data["O3"] * 100.0
    mipas.add_to_atmosphere(atmo2, {"O3": xs}, atm_data=data_hi)
    atmo2["rayleigh"] = sk.constituent.Rayleigh()
    rad2 = engine.calculate_radiance(atmo2)["radiance"].to_numpy()
    assert rad2[0, 0, 0] < rad[0, 0, 0]
