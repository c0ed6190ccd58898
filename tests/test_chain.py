"""Full-pipeline smoke chain tests: US76 + Rayleigh + ozone over a wide
wavelength sweep through a spherical limb geometry (the analog of the
reference's ``tests/engine/test_chain.py:7-48`` scalar/vector chains; the
O3 cross section is synthetic because this environment ships no
downloaded databases — same spectral role, zero egress)."""

import numpy as np

import sasktran2_tpu as sk
from sasktran2_tpu.climatology import add_us76_standard_atmosphere
from sasktran2_tpu.constituent import (
    LambertianSurface,
    Rayleigh,
    VMRAltitudeAbsorber,
)
from sasktran2_tpu.optical.database import OpticalDatabaseGenericAbsorber


def _synthetic_o3():
    """Hartley/Huggins + Chappuis-shaped synthetic ozone cross section
    [m^2] over 250-850 nm."""
    wl = np.linspace(250.0, 850.0, 121)
    hartley = 1.1e-21 * np.exp(-0.5 * ((wl - 255.0) / 25.0) ** 2)
    chappuis = 4.5e-25 * np.exp(-0.5 * ((wl - 600.0) / 45.0) ** 2)
    return OpticalDatabaseGenericAbsorber(db={
        "coords": {"wavelength_nm": wl},
        "data_vars": {"xs": (("wavelength_nm",), hartley + chappuis)},
    })


def _chain_setup(num_streams, num_stokes):
    config = sk.Config(
        num_streams=num_streams,
        num_stokes=num_stokes,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.Exact,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6,
        solar_azimuth=0.0,
        earth_radius_m=6372000.0,
        altitude_grid_m=np.arange(0.0, 65001.0, 2500.0),
        geometry_type=sk.GeometryType.Spherical,
    )
    viewing = sk.ViewingGeometry()
    for alt in [10000.0, 20000.0, 30000.0, 40000.0]:
        viewing.add_ray(sk.TangentAltitudeSolar(
            tangent_altitude_m=alt, relative_azimuth=0.0,
            observer_altitude_m=200000.0, cos_sza=0.6,
        ))
    wavel = np.arange(280.0, 800.0, 10.0)  # 52 wavelengths
    atmo = sk.Atmosphere(geometry, config, wavelengths_nm=wavel)
    add_us76_standard_atmosphere(atmo)
    atmo["rayleigh"] = Rayleigh()
    atmo["ozone"] = VMRAltitudeAbsorber(
        _synthetic_o3(), geometry.altitudes(),
        np.full(geometry.altitudes().shape, 1e-6),
    )
    atmo["surface"] = LambertianSurface(0.3)
    return config, geometry, viewing, atmo, wavel


def test_scalar_full_chain():
    config, geometry, viewing, atmo, wavel = _chain_setup(2, 1)
    engine = sk.Engine(config, geometry, viewing)
    out = engine.calculate_radiance(atmo)
    rad = out["radiance"].to_numpy()
    assert rad.shape == (len(wavel), 4, 1)
    assert np.all(np.isfinite(rad)) and np.all(rad > 0)
    # Hartley-band absorption: deep-UV limb radiance at 10 km is
    # darker than the Chappuis-window radiance next to it
    assert rad[0, 0, 0] < rad[-1, 0, 0]
    # Jacobians present and finite for every registered family
    for key in ("wf_ozone", "wf_rayleigh_pressure_pa", "wf_surface_albedo"):
        assert np.all(np.isfinite(out[key].to_numpy()))


def test_vector_full_chain():
    config, geometry, viewing, atmo, wavel = _chain_setup(4, 3)
    engine = sk.Engine(config, geometry, viewing)
    out = engine.calculate_radiance(atmo)
    rad = out["radiance"].to_numpy()
    assert rad.shape == (len(wavel), 4, 3)
    assert np.all(np.isfinite(rad))
    I, Q = rad[..., 0], rad[..., 1]
    assert np.all(I > 0)
    # limb Rayleigh scattering polarizes: Q is nonzero and bounded by I
    assert np.any(np.abs(Q) > 1e-6 * I.max())
    assert np.all(np.abs(Q) <= I + 1e-12)
