"""Air-mass-factor constituent: FD validation of the box-AMF definition.

The box AMF for layer i is -d(ln I)/d(tau_i) where tau_i is absorption
optical depth added to the gradient cell around altitude level i (pure
absorber: scattering extinction held fixed). Mirrors the reference's
``src/sasktran2/constituent/amf.py:33-48`` altitude factors + ssa
compensation; the reference's own test (``tests/weightingfunctions/
test_amf.py``) only smoke-runs, so the FD check here is stronger.
"""

import numpy as np

import sasktran2_tpu as sk
from sasktran2_tpu.climatology import add_us76_standard_atmosphere
from sasktran2_tpu.constituent.misc import ManualOpticalProperties


def _setup(nalt=20):
    config = sk.Config(
        num_streams=4,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
        num_singlescatter_moments=4,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6,
        solar_azimuth=0.0,
        earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 100000, nalt),
        geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(
        sk.GroundViewingSolar(
            cos_sza=0.6,
            relative_azimuth=0.0,
            cos_viewing_zenith=0.8,
            observer_altitude_m=200000.0,
        )
    )
    return config, geometry, viewing


def _make_atmo(config, geometry, background, extra_extinction=None):
    atmo = sk.Atmosphere(
        geometry, config, wavelengths_nm=np.array([330.0])
    )
    add_us76_standard_atmosphere(atmo)
    atmo["rayleigh"] = sk.constituent.Rayleigh()
    atmo["surface"] = sk.constituent.LambertianSurface(0.3)
    atmo["amf"] = sk.constituent.AirMassFactor()
    if background is not None:
        # pure-absorber background so ssa sits below the solver's
        # conservative-scattering ceiling everywhere (an FD that straddles
        # the ssa clamp would disagree with the straight-through analytic
        # gradient by construction)
        atmo["background"] = ManualOpticalProperties(extinction=background)
    if extra_extinction is not None:
        atmo["pert"] = ManualOpticalProperties(extinction=extra_extinction)
    return atmo


def test_amf_vs_finite_difference():
    config, geometry, viewing = _setup()
    engine = sk.Engine(config, geometry, viewing)

    alts = geometry.altitudes()
    # ~5% of the local Rayleigh extinction: ssa ~ 0.95 at every level
    background = 5e-7 * np.exp(-alts / 8000.0)

    atmo = _make_atmo(config, geometry, background)
    out = engine.calculate_radiance(atmo)
    amf = out["air_mass_factor"].to_numpy()  # [alt, wavel, los, stokes]
    base_i = float(out["radiance"].to_numpy()[0, 0, 0])
    base_ext = atmo.unscaled_extinction[:, 0].copy()

    widths = np.gradient(alts)
    widths[0] /= 2
    widths[-1] /= 2

    nalt = len(alts)
    for i in (0, 5, 10, nalt - 1):
        dk = 1e-3 * base_ext[i]  # relative pure-absorber perturbation
        pert = np.zeros(nalt)
        pert[i] = dk
        atmo_p = _make_atmo(config, geometry, background,
                            extra_extinction=pert)
        rad_p = float(
            engine.calculate_radiance(atmo_p)["radiance"].to_numpy()[0, 0, 0]
        )
        dtau = dk * widths[i]
        amf_fd = -(np.log(rad_p) - np.log(base_i)) / dtau
        np.testing.assert_allclose(amf[i, 0, 0, 0], amf_fd, rtol=5e-3)


def test_amf_physical_magnitude():
    """Ground-viewing AMF should be near the geometric slant-path factor
    (1/cos_sza + 1/cos_view) in an optically thin absorber limit, and
    positive throughout the profile."""
    config, geometry, viewing = _setup()
    engine = sk.Engine(config, geometry, viewing)
    atmo = _make_atmo(config, geometry, None)
    amf = engine.calculate_radiance(atmo)["air_mass_factor"].to_numpy()
    assert np.all(np.isfinite(amf))
    geometric = 1.0 / 0.6 + 1.0 / 0.8
    # upper atmosphere (thin, above most scattering): close to geometric
    np.testing.assert_allclose(amf[12:, 0, 0, 0], geometric, rtol=0.15)
    assert np.all(amf[:, 0, 0, 0] > 0)
