"""Line-list and population volume emission rate constituents
(reference: rust/sasktran2-rs/src/constituent/types/
line_list_volume_emission_rate.rs, population_emission_rate.rs)."""

import numpy as np
import pytest

import sasktran2_tpu as sk
from sasktran2_tpu.climatology import add_us76_standard_atmosphere
from sasktran2_tpu.constituent import (
    LineListVolumeEmissionRate,
    PopulationEmissionRate,
)
from sasktran2_tpu.test_util.wf import numeric_wf, validate_wf


def _setup(wavelengths, nalt=12):
    config = sk.Config(
        num_streams=2,
        multiple_scatter_source=sk.MultipleScatterSource.NoSource,
        single_scatter_source=sk.SingleScatterSource.NoSource,
        emission_source=sk.EmissionSource.VolumeEmissionRate,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 100000, nalt),
        geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, 0.3, 1.0, 2e5))
    atmo = sk.Atmosphere(geometry, config, wavelengths_nm=wavelengths)
    add_us76_standard_atmosphere(atmo)
    atmo.storage.solar_irradiance[:] = 0.0
    return config, geometry, viewing, atmo


def test_line_list_ver_spectral_integral():
    """The Doppler-broadened per-nm emission integrates over wavelength to
    VER / 4pi at every altitude (normalized line shapes)."""
    wl0 = 762.0
    wavelengths = np.linspace(wl0 - 0.5, wl0 + 0.5, 4001)
    _, _, _, atmo = _setup(wavelengths)
    alts = atmo.model_geometry.altitudes()
    ver = np.linspace(1.0, 2.0, alts.size) * 1e9
    con = LineListVolumeEmissionRate(
        alts, ver, np.array([wl0 - 0.05, wl0 + 0.05]),
        np.array([0.25, 0.75]),
    )
    con.add_to_atmosphere(atmo)
    spectrum = np.asarray(atmo.storage.emission_source)  # [A, W]
    integral = np.trapezoid(spectrum, wavelengths, axis=1)
    np.testing.assert_allclose(integral, ver / (4 * np.pi), rtol=1e-6)


def test_line_list_ver_weight_normalization_and_validation():
    alts = np.linspace(0, 100e3, 5)
    con = LineListVolumeEmissionRate(
        alts, np.ones(5), np.array([760.0, 765.0]), np.array([2.0, 6.0])
    )
    np.testing.assert_allclose(con.weights, [[0.25, 0.75]] * 5)
    with pytest.raises(ValueError, match="positive finite"):
        LineListVolumeEmissionRate(
            alts, np.ones(5), np.array([-760.0]), np.array([1.0])
        )
    with pytest.raises(ValueError, match="row sums"):
        LineListVolumeEmissionRate(
            alts, np.ones(5), np.array([760.0, 765.0]),
            np.array([0.0, 0.0]),
        )


def test_line_list_ver_photon_ver_wf():
    """Analytic wf_*_photon_ver vs finite differences through the engine."""
    wavelengths = np.linspace(761.8, 762.2, 41)
    config, geometry, viewing, atmo = _setup(wavelengths)
    alts = atmo.model_geometry.altitudes()
    engine = sk.Engine(config, geometry, viewing)
    ver = np.exp(-((alts - 60e3) / 15e3) ** 2) * 1e9 + 1e7
    atmo["airglow"] = LineListVolumeEmissionRate(
        alts, ver, np.array([762.0]), np.array([1.0])
    )
    ds = numeric_wf(
        atmo["airglow"].photon_ver, 0.01, engine, atmo,
        "wf_airglow_photon_ver",
    )
    validate_wf(
        ds["wf_airglow_photon_ver"],
        ds["wf_airglow_photon_ver_numeric"],
        wf_dim="airglow_altitude", decimal=5,
    )


def _write_par_with_quanta(tmp_path):
    """Fake O2 .par with global quanta: two A-band lines (b0->X0), one
    hot-band line (b1->X1), and one B-band line (b1->X0)."""

    def record(iso, nu0, s, a, elower, qup, qlo, gp, gpp):
        line = (
            f"{7:2d}{iso:1d}{nu0:12.6f}{s:10.3E}{a:10.3E}"
            f"{0.05:5.3f}{0.04:5.3f}{elower:10.4f}{0.70:4.2f}{0.0:8.6f}"
        )
        line += f"{qup:>15}{qlo:>15}"
        line += " " * (146 - len(line))
        line += f"{gp:7.1f}{gpp:7.1f}"
        assert len(line) == 160
        return line

    rows = [
        record(1, 13120.0, 1e-25, 0.060, 2.0, "b 0", "X 0", 5.0, 3.0),
        record(1, 13112.0, 2e-25, 0.020, 10.0, "b 0", "X 0", 5.0, 7.0),
        record(1, 13125.0, 1e-24, 0.045, 1400.0, "b 1", "X 1", 7.0, 5.0),
        record(1, 14520.0, 5e-26, 0.070, 2.0, "b 1", "X 0", 5.0, 3.0),
    ]
    p = tmp_path / "o2_quanta.par"
    p.write_text("\n".join(rows) + "\n")
    return p


def test_population_emission_rate_builds_bands(tmp_path):
    from sasktran2_tpu.optical.line_absorber import load_hitran_par

    cat = load_hitran_par(_write_par_with_quanta(tmp_path), 0.0319988)
    alts = np.linspace(50e3, 100e3, 6)
    temp = np.linspace(250.0, 180.0, 6)
    pops = {
        "altitude": alts,
        "temperature": temp,
        "O2(b)": np.full(6, 1e10),
        "O2(b, v=1)": np.full(6, 2e9),
    }
    con = PopulationEmissionRate(pops, cat)
    assert con.num_line_list_emissions == 2

    # A band: 3 lines (b0->X0 x2 + b1->X1); B band: 1 line (b1->X0)
    assert con.line_list_wavelengths_nm(0).size == 3
    assert con.line_list_wavelengths_nm(1).size == 1

    # total A-band VER = pop_b0 * A_b0x0 + pop_b1 * A_b1x1
    expected_a = 1e10 * 7.58e-2 + 2e9 * 7.0e-2
    np.testing.assert_allclose(con.line_list_photon_ver(0), expected_a)
    # B-band VER = pop_b1 * A_b1x0
    np.testing.assert_allclose(con.line_list_photon_ver(1), 2e9 * 7.0e-2)

    # weights rows normalized
    np.testing.assert_allclose(con.line_list_weights(0).sum(axis=1), 1.0)

    # hot-band line weight share = its VER share within the band
    from sasktran2_tpu.photchem.emission import (
        oxygen_a_band_from_catalogue,
    )

    band = oxygen_a_band_from_catalogue(cat)
    hot = np.array([s == "O2(b, v=1)" for s in band.upper_vib_state])
    w_hot = con.line_list_weights(0)[:, hot].sum(axis=1)
    np.testing.assert_allclose(
        w_hot, 2e9 * 7.0e-2 / expected_a, rtol=1e-12
    )


def test_population_emission_rate_engine_radiance(tmp_path):
    """End to end: population emission produces limb radiance localized at
    the A-band line positions."""
    from sasktran2_tpu.optical.line_absorber import load_hitran_par

    cat = load_hitran_par(_write_par_with_quanta(tmp_path), 0.0319988)
    # Doppler widths are ~1e-4 nm: center the grid exactly on the strongest
    # line (nu0 = 13120, branching 0.75) so monochromatic samples hit it
    wl_line = 1e7 / 13120.0
    wavelengths = wl_line + np.linspace(-0.01, 0.01, 41)
    config, geometry, viewing, atmo = _setup(wavelengths)
    engine = sk.Engine(config, geometry, viewing)
    alts = atmo.model_geometry.altitudes()
    temp = np.asarray(atmo.temperature_k)
    pops = {
        "altitude": alts,
        "temperature": temp,
        "O2(b)": np.exp(-((alts - 90e3) / 10e3) ** 2) * 1e10,
    }
    atmo["airglow"] = PopulationEmissionRate(pops, cat)
    out = engine.calculate_radiance(atmo)
    rad = out["radiance"].to_numpy()[:, 0, 0]
    assert rad.max() > 0
    # peak radiance at the line nearest 762.2 nm (1e7/13120 = 762.2)
    assert abs(wavelengths[np.argmax(rad)] - 1e7 / 13120.0) < 0.05


def test_hitran_line_strength_weight_model(tmp_path):
    from sasktran2_tpu.optical.line_absorber import load_hitran_par
    from sasktran2_tpu.photchem.emission import (
        band_line_weights,
        oxygen_a_band_from_catalogue,
    )

    cat = load_hitran_par(_write_par_with_quanta(tmp_path), 0.0319988)
    band = oxygen_a_band_from_catalogue(cat)
    t = np.array([150.0, 300.0])
    w = band_line_weights(band, t, "hitran_line_strength")
    # normalized within each vibrational state: b0 group (2 lines) and
    # b1 group (1 line) each sum to 1
    b0 = np.array([s == "O2(b)" for s in band.upper_vib_state])
    np.testing.assert_allclose(w[:, b0].sum(axis=1), 1.0)
    np.testing.assert_allclose(w[:, ~b0].sum(axis=1), 1.0)
    # colder temperature favors the lower-E'' line (E''=2 vs E''=10)
    i_low = int(np.argmin(band.lower_energy_cminv[b0]))
    w_b0 = w[:, b0]
    assert w_b0[0, i_low] > w_b0[1, i_low]
