"""N-dimensional optical databases (reference ``xsec_dbase.rs``,
``scat_dbase.rs``, ``src/sasktran2/optical/database.py``)."""

from __future__ import annotations

import numpy as np

import sasktran2_tpu as sk
from sasktran2_tpu.optical import (
    AbsorberDatabase,
    OpticalDatabaseGenericAbsorber,
    OpticalDatabaseGenericScatterer,
    ScattererDatabase,
)


def _xs_fn(t, p, w):
    return 1e-25 * (1.0 + 0.01 * (t - 250.0) + 1e-6 * p) * (w / 500.0)


def test_absorber_dim3_interpolation_and_derivs():
    wl = np.linspace(300.0, 700.0, 21)
    tg = np.array([200.0, 250.0, 300.0])
    pg = np.array([1e3, 1e4, 1e5])
    xs = _xs_fn(tg[:, None, None], pg[None, :, None], wl[None, None, :])
    db = AbsorberDatabase(wl, xs, {"temperature_k": tg, "pressure_pa": pg})

    t_prof = np.array([220.0, 260.0, 290.0])
    p_prof = np.array([9e4, 2e4, 2e3])
    w_eval = np.array([405.0, 633.0])
    got = db.cross_sections(
        w_eval, altitudes_m=np.array([0.0, 1e4, 2e4]),
        temperature_k=t_prof, pressure_pa=p_prof,
    )
    expected = _xs_fn(t_prof[:, None], p_prof[:, None], w_eval[None, :])
    # the tabulated function is multilinear -> interpolation is exact
    np.testing.assert_allclose(got, expected, rtol=1e-12)

    d = db.cross_section_derivatives(
        w_eval, altitudes_m=np.array([0.0, 1e4, 2e4]),
        temperature_k=t_prof, pressure_pa=p_prof,
    )
    np.testing.assert_allclose(
        d["temperature_k"],
        np.broadcast_to(1e-25 * 0.01 * (w_eval / 500.0), (3, 2)),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        d["pressure_pa"],
        np.broadcast_to(1e-25 * 1e-6 * (w_eval / 500.0), (3, 2)),
        rtol=1e-10,
    )


def test_generic_absorber_wavenumber_and_legacy_names():
    # wavenumber-ordered dataset with legacy 'temperature' dim name
    wl = np.linspace(300.0, 700.0, 11)
    wn = 1e7 / wl  # decreasing wavelength order
    tg = np.array([200.0, 300.0])
    xs = _xs_fn(tg[:, None], 5e4, wl[None, :])
    db = OpticalDatabaseGenericAbsorber(db={
        "coords": {"temperature": tg, "wavenumber_cminv": wn},
        "data_vars": {"xs": (("temperature", "wavenumber_cminv"), xs)},
    })
    got = db.cross_sections(
        np.array([500.0]), altitudes_m=np.array([0.0]),
        temperature_k=np.array([250.0]), pressure_pa=np.array([1e4]),
    )
    np.testing.assert_allclose(got[0, 0], _xs_fn(250.0, 5e4, 500.0),
                               rtol=1e-10)


def test_generic_absorber_h5_file(tmp_path):
    import h5py

    wl = np.linspace(300.0, 700.0, 11)
    tg = np.array([200.0, 300.0])
    xs = _xs_fn(tg[:, None], 5e4, wl[None, :])
    path = tmp_path / "xs.h5"
    with h5py.File(path, "w") as f:
        f.create_dataset("wavelength_nm", data=wl)
        f["wavelength_nm"].make_scale("wavelength_nm")
        f.create_dataset("temperature_k", data=tg)
        f["temperature_k"].make_scale("temperature_k")
        d = f.create_dataset("xs", data=xs)
        d.dims[0].attach_scale(f["temperature_k"])
        d.dims[1].attach_scale(f["wavelength_nm"])
    db = OpticalDatabaseGenericAbsorber(db_filepath=path)
    got = db.cross_sections(
        np.array([500.0]), altitudes_m=np.array([0.0]),
        temperature_k=np.array([250.0]),
    )
    np.testing.assert_allclose(got[0, 0], _xs_fn(250.0, 5e4, 500.0),
                               rtol=1e-10)


def test_scatterer_database_param_profile():
    wl = np.linspace(400.0, 800.0, 9)
    rg = np.array([0.1, 0.5, 1.0])  # particle radius parameter
    xs_t = 1e-12 * rg[:, None] ** 2 * (500.0 / wl[None, :])
    xs_s = 0.9 * xs_t
    L = 4
    lm = np.zeros((L, len(rg), len(wl)))
    lm[0] = 2.0  # deliberately unnormalized: must be renormalized to 1
    lm[1] = 2.0 * (0.5 + 0.3 * rg[:, None]) * 3.0
    db = ScattererDatabase(
        wl, xs_t, xs_s, lm, params={"radius_um": rg}
    )
    props = db.scattering_properties(
        np.array([500.0, 600.0]), radius_um=np.array([0.3, 0.75]),
    )
    assert props["xs_total"].shape == (2, 2)
    np.testing.assert_allclose(props["ssa"], 0.9)
    np.testing.assert_allclose(props["legendre"][0], 1.0)
    np.testing.assert_allclose(
        props["legendre"][1][:, 0] / 3.0, 0.5 + 0.3 * np.array([0.3, 0.75]),
        rtol=1e-12,
    )


def test_database_scatterer_in_engine():
    """End-to-end: altitude-varying particle size through the engine, with
    number-density weighting functions vs finite differences."""
    alts = np.linspace(0, 60000, 16)
    wl = np.linspace(400.0, 800.0, 5)
    rg = np.array([0.1, 0.5, 1.0])
    xs_t = 1e-12 * rg[:, None] ** 2 * (500.0 / wl[None, :])
    xs_s = 0.95 * xs_t
    L = 4
    lm = np.zeros((L, len(rg), len(wl)))
    lm[0] = 1.0
    lm[1] = (0.5 + 0.3 * rg[:, None]) * 3.0
    lm[2] = 0.5 * 5.0
    db = OpticalDatabaseGenericScatterer(db={
        "coords": {"wavelength_nm": wl, "radius_um": rg,
                   "legendre": np.arange(L)},
        "data_vars": {
            "xs_total": (("radius_um", "wavelength_nm"), xs_t),
            "xs_scattering": (("radius_um", "wavelength_nm"), xs_s),
            "lm_a1": (("legendre", "radius_um", "wavelength_nm"), lm),
        },
    })
    config = sk.Config(
        num_streams=4,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=alts, geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, 0.0, 0.8, 200000.0))

    nd0 = 1e8 * np.exp(-alts / 10000.0)

    def run(bump):
        atmo = sk.Atmosphere(geometry, config, wavelengths_nm=wl)
        sk.climatology.us76.add_us76_standard_atmosphere(atmo)
        nd = nd0.copy()
        nd[5] += bump
        atmo["rayleigh"] = sk.constituent.Rayleigh()
        atmo["aerosol"] = sk.constituent.NumberDensityScatterer(
            db, alts, nd,
            param_values={"radius_um": 0.1 + alts / 1e5},
        )
        eng = sk.Engine(config, geometry, viewing)
        return eng.calculate_radiance(atmo)

    out = run(0.0)
    wf = out["wf_aerosol"].to_numpy()
    assert np.all(np.isfinite(wf))
    h = 1e4
    fd = (
        run(h)["radiance"].to_numpy() - run(-h)["radiance"].to_numpy()
    ) / (2 * h)
    an = wf[5, :, 0, 0] if wf.shape[0] == len(alts) else wf[:, 5, 0, 0]
    np.testing.assert_allclose(an, fd[:, 0, 0], rtol=2e-3)


def test_database_absorber_pt_wf_fd():
    """T-dependent absorber database: wf_<name>_temperature_k must match
    finite differences through the full engine."""
    alts = np.linspace(0, 60000, 16)
    wl = np.array([500.0])
    tg = np.linspace(150.0, 350.0, 9)
    xs = 1e-24 * (1.0 + 0.005 * (tg[:, None] - 250.0)) * np.ones(
        (1, len(wl))
    )
    db = AbsorberDatabase(wl, xs, {"temperature_k": tg})
    config = sk.Config(
        num_streams=4,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=alts, geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, 0.0, 0.8, 200000.0))

    def run(dt):
        atmo = sk.Atmosphere(geometry, config, wavelengths_nm=wl)
        sk.climatology.us76.add_us76_standard_atmosphere(atmo)
        atmo.temperature_k[5] += dt
        atmo["rayleigh"] = sk.constituent.Rayleigh()
        atmo["gas"] = sk.constituent.VMRAltitudeAbsorber(
            db, alts, np.full(len(alts), 1e-6)
        )
        eng = sk.Engine(config, geometry, viewing)
        return eng.calculate_radiance(atmo)

    out = run(0.0)
    # total temperature WF = rayleigh + gas contributions
    wf = (
        out["wf_rayleigh_temperature_k"].to_numpy().squeeze()
        + out["wf_gas_temperature_k"].to_numpy().squeeze()
    )
    h = 0.5
    fd = (
        run(h)["radiance"].to_numpy()[0, 0, 0]
        - run(-h)["radiance"].to_numpy()[0, 0, 0]
    ) / (2 * h)
    np.testing.assert_allclose(wf[5], fd, rtol=1e-3)


def test_named_absorbers_resolve_local_cache(tmp_path, monkeypatch):
    """Named standard absorbers (O3DBM, NO2Vandaele, ...) resolve their
    file from the local database cache; a clear error names the expected
    path when data is missing (zero-egress analog of the reference's
    StandardDatabase download)."""
    import pytest as _pytest

    monkeypatch.setenv("SASKTRAN2_TPU_DB_ROOT", str(tmp_path))
    from sasktran2_tpu.optical import O3DBM, NO2Vandaele

    with _pytest.raises(FileNotFoundError, match="o3/dbm.nc"):
        O3DBM()

    # place an .npz equivalent in the cache and load through the class
    d = tmp_path / "cross_sections" / "o3"
    d.mkdir(parents=True)
    wl = np.linspace(200.0, 800.0, 31)
    t = np.array([220.0, 280.0])
    xs = 1e-24 * np.exp(-((wl - 255.0) / 40.0) ** 2)[None, :] * np.array(
        [[1.1], [0.9]]
    )
    np.savez(
        d / "dbm.npz",
        coord_wavelength_nm=wl,
        coord_temperature_k=t,
        dims_xs=np.array(["temperature_k", "wavelength_nm"]),
        xs=xs,
    )
    db = O3DBM()
    out = db.cross_sections(
        np.array([260.0, 500.0]),  # on-grid wavelength
        altitudes_m=np.array([0.0, 1e4]),
        temperature_k=np.array([280.0, 220.0]),
        pressure_pa=np.array([1e5, 2e4]),
    )
    assert out.shape == (2, 2)
    base = 1e-24 * np.exp(-((260.0 - 255.0) / 40.0) ** 2)
    np.testing.assert_allclose(out[0, 0], 0.9 * base, rtol=1e-12)
    np.testing.assert_allclose(out[1, 0], 1.1 * base, rtol=1e-12)

    with _pytest.raises(FileNotFoundError, match="no2/vandaele.nc"):
        NO2Vandaele()
