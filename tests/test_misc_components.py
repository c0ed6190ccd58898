"""US76 climatology, geodetic, interpolation, quadrature, dataset sanity."""

import numpy as np

import sasktran2_tpu as sk
from sasktran2_tpu.climatology import us76_pressure_temperature
from sasktran2_tpu.geodetic import Geodetic
from sasktran2_tpu.ops.quadrature import streams
from sasktran2_tpu.util.interpolation import linear_interpolating_matrix


def test_us76_sea_level_and_tropopause():
    p, t = us76_pressure_temperature(np.array([0.0, 11000.0, 20000.0, 32000.0]))
    np.testing.assert_allclose(p[0], 101325.0, rtol=1e-10)
    np.testing.assert_allclose(t[0], 288.15, rtol=1e-10)
    # 11 km geopotential != geometric; temperature near 216.8 K
    assert abs(t[1] - 216.65) < 0.5
    np.testing.assert_allclose(p[1], 22632.0, rtol=0.01)
    np.testing.assert_allclose(p[2], 5474.9, rtol=0.02)


def test_geodetic_roundtrip():
    g = Geodetic()
    g.from_lat_lon_alt(-45.0, 30.0, 25000.0)
    loc = g.location
    g2 = Geodetic().from_xyz(loc)
    np.testing.assert_allclose(g2.latitude, -45.0, atol=1e-8)
    np.testing.assert_allclose(g2.longitude, 30.0, atol=1e-8)
    np.testing.assert_allclose(g2.altitude, 25000.0, atol=1e-4)


def test_geodetic_tangent_point():
    g = Geodetic()
    obs = Geodetic().from_lat_lon_alt(0.0, 0.0, 600000.0).location
    look = g.from_tangent_altitude(20000.0, obs, np.array([0.0, 1.0, 0.2]))
    tp = Geodetic().from_tangent_point(obs, look)
    np.testing.assert_allclose(tp.altitude, 20000.0, atol=1.0)


def test_interpolating_matrix():
    src = np.array([0.0, 1.0, 2.0])
    dst = np.array([0.5, 1.5, 3.0, -1.0])
    m0 = linear_interpolating_matrix(src, dst, "zero")
    f = np.array([1.0, 3.0, 5.0])
    np.testing.assert_allclose(m0 @ f, [2.0, 4.0, 0.0, 0.0])
    me = linear_interpolating_matrix(src, dst, "extend")
    np.testing.assert_allclose(me @ f, [2.0, 4.0, 5.0, 1.0])


def test_stream_quadrature_integrates():
    mu, w = streams(16)
    # integrates polynomials exactly over [0, 1]
    np.testing.assert_allclose(np.sum(w), 1.0, rtol=1e-13)
    np.testing.assert_allclose(np.sum(w * mu**5), 1.0 / 6.0, rtol=1e-12)


def test_dataset_arithmetic():
    ds = sk.Dataset()
    ds["a"] = sk.DataArray(np.arange(6.0).reshape(2, 3), ("x", "y"))
    ds["b"] = sk.DataArray(np.ones(3), ("y",))
    c = ds["a"] + ds["b"]
    assert c.dims == ("x", "y")
    np.testing.assert_allclose(c.values[0], [1, 2, 3])
    sel = ds["a"].isel(x=1)
    assert sel.dims == ("y",)
    mx = ds["a"].max(dim="x")
    np.testing.assert_allclose(mx.values, [3, 4, 5])


def test_photolysis_rate():
    from sasktran2_tpu.photchem import (
        integrate_photolysis_rate,
        irradiance_to_photon_flux,
    )

    wl = np.linspace(200, 300, 101)
    xs = np.full(101, 1e-23)
    qy = np.ones(101)
    flux = irradiance_to_photon_flux(wl, np.full(101, 0.1))
    j = integrate_photolysis_rate(wl, xs, qy, flux)
    # order of magnitude: 1e-23 m^2 * ~1e17 photons/(m^2 s nm) * 100 nm
    assert 1e-5 < j < 1e-2


def test_database_offline():
    import pytest as _pytest

    from sasktran2_tpu.database import WebDatabase

    db = WebDatabase("https://example.invalid/data.nc", "testdb")
    with _pytest.raises(FileNotFoundError):
        db.fetch("missing.nc")


def test_solar_model_modes_and_source(tmp_path, monkeypatch):
    """SolarModel: sample/average/integrate modes, solar-distance scaling,
    and cached-source loading (HSRS analog; reference solar/model.py)."""
    from sasktran2_tpu.solar import SolarModel

    wl = np.linspace(300.0, 700.0, 401)
    irr = 1.0 + 0.5 * np.sin(wl / 20.0)

    m = SolarModel(wl, irr)
    np.testing.assert_allclose(
        m.irradiance(np.array([400.0])), 1.0 + 0.5 * np.sin(20.0),
        rtol=1e-6,
    )
    # solar distance scaling: 1/d^2
    np.testing.assert_allclose(
        m.irradiance(np.array([400.0]), solardistance=2.0),
        m.irradiance(np.array([400.0])) / 4.0,
    )
    # average over a flat region equals the sample; integrate = avg * width
    flat = SolarModel(wl, np.full_like(wl, 2.0), mode="average",
                      resolution_nm=10.0)
    np.testing.assert_allclose(flat.irradiance(np.array([500.0])), 2.0,
                               rtol=1e-12)
    integ = SolarModel(wl, np.full_like(wl, 2.0), mode="integrate",
                       resolution_nm=10.0)
    np.testing.assert_allclose(integ.irradiance(np.array([500.0])), 20.0,
                               rtol=1e-12)

    # cached source file (npz analog of the HSRS netCDF)
    monkeypatch.setenv("SASKTRAN2_TPU_DB_ROOT", str(tmp_path))
    sdir = tmp_path / "solar"
    sdir.mkdir(parents=True)
    np.savez(sdir / "solar_irradiance_hsrs_2022_11_30_extended.npz",
             coord_wavelength=wl, irradiance=irr,
             dims_irradiance=np.array(["wavelength"]))
    from sasktran2_tpu.solar.model import HSRS_2022

    m2 = SolarModel(source=HSRS_2022)
    np.testing.assert_allclose(
        m2.irradiance(np.array([400.0])),
        m.irradiance(np.array([400.0])),
    )

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="missing_source"):
        SolarModel(source="missing_source")


def test_osculating_spheroid():
    """WGS84 osculating-spheroid radius (reference geodetic.cpp:283):
    meridian radius of curvature is b^2/a at the equator and a^2/b at the
    poles; the center offset vanishes at both (symmetry points)."""
    from sasktran2_tpu.geodetic import WGS84_A, WGS84_F, Geodetic

    a = WGS84_A
    b = WGS84_A * (1.0 - WGS84_F)

    g = Geodetic().from_lat_lon_alt(0.0, 0.0, 0.0)
    r_eq, off_eq = g.osculating_spheroid()
    np.testing.assert_allclose(r_eq, b * b / a, rtol=1e-9)
    # center offset lies along the surface normal; at the equator it is
    # radial with magnitude a - b^2/a
    np.testing.assert_allclose(
        np.linalg.norm(off_eq), a - b * b / a, rtol=1e-9
    )

    g = Geodetic().from_lat_lon_alt(90.0, 0.0, 0.0)
    r_po, off_po = g.osculating_spheroid()
    np.testing.assert_allclose(r_po, a * a / b, rtol=1e-9)
    np.testing.assert_allclose(
        np.linalg.norm(off_po), a * a / b - b, rtol=1e-8
    )
    # monotonic in latitude between the endpoints
    r_45, _ = Geodetic().from_lat_lon_alt(
        45.0, 0.0, 0.0
    ).osculating_spheroid()
    assert r_eq < r_45 < r_po


def test_ellipsoidal_geometry_limb():
    """GeometryType.Ellipsoidal traces on the osculating sphere: identical
    to a Spherical geometry constructed with the osculating radius, and
    within the expected small deviation of the nominal-sphere result."""
    import sasktran2_tpu as sk
    from sasktran2_tpu.geodetic import Geodetic

    alts = np.linspace(0, 65000, 14)
    config = sk.Config(
        num_streams=2,
        single_scatter_source=sk.SingleScatterSource.Exact,
        multiple_scatter_source=sk.MultipleScatterSource.NoSource,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.TangentAltitudeSolar(20000.0, 0.3, 200000.0, 0.6))

    def run(geometry):
        engine = sk.Engine(config, geometry, viewing)
        atmo = sk.Atmosphere(geometry, config,
                             wavelengths_nm=np.array([450.0]))
        sk.climatology.us76.add_us76_standard_atmosphere(atmo)
        atmo["rayleigh"] = sk.constituent.Rayleigh()
        return engine.calculate_radiance(atmo)["radiance"].to_numpy()[0, 0, 0]

    r_osc, _ = Geodetic().from_lat_lon_alt(45.0, 0.0, 0.0
                                           ).osculating_spheroid()
    r_ell = run(sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=alts, geometry_type=sk.GeometryType.Ellipsoidal,
        reference_latitude_deg=45.0,
    ))
    r_sph_osc = run(sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=r_osc,
        altitude_grid_m=alts, geometry_type=sk.GeometryType.Spherical,
    ))
    r_sph_nom = run(sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=alts, geometry_type=sk.GeometryType.Spherical,
    ))
    np.testing.assert_allclose(r_ell, r_sph_osc, rtol=1e-12)
    # ~0.1% earth-radius change perturbs the limb path slightly but
    # must not change the answer at leading order
    assert r_ell != r_sph_nom
    np.testing.assert_allclose(r_ell, r_sph_nom, rtol=0.05)


def test_extending_doc_constituent_example():
    """The docs/extending.md custom-constituent example runs end-to-end
    and its registered weighting function matches finite differences."""
    import sasktran2_tpu as sk
    from sasktran2_tpu.constituent.base import Constituent
    from sasktran2_tpu.util.state import EquationOfState

    class SpectrallyFlatAbsorber(Constituent):
        def __init__(self, vmr, xsec_m2=1e-25):
            self._vmr = vmr
            self._xsec = xsec_m2

        def add_to_atmosphere(self, atmo):
            eos = EquationOfState(
                atmo.pressure_pa, atmo.temperature_k, None
            )
            nd = eos.air_numberdensity["N"]
            atmo.storage.total_extinction += (
                self._xsec * (nd * self._vmr)[:, None]
            )

        def register_derivative(self, atmo, name):
            eos = EquationOfState(
                atmo.pressure_pa, atmo.temperature_k, None
            )
            nd = eos.air_numberdensity["N"]
            m = atmo.storage.get_derivative_mapping(f"wf_{name}_vmr")
            m.d_extinction[:] = self._xsec * nd[:, None]
            m.d_ssa[:] = -atmo.storage.ssa / np.maximum(
                atmo.storage.total_extinction, 1e-300
            ) * m.d_extinction
            m.interp_dim = "altitude"

    config = sk.Config(
        num_streams=2,
        multiple_scatter_source=sk.MultipleScatterSource.TwoStream,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
        num_singlescatter_moments=4,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 60000, 11),
        geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, 0.3, 0.8, 2e5))
    engine = sk.Engine(config, geometry, viewing)

    def run(vmr):
        atmo = sk.Atmosphere(geometry, config,
                             wavelengths_nm=np.array([450.0]))
        sk.climatology.us76.add_us76_standard_atmosphere(atmo)
        atmo["rayleigh"] = sk.constituent.Rayleigh()
        atmo["my_gas"] = SpectrallyFlatAbsorber(vmr)
        atmo["surface"] = sk.constituent.LambertianSurface(0.3)
        return engine.calculate_radiance(atmo)

    out = run(1e-6)
    wf = out["wf_my_gas_vmr"].to_numpy()
    assert wf.shape[0] == 11
    h = 1e-9
    fd = (
        run(1e-6 + h)["radiance"].to_numpy()
        - run(1e-6 - h)["radiance"].to_numpy()
    )[0, 0, 0] / (2 * h)
    np.testing.assert_allclose(wf.sum(axis=0)[0, 0, 0], fd, rtol=1e-4)


def test_database_converter_tools(tmp_path, monkeypatch):
    """Offline DB builders (reference tools/databases/{o3_dbm,
    no2_vandaele}.py): synthetic raw files -> standard layout -> loadable
    through the named optical classes, with the clamp-row and
    gap-filling semantics verified."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.databases.xs_convert import (
        build_xs_grid,
        convert_no2_vandaele,
        convert_o3_dbm,
    )

    # grid semantics: clamp rows at 0/1000 K, cross-T gap filling
    wv1 = np.linspace(300.0, 400.0, 11)
    wv2 = np.linspace(320.0, 400.0, 9)  # misses 300-310 nm
    g = build_xs_grid(
        [(220.0, wv1, np.full(11, 2.0)), (290.0, wv2, np.full(9, 4.0))],
        air_wavelengths=False,
    )
    assert g["temperature"][0] == 0.0 and g["temperature"][-1] == 1000.0
    # clamp rows copy the coldest/warmest sets (cm^2 -> m^2)
    np.testing.assert_allclose(g["xs"][0][g["wavelength_nm"] >= 320],
                               2.0e-4)
    # where the warm set has no coverage, the cold value fills in
    j = np.searchsorted(g["wavelength_nm"], 300.0)
    np.testing.assert_allclose(g["xs"][:, j], 2.0e-4)

    # end-to-end: synthetic DBM + Vandaele raw files -> converters ->
    # named classes load them from the database root
    dbm_dir = tmp_path / "raw_dbm"
    dbm_dir.mkdir()
    for t in (218, 295):
        body = "h1\nh2\nh3\nh4\n" + "\n".join(
            f"{{{w:.2f}}} {{{1e-21 * (1 + t / 1000):.4e}}}"
            for w in np.linspace(300.0, 330.0, 7)
        ) + "\nfooter"
        (dbm_dir / f"O3_CRS_{t}K.txt").write_text(body)
    no2_dir = tmp_path / "raw_no2"
    no2_dir.mkdir()
    for stem, t in (("no2_294K", 294), ("no2c_220K", 220)):
        body = "idx wn xs\n" + "\n".join(
            f"{i} {1e7 / w:.4f} {2e-23:.4e}"
            for i, w in enumerate(np.linspace(400.0, 430.0, 7))
        )
        (no2_dir / f"{stem}.txt").write_text(body)

    monkeypatch.setenv("SASKTRAN2_TPU_DB_ROOT", str(tmp_path))
    convert_o3_dbm(dbm_dir, tmp_path)
    convert_no2_vandaele(no2_dir, tmp_path)

    from sasktran2_tpu.optical.named import NO2Vandaele, O3DBM

    o3 = O3DBM()
    xs = o3.cross_sections(
        np.array([310.0, 320.0]), temperature_k=np.array([250.0])
    )
    assert xs.shape == (1, 2)
    assert np.all(xs > 0)
    no2 = NO2Vandaele()
    xs2 = no2.cross_sections(
        np.array([410.0]), temperature_k=np.array([250.0])
    )
    assert np.all(xs2 > 0)
