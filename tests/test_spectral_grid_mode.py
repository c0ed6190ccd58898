"""SpectralGridMode.AtmosphereIntegratedLineShape: constituents evaluated
on a fine grid, optical quantities reduced onto an output basis grid
(reference ``rust/sasktran2-rs/src/optical/traits.rs:51-76``:
UpsampledStorageInputs + reduce_optical with the rebasis mapping_matrix)."""

import numpy as np

import sasktran2_tpu as sk
from sasktran2_tpu.basis import Grid, mapping_matrix
from sasktran2_tpu.optical.tabulated import TabulatedCrossSectionAbsorber


def _line_xsec(wl):
    """Sharp Lorentzian absorption line at 500 nm on a smooth continuum."""
    return 1e-24 * (0.05 + 1.0 / (1.0 + ((wl - 500.0) / 0.05) ** 2))


def _setup(mode, wl_fine, out_grid):
    config = sk.Config(
        num_streams=4,
        single_scatter_source=sk.SingleScatterSource.NoSource,
        multiple_scatter_source=sk.MultipleScatterSource.NoSource,
        occultation_source=sk.OccultationSource.Standard,
        output_los_optical_depth=True,
        spectral_grid_mode=mode,
    )
    alts = np.linspace(0, 60000, 16)
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=alts, geometry_type=sk.GeometryType.Spherical,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.TangentAltitudeSolar(15000.0, 0.0, 200000.0, 0.6))
    engine = sk.Engine(config, geometry, viewing)
    kwargs = {}
    if mode != sk.SpectralGridMode.Monochromatic:
        kwargs["spectral_grid"] = out_grid
    atmo = sk.Atmosphere(geometry, config, wavelengths_nm=wl_fine.copy(),
                         calculate_derivatives=False, **kwargs)
    sk.climatology.us76.add_us76_standard_atmosphere(atmo)
    xs = TabulatedCrossSectionAbsorber(wl_fine, _line_xsec(wl_fine))
    atmo["gas"] = sk.constituent.VMRAltitudeAbsorber(
        xs, geometry.altitudes(), np.full(16, 5e-6)
    )
    return engine, atmo


def test_integrated_lineshape_od_reduction():
    """LOS optical depth is linear in extinction, so the integrated-mode OD
    must equal the mapping-matrix-reduced monochromatic ODs exactly."""
    wl_fine = np.linspace(499.0, 501.0, 161)
    out_grid = Grid.from_triangles([499.5, 500.0, 500.5], 0.4)

    eng_m, atmo_m = _setup(sk.SpectralGridMode.Monochromatic, wl_fine, None)
    od_fine = eng_m.calculate_radiance(atmo_m)["los_optical_depth"].to_numpy()

    eng_i, atmo_i = _setup(
        sk.SpectralGridMode.AtmosphereIntegratedLineShape, wl_fine, out_grid
    )
    out = eng_i.calculate_radiance(atmo_i)
    od_int = out["los_optical_depth"].to_numpy()

    M = mapping_matrix(Grid.from_deltas(wl_fine), out_grid)
    np.testing.assert_allclose(od_int, M @ od_fine, rtol=1e-10)
    assert od_int.shape[0] == 3
    # output wavelength coordinate comes from the basis centers
    np.testing.assert_allclose(
        out.coords["wavelength"], [499.5, 500.0, 500.5]
    )
    # line-center output integrates more absorption than the wings
    assert od_int[1, 0] > od_int[0, 0]
    assert od_int[1, 0] > od_int[2, 0]
    # repeated calls reuse the pipeline (storage reallocation path)
    od_int2 = eng_i.calculate_radiance(atmo_i)["los_optical_depth"].to_numpy()
    np.testing.assert_allclose(od_int2, od_int, rtol=1e-12)


def test_engine_integrated_lineshape_matches_output_reduction():
    """EngineIntegratedLineShape: the engine runs on the fine grid and the
    OUTPUT radiances/ODs are reduced with the mapping matrix — for a
    quantity linear in the spectrum (OD) this is exactly M @ fine, and the
    radiance must equal the reduced fine-grid radiances (reference third
    SpectralGridMode, rust/rebasis/src/grid.rs:64)."""
    wl_fine = np.linspace(499.0, 501.0, 161)
    out_grid = Grid.from_triangles([499.5, 500.0, 500.5], 0.4)

    eng_m, atmo_m = _setup(sk.SpectralGridMode.Monochromatic, wl_fine, None)
    out_m = eng_m.calculate_radiance(atmo_m)
    od_fine = out_m["los_optical_depth"].to_numpy()
    rad_fine = out_m["radiance"].to_numpy()

    eng_e, atmo_e = _setup(
        sk.SpectralGridMode.EngineIntegratedLineShape, wl_fine, out_grid
    )
    out = eng_e.calculate_radiance(atmo_e)
    od_eng = out["los_optical_depth"].to_numpy()
    rad_eng = out["radiance"].to_numpy()

    M = mapping_matrix(Grid.from_deltas(wl_fine), out_grid)
    np.testing.assert_allclose(od_eng, M @ od_fine, rtol=1e-10)
    np.testing.assert_allclose(
        rad_eng, np.tensordot(M, rad_fine, axes=1), rtol=1e-10
    )
    assert od_eng.shape[0] == 3
    np.testing.assert_allclose(
        out.coords["wavelength"], [499.5, 500.0, 500.5]
    )
    # engine-integrated OD differs from atmosphere-integrated OD only
    # through the nonlinearity of the transmission average (both tested
    # reductions are exact for OD, which is linear) — but the RADIANCE
    # (exp(-od)) differs: engine mode averages exp(-od_fine), atmosphere
    # mode exponentiates the averaged od. Verify the physically expected
    # ordering at the line center (Jensen: mean of exp >= exp of mean).
    eng_i, atmo_i = _setup(
        sk.SpectralGridMode.AtmosphereIntegratedLineShape, wl_fine, out_grid
    )
    rad_atm = eng_i.calculate_radiance(atmo_i)["radiance"].to_numpy()
    assert rad_eng[1, 0, 0] >= rad_atm[1, 0, 0] - 1e-12


def test_integrated_lineshape_wf_fd():
    """Analytic weighting functions through the spectral reduction
    (quotient-rule chain for d_extinction/d_ssa) must match finite
    differences on the fine-grid inputs."""
    wl_fine = np.linspace(499.5, 500.5, 41)
    out_grid = Grid.from_triangles([500.0], 0.6)
    alts = np.linspace(0, 60000, 16)
    config = sk.Config(
        num_streams=4,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        spectral_grid_mode=sk.SpectralGridMode.AtmosphereIntegratedLineShape,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=alts, geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, 0.0, 0.8, 200000.0))
    engine = sk.Engine(config, geometry, viewing)

    def make_atmo(vmr):
        atmo = sk.Atmosphere(geometry, config, wavelengths_nm=wl_fine.copy(),
                             spectral_grid=out_grid)
        sk.climatology.us76.add_us76_standard_atmosphere(atmo)
        xs = TabulatedCrossSectionAbsorber(wl_fine, _line_xsec(wl_fine))
        atmo["rayleigh"] = sk.constituent.Rayleigh()
        atmo["gas"] = sk.constituent.VMRAltitudeAbsorber(
            xs, geometry.altitudes(), vmr
        )
        atmo["surface"] = sk.constituent.LambertianSurface(0.3)
        return atmo

    vmr0 = np.full(16, 5e-6)
    out = engine.calculate_radiance(make_atmo(vmr0.copy()))
    wf = out["wf_gas"].to_numpy()  # [alt, W, los, stokes]

    for i in (4, 10):
        h = vmr0[i] * 1e-3
        up = vmr0.copy(); up[i] += h
        dn = vmr0.copy(); dn[i] -= h
        fd = (
            engine.calculate_radiance(make_atmo(up))["radiance"].to_numpy()
            - engine.calculate_radiance(make_atmo(dn))["radiance"].to_numpy()
        ) / (2 * h)
        np.testing.assert_allclose(wf[i], fd, rtol=2e-4)
