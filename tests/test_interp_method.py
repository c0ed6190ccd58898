"""Grid interpolation policies (linear / shell / lower) in the ray tracer.

Mirrors the reference's per-grid interpolation modes
(``/root/reference/cpp/lib/grids/grid.cpp:103-126``): `linear` uses
fractional weights between bounding levels, `shell` treats the in-shell
value as the mean of the bounding levels, `lower` uses the lower level
only. Previously the repo accepted ``interpolation_method`` and silently
ignored it.
"""

import numpy as np

import sasktran2_tpu as sk


def _engine(method, nalt=11):
    config = sk.Config(
        single_scatter_source=sk.SingleScatterSource.NoSource,
        multiple_scatter_source=sk.MultipleScatterSource.NoSource,
        occultation_source=sk.OccultationSource.Standard,
        output_los_optical_depth=True,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6,
        solar_azimuth=0.0,
        earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 100000, nalt),
        interpolation_method=method,
        geometry_type=sk.GeometryType.Spherical,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.TangentAltitudeSolar(25000.0, 0.0, 600000.0, 0.6))
    return sk.Engine(config, geometry, viewing), geometry


def _od(engine, geometry, ext_profile):
    atmo = sk.Atmosphere(
        geometry,
        engine._config,
        wavelengths_nm=np.array([500.0]),
        calculate_derivatives=False,
    )
    atmo.storage.total_extinction[:] = ext_profile[:, None]
    atmo.storage.ssa[:] = 0.0
    out = engine.calculate_radiance(atmo)
    return float(out["los_optical_depth"].to_numpy()[0, 0])


def test_constant_profile_all_methods_agree():
    ext = np.full(11, 1e-5)
    ods = {}
    for method in sk.InterpolationMethod:
        engine, geometry = _engine(method)
        ods[method] = _od(engine, geometry, ext)
    vals = list(ods.values())
    np.testing.assert_allclose(vals[1:], vals[0], rtol=1e-12)


def test_methods_differ_on_gradient_profile():
    alts = np.linspace(0, 100000, 11)
    ext = 1e-5 * np.exp(-alts / 20000.0)
    od = {}
    for method in sk.InterpolationMethod:
        engine, geometry = _engine(method)
        od[method] = _od(engine, geometry, ext)

    lin = od[sk.InterpolationMethod.LinearInterpolation]
    shell = od[sk.InterpolationMethod.ShellInterpolation]
    lower = od[sk.InterpolationMethod.LowerInterpolation]
    # all are O(1) consistent estimates of the same integral
    np.testing.assert_allclose(shell, lin, rtol=0.05)
    np.testing.assert_allclose(lower, lin, rtol=0.5)
    # but genuinely different quadratures
    assert abs(shell - lin) > 1e-6 * lin
    assert abs(lower - lin) > 1e-3 * lin
    # lower keeps the (larger) lower-level extinction through each shell of
    # a decaying profile -> strictly more optical depth
    assert lower > shell


def test_lower_interpolation_exact_value():
    """Limb ray, lower interpolation: OD = sum over shells of
    k(lower level) * geometric path length, computable in closed form."""
    alts = np.linspace(0, 100000, 11)
    ext = 1e-5 * np.exp(-alts / 20000.0)
    re = 6372000.0
    rt = re + 25000.0
    radii = re + alts

    engine, geometry = _engine(sk.InterpolationMethod.LowerInterpolation)
    od = _od(engine, geometry, ext)

    expected = 0.0
    for j in range(len(radii) - 1):
        lo, hi = radii[j], radii[j + 1]
        if hi <= rt:
            continue
        l_hi = np.sqrt(hi**2 - rt**2)
        l_lo = np.sqrt(max(lo**2 - rt**2, 0.0))
        # both halves of the limb ray traverse the shell
        expected += 2.0 * (l_hi - l_lo) * ext[j]
    np.testing.assert_allclose(od, expected, rtol=1e-10)


def test_geometry2d_rejects_nonlinear():
    import pytest

    geometry = sk.Geometry2D(
        cos_sza=0.6,
        solar_azimuth=0.0,
        earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 100000, 11),
        horizontal_angle_grid_radians=np.linspace(-0.1, 0.1, 3),
        interpolation_method=sk.InterpolationMethod.ShellInterpolation,
    )
    config = sk.Config(
        single_scatter_source=sk.SingleScatterSource.NoSource,
        multiple_scatter_source=sk.MultipleScatterSource.NoSource,
        occultation_source=sk.OccultationSource.Standard,
        output_los_optical_depth=True,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.TangentAltitude(25000.0, 600000.0))
    with pytest.raises(NotImplementedError):
        sk.Engine(config, geometry, viewing)
