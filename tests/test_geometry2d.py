"""2D geometry: transmission and single scatter (mirrors the reference's
tests/engine/test_geometry2d_transmission.py intent)."""

import numpy as np

import sasktran2_tpu as sk


def _setup(occult=True):
    config = sk.Config(
        single_scatter_source=(sk.SingleScatterSource.NoSource if occult
                               else sk.SingleScatterSource.Exact),
        multiple_scatter_source=sk.MultipleScatterSource.NoSource,
        occultation_source=(sk.OccultationSource.Standard if occult
                            else sk.OccultationSource.NoSource),
        output_los_optical_depth=True,
        num_singlescatter_moments=4,
        num_streams=2,
    )
    geometry = sk.Geometry2D(
        cos_sza=0.6,
        solar_azimuth=0.0,
        earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 80000, 17),
        horizontal_angle_grid_radians=np.linspace(-0.5, 0.5, 11),
    )
    viewing = sk.ViewingGeometry()
    for t in (15000.0, 30000.0):
        viewing.add_ray(sk.TangentAltitude(t, 2e5, 0.0, 0.0))
    return config, geometry, viewing


def test_2d_transmission_homogeneous_matches_1d():
    """A horizontally-uniform 2D atmosphere must give the same LOS optical
    depth as the equivalent 1D spherical trace."""
    config, geometry, viewing = _setup(occult=True)
    engine = sk.Engine(config, geometry, viewing)
    atmo = sk.Atmosphere(geometry, config, numwavel=1,
                         calculate_derivatives=False)
    alts = np.linspace(0, 80000, 17)
    prof = 5e-5 * np.exp(-alts / 8000.0)
    nh = geometry.num_horizontal
    atmo.storage.total_extinction[:] = np.tile(prof, nh)[:, None]
    atmo.storage.ssa[:] = 0.0
    atmo.leg_coeff.a1[0] = 1.0
    out = engine.calculate_radiance(atmo)
    od2d = out["los_optical_depth"].to_numpy()[0]
    rad = out["radiance"].to_numpy()[0, :, 0]
    np.testing.assert_allclose(rad, np.exp(-od2d), rtol=1e-10)

    # 1D comparison
    g1 = sk.Geometry1D(0.6, 0.0, 6372000.0, alts,
                       geometry_type=sk.GeometryType.Spherical)
    v1 = sk.ViewingGeometry()
    for t in (15000.0, 30000.0):
        v1.add_ray(sk.TangentAltitudeSolar(t, 0.0, 2e5, 0.6))
    c1 = sk.Config(
        single_scatter_source=sk.SingleScatterSource.NoSource,
        multiple_scatter_source=sk.MultipleScatterSource.NoSource,
        occultation_source=sk.OccultationSource.Standard,
        output_los_optical_depth=True, num_streams=2,
    )
    e1 = sk.Engine(c1, g1, v1)
    a1 = sk.Atmosphere(g1, c1, numwavel=1, calculate_derivatives=False)
    a1.storage.total_extinction[:] = prof[:, None]
    a1.storage.ssa[:] = 0.0
    a1.leg_coeff.a1[0] = 1.0
    od1d = e1.calculate_radiance(a1)["los_optical_depth"].to_numpy()[0]
    np.testing.assert_allclose(od2d, od1d, rtol=2e-3)


def test_2d_gradient_field_changes_od():
    """A horizontal extinction gradient must break the symmetry between
    rays at different tangent angles."""
    config, geometry, viewing = _setup(occult=True)
    engine = sk.Engine(config, geometry, viewing)
    atmo = sk.Atmosphere(geometry, config, numwavel=1,
                         calculate_derivatives=False)
    alts = np.linspace(0, 80000, 17)
    prof = 5e-5 * np.exp(-alts / 8000.0)
    nh = geometry.num_horizontal
    # a linear horizontal gradient integrates out over the symmetric limb
    # path; use a one-sided (exponential) variation instead
    scale = np.exp(np.linspace(-1.0, 1.0, nh))
    field = np.concatenate([prof * s for s in scale])
    atmo.storage.total_extinction[:] = field[:, None]
    atmo.storage.ssa[:] = 0.0
    atmo.leg_coeff.a1[0] = 1.0
    od_grad = engine.calculate_radiance(atmo)[
        "los_optical_depth"].to_numpy()[0]
    atmo2 = sk.Atmosphere(geometry, config, numwavel=1,
                          calculate_derivatives=False)
    atmo2.storage.total_extinction[:] = np.tile(prof, nh)[:, None]
    atmo2.storage.ssa[:] = 0.0
    atmo2.leg_coeff.a1[0] = 1.0
    od_uni = engine.calculate_radiance(atmo2)[
        "los_optical_depth"].to_numpy()[0]
    assert not np.allclose(od_grad, od_uni, rtol=1e-3)


def test_2d_single_scatter_runs():
    config, geometry, viewing = _setup(occult=False)
    engine = sk.Engine(config, geometry, viewing)
    atmo = sk.Atmosphere(geometry, config, numwavel=1,
                         calculate_derivatives=False)
    alts = np.linspace(0, 80000, 17)
    prof = 5e-5 * np.exp(-alts / 8000.0)
    nh = geometry.num_horizontal
    atmo.storage.total_extinction[:] = np.tile(prof, nh)[:, None]
    atmo.storage.ssa[:] = 0.9
    atmo.leg_coeff.a1[0] = 1.0
    atmo.leg_coeff.a1[2] = 0.5
    rad = engine.calculate_radiance(atmo)["radiance"].to_numpy()[0, :, 0]
    assert np.all(rad > 0)
    assert rad[0] > rad[1]  # lower tangent -> brighter


def test_2d_single_scatter_matches_1d():
    """Homogeneous 2D field: single scatter must match the 1D spherical
    path to high accuracy (same source model, same exact quadrature)."""
    alts = np.linspace(0, 60000, 13)
    prof = 5e-5 * np.exp(-alts / 8000.0)
    cfg = sk.Config(
        single_scatter_source=sk.SingleScatterSource.Exact,
        multiple_scatter_source=sk.MultipleScatterSource.NoSource,
        num_singlescatter_moments=4, num_streams=2,
    )
    g2 = sk.Geometry2D(0.5, 0.0, 6372000.0, alts,
                       np.linspace(-0.4, 0.4, 9))
    v2 = sk.ViewingGeometry()
    for t in (20000.0, 30000.0):
        v2.add_ray(sk.TangentAltitude(t, 2e5, 0.0, 0.0))
    e2 = sk.Engine(cfg, g2, v2)
    a2 = sk.Atmosphere(g2, cfg, numwavel=1, calculate_derivatives=False)
    a2.storage.total_extinction[:] = np.tile(prof, 9)[:, None]
    a2.storage.ssa[:] = 0.8
    a2.leg_coeff.a1[0] = 1.0
    a2.leg_coeff.a1[2] = 0.5
    r2 = e2.calculate_radiance(a2)["radiance"].to_numpy()[0, :, 0]

    g1 = sk.Geometry1D(0.5, 0.0, 6372000.0, alts,
                       geometry_type=sk.GeometryType.Spherical)
    v1 = sk.ViewingGeometry()
    for t in (20000.0, 30000.0):
        v1.add_ray(sk.TangentAltitudeSolar(t, 0.0, 2e5, 0.5))
    e1 = sk.Engine(cfg, g1, v1)
    a1 = sk.Atmosphere(g1, cfg, numwavel=1, calculate_derivatives=False)
    a1.storage.total_extinction[:] = prof[:, None]
    a1.storage.ssa[:] = 0.8
    a1.leg_coeff.a1[0] = 1.0
    a1.leg_coeff.a1[2] = 0.5
    r1 = e1.calculate_radiance(a1)["radiance"].to_numpy()[0, :, 0]
    np.testing.assert_allclose(r2, r1, rtol=1e-4)
