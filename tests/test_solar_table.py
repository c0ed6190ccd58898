"""SingleScatterSource.Table — precomputed (altitude x SZA) solar
transmission table (reference cpp/lib/solar/solartransmissiontable.cpp)."""

import numpy as np

import sasktran2_tpu as sk
from sasktran2_tpu.climatology import add_us76_standard_atmosphere


def _run(ss_source, tangents=(10000.0, 25000.0, 40000.0)):
    config = sk.Config(
        single_scatter_source=ss_source,
        multiple_scatter_source=sk.MultipleScatterSource.NoSource,
        num_singlescatter_moments=8,
        num_streams=2,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 80000, 41),
        geometry_type=sk.GeometryType.Spherical,
    )
    viewing = sk.ViewingGeometry()
    for t in tangents:
        viewing.add_ray(sk.TangentAltitudeSolar(t, 0.3, 2e5, 0.6))
    engine = sk.Engine(config, geometry, viewing)
    atmo = sk.Atmosphere(geometry, config,
                         wavelengths_nm=np.array([450.0, 550.0]),
                         calculate_derivatives=False)
    add_us76_standard_atmosphere(atmo)
    atmo["rayleigh"] = sk.constituent.Rayleigh()
    return engine.calculate_radiance(atmo)["radiance"].to_numpy()


def test_solar_table_matches_exact():
    """The 100-point SZA table reproduces the exact per-point solar
    transmission to interpolation accuracy."""
    r_exact = _run(sk.SingleScatterSource.Exact)
    r_table = _run(sk.SingleScatterSource.Table)
    assert np.all(r_table > 0)
    np.testing.assert_allclose(r_table, r_exact, rtol=2e-4)


def test_solar_table_plane_parallel_falls_back_to_exact():
    config_kwargs = dict(
        multiple_scatter_source=sk.MultipleScatterSource.NoSource,
        num_singlescatter_moments=8,
        num_streams=2,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 60000, 16),
        geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, 0.3, 0.8, 2e5))

    out = {}
    for ss in (sk.SingleScatterSource.Exact, sk.SingleScatterSource.Table):
        config = sk.Config(single_scatter_source=ss, **config_kwargs)
        engine = sk.Engine(config, geometry, viewing)
        atmo = sk.Atmosphere(geometry, config,
                             wavelengths_nm=np.array([550.0]),
                             calculate_derivatives=False)
        add_us76_standard_atmosphere(atmo)
        atmo["rayleigh"] = sk.constituent.Rayleigh()
        out[ss] = engine.calculate_radiance(atmo)["radiance"].to_numpy()
    np.testing.assert_allclose(
        out[sk.SingleScatterSource.Table],
        out[sk.SingleScatterSource.Exact], rtol=1e-12,
    )
