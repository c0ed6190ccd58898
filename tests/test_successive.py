"""Successive-orders source: consistency with discrete ordinates."""

import numpy as np

import sasktran2_tpu as sk
from sasktran2_tpu.test_util import default_pure_scattering_atmosphere


def _engines(nstr=8, iterations=30):
    geometry = sk.Geometry1D(
        cos_sza=0.7, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 60000, 16),
        geometry_type=sk.GeometryType.Spherical,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.7, 0.4, 0.8, 200000.0))

    c_so = sk.Config(
        num_streams=nstr,
        multiple_scatter_source=sk.MultipleScatterSource.SuccessiveOrders,
        single_scatter_source=sk.SingleScatterSource.Exact,
        num_singlescatter_moments=4,
        num_successive_orders_iterations=iterations,
        num_successive_orders_incoming=100,
    )
    c_do = sk.Config(
        num_streams=nstr,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.Exact,
        num_singlescatter_moments=4,
    )
    e_so = sk.Engine(c_so, geometry, viewing)
    e_do = sk.Engine(c_do, geometry, viewing)
    return c_so, c_do, geometry, e_so, e_do


def test_so_vs_do_nadir():
    c_so, c_do, geometry, e_so, e_do = _engines()
    a1 = default_pure_scattering_atmosphere(c_so, geometry, ssa=0.8,
                                            albedo=0.0)
    r_so = e_so.calculate_radiance(a1)["radiance"].to_numpy()[0, 0, 0]
    a2 = default_pure_scattering_atmosphere(c_do, geometry, ssa=0.8,
                                            albedo=0.0)
    r_do = e_do.calculate_radiance(a2)["radiance"].to_numpy()[0, 0, 0]
    # independent angular discretizations. Convergence study (round 3),
    # this config (ssa=0.8, albedo=0): n_inc 100 -> 1.8%, 196 -> 1.4%,
    # 324 -> 1.3%, 484 -> 1.3% — a ~1.3% plateau that persists at
    # 1000x earth radius, i.e. a transport-discretization floor for the
    # dark-surface case, not sphericity. The albedo=0.3 configuration
    # (test_so_direction_grid_convergence below) converges under 1%.
    np.testing.assert_allclose(r_so, r_do, rtol=2e-2)
    assert r_so > 0


def test_so_direction_grid_convergence():
    """SO -> DO error decreases monotonically with direction-grid density
    (the convergence study backing the 1% tolerance above)."""
    geometry = sk.Geometry1D(
        cos_sza=0.7, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 60000, 16),
        geometry_type=sk.GeometryType.Spherical,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.7, 0.4, 0.8, 200000.0))

    def run(ms, n_inc=100):
        c = sk.Config(
            num_streams=8,
            multiple_scatter_source=ms,
            single_scatter_source=sk.SingleScatterSource.Exact,
            num_singlescatter_moments=4,
            num_successive_orders_iterations=30,
            num_successive_orders_incoming=n_inc,
        )
        e = sk.Engine(c, geometry, viewing)
        a = default_pure_scattering_atmosphere(c, geometry, ssa=0.8,
                                               albedo=0.3)
        return e.calculate_radiance(a)["radiance"].to_numpy()[0, 0, 0]

    r_do = run(sk.MultipleScatterSource.DiscreteOrdinates)
    errs = [
        abs(run(sk.MultipleScatterSource.SuccessiveOrders, n) - r_do)
        for n in (64, 144)
    ]
    assert errs[1] < errs[0]
    assert errs[1] / r_do < 1e-2


def test_so_iterations_converge():
    geometry = sk.Geometry1D(
        cos_sza=0.7, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 60000, 12),
        geometry_type=sk.GeometryType.Spherical,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.7, 0.4, 0.8, 200000.0))

    def run(iters):
        c = sk.Config(
            num_streams=4,
            multiple_scatter_source=sk.MultipleScatterSource.SuccessiveOrders,
            single_scatter_source=sk.SingleScatterSource.Exact,
            num_singlescatter_moments=4,
            num_successive_orders_iterations=iters,
            num_successive_orders_incoming=36,
        )
        e = sk.Engine(c, geometry, viewing)
        a = default_pure_scattering_atmosphere(c, geometry, ssa=0.9,
                                               albedo=0.2)
        return e.calculate_radiance(a)["radiance"].to_numpy()[0, 0, 0]

    r5, r15, r30 = run(5), run(15), run(30)
    # geometric convergence: successive differences shrink
    assert abs(r30 - r15) < abs(r15 - r5)
    np.testing.assert_allclose(r15, r30, rtol=1e-3)


def test_so_vs_do_reflective_surface():
    """Diffuse ground reflection in the SO iteration: with a bright surface
    the SO and DO solutions must still agree (reference DiffuseTable ground
    sphere, diffuse_table.cpp:521)."""
    c_so, c_do, geometry, e_so, e_do = _engines()
    a1 = default_pure_scattering_atmosphere(c_so, geometry, ssa=0.9,
                                            albedo=0.8)
    r_so = e_so.calculate_radiance(a1)["radiance"].to_numpy()[0, 0, 0]
    a2 = default_pure_scattering_atmosphere(c_do, geometry, ssa=0.9,
                                            albedo=0.8)
    r_do = e_do.calculate_radiance(a2)["radiance"].to_numpy()[0, 0, 0]
    np.testing.assert_allclose(r_so, r_do, rtol=5e-2)

    # and the reflective-surface radiance must exceed the dark-surface one
    a3 = default_pure_scattering_atmosphere(c_so, geometry, ssa=0.9,
                                            albedo=0.0)
    r_dark = e_so.calculate_radiance(a3)["radiance"].to_numpy()[0, 0, 0]
    assert r_so > 1.5 * r_dark


def test_so_do_initialization():
    """DO-initialized successive orders (reference initialize_hr_with_do,
    diffuse_table.cpp:739): with the DO seed, 2 iterations must land much
    closer to the converged (40-iteration) answer than 2 cold iterations
    do, and the converged answers must agree regardless of the seed."""
    geometry = sk.Geometry1D(
        cos_sza=0.7, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 60000, 12),
        geometry_type=sk.GeometryType.Spherical,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.7, 0.4, 0.8, 200000.0))

    def run(iters, do_init):
        c = sk.Config(
            num_streams=8,
            multiple_scatter_source=sk.MultipleScatterSource.SuccessiveOrders,
            single_scatter_source=sk.SingleScatterSource.Exact,
            num_singlescatter_moments=4,
            num_successive_orders_iterations=iters,
            num_successive_orders_incoming=100,
            init_successive_orders_with_discrete_ordinates=do_init,
        )
        e = sk.Engine(c, geometry, viewing)
        a = default_pure_scattering_atmosphere(c, geometry, ssa=0.95,
                                               albedo=0.3)
        return e.calculate_radiance(a)["radiance"].to_numpy()[0, 0, 0]

    converged = run(40, False)
    cold2 = run(2, False)
    warm2 = run(2, True)
    converged_warm = run(40, True)
    np.testing.assert_allclose(converged_warm, converged, rtol=1e-9)
    err_cold = abs(cold2 - converged)
    err_warm = abs(warm2 - converged)
    assert err_warm < 0.25 * err_cold


def test_so_multiple_scatter_refraction():
    """multiple_scatter_refraction: with n=1 the refracted SO geometry must
    reproduce the straight tracer (exact linear-in-radius quadrature vs
    midpoint split: sub-0.1%); with a realistic refractive profile the
    radiance shifts by a small, nonzero amount (reference traces HR
    incoming rays refracted, diffuse_table.cpp:250)."""
    alts = np.linspace(0, 60000, 16)

    def run(ms_refraction, with_index):
        n_index = None
        if with_index:
            # Ciddor-like exponential profile, n-1 ~ 2.8e-4 at the ground
            n_index = 1.0 + 2.8e-4 * np.exp(-alts / 8000.0)
        geometry = sk.Geometry1D(
            cos_sza=0.7, solar_azimuth=0.0, earth_radius_m=6372000.0,
            altitude_grid_m=alts,
            geometry_type=sk.GeometryType.Spherical,
        )
        if n_index is not None:
            geometry.refractive_index = n_index
        viewing = sk.ViewingGeometry()
        viewing.add_ray(sk.GroundViewingSolar(0.7, 0.4, 0.3, 200000.0))
        c = sk.Config(
            num_streams=8,
            multiple_scatter_source=sk.MultipleScatterSource.SuccessiveOrders,
            single_scatter_source=sk.SingleScatterSource.Exact,
            num_singlescatter_moments=4,
            num_successive_orders_iterations=20,
            num_successive_orders_incoming=100,
            multiple_scatter_refraction=ms_refraction,
        )
        e = sk.Engine(c, geometry, viewing)
        a = default_pure_scattering_atmosphere(c, geometry, ssa=0.9,
                                               albedo=0.3)
        return e.calculate_radiance(a)["radiance"].to_numpy()[0, 0, 0]

    r_straight = run(False, False)
    r_vacuum = run(True, False)
    np.testing.assert_allclose(r_vacuum, r_straight, rtol=1e-3)

    r_refr = run(True, True)
    assert r_refr != r_straight
    # refraction is a small correction, not a blow-up
    np.testing.assert_allclose(r_refr, r_straight, rtol=2e-2)


def test_so_sza_grid_limb_high_sza():
    """SZA-grid diffuse profiles (reference DiffuseTable SZA x altitude
    grid): at high SZA the solar attenuation varies strongly along a limb
    ray, so a single diffuse profile at the reference SZA is biased;
    the SZA-grid version must (a) differ materially from the single
    profile and (b) move toward the SZA-interpolated DO reference."""
    cos_sza = 0.15  # ~81 degrees
    geometry = sk.Geometry1D(
        cos_sza=cos_sza, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 60000, 13),
        geometry_type=sk.GeometryType.Spherical,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.TangentAltitudeSolar(20000.0, 0.6, 2e5, cos_sza))

    def so_config(n_sza):
        return sk.Config(
            num_streams=8,
            multiple_scatter_source=(
                sk.MultipleScatterSource.SuccessiveOrders
            ),
            single_scatter_source=sk.SingleScatterSource.Exact,
            num_singlescatter_moments=4,
            num_successive_orders_iterations=30,
            num_successive_orders_incoming=100,
            num_successive_orders_sza=n_sza,
        )

    c_do = sk.Config(
        num_streams=8,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.Exact,
        num_singlescatter_moments=4,
        num_do_sza=5,
    )

    def run(config):
        engine = sk.Engine(config, geometry, viewing)
        atmo = default_pure_scattering_atmosphere(
            config, geometry, ssa=0.9, albedo=0.0
        )
        return float(
            engine.calculate_radiance(atmo)["radiance"].to_numpy()[0, 0, 0]
        )

    r_single = run(so_config(1))
    r_grid = run(so_config(5))
    r_do = run(c_do)

    # materially different at high SZA
    assert abs(r_grid - r_single) / r_do > 0.005
    # and closer to the SZA-resolved DO reference
    assert abs(r_grid - r_do) < abs(r_single - r_do)
