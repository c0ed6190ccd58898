"""StokesBasis output transforms (Standard / Solar / Observer).

Reference rotates the output (Q, U) per line of sight into the requested
reference plane (``cpp/lib/output/output.cpp:28-56``,
``geometry.cpp:232-307``); previously the repo accepted the enum and
silently ignored it.
"""

import numpy as np
import sasktran2_tpu as sk


def _run(basis, relazi=1.1):
    config = sk.Config(
        num_streams=4,
        num_stokes=3,
        multiple_scatter_source=sk.MultipleScatterSource.DiscreteOrdinates,
        single_scatter_source=sk.SingleScatterSource.DiscreteOrdinates,
        num_singlescatter_moments=4,
        stokes_basis=basis,
    )
    geometry = sk.Geometry1D(
        cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
        altitude_grid_m=np.linspace(0, 60000, 11),
        geometry_type=sk.GeometryType.PlaneParallel,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(0.6, relazi, 0.8, 2e5))
    engine = sk.Engine(config, geometry, viewing)
    atmo = _rayleigh_atmo(geometry, config)
    return engine.calculate_radiance(atmo)


def _rayleigh_atmo(geometry, config):
    nlvl = geometry.num_altitudes
    atmo = sk.Atmosphere(
        geometry, config,
        wavelengths_nm=np.array([450.0]),
    )
    atmo.pressure_pa = 101325 * np.exp(-geometry.altitudes() / 7500)
    atmo.temperature_k = np.full(nlvl, 250.0)
    atmo["rayleigh"] = sk.constituent.Rayleigh()
    atmo["surface"] = sk.constituent.LambertianSurface(0.2)
    return atmo


def test_solar_basis_preserves_intensity_and_dolp():
    out_std = _run(sk.StokesBasis.Standard)
    out_sol = _run(sk.StokesBasis.Solar)
    r_std = out_std["radiance"].to_numpy()
    r_sol = out_sol["radiance"].to_numpy()
    # I unchanged; Q^2 + U^2 (degree of linear polarization) invariant
    np.testing.assert_allclose(r_sol[..., 0], r_std[..., 0], rtol=1e-12)
    np.testing.assert_allclose(
        r_sol[..., 1] ** 2 + r_sol[..., 2] ** 2,
        r_std[..., 1] ** 2 + r_std[..., 2] ** 2,
        rtol=1e-10,
    )
    # a genuinely rotated frame at relazi != 0
    assert not np.allclose(r_sol[..., 1], r_std[..., 1], rtol=1e-6)


def test_solar_basis_identity_in_principal_plane():
    """With the sun, look vector and zenith coplanar (relazi = 0), the
    solar reference plane IS the meridian plane: rotation is identity."""
    out_std = _run(sk.StokesBasis.Standard, relazi=0.0)
    out_sol = _run(sk.StokesBasis.Solar, relazi=0.0)
    np.testing.assert_allclose(
        out_sol["radiance"].to_numpy(),
        out_std["radiance"].to_numpy(),
        rtol=1e-10, atol=1e-14,
    )


def test_observer_basis_identity_for_nadir_geometry():
    """Ground-viewing from (near) overhead: the observer position is
    (near) radial, so the observer plane coincides with the meridian
    plane and the rotation is (near) identity only when look is vertical;
    for slant looks it differs from standard."""
    out_std = _run(sk.StokesBasis.Standard)
    out_obs = _run(sk.StokesBasis.Observer)
    r_std = out_std["radiance"].to_numpy()
    r_obs = out_obs["radiance"].to_numpy()
    np.testing.assert_allclose(r_obs[..., 0], r_std[..., 0], rtol=1e-12)
    np.testing.assert_allclose(
        r_obs[..., 1] ** 2 + r_obs[..., 2] ** 2,
        r_std[..., 1] ** 2 + r_std[..., 2] ** 2,
        rtol=1e-10,
    )


def test_wfs_rotate_with_radiance():
    """FD check in the rotated basis: the emitted WFs must be the
    derivative of the ROTATED radiance."""
    def run(scale):
        config = sk.Config(
            num_streams=4,
            num_stokes=3,
            multiple_scatter_source=(
                sk.MultipleScatterSource.DiscreteOrdinates
            ),
            single_scatter_source=(
                sk.SingleScatterSource.DiscreteOrdinates
            ),
            num_singlescatter_moments=4,
            stokes_basis=sk.StokesBasis.Solar,
        )
        geometry = sk.Geometry1D(
            cos_sza=0.6, solar_azimuth=0.0, earth_radius_m=6372000.0,
            altitude_grid_m=np.linspace(0, 60000, 11),
            geometry_type=sk.GeometryType.PlaneParallel,
        )
        viewing = sk.ViewingGeometry()
        viewing.add_ray(sk.GroundViewingSolar(0.6, 1.1, 0.8, 2e5))
        engine = sk.Engine(config, geometry, viewing)
        atmo = _rayleigh_atmo(geometry, config)
        atmo.pressure_pa = atmo.pressure_pa * scale
        out = engine.calculate_radiance(atmo)
        return out, atmo

    base, atmo_b = run(1.0)
    # d radiance / d pressure at level 5 via the rayleigh pressure WF
    wf = base["wf_rayleigh_pressure_pa"].to_numpy()[5, 0, 0]  # [stokes]
    p5 = atmo_b.pressure_pa[5]
    eps = 1e-3
    up, _ = run(1.0 + eps)
    dn, _ = run(1.0 - eps)
    fd_all = (
        up["radiance"].to_numpy()[0, 0] - dn["radiance"].to_numpy()[0, 0]
    ) / (2 * eps)
    # full-profile scaling: FD = sum_i p_i dI/dp_i; compare against the
    # analytic sum (all levels), in the ROTATED basis
    wf_all = base["wf_rayleigh_pressure_pa"].to_numpy()[:, 0, 0]  # [A, st]
    analytic = np.sum(
        wf_all * atmo_b.pressure_pa[:, None], axis=0
    )
    np.testing.assert_allclose(analytic, fd_all, rtol=5e-4, atol=1e-12)
