"""External validation scenarios beyond DISORT 7a / Coulson:

* Korkin-style conservative Rayleigh slab (the reference's
  ``korkin.ipynb`` scenario — its own notebook is an unexecuted stub
  producing NaN): tau = 0.25, ssa = 1, pure Rayleigh, dark surface,
  cross-validated between the engine's independent SO and DO routes.
* Zawada et al. (2021) limb vector intercomparison, gated on the zenodo
  data file being present locally (zero-egress build cannot download
  record 4292303; place it under <database_root>/validation/).
"""

import numpy as np
import pytest

import sasktran2_tpu as sk
from sasktran2_tpu.test_util import zawada


def _korkin_scenario(ms_source, num_stokes=1, n_sza=1, nstr=16,
                     derivs=True):
    """The reference korkin.ipynb configuration: sza = 0.76 deg,
    vza = 40.76 deg, 100 km slab of tau 0.25 conservative Rayleigh."""
    sza, vza = 0.76, 40.76
    top_alt = 100000.0
    nalt = 50
    config = sk.Config(
        num_streams=nstr,
        num_stokes=num_stokes,
        multiple_scatter_source=ms_source,
        single_scatter_source=sk.SingleScatterSource.Exact,
        num_singlescatter_moments=4,
        num_successive_orders_iterations=50,
        init_successive_orders_with_discrete_ordinates=False,
        num_successive_orders_sza=n_sza,
        num_do_sza=n_sza,
    )
    if ms_source == sk.MultipleScatterSource.DiscreteOrdinates:
        config.single_scatter_source = (
            sk.SingleScatterSource.DiscreteOrdinates
        )
    geometry = sk.Geometry1D(
        cos_sza=float(np.cos(np.deg2rad(sza))),
        solar_azimuth=0.0,
        earth_radius_m=6371000.0,
        altitude_grid_m=np.linspace(0, top_alt, nalt),
        geometry_type=sk.GeometryType.Spherical,
    )
    viewing = sk.ViewingGeometry()
    viewing.add_ray(sk.GroundViewingSolar(
        float(np.cos(np.deg2rad(sza))), 0.0,
        float(np.cos(np.deg2rad(vza))), 2 * top_alt,
    ))
    engine = sk.Engine(config, geometry, viewing)
    atmo = sk.Atmosphere(geometry, config, numwavel=1,
                         calculate_derivatives=derivs)
    atmo.storage.total_extinction[:] = 0.25 / top_alt
    atmo.storage.ssa[:] = 1.0
    a1 = atmo.leg_coeff.a1
    a1[0] = 1.0
    a1[2] = 0.5
    if num_stokes == 3:
        atmo.leg_coeff.a2[2] = 3.0
        atmo.leg_coeff.b1[2] = np.sqrt(6.0) / 2.0
    atmo.surface.albedo[:] = 0.0
    return engine, atmo


def test_korkin_rayleigh_slab_so_vs_do():
    """pi*I of the Korkin conservative Rayleigh slab from the two
    independent multiple-scatter formulations must agree at the
    sub-percent level (the scenario the reference's notebook fails to
    execute)."""
    e_so, a_so = _korkin_scenario(sk.MultipleScatterSource.SuccessiveOrders)
    e_do, a_do = _korkin_scenario(sk.MultipleScatterSource.DiscreteOrdinates)
    i_so = float(
        e_so.calculate_radiance(a_so)["radiance"].to_numpy()[0, 0, 0]
    )
    i_do = float(
        e_do.calculate_radiance(a_do)["radiance"].to_numpy()[0, 0, 0]
    )
    np.testing.assert_allclose(i_so, i_do, rtol=1.5e-2)
    # Benchmark magnitude: pi*I for tau=0.25 conservative Rayleigh at
    # near-overhead sun, vza ~ 41 deg, dark surface: measured 0.0975
    # (Coulson-table regime); bound it loosely
    assert 0.07 < np.pi * i_do < 0.14


def test_korkin_rayleigh_slab_polarized_dolp():
    """Polarized engine variant: the conservative Rayleigh slab at
    vza ~ 41 deg near the principal plane produces a strongly polarized
    sky with Q < 0 (scattering angle ~ 139 deg => polarization
    perpendicular to the scattering plane) and U ~ 0 by symmetry.

    Runs at nstr=8 with WFs off: the full ENGINE graph at polarized
    nstr=16 does not compile within 50 min on the CPU test backend even
    without the VJP (measured round 5) — the 16-stream polarized
    envelope is instead closed at the solver level against the dense
    expm oracle (tests/test_nstream_vec.py::
    test_vector_minor_16_streams_vs_bruteforce, which compiles in ~60 s)
    and exercised end-to-end on the TPU bench (pol3_16str case). The
    slab needs only l <= 2 moments, so nstr=8 is stream-converged."""
    e_v, a_v = _korkin_scenario(
        sk.MultipleScatterSource.DiscreteOrdinates, num_stokes=3, nstr=8,
        derivs=False,  # the DOLP assertions use no WFs
    )
    assert e_v._polarized_fast_ok()
    rad = e_v.calculate_radiance(a_v)["radiance"].to_numpy()[0, 0]
    i, q, u = rad
    assert i > 0
    dolp = np.hypot(q, u) / i
    assert 0.1 < dolp < 0.7
    # principal-plane symmetry: |U| << |Q|
    assert abs(u) < 0.05 * abs(q)


needs_zawada = pytest.mark.skipif(
    zawada.comparison_file() is None,
    reason="zawada_AMT_rtm_comparison_data_v1.nc not present "
    "(zero-egress build; place it under <database_root>/validation/)",
)


@needs_zawada
def test_zawada_single_scatter_case():
    """Test case 1 (single scatter) of the 2021 limb vector
    intercomparison: engine I/Q/U within the published multi-model
    spread (paper reports sub-0.5%-of-I agreement)."""
    scen = zawada.load_scenario(0, 2, 0, 0, altitude_spacing=500.0)
    engine = sk.Engine(scen["config"], scen["geometry"], scen["viewing"])
    out = engine.calculate_radiance(scen["atmosphere"])
    rad = out["radiance"].to_numpy()
    assert np.all(np.isfinite(rad))
    pd = zawada.percent_difference_vs_models(rad, scen, test_case=0)
    assert np.nanmedian(np.abs(pd[..., 0])) < 1.0
