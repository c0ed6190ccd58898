"""Public mesh-sharded entry: Engine.calculate_radiance(..., mesh=) on the
8-virtual-device CPU mesh must reproduce the unsharded results exactly
(shard-invariance — the TPU analog of the reference's thread-count
invariance tests, tests/engine/test_1d_solver_regression.py)."""

import jax
import numpy as np
import pytest

import sasktran2_tpu as sk
from sasktran2_tpu.climatology import add_us76_standard_atmosphere
from sasktran2_tpu.parallel import make_mesh


def _setup(nstr=2, ms=None):
    ms = ms or sk.MultipleScatterSource.TwoStream
    config = sk.Config(
        num_streams=nstr,
        multiple_scatter_source=ms,
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
    return config, geometry, viewing


def test_sharded_hlo_has_no_hot_path_collectives():
    """Pins the MULTICHIP_SCALING.json note's claim: the wavelength axis
    is embarrassingly parallel, so the compiled SPMD HLO of the sharded
    forward+Jacobian step must contain NO cross-device collectives
    (all-reduce / all-gather / reduce-scatter / collective-permute /
    all-to-all). A partitioning change that silently introduces one would
    turn ICI traffic into a per-solve cost and show up here, not in a
    noisy throughput number."""
    config, geometry, viewing = _setup()
    engine = sk.Engine(config, geometry, viewing)
    mesh = make_mesh(n_wavelength=8, n_los=1)
    atmo = sk.Atmosphere(
        geometry, config, wavelengths_nm=np.linspace(300.0, 700.0, 16),
    )
    add_us76_standard_atmosphere(atmo)
    atmo["rayleigh"] = sk.constituent.Rayleigh()
    atmo["surface"] = sk.constituent.LambertianSurface(0.3)
    engine.calculate_radiance(atmo, mesh=mesh)  # builds _compute_jit

    from sasktran2_tpu.parallel import shard_core_wavelength

    core = {
        k: np.asarray(v, dtype=engine._dtype)
        for k, v in atmo.internal_object().items()
    }
    core, _ = shard_core_wavelength(core, mesh)
    hlo = engine._compute_jit.lower(core).compile().as_text()
    for op in ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all"):
        assert op not in hlo, (
            f"hot-path SPMD HLO contains a {op}; the wavelength-sharded "
            "solve is supposed to be collective-free"
        )


@pytest.mark.parametrize("W", [8, 11])  # 11 exercises the shard padding
def test_mesh_sharded_matches_unsharded(W):
    config, geometry, viewing = _setup()
    engine = sk.Engine(config, geometry, viewing)

    def run(mesh):
        atmo = sk.Atmosphere(
            geometry, config,
            wavelengths_nm=np.linspace(300.0, 700.0, W),
        )
        add_us76_standard_atmosphere(atmo)
        atmo["rayleigh"] = sk.constituent.Rayleigh()
        atmo["surface"] = sk.constituent.LambertianSurface(0.3)
        return engine.calculate_radiance(atmo, mesh=mesh)

    assert len(jax.devices()) >= 8
    mesh = make_mesh(n_wavelength=8, n_los=1)
    out_m = run(mesh)
    out_s = run(None)
    for key in out_s.keys():
        # Not bit-equal: per-shard compilation changes SIMD vector widths,
        # and 1-ulp transcendental differences amplify through the
        # two-stream divided differences to ~5e-9 relative (measured at
        # f64). The reference's own thread-invariance tests compare at
        # allclose level for the same reason.
        # 1e-4 * peak absolute floor: the pressure/temperature EOS WFs
        # chain the ulp noise through a near-cancelling d_ext/d_ssa sum
        # (same bound + rationale as the engine fast-path parity tests).
        b = out_s[key].to_numpy()
        np.testing.assert_allclose(
            out_m[key].to_numpy(), b,
            rtol=1e-6, atol=1e-4 * np.abs(b).max(), err_msg=key,
        )
