"""Mie ensemble integration over particle size distributions (reference
src/sasktran2/mie/distribution.py) and refractive-index wrappers."""

import numpy as np
import pytest

from sasktran2_tpu.mie import (
    FrozenDistribution,
    GammaDistribution,
    LogNormalDistribution,
    RefractiveIndex,
    TriangularDistribution,
    UniformDistribution,
    integrate_mie,
)


def test_distribution_args_and_freeze():
    ln = LogNormalDistribution()
    assert ln.args() == ["median_radius", "mode_width"]
    frozen = ln.freeze(mode_width=1.6)
    assert isinstance(frozen, FrozenDistribution)
    assert frozen.args() == ["median_radius"]
    d1 = ln.distribution(median_radius=100.0, mode_width=1.6)
    d2 = frozen.distribution(median_radius=100.0)
    np.testing.assert_allclose(d1.mean(), d2.mean())
    with pytest.raises(ValueError, match="not in base"):
        ln.freeze(bogus=1.0)
    with pytest.raises(ValueError, match="bound"):
        UniformDistribution().distribution(min_radius=5.0, max_radius=1.0)
    g = GammaDistribution().distribution(alpha=2.0, beta=0.01)
    np.testing.assert_allclose(g.mean(), 200.0)
    t = TriangularDistribution().distribution(
        min_radius=0.0, max_radius=2.0, center_radius=1.0
    )
    np.testing.assert_allclose(t.mean(), 1.0)


def test_integrate_mie_lognormal():
    """Ensemble-averaged lognormal Mie at 525 nm: phase normalization,
    cross-section positivity, and asymmetry of the forward peak."""
    dist = LogNormalDistribution().distribution(
        median_radius=80.0, mode_width=1.6
    )
    out = integrate_mie(
        dist, lambda wl: 1.45 - 0.0j, np.array([525.0]),
        num_angles=361, num_quad=128, compute_coeffs=True, num_coeffs=32,
    )
    assert out["xs_scattering"][0] > 0
    np.testing.assert_allclose(
        out["xs_total"], out["xs_scattering"] + out["xs_absorption"]
    )
    # non-absorbing: xs_absorption ~ 0
    assert abs(out["xs_absorption"][0]) < 1e-8 * out["xs_total"][0]

    # p11 normalized: integral p11 dmu / 2 == 1
    mu = np.cos(np.deg2rad(out["angle"]))
    p11_int = -np.trapezoid(out["p11"][0], mu) / 2.0
    np.testing.assert_allclose(p11_int, 1.0, rtol=1e-3)

    # greek a1 zeroth moment == 1, g = a1_1/3 in (0, 1) for forward peak
    np.testing.assert_allclose(out["lm_a1"][0, 0], 1.0, rtol=1e-3)
    assert 0.0 < out["lm_a1"][0, 1] / 3.0 < 1.0

    # forward peak dominates backscatter
    assert out["p11"][0, 0] > out["p11"][0, -1]


def test_integrate_mie_matches_scatterer_optical():
    """Cross-check against the MieScatteringOptical lognormal ensemble
    used by the constituent layer (independent quadrature scheme)."""
    from sasktran2_tpu.constituent import MieScatteringOptical

    rg_nm, sigma_g, wl = 100.0, 1.5, 750.0
    dist = LogNormalDistribution().distribution(
        median_radius=rg_nm, mode_width=sigma_g
    )
    out = integrate_mie(
        dist, lambda w: 1.45 - 0.0j, np.array([wl]),
        num_angles=361, num_quad=256,
    )
    opt = MieScatteringOptical(1.45 - 0.0j, rg_nm / 1000.0, sigma_g)
    props = opt.scattering_properties(np.array([wl]))
    # units: integrate_mie returns nm^2; optical returns m^2
    np.testing.assert_allclose(
        out["xs_total"][0] * 1e-18, props["xs_total"][0], rtol=5e-2
    )


def test_refractive_index_wrapper():
    ri = RefractiveIndex(lambda wl: 1.45 - 0.01j, "const")
    assert ri.identifier == "const"
    assert ri.refractive_index(500.0) == 1.45 - 0.01j

    from sasktran2_tpu.mie.refractive import _from_osiris_file
    import tempfile, pathlib

    with tempfile.TemporaryDirectory() as d:
        p = pathlib.Path(d) / "refrac.txt"
        p.write_text("400.0,1.5,0.1\n800.0,1.4,0.2\n")
        fn = _from_osiris_file(p)
        np.testing.assert_allclose(fn(600.0), 1.45 - 0.15j)
