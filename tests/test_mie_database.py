"""Cached Mie database generation (reference src/sasktran2/database/mie.py)."""

import numpy as np

from sasktran2_tpu.database.mie import MieDatabase
from sasktran2_tpu.mie import LogNormalDistribution, RefractiveIndex


def _make(tmp_path, **kw):
    return MieDatabase(
        LogNormalDistribution(),
        RefractiveIndex(lambda wl: 1.45 - 0.0j, "const145"),
        np.array([525.0, 750.0]),
        db_root=tmp_path,
        max_legendre_moments=16,
        num_size_quadrature=64,
        num_angles=181,
        median_radius=np.array([80.0, 160.0]),
        mode_width=np.array([1.5, 1.7]),
        **kw,
    )


def test_mie_database_generate_and_load(tmp_path):
    db = _make(tmp_path)
    assert db.data_file.exists()

    props = db.scattering_properties(
        np.array([525.0]), altitudes_m=np.array([0.0, 1.0]),
        median_radius=np.array([80.0, 160.0]),
        mode_width=np.array([1.5, 1.7]),
    )
    assert props["xs_total"].shape == (2, 1)
    assert np.all(props["xs_total"] > 0)
    assert np.all((props["ssa"] > 0.99) & (props["ssa"] <= 1.0 + 1e-12))
    # bigger particles scatter more
    assert props["xs_total"][1, 0] > props["xs_total"][0, 0]
    # normalized a1: l=0 moment exactly 1
    np.testing.assert_allclose(props["legendre"][0], 1.0)

    # cache hit: second construction must not regenerate
    import os

    mtime = os.path.getmtime(db.data_file)
    db2 = _make(tmp_path)
    assert os.path.getmtime(db2.data_file) == mtime

    # changing the recipe changes the cache key
    db3 = MieDatabase(
        LogNormalDistribution(),
        RefractiveIndex(lambda wl: 1.45 - 0.0j, "const145"),
        np.array([525.0, 750.0]),
        db_root=tmp_path,
        max_legendre_moments=8,
        num_size_quadrature=64,
        num_angles=181,
        median_radius=np.array([80.0]),
        mode_width=np.array([1.5]),
    )
    assert db3.data_file != db.data_file


def test_mie_database_cross_check_with_direct_integration(tmp_path):
    """Database values equal a direct integrate_mie call."""
    from sasktran2_tpu.mie.distribution import integrate_mie

    db = _make(tmp_path)
    dist = LogNormalDistribution().distribution(
        median_radius=80.0, mode_width=1.5
    )
    direct = integrate_mie(
        dist, lambda wl: 1.45 - 0.0j, np.array([525.0]),
        num_angles=181, num_quad=64, maxintquantile=0.999999,
    )
    props = db.scattering_properties(
        np.array([525.0]), altitudes_m=np.array([0.0]),
        median_radius=np.array([80.0]), mode_width=np.array([1.5]),
    )
    np.testing.assert_allclose(
        props["xs_total"][0, 0], direct["xs_total"][0] * 1e-18, rtol=1e-10
    )
