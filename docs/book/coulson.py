"""Coulson-table comparison: polarized Rayleigh slab, tau = 0.5, ssa = 1,
mu0 = 0.2, dark surface, 40 streams — computed I/Q/U * pi vs the
reference engine's executed Coulson run
(``/root/reference/docs/performance_book/source/external_validation/
coulsen.ipynb`` cell 1 output). Published values and scenario match
``tests/test_polarized.py``.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from common import fmt, setup_backend, write_report  # noqa: E402

MUS = [0.02] * 7 + [0.06] * 7
PHIS = [1e-4, 30, 60, 90, 120, 150, 180] * 2
PUBLISHED = np.array([
    [4.41293240e-01, 1.75261058e-02, 1.55014156e-07],
    [3.94444790e-01, 6.48478175e-02, 4.39036280e-02],
    [3.00907330e-01, 1.59650679e-01, 7.36552548e-02],
    [2.54653913e-01, 2.07567424e-01, 8.12829559e-02],
    [3.02532989e-01, 1.61276339e-01, 6.71309546e-02],
    [3.97260515e-01, 6.76635417e-02, 3.73793279e-02],
    [4.44544558e-01, 2.07774240e-02, 0.0],
    [3.92505813e-01, 1.77156658e-02, 1.59193697e-07],
    [3.52229443e-01, 5.94372415e-02, 4.42873579e-02],
    [2.72097636e-01, 1.43301327e-01, 7.04698002e-02],
    [2.33392212e-01, 1.86593849e-01, 7.15317627e-02],
    [2.76389542e-01, 1.47593233e-01, 5.34268472e-02],
    [3.59663242e-01, 6.68710404e-02, 2.72444048e-02],
    [4.01089625e-01, 2.62994773e-02, 0.0],
])
TOL = {"I": 3e-4, "Q": 2e-3, "U": 2e-3}


def run():
    backend = setup_backend()
    import jax.numpy as jnp

    from sasktran2_tpu.rt import disco_vec

    L = 3
    a1 = np.zeros(L); a1[0] = 1.0; a1[2] = 0.5  # noqa: E702
    a2 = np.zeros(L); a2[2] = 3.0               # noqa: E702
    a3 = np.zeros(L)
    b1 = np.zeros(L); b1[2] = np.sqrt(6.0) / 2  # noqa: E702

    user_mu = np.array(MUS)
    user_up = np.ones(len(user_mu), dtype=bool)
    user_azi = np.pi - np.deg2rad(np.array(PHIS))
    tables = disco_vec.build_vector_mode_tables(40, L, 0.2, user_mu,
                                                num_azimuth=3)
    rad = np.asarray(disco_vec.solve_plane_parallel_vector(
        jnp.asarray([[0.5]]), jnp.asarray([[1.0]]),
        jnp.asarray(a1)[None, None], jnp.asarray(a2)[None, None],
        jnp.asarray(a3)[None, None], jnp.asarray(b1)[None, None],
        jnp.asarray([0.0]), tables, user_up, user_azi,
    ))[0] * np.pi

    lines = [
        "# Coulson tables — polarized Rayleigh slab",
        "",
        "tau = 0.5, ssa = 1, mu0 = 0.2, albedo = 0, nstr = 40, "
        f"backend = {backend} (f64).",
        "Published column: reference engine's executed coulsen.ipynb "
        "(itself validated against the Coulson/Dave/Sekera tables).",
        "",
        "| mu | phi (deg) | I*pi | I published | Q*pi | Q published "
        "| U*pi | U published |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for i, (mu, phi) in enumerate(zip(MUS, PHIS)):
        lines.append(
            f"| {mu} | {phi:g} | {fmt(rad[i, 0])} | "
            f"{fmt(PUBLISHED[i, 0])} | {fmt(rad[i, 1])} | "
            f"{fmt(PUBLISHED[i, 1])} | {fmt(rad[i, 2])} | "
            f"{fmt(PUBLISHED[i, 2])} |"
        )

    drift = []
    maxrel = {}
    for ci, comp in enumerate("IQU"):
        denom = np.maximum(np.abs(PUBLISHED[:, ci]), 1e-6)
        rel = np.max(np.abs(rad[:, ci] - PUBLISHED[:, ci]) / denom)
        maxrel[comp] = rel
        if rel > TOL[comp]:
            drift.append(f"{comp}: max rel diff {rel:.2e} > {TOL[comp]}")
    lines += [
        "",
        "Max relative difference vs published: "
        + ", ".join(f"{c} = {maxrel[c]:.2e} (tol {TOL[c]})" for c in "IQU")
        + ".",
    ]
    path = write_report("coulson", lines)
    return path, drift


if __name__ == "__main__":
    p, drift = run()
    print(f"wrote {p}")
    if drift:
        print("DRIFT: " + "; ".join(drift))
        sys.exit(1)
