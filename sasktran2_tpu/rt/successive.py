"""Successive-orders-of-scattering multiple scatter source.

Replaces the reference's HR ``DiffuseTable``
(``/root/reference/cpp/lib/hr/diffuse_table.cpp``: Lebedev incoming/outgoing
spheres per diffuse point, sparse accumulation matrix, fixed-point
iteration) with a TPU-first formulation:

* Diffuse points live on the model altitude levels; directions on a
  (Gauss-Legendre mu) x (uniform phi) product grid, which makes the
  scattering integral a sum of per-Legendre-moment matmuls
  ``J = omega/(4 pi) sum_l beta_l (G_l @ I)`` with static kernels
  ``G_l[out, in] = w_in P_l(cos Theta)`` — pure MXU work batched over
  (wavelength x level).
* Every (level, direction) "internal ray" is traced once on the host into
  compact 2-entry optical-depth gather tables; the transport step
  ``I <- I_ss + sum_seg T (1 - e^-dtau) J(seg)`` is a static gather +
  cumulative sum, identical in structure to the LOS source integrator.
* The iteration is a fixed-count ``lax.scan`` (reference
  ``num_successive_orders_iterations``), fully differentiable.

The observer line-of-sight radiance then integrates the converged source
along the engine's traced rays via the same segment machinery used by the
DO limb source.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.quadrature import gauss_legendre
from ..ops.wigner import legendre_p
from ..util.jaxmath import safe_div
from .raytrace import TracedRays, _solar_at_point, _sun_od_weights


@dataclass
class SOGeometry:
    """Static successive-orders tables (host precompute).

    D = number of directions, V = number of levels, R = V*D internal rays,
    S = max segments.
    """

    mu_d: np.ndarray          # [D] direction cosines (propagation, +up)
    phi_d: np.ndarray         # [D] direction azimuths (relative to sun)
    w_d: np.ndarray           # [D] sphere quadrature weights (sum 4 pi)
    g_l: np.ndarray           # [L, D, D] scattering kernels (w_in included)
    seg_idx: np.ndarray       # [R, S, 2] int level indices for segment OD
    seg_w: np.ndarray         # [R, S, 2] weights: seg_od = sum w * k[idx]
    seg_mask: np.ndarray      # [R, S]
    src_level_idx: np.ndarray  # [R, S, 2, 2] (entrance/exit, 2 levels)
    src_level_w: np.ndarray    # [R, S, 2, 2]
    src_dir_idx: np.ndarray    # [R, S, 2, 4] direction interp indices
    src_dir_w: np.ndarray      # [R, S, 2, 4]
    sun_weights: np.ndarray    # [R, S+1, A] OD-to-sun at boundaries
    cos_scatter: np.ndarray    # [R, S+1] solar scattering cosine
    interp_weights: np.ndarray  # [R, S+1, A] level interp at boundaries
    ground_hit: np.ndarray     # [R]
    ground_cos_sza: np.ndarray  # [R]
    nlev: int
    ndir: int
    # Stokes rotation (scattering plane -> local meridian plane) of the
    # first-order beam source at each internal-ray boundary; identity for
    # scalar runs (used only by the polarized field iteration)
    sun_c2: np.ndarray | None = None   # [R, S+1]
    sun_s2: np.ndarray | None = None


def _direction_grid(n_mu: int, n_phi: int):
    x, w = gauss_legendre(n_mu)
    phi = 2.0 * np.pi * (np.arange(n_phi) + 0.5) / n_phi
    wphi = 2.0 * np.pi / n_phi
    mu_d = np.repeat(x, n_phi)
    phi_d = np.tile(phi, n_mu)
    w_d = np.repeat(w * wphi, n_phi)
    return mu_d, phi_d, w_d


def build_so_geometry(
    altitude_grid_m: np.ndarray,
    earth_radius_m: float,
    cos_sza: float,
    nleg: int,
    n_mu: int = 8,
    n_phi: int = 8,
    refractive_index=None,
    ms_refraction: bool = False,
) -> SOGeometry:
    alts = np.asarray(altitude_grid_m, dtype=np.float64)
    radii = earth_radius_m + alts
    A = len(alts)

    integ = None
    if ms_refraction:
        from .refraction import RefractiveShellIntegrator

        integ = RefractiveShellIntegrator(radii, refractive_index)
    mu_d, phi_d, w_d = _direction_grid(n_mu, n_phi)
    D = len(mu_d)

    # scattering kernels: cos Theta between direction pairs
    smu = np.sqrt(np.maximum(1.0 - mu_d**2, 0.0))
    cos_t = (
        mu_d[:, None] * mu_d[None, :]
        + smu[:, None] * smu[None, :] * np.cos(phi_d[:, None] - phi_d[None, :])
    )
    pl = legendre_p(cos_t, nleg)  # [L, D, D]
    g_l = pl * w_d[None, None, :]

    R = A * D
    S = 2 * (A - 1)
    seg_idx = np.zeros((R, S, 2), dtype=np.int32)
    seg_w = np.zeros((R, S, 2))
    seg_mask = np.zeros((R, S))
    src_level_idx = np.zeros((R, S, 2, 2), dtype=np.int32)
    src_level_w = np.zeros((R, S, 2, 2))
    src_dir_idx = np.zeros((R, S, 2, 4), dtype=np.int32)
    src_dir_w = np.zeros((R, S, 2, 4))
    sun_w = np.zeros((R, S + 1, A))
    cos_scat = np.zeros((R, S + 1))
    interp_w = np.zeros((R, S + 1, A))
    ground_hit = np.zeros(R, dtype=bool)
    g_cs = np.zeros(R)
    sun_c2 = np.ones((R, S + 1))
    sun_s2 = np.zeros((R, S + 1))

    from .raytrace import _stokes_rotation

    def _sun_rot(cz, cs, relazi):
        szn = np.sqrt(max(1.0 - cz * cz, 0.0))
        sss = np.sqrt(max(1.0 - cs * cs, 0.0))
        d_hat = np.array([szn, 0.0, cz])
        sun_hat = np.array(
            [sss * np.cos(relazi), sss * np.sin(relazi), cs]
        )
        return _stokes_rotation(d_hat, sun_hat)

    sun_s = np.sqrt(max(1.0 - cos_sza**2, 0.0))
    sun_vec = np.array([sun_s, 0.0, cos_sza])

    def dir_interp(mu, phi):
        """4-point bilinear interpolation weights onto the direction grid."""
        xs = np.unique(mu_d)  # sorted gauss nodes
        phis = np.unique(phi_d)
        i = np.clip(np.searchsorted(xs, mu) - 1, 0, len(xs) - 2)
        f = np.clip((mu - xs[i]) / (xs[i + 1] - xs[i]), 0.0, 1.0)
        dphi = 2.0 * np.pi / len(phis)
        phi = phi % (2.0 * np.pi)
        j = int(np.floor((phi - phis[0]) / dphi)) % len(phis)
        j2 = (j + 1) % len(phis)
        g = ((phi - phis[j]) % (2.0 * np.pi)) / dphi
        g = np.clip(g, 0.0, 1.0)

        def didx(ii, jj):
            return ii * len(phis) + jj

        idx = [didx(i, j), didx(i, j2), didx(i + 1, j), didx(i + 1, j2)]
        wt = [(1 - f) * (1 - g), (1 - f) * g, f * (1 - g), f * g]
        return np.array(idx, dtype=np.int32), np.array(wt)

    for vi in range(A):
        r0 = radii[vi]
        for di in range(D):
            ri = vi * D + di
            mu = mu_d[di]
            phi = phi_d[di]
            if integ is not None:
                path = _upstream_path_refracted(r0, mu, radii, integ)
                blist_r = path["bounds"]
                czs_r = path["cz"]
                phis_e = path["phi_e"]
                nseg_r = len(blist_r) - 1
                ground_hit[ri] = path["ground"]
                sun_vec_r = sun_vec_local(phi, cos_sza)
                for s in range(nseg_r):
                    jlev = path["jlev"][s]
                    seg_idx[ri, s] = (jlev, jlev + 1)
                    seg_w[ri, s] = (path["w_lo"][s], path["w_hi"][s])
                    seg_mask[ri, s] = 1.0
                    for ei in (0, 1):
                        rr = blist_r[s + ei]
                        jl = int(np.clip(
                            np.searchsorted(radii, rr) - 1, 0, A - 2
                        ))
                        fl = np.clip(
                            (rr - radii[jl]) / (radii[jl + 1] - radii[jl]),
                            0.0, 1.0,
                        )
                        src_level_idx[ri, s, ei] = (jl, jl + 1)
                        src_level_w[ri, s, ei] = (1 - fl, fl)
                        idx4, w4 = dir_interp(czs_r[s + ei], phi)
                        src_dir_idx[ri, s, ei] = idx4
                        src_dir_w[ri, s, ei] = w4
                for b in range(nseg_r + 1):
                    rr = blist_r[b]
                    cz = czs_r[b]
                    cs, relazi = _solar_at_plane_point(
                        phis_e[b], cz, sun_vec_r
                    )
                    sun_w[ri, b] = integ.sun_od_weights(
                        rr, cs, earth_radius_m
                    )
                    szn = np.sqrt(max(1.0 - cz * cz, 0.0))
                    sss = np.sqrt(max(1.0 - cs * cs, 0.0))
                    cos_scat[ri, b] = -cz * cs - szn * sss * np.cos(relazi)
                    sun_c2[ri, b], sun_s2[ri, b] = _sun_rot(cz, cs, relazi)
                    jl = int(np.clip(
                        np.searchsorted(radii, rr) - 1, 0, A - 2
                    ))
                    fl = np.clip(
                        (rr - radii[jl]) / (radii[jl + 1] - radii[jl]),
                        0.0, 1.0,
                    )
                    interp_w[ri, b, jl] = 1 - fl
                    interp_w[ri, b, jl + 1] = fl
                g_cs[ri] = cos_sza if path["ground"] else 0.0
                continue
            # incoming ray: photons travel along (mu, phi) ARRIVING at the
            # point; trace backwards (upstream) to the far end.
            # Upstream direction has cosine -mu. The ray's tangent radius:
            sinz = np.sqrt(max(1.0 - mu * mu, 0.0))
            rt = r0 * sinz
            segs = _upstream_segments(r0, mu, radii, rt)
            ground_hit[ri] = segs["ground"]
            # boundaries: from far end toward the point (matching the LOS
            # integrator convention far -> near)
            blist = segs["bounds"][::-1]  # far-first
            ldists = segs["ldist"][::-1]
            nseg = len(blist) - 1
            for s in range(nseg):
                r_far, r_near = blist[s], blist[s + 1]
                seg_len = abs(ldists[s] - ldists[s + 1])
                rm = 0.5 * (r_far + r_near)
                jlev = int(np.clip(np.searchsorted(radii, rm) - 1, 0, A - 2))
                fr = np.clip((rm - radii[jlev]) / (radii[jlev + 1] - radii[jlev]),
                             0.0, 1.0)
                seg_idx[ri, s] = (jlev, jlev + 1)
                seg_w[ri, s] = ((1 - fr) * seg_len, fr * seg_len)
                seg_mask[ri, s] = 1.0
                # source evaluation at entrance/exit boundaries
                for ei, rr in enumerate((r_far, r_near)):
                    jl = int(np.clip(np.searchsorted(radii, rr) - 1, 0, A - 2))
                    fl = np.clip((rr - radii[jl]) / (radii[jl + 1] - radii[jl]),
                                 0.0, 1.0)
                    src_level_idx[ri, s, ei] = (jl, jl + 1)
                    src_level_w[ri, s, ei] = (1 - fl, fl)
                    # local propagation direction at rr (toward the point)
                    sdist = ldists[s + ei]
                    cs, cz, relazi, _ = _solar_at_point(
                        sdist, r0, mu, sun_vec_local(phi, cos_sza)
                    )
                    # direction in the grid frame: (cz, azimuth)
                    az = _azimuth_at_point(sdist, r0, mu, phi)
                    idx4, w4 = dir_interp(cz, az)
                    src_dir_idx[ri, s, ei] = idx4
                    src_dir_w[ri, s, ei] = w4
            # boundaries solar data for first-order scattering
            for b in range(nseg + 1):
                rr = blist[b]
                sdist = ldists[b]
                cs, cz, relazi, _ = _solar_at_point(
                    sdist, r0, mu, sun_vec_local(phi, cos_sza)
                )
                sun_w[ri, b] = _sun_od_weights(rr, cs, radii, earth_radius_m)
                szn = np.sqrt(max(1.0 - cz * cz, 0.0))
                sss = np.sqrt(max(1.0 - cs * cs, 0.0))
                cos_scat[ri, b] = -cz * cs - szn * sss * np.cos(relazi)
                sun_c2[ri, b], sun_s2[ri, b] = _sun_rot(cz, cs, relazi)
                jl = int(np.clip(np.searchsorted(radii, rr) - 1, 0, A - 2))
                fl = np.clip((rr - radii[jl]) / (radii[jl + 1] - radii[jl]),
                             0.0, 1.0)
                interp_w[ri, b, jl] = 1 - fl
                interp_w[ri, b, jl + 1] = fl
            g_cs[ri] = cos_sza if segs["ground"] else 0.0

    return SOGeometry(
        mu_d=mu_d, phi_d=phi_d, w_d=w_d, g_l=g_l,
        seg_idx=seg_idx, seg_w=seg_w, seg_mask=seg_mask,
        src_level_idx=src_level_idx, src_level_w=src_level_w,
        src_dir_idx=src_dir_idx, src_dir_w=src_dir_w,
        sun_weights=sun_w, cos_scatter=cos_scat, interp_weights=interp_w,
        ground_hit=ground_hit, ground_cos_sza=g_cs,
        nlev=A, ndir=D,
        sun_c2=sun_c2, sun_s2=sun_s2,
    )


def sun_vec_local(phi_dir, cos_sza):
    """Sun unit vector in a frame where the direction's horizontal azimuth
    is x and up is z: the sun sits at azimuth -phi_dir (the direction grid's
    phi is measured from the solar azimuth)."""
    ss = np.sqrt(max(1.0 - cos_sza**2, 0.0))
    return np.array([ss * np.cos(phi_dir), -ss * np.sin(phi_dir), cos_sza])


def _azimuth_at_point(sdist, r_ref, coszen_ref, phi_ref):
    """Azimuth (relative to the sun meridian) of the propagation direction
    at distance sdist along a straight ray whose azimuth at the reference
    point is phi_ref. In the great-circle plane of a straight ray the
    horizontal azimuth is constant relative to the sun meridian only in the
    plane approximation; for the 1D model we keep phi constant (the
    reference's diffuse-point model makes the same 1D assumption)."""
    return phi_ref


def _solar_at_plane_point(phi_e, cz_loc, sun_vec):
    """(cos_sza, relazi) at a point of the ray plane at earth angle
    ``phi_e`` from the reference point (positive along the propagation
    azimuth) where the propagation direction has local zenith cosine
    ``cz_loc``. Mirrors ``raytrace._solar_at_point`` with the position
    supplied as an angle instead of a straight-line distance (refracted
    rays bend, but stay in their plane by spherical symmetry)."""
    r_hat = np.array([np.sin(phi_e), 0.0, np.cos(phi_e)])
    t_hat = np.array([np.cos(phi_e), 0.0, -np.sin(phi_e)])
    sz = np.sqrt(max(1.0 - cz_loc * cz_loc, 0.0))
    p_hat = sz * t_hat + cz_loc * r_hat
    cs = float(np.dot(sun_vec, r_hat))
    ss = np.sqrt(max(1.0 - cs * cs, 0.0))
    if sz * ss < 1e-12:
        return cs, 0.0
    h_hat = (p_hat - cz_loc * r_hat) / sz
    y_hat = np.cross(r_hat, h_hat)
    relazi = float(
        np.arctan2(np.dot(sun_vec, y_hat), np.dot(sun_vec, h_hat))
    )
    return cs, relazi


def _upstream_path_refracted(r0, mu, radii, integ):
    """Curved upstream path of a photon ARRIVING at radius r0 with
    propagation cosine mu (+up), traced with refraction (Bouguer invariant
    n r sin z = const; reference traces HR incoming rays with the refracted
    tracer when ``multiple_scatter_refraction`` is set,
    ``diffuse_table.cpp:250``).

    Returns dict with far-first arrays: ``bounds`` radii, ``cz`` signed
    local propagation cosines, ``phi_e`` earth angles relative to the point
    (non-positive upstream), per-segment shell index ``jlev`` and exact
    linear-in-radius OD weights ``(w_lo, w_hi)``, and ``ground``.
    """
    A = len(radii)
    eps = 1e-6
    sinz = np.sqrt(max(1.0 - mu * mu, 0.0))
    invariant = integ.n_at(r0) * r0 * sinz
    rt = integ.tangent_radius(invariant)
    nt = integ.n_at(rt)

    def cz_at(rr, sign):
        s = min(invariant / (integ.n_at(rr) * rr), 1.0)
        return sign * np.sqrt(max(1.0 - s * s, 0.0))

    # Backward traversal from the point: (radius, cz sign) lists
    bounds = [r0]
    signs = [1.0 if mu > 0.0 else -1.0]
    ground = False
    if mu <= 0.0:
        # photon descends; upstream ascends to TOA (cz < 0 throughout)
        for j in range(A):
            if radii[j] > r0 + eps:
                bounds.append(radii[j])
                signs.append(-1.0)
    else:
        ground = rt <= radii[0] + eps
        for j in range(A - 1, -1, -1):
            if radii[j] < r0 - eps and radii[j] > rt + eps:
                bounds.append(radii[j])
                signs.append(1.0)
        if ground:
            if not np.isclose(bounds[-1], radii[0]):
                bounds.append(radii[0])
                signs.append(1.0)
        else:
            # tangent pass: descend to rt then (backwards) out to TOA
            bounds.append(rt)
            signs.append(0.0)
            for j in range(A):
                if radii[j] > rt + eps:
                    bounds.append(radii[j])
                    signs.append(-1.0)

    # per-gap curved integrals (backward traversal -> negative phi/arc)
    n_b = len(bounds)
    phi_e = [0.0]
    jlevs, wlos, whis = [], [], []
    for i in range(n_b - 1):
        ra, rb = bounds[i], bounds[i + 1]
        rm = 0.5 * (ra + rb)
        jlev = int(np.clip(np.searchsorted(radii, rm) - 1, 0, A - 2))
        _, w_lo, w_hi, dphi = integ.shell_integral(
            rt, nt, ra, rb, radii[jlev], radii[jlev + 1]
        )
        jlevs.append(jlev)
        wlos.append(w_lo)
        whis.append(w_hi)
        phi_e.append(phi_e[-1] - dphi)

    czs = [cz_at(rr, sg) for rr, sg in zip(bounds, signs)]
    # reverse to far-first (matching the straight builder's convention)
    return {
        "bounds": bounds[::-1],
        "cz": czs[::-1],
        "phi_e": phi_e[::-1],
        "jlev": jlevs[::-1],
        "w_lo": wlos[::-1],
        "w_hi": whis[::-1],
        "ground": ground,
    }


def _upstream_segments(r0, mu, radii, rt):
    """Boundary radii and signed arc distances along the upstream path of a
    photon ARRIVING at radius r0 with propagation cosine mu (+up).

    Returns dict(bounds=[point..far], ldist=[signed distances], ground).
    Distances measured along the propagation direction (the point is 0; the
    far end is negative).
    """
    A = len(radii)
    eps = 1e-6
    bounds = [r0]
    ldist = [0.0]

    def l_of(r):
        return np.sqrt(max(r * r - rt * rt, 0.0))

    if mu <= 0.0:
        # photon travels downward; upstream is upward: r increasing to TOA
        for j in range(A):
            if radii[j] > r0 + eps:
                bounds.append(radii[j])
                ldist.append(-(l_of(radii[j]) - l_of(r0)))
        return {"bounds": bounds, "ldist": ldist, "ground": False}
    # photon travels upward; upstream descends
    ground = rt <= radii[0] + eps
    below = [radii[j] for j in range(A - 1, -1, -1)
             if radii[j] < r0 - eps and radii[j] > rt + eps]
    for rr in below:
        bounds.append(rr)
        ldist.append(-(l_of(r0) - l_of(rr)))
    if ground:
        if not np.isclose(bounds[-1], radii[0]):
            bounds.append(radii[0])
            ldist.append(-(l_of(r0) - l_of(radii[0])))
        return {"bounds": bounds, "ldist": ldist, "ground": True}
    # tangent pass: descend to rt then ascend to TOA
    bounds.append(rt)
    ldist.append(-l_of(r0))
    for j in range(A):
        if radii[j] > rt + eps:
            bounds.append(radii[j])
            ldist.append(-(l_of(r0) + l_of(radii[j])))
    return {"bounds": bounds, "ldist": ldist, "ground": False}


def successive_orders_field(
    extinction, ssa, leg_coeff, albedo, geom: SOGeometry, iterations: int,
    j_init=None,
):
    """Iterate the scattering field. Inputs: extinction/ssa [W, A],
    leg_coeff [W, A, L], albedo [W]. Returns the converged diffuse+direct-
    scatter radiance field I [W, V, D] and source J [W, V, D].

    ``j_init`` (optional, [W, V, D]): multiple-scatter-only source per unit
    OD used to seed the incoming field before the first iteration — the
    DO-initialization mode (reference ``initialize_hr_with_do``,
    ``diffuse_table.cpp:739-760``: outgoing sources start from the
    interpolated DO source, one transport precedes the iteration)."""
    dt = extinction.dtype
    seg_idx = jnp.asarray(geom.seg_idx)
    seg_w = jnp.asarray(geom.seg_w, dtype=dt)
    mask = jnp.asarray(geom.seg_mask, dtype=dt)
    sun_w = jnp.asarray(geom.sun_weights, dtype=dt)
    int_w = jnp.asarray(geom.interp_weights, dtype=dt)
    V, D = geom.nlev, geom.ndir
    R = V * D

    # segment OD: [W, R, S]
    k_lev = extinction  # [W, A]
    seg_od = jnp.einsum("wrsk,rsk->wrs", k_lev[:, seg_idx], seg_w)
    od_m = seg_od * mask
    closer = jnp.flip(jnp.cumsum(jnp.flip(od_m, axis=-1), axis=-1), axis=-1) - od_m
    trans = jnp.exp(-closer)
    factor = -jnp.expm1(-od_m)

    # first-order (single scatter + ground direct) along internal rays
    from ..ops.wigner import legendre_p as _lp

    nleg = leg_coeff.shape[-1]
    pt = np.moveaxis(_lp(geom.cos_scatter, nleg), 0, -1)  # [R, S+1, L]
    sun_od = jnp.einsum("rba,wa->wrb", sun_w, k_lev)
    t_sun = jnp.exp(-jnp.minimum(sun_od, 300.0))
    kscat = k_lev * ssa
    kscat_b = jnp.einsum("rba,wa->wrb", int_w, kscat)
    beta_b = safe_div(
        jnp.einsum("rba,wal->wrbl", int_w, leg_coeff * kscat[..., None]),
        kscat_b[..., None],
    )
    phase_b = jnp.einsum("wrbl,rbl->wrb", beta_b, jnp.asarray(pt, dtype=dt))
    k_b = jnp.einsum("rba,wa->wrb", int_w, k_lev)
    # J per unit OD
    j_ss_b = safe_div(kscat_b * phase_b / (4.0 * jnp.pi) * t_sun, k_b)
    seg_src_ss = factor * 0.5 * (j_ss_b[..., :-1] + j_ss_b[..., 1:]) * mask
    i_first = jnp.sum(seg_src_ss * trans, axis=-1)  # [W, R]
    # ground reflection of direct beam at far end of ground-hitting rays
    ground = jnp.asarray(geom.ground_hit, dtype=dt)
    t_sun_g = t_sun[..., 0]
    total_od = jnp.sum(od_m, axis=-1)
    mu0 = jnp.asarray(geom.ground_cos_sza, dtype=dt)
    i_first = i_first + (
        ground * albedo[:, None] * jnp.maximum(mu0, 0.0) * t_sun_g / jnp.pi
    ) * jnp.exp(-total_od)
    i_first = i_first.reshape(-1, V, D)

    g_l = jnp.asarray(geom.g_l, dtype=dt)  # [L, D, D]
    w_d = jnp.asarray(geom.w_d, dtype=dt)
    mu_d = jnp.asarray(geom.mu_d, dtype=dt)

    sli = jnp.asarray(geom.src_level_idx)   # [R, S, 2, 2]
    slw = jnp.asarray(geom.src_level_w, dtype=dt)
    sdi = jnp.asarray(geom.src_dir_idx)     # [R, S, 2, 4]
    sdw = jnp.asarray(geom.src_dir_w, dtype=dt)

    def scattering_source(i_field):
        # J[W, V, D] = omega/(4 pi) sum_l beta_l (G_l I)
        gi = jnp.einsum("ldi,wvi->wvld", g_l, i_field)
        return (
            ssa[..., None]
            / (4.0 * jnp.pi)
            * jnp.einsum("wvl,wvld->wvd", leg_coeff, gi)
        )

    # gather BOTH interpolation axes up front: [W, R, S, 2, 2lev, 4dir]
    # stays ~MB-scale even for dense direction grids, where interpolating
    # levels first would materialize the full [.., D] axis per endpoint
    gather_idx_l = sli[..., :, None]          # [R, S, 2, 2, 1]
    gather_idx_d = sdi[..., None, :]          # [R, S, 2, 1, 4]

    def transport_simple(j_field):
        jg = j_field[:, gather_idx_l, gather_idx_d]  # [W, R, S, 2, 2, 4]
        je = jnp.einsum("wrsekq,rsek,rseq->wrse", jg, slw, sdw)
        seg_src = factor * 0.5 * (je[..., 0] + je[..., 1]) * mask
        return jnp.sum(seg_src * trans, axis=-1).reshape(-1, V, D)

    # diffuse (Lambertian) ground reflection: downwelling diffuse flux at
    # the bottom level reflects isotropically and is carried up every
    # ground-hitting internal ray, attenuated by its total OD (reference
    # DiffuseTable ground sphere, ``cpp/lib/hr/diffuse_table.cpp:521``)
    f_dn_w = w_d * jnp.abs(mu_d) * (mu_d < 0.0)  # [D]
    ground_t = (ground * jnp.exp(-total_od)).reshape(-1, V, D)  # [W, V, D]

    def ground_diffuse(i_field):
        f_dn = jnp.einsum("d,wd->w", f_dn_w, i_field[:, 0, :])
        return (albedo * f_dn / jnp.pi)[:, None, None] * ground_t

    def step(i_field, _):
        j = scattering_source(i_field)
        i_new = i_first + transport_simple(j) + ground_diffuse(i_field)
        return i_new, None

    i_start = i_first
    if j_init is not None:
        i_start = i_first + transport_simple(j_init) + ground_diffuse(i_first)
    i_final, _ = jax.lax.scan(step, i_start, None, length=iterations)
    j_final = scattering_source(i_final)
    # diffuse ground-leaving radiance (for observer end-of-ray terms)
    i_ground_diffuse = albedo * jnp.einsum(
        "d,wd->w", f_dn_w, i_final[:, 0, :]
    ) / jnp.pi
    return i_final, j_final, i_ground_diffuse


# ---------------------------------------------------------------------------
# Polarized (NSTOKES=3) successive orders
#
# The reference templates DiffuseTable on NSTOKES
# (``cpp/include/sasktran2/hr/diffuse_source.h:45``) with full Stokes
# rotations between meridian and scattering planes at every scatter. Here
# the pairwise direction-grid rotations and generalized-spherical basis
# functions are STATIC host tables; the per-iteration scattering becomes a
# set of (W, V)-batched [D, D] contractions — one per phase-matrix
# component — exactly like the scalar G_l kernels.
#
# Approximation (documented): Stokes bases are interpolated componentwise
# on the direction grid during transport (O(dphi) basis mismatch between
# neighbouring azimuth nodes); exact along each straight internal ray,
# whose meridian plane is constant. Validated against the polarized DO
# solver at the percent level (tests/test_polarized_so.py).
#
# Round-4 experiment (do not repeat blindly): parallel-transported
# frame rotations at every direction-interpolation node (minimal-rotation
# basis correction, both signs) did NOT reduce the Q/U error at
# n_inc=144 — measured dQ/I 0.20->0.21/0.34%, dU/I 0.52->0.42/0.92% vs
# the componentwise baseline. The residual is dominated by the angular
# discretization of the scattering kernel, not the gather-basis mix;
# raising n_inc is the effective lever (0.1%/0.03% by n_inc=784).
# ---------------------------------------------------------------------------


def build_so_polarized_tables(geom: SOGeometry, nleg: int) -> dict:
    """Static pairwise tables for the polarized scattering kernel.

    Z(d <- d') = R_out(d', d) F(Theta) R_in(d', d)^T with
    F11 = sum a1 d^l_00, F12 = F21 = -sum b1 d^l_02,
    F22/F33 = 1/2 sum (a2+a3) d^l_22 +- (a2-a3) d^l_2-2  (I, Q, U block;
    reference polarization types, ``sktran_do_polarization_types.h``).
    """
    from ..ops.wigner import wigner_d
    from .raytrace import _stokes_rotation

    mu_d, phi_d = geom.mu_d, geom.phi_d
    D = len(mu_d)
    s_d = np.sqrt(np.maximum(1.0 - mu_d**2, 0.0))
    dvec = np.stack(
        [s_d * np.cos(phi_d), s_d * np.sin(phi_d), mu_d], axis=-1
    )  # [D, 3]

    cos_t = np.clip(dvec @ dvec.T, -1.0, 1.0)  # [D_out, D_in]... (in, out)?
    # dvec[i] . dvec[j]: symmetric, orientation irrelevant for Theta
    theta = np.arccos(cos_t)
    t00 = wigner_d(theta, 0, 0, nleg)    # [L, D, D]
    t02 = wigner_d(theta, 0, 2, nleg)
    t22 = wigner_d(theta, 2, 2, nleg)
    t2m2 = wigner_d(theta, 2, -2, nleg)

    c2o = np.ones((D, D))
    s2o = np.zeros((D, D))
    c2i = np.ones((D, D))
    s2i = np.zeros((D, D))
    z = np.array([0.0, 0.0, 1.0])
    for di in range(D):        # incoming direction (propagation)
        for do in range(D):    # outgoing direction
            u_in = dvec[di]
            d_out = dvec[do]
            # outgoing: scattering plane -> meridian(d_out), about d_out
            c2o[do, di], s2o[do, di] = _stokes_rotation(d_out, -u_in)
            # incoming: scattering plane -> meridian(d_in), about d_in;
            # the transpose (applied in the kernel) takes meridian ->
            # scattering. Scattering-plane normal is the same plane:
            n1 = np.cross(u_in, d_out)
            n2 = np.cross(z, u_in)
            s1n = np.linalg.norm(n1)
            s2n = np.linalg.norm(n2)
            if s1n < 1e-10 or s2n < 1e-10:
                continue
            n1 = n1 / s1n
            n2 = n2 / s2n
            c = float(np.dot(n1, n2))
            s = float(np.dot(np.cross(n1, n2), u_in))
            c2i[do, di] = c * c - s * s
            s2i[do, di] = -2.0 * s * c

    # first-order beam basis functions at the internal-ray boundaries
    theta_b = np.arccos(np.clip(geom.cos_scatter, -1.0, 1.0))
    b00 = wigner_d(theta_b, 0, 0, nleg)   # [L, R, S+1]
    b02 = wigner_d(theta_b, 0, 2, nleg)

    return {
        "t00": t00, "t02": t02, "t22": t22, "t2m2": t2m2,
        "c2o": c2o, "s2o": s2o, "c2i": c2i, "s2i": s2i,
        "b00": np.moveaxis(b00, 0, -1),   # [R, S+1, L]
        "b02": np.moveaxis(b02, 0, -1),
    }


def successive_orders_field_polarized(
    extinction, ssa, legs, albedo, geom: SOGeometry, pol_tabs: dict,
    iterations: int,
):
    """Polarized fixed-point iteration. ``legs`` = (a1, a2, a3, b1) each
    [W, A, L]. Returns (I [W, V, D, 3], J [W, V, D, 3], i_ground [W]).

    Same transport scaffolding as the scalar ``successive_orders_field``;
    the scattering step applies the rotated phase MATRIX and the
    first-order beam source carries its (Q, U) via the per-boundary
    scattering-plane rotations.
    """
    a1, a2, a3, b1 = legs
    dt = extinction.dtype
    seg_idx = jnp.asarray(geom.seg_idx)
    seg_w = jnp.asarray(geom.seg_w, dtype=dt)
    mask = jnp.asarray(geom.seg_mask, dtype=dt)
    sun_w = jnp.asarray(geom.sun_weights, dtype=dt)
    int_w = jnp.asarray(geom.interp_weights, dtype=dt)
    V, D = geom.nlev, geom.ndir

    k_lev = extinction
    seg_od = jnp.einsum("wrsk,rsk->wrs", k_lev[:, seg_idx], seg_w)
    od_m = seg_od * mask
    closer = jnp.flip(
        jnp.cumsum(jnp.flip(od_m, axis=-1), axis=-1), axis=-1
    ) - od_m
    trans = jnp.exp(-closer)
    factor = -jnp.expm1(-od_m)

    # ---- first order: polarized beam scatter at boundaries -------------
    nleg = a1.shape[-1]
    sun_od = jnp.einsum("rba,wa->wrb", sun_w, k_lev)
    t_sun = jnp.exp(-jnp.minimum(sun_od, 300.0))
    kscat = k_lev * ssa
    kscat_b = jnp.einsum("rba,wa->wrb", int_w, kscat)

    def interp_beta(lc):
        num = jnp.einsum("rba,wal->wrbl", int_w, lc * kscat[..., None])
        return safe_div(num, kscat_b[..., None])

    a1_b = interp_beta(a1)
    b1_b = interp_beta(b1)
    b00 = jnp.asarray(pol_tabs["b00"][..., :nleg], dtype=dt)
    b02 = jnp.asarray(pol_tabs["b02"][..., :nleg], dtype=dt)
    f11_b = jnp.einsum("wrbl,rbl->wrb", a1_b, b00)
    f21_b = -jnp.einsum("wrbl,rbl->wrb", b1_b, b02)
    c2b = jnp.asarray(geom.sun_c2, dtype=dt)
    s2b = jnp.asarray(geom.sun_s2, dtype=dt)
    k_b = jnp.einsum("rba,wa->wrb", int_w, k_lev)
    pref = safe_div(kscat_b / (4.0 * jnp.pi) * t_sun, k_b)
    j_b = jnp.stack(
        [pref * f11_b, pref * c2b * f21_b, pref * s2b * f21_b], axis=-1
    )  # [W, R, S+1, 3]
    seg_src = (
        factor[..., None] * 0.5 * (j_b[..., :-1, :] + j_b[..., 1:, :])
        * mask[..., None]
    )
    i_first = jnp.sum(seg_src * trans[..., None], axis=-2)  # [W, R, 3]
    # unpolarized Lambertian ground reflection of the direct beam
    ground = jnp.asarray(geom.ground_hit, dtype=dt)
    total_od = jnp.sum(od_m, axis=-1)
    mu0 = jnp.asarray(geom.ground_cos_sza, dtype=dt)
    gterm = (
        ground * albedo[:, None] * jnp.maximum(mu0, 0.0)
        * t_sun[..., 0] / jnp.pi
    ) * jnp.exp(-total_od)
    i_first = i_first.at[..., 0].add(gterm)
    i_first = i_first.reshape(-1, V, D, 3)

    # ---- scattering kernel ---------------------------------------------
    t00 = jnp.asarray(pol_tabs["t00"][:nleg], dtype=dt)  # [L, Do, Di]
    t02 = jnp.asarray(pol_tabs["t02"][:nleg], dtype=dt)
    t22 = jnp.asarray(pol_tabs["t22"][:nleg], dtype=dt)
    t2m2 = jnp.asarray(pol_tabs["t2m2"][:nleg], dtype=dt)
    c2i = jnp.asarray(pol_tabs["c2i"], dtype=dt)         # [Do, Di]
    s2i = jnp.asarray(pol_tabs["s2i"], dtype=dt)
    c2o = jnp.asarray(pol_tabs["c2o"], dtype=dt)
    s2o = jnp.asarray(pol_tabs["s2o"], dtype=dt)
    w_d = jnp.asarray(geom.w_d, dtype=dt)
    mu_d = jnp.asarray(geom.mu_d, dtype=dt)

    ap = 0.5 * (a2 + a3)
    am = 0.5 * (a2 - a3)

    def scattering_source(i_field):
        # component tensors [W, V, Do, Di]
        fa = jnp.einsum("wvl,lde->wvde", a1, t00)
        fb = -jnp.einsum("wvl,lde->wvde", b1, t02)
        f22 = jnp.einsum("wvl,lde->wvde", ap, t22) + jnp.einsum(
            "wvl,lde->wvde", am, t2m2
        )
        f33 = jnp.einsum("wvl,lde->wvde", ap, t22) - jnp.einsum(
            "wvl,lde->wvde", am, t2m2
        )
        ii = i_field[..., 0]   # [W, V, Di]
        qq = i_field[..., 1]
        uu = i_field[..., 2]
        # rotate incoming meridian -> scattering plane (transpose of the
        # scattering->meridian rotation): Q_s = c2i Q + s2i U
        qs = c2i[None, None] * qq[:, :, None, :] + s2i[None, None] * uu[
            :, :, None, :
        ]
        us = -s2i[None, None] * qq[:, :, None, :] + c2i[None, None] * uu[
            :, :, None, :
        ]
        ip = fa * ii[:, :, None, :] + fb * qs
        qp = fb * ii[:, :, None, :] + f22 * qs
        up = f33 * us
        # rotate scattering plane -> outgoing meridian
        qo = c2o[None, None] * qp - s2o[None, None] * up
        uo = s2o[None, None] * qp + c2o[None, None] * up
        pref2 = ssa[..., None] / (4.0 * jnp.pi)
        j_i = pref2 * jnp.einsum("wvde,e->wvd", ip, w_d)
        j_q = pref2 * jnp.einsum("wvde,e->wvd", qo, w_d)
        j_u = pref2 * jnp.einsum("wvde,e->wvd", uo, w_d)
        return jnp.stack([j_i, j_q, j_u], axis=-1)

    sli = jnp.asarray(geom.src_level_idx)
    slw = jnp.asarray(geom.src_level_w, dtype=dt)
    sdi = jnp.asarray(geom.src_dir_idx)
    sdw = jnp.asarray(geom.src_dir_w, dtype=dt)

    gather_idx_l = sli[..., :, None]          # [R, S, 2, 2, 1]
    gather_idx_d = sdi[..., None, :]          # [R, S, 2, 1, 4]

    def transport(j_field):
        # componentwise (see module note on the interp-basis approximation);
        # both interpolation axes gathered up front to avoid materializing
        # the full direction axis per segment endpoint
        def one(jc):
            jg = jc[:, gather_idx_l, gather_idx_d]  # [W, R, S, 2, 2, 4]
            je = jnp.einsum("wrsekq,rsek,rseq->wrse", jg, slw, sdw)
            ss_ = factor * 0.5 * (je[..., 0] + je[..., 1]) * mask
            return jnp.sum(ss_ * trans, axis=-1).reshape(-1, V, D)

        return jnp.stack(
            [one(j_field[..., c]) for c in range(3)], axis=-1
        )

    f_dn_w = w_d * jnp.abs(mu_d) * (mu_d < 0.0)
    ground_t = (ground * jnp.exp(-total_od)).reshape(-1, V, D)

    def ground_diffuse(i_field):
        # Lambertian: depolarizing, reflects the I flux only
        f_dn = jnp.einsum("d,wd->w", f_dn_w, i_field[:, 0, :, 0])
        out = jnp.zeros_like(i_field)
        return out.at[..., 0].add(
            (albedo * f_dn / jnp.pi)[:, None, None] * ground_t
        )

    def step(i_field, _):
        j = scattering_source(i_field)
        i_new = i_first + transport(j) + ground_diffuse(i_field)
        return i_new, None

    i_final, _ = jax.lax.scan(step, i_first, None, length=iterations)
    j_final = scattering_source(i_final)
    i_ground_diffuse = albedo * jnp.einsum(
        "d,wd->w", f_dn_w, i_final[:, 0, :, 0]
    ) / jnp.pi
    return i_final, j_final, i_ground_diffuse


def so_source_along_rays_polarized(j_field, traced: TracedRays, tables):
    """Polarized SO source at observer-ray segment endpoints.

    j_field [W, V, D, 3] (meridian-frame Stokes); for straight observer
    rays the local meridian plane equals the ray plane everywhere, so the
    interpolated Stokes vector is already in the LOS output frame (same
    argument as ``do_source.ms_source_along_rays_vec``).
    Returns (j_in, j_out) each [W, R, S, 3].
    """
    outs = [
        so_source_along_rays(j_field[..., c], traced, tables)
        for c in range(3)
    ]
    j_in = jnp.stack([o[0] for o in outs], axis=-1)
    j_out = jnp.stack([o[1] for o in outs], axis=-1)
    return j_in, j_out


def observer_source_tables(traced: TracedRays, geom: SOGeometry):
    """Static (direction-interpolation) tables for evaluating the SO source
    field along the engine's observer rays: [R, S+1, 4] indices/weights onto
    the SO direction grid at each segment boundary."""
    xs = np.unique(geom.mu_d)
    phis = np.unique(geom.phi_d)
    nphi = len(phis)
    R, B = traced.cos_zenith.shape
    idx = np.zeros((R, B, 4), dtype=np.int32)
    wts = np.zeros((R, B, 4))
    dphi = 2.0 * np.pi / nphi
    for r in range(R):
        for b in range(B):
            mu = np.clip(traced.cos_zenith[r, b], xs[0], xs[-1])
            # boundary_relazi is the SUN's azimuth relative to the LOS
            # direction; the SO grid's phi is the DIRECTION's azimuth
            # relative to the sun — negatives of each other. Scalar/I/Q
            # are even in azimuth and insensitive; U is odd and flips
            # sign if the conventions are mixed (caught by the polarized
            # SO-vs-DO multiple-scatter-only comparison).
            phi = (-traced.boundary_relazi[r, b]) % (2.0 * np.pi)
            i = int(np.clip(np.searchsorted(xs, mu) - 1, 0, len(xs) - 2))
            f = np.clip((mu - xs[i]) / (xs[i + 1] - xs[i]), 0.0, 1.0)
            j = int(np.floor((phi - phis[0]) / dphi)) % nphi
            j2 = (j + 1) % nphi
            g = np.clip(((phi - phis[j]) % (2.0 * np.pi)) / dphi, 0.0, 1.0)
            idx[r, b] = (i * nphi + j, i * nphi + j2,
                         (i + 1) * nphi + j, (i + 1) * nphi + j2)
            wts[r, b] = ((1 - f) * (1 - g), (1 - f) * g,
                         f * (1 - g), f * g)
    return {"dir_idx": idx, "dir_w": wts}


def so_source_along_rays(j_field, traced: TracedRays, tables):
    """SO source (per unit OD) at observer-ray segment endpoints.

    j_field: [W, V, D]; returns (j_in, j_out) each [W, R, S].
    """
    dt = j_field.dtype
    intw = jnp.asarray(traced.interp_weights, dtype=dt)   # [R, S+1, A]
    didx = jnp.asarray(tables["dir_idx"])                 # [R, S+1, 4]
    dw = jnp.asarray(tables["dir_w"], dtype=dt)
    # level interp: [W, R, S+1, D]
    j_lev = jnp.einsum("rba,wad->wrbd", intw, j_field)
    # direction interp
    j_dir = jnp.take_along_axis(j_lev, didx[None], axis=-1)
    j_b = jnp.einsum("wrbk,rbk->wrb", j_dir, dw)
    return j_b[..., :-1], j_b[..., 1:]
