"""Wavelength-minor polarized (I, Q, U) discrete-ordinates solver.

Same physics as ``rt/disco_vec.py`` (the sign-transform reduction of the
reference's NSTOKES=3 DISCO templates,
``/root/reference/cpp/include/sktran_disco/sktran_do_polarization_types.h``,
to the scalar symmetric machinery), in the lane layout of
``rt/disco_nstream.py``: every array carries the wavelength axis LAST so
the (8, 128) register tiling packs wavelengths into vector lanes, and the
solver state is flattened (stream x stokes) blocks of size K = 3N.

The one structural novelty vs the scalar wavelength-minor solver: every
greek-coefficient contraction is decomposed into four STATIC angular
tables (one per greek a1/a2/a3/b1) applied with the same
``_contract_legendre`` matmul pattern — the Pi-matrix algebra is folded
into host-side numpy tables per azimuth mode, so the traced graph sees
only [G*L, ...] x [G*L, P, W] contractions that map onto the MXU.

Scope: beam source + Lambertian surface (the polarized benchmark
configuration). Thermal and BRDF polarized configs stay on the generic
path. Validated against ``disco_vec.solve_plane_parallel_vector`` at
1e-10 in ``tests/test_nstream_vec.py``.

Shapes: dtau/omega [P, W]; a1/a2/a3/b1 [L, P, W]; albedo/f0 [W];
radiance [U, 3, W].
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.lanes import (
    lane_block_thomas_solve,
    lane_cholesky,
    lane_jacobi_eigh_scan,
    lane_mm,
    lane_solve_upper,
    lane_t,
)
from ..ops.linalg import ddiff2, ediff
from .disco import KMIN, clamp_ssa
from .disco_vec import NS, _pi_matrices, DSIGN
from ..ops.wigner import wigner_d
from ..ops.quadrature import streams

__all__ = ["build_vector_minor_tables", "solve_nstream_vector"]


@dataclass(frozen=True)
class VectorMinorTables:
    """Static per-azimuth-mode tables for the wavelength-minor polarized
    solver. G = 4 greeks ordered (a1, a2, a3, b1); K = 3N; KU = 3U.

    kernel_a / kernel_b : [M, G, L, K, K] symmetrization kernels
    q_plus / q_minus    : [M, G2, L, K]   beam source tables (G2 = a1, b1)
    stream_sum          : [M, L, 3, K]    S[l, c, (j s)] = w_j Pi_j[s, c]
    par_d               : [M, L, 3]       nu_l * dsign[c]
    user_up / user_dn   : [M, G, L, U, 3, 3]  user projection tables
    beam_user_up / _dn  : [M, G2, L, U, 3]    direct-beam user tables
    mu, w               : [N] stream cosines / weights
    mu0                 : float
    user_mu             : [U]
    """

    kernel_a: np.ndarray
    kernel_b: np.ndarray
    q_plus: np.ndarray
    q_minus: np.ndarray
    stream_sum: np.ndarray
    par_d: np.ndarray
    user_up: np.ndarray
    user_dn: np.ndarray
    beam_user_up: np.ndarray
    beam_user_dn: np.ndarray
    mu: np.ndarray
    w: np.ndarray
    mu0: float
    user_mu: np.ndarray


def build_vector_minor_tables(
    nstr: int,
    nlegendre: int,
    mu0: float,
    user_mu: np.ndarray,
    num_azimuth: int | None = None,
) -> VectorMinorTables:
    """Fold the generalized-spherical-function algebra into static
    per-greek tables (host-side, numpy)."""
    if num_azimuth is None:
        num_azimuth = nstr
    M = num_azimuth
    mu, w = streams(nstr)
    N = len(mu)
    K = N * NS
    L = max(nlegendre, 1)
    user_mu = np.asarray(user_mu, dtype=np.float64)
    U = len(user_mu)
    theta0 = np.arccos(np.clip(mu0, -1.0, 1.0))
    ls = np.arange(L)

    kernel_a = np.zeros((M, 4, L, K, K))
    kernel_b = np.zeros((M, 4, L, K, K))
    q_plus = np.zeros((M, 2, L, K))
    q_minus = np.zeros((M, 2, L, K))
    stream_sum = np.zeros((M, L, NS, K))
    par_d = np.zeros((M, L, NS))
    user_up = np.zeros((M, 4, L, U, NS, NS))
    user_dn = np.zeros((M, 4, L, U, NS, NS))
    beam_user_up = np.zeros((M, 2, L, U, NS))
    beam_user_dn = np.zeros((M, 2, L, U, NS))

    # B_l decomposition patterns: greek -> [(row a, col b, sign)]
    patterns = {
        0: [(0, 0, 1.0)],           # a1
        1: [(1, 1, 1.0)],           # a2
        2: [(2, 2, 1.0)],           # a3
        3: [(0, 1, -1.0), (1, 0, -1.0)],  # b1
    }

    for m in range(M):
        pi = _pi_matrices(mu, m, L)        # [L, N, 3, 3]
        pi_user = _pi_matrices(user_mu, m, L)  # [L, U, 3, 3]
        d0_sun = wigner_d(np.array(theta0), m, 0, L)
        parity = (-1.0) ** (ls + m)        # [L]

        # G diagonals: gminus (C^A kernel), gplus (C^B kernel)
        gplus = np.stack(
            [1.0 + parity, 1.0 + parity, 1.0 - parity], axis=-1
        )  # [L, 3]
        gminus = np.stack(
            [1.0 - parity, 1.0 - parity, 1.0 + parity], axis=-1
        )

        # pi flattened over (stream, stokes) -> [L, K, 3(col)]
        pif = pi.reshape(L, K, NS)
        pif_user = pi_user  # [L, U, 3, 3]

        for g, pat in patterns.items():
            for a, b, sgn in pat:
                # kernel_X[l, (is), (jt)] += 0.5 sgn G_X[l, b]
                #   pi[l,(is),a] pi[l,(jt),b]
                outer = pif[:, :, a][:, :, None] * pif[:, :, b][:, None, :]
                kernel_a[m, g] += 0.5 * sgn * gminus[:, b, None, None] * outer
                kernel_b[m, g] += 0.5 * sgn * gplus[:, b, None, None] * outer
                # user tables: U_X[l, u, s, b] += sgn pi_user[l,u,s,a]
                # (up: plain; down: nu_l dsign[a] pi_user[l,u,s,a])
                user_up[m, g, :, :, :, b] += sgn * pif_user[..., a]
                user_dn[m, g, :, :, :, b] += (
                    sgn * DSIGN[a] * parity[:, None, None]
                    * pif_user[..., a]
                )

        # beam source tables: (B_l e1) = (a1, -b1, 0)
        # Q~+ = c sum_l nu_l d0_l (Pi B)e1 ; Q~- without nu
        q_plus[m, 0] = (parity * d0_sun)[:, None] * pif[:, :, 0]
        q_plus[m, 1] = -(parity * d0_sun)[:, None] * pif[:, :, 1]
        q_minus[m, 0] = d0_sun[:, None] * pif[:, :, 0]
        q_minus[m, 1] = -d0_sun[:, None] * pif[:, :, 1]

        # user beam tables (dsign only touches the U row, which (B e1)
        # never populates, so up/dn differ only in the nu_l factor)
        beam_user_up[m, 0] = (parity * d0_sun)[:, None, None] * pif_user[..., 0]
        beam_user_up[m, 1] = -(parity * d0_sun)[:, None, None] * pif_user[..., 1]
        beam_user_dn[m, 0] = d0_sun[:, None, None] * pif_user[..., 0]
        beam_user_dn[m, 1] = -d0_sun[:, None, None] * pif_user[..., 1]

        # stream sums: S[l, c, (j s)] = w_j pi[l, j, s, c]
        stream_sum[m] = np.einsum(
            "ljsc,j->lcjs", pi, w
        ).reshape(L, NS, K)
        par_d[m] = parity[:, None] * DSIGN[None, :]

    return VectorMinorTables(
        kernel_a=kernel_a,
        kernel_b=kernel_b,
        q_plus=q_plus,
        q_minus=q_minus,
        stream_sum=stream_sum,
        par_d=par_d,
        user_up=user_up,
        user_dn=user_dn,
        beam_user_up=beam_user_up,
        beam_user_dn=beam_user_dn,
        mu=mu,
        w=w,
        mu0=float(mu0),
        user_mu=user_mu,
    )


def _mode_radiance_vec(
    m_idx, tab,
    dtau, omega, greeks, t_top, sbar, t_ground,
    albedo, mu, w, mu0, user_mu, user_up, include_ss, f0,
    with_levels=False,
):
    """One azimuth mode, wavelength-minor polarized. ``tab`` is the
    per-mode slice of the stacked static tables (traced through
    lax.scan); ``greeks`` [G=4, L, P, W]. Returns radiance [U, 3, W]
    in the TRANSFORMED frame (caller untransforms the U component of
    downwelling outputs via the azimuth synthesis sign table)."""
    dt = dtau.dtype
    N = len(mu)
    K = N * NS
    P = dtau.shape[0]
    omega = clamp_ssa(omega)

    (kern_a, kern_b, qp_tab, qm_tab, s_tab, par_d,
     uu_tab, ud_tab, bu_tab, bd_tab) = tab

    G, L = greeks.shape[0], greeks.shape[1]
    greeks_f = greeks.reshape(G * L, P, -1)

    # --- symmetrized layer matrices (disco_vec._assemble_symmetric_vec) --
    ca = jnp.einsum(
        "lij,lpw->pijw", kern_a.reshape(G * L, K, K), greeks_f
    )
    cb = jnp.einsum(
        "lij,lpw->pijw", kern_b.reshape(G * L, K, K), greeks_f
    )
    mu_f = np.repeat(mu, NS)
    w_f = np.repeat(w, NS)
    s = np.sqrt(w_f / mu_f)
    scale = jnp.asarray(s[:, None] * s[None, :], dtype=dt)[None, :, :, None]
    diag = jnp.asarray(np.diag(1.0 / mu_f), dtype=dt)[None, :, :, None]
    om = omega[:, None, None, :]
    a_hat = diag - om * ca * scale
    b_hat = diag - om * cb * scale

    # --- eigensolve (lane-minor) ----------------------------------------
    chol = lane_cholesky(b_hat)
    m_sym = lane_mm(lane_mm(lane_t(chol), a_hat), chol)
    m_sym = 0.5 * (m_sym + lane_t(m_sym))
    k2, v = lane_jacobi_eigh_scan(m_sym)
    k = jnp.sqrt(jnp.maximum(k2, KMIN * KMIN))          # [P, A, W]
    f_hat = lane_solve_upper(lane_t(chol), v)
    g_hat = lane_mm(chol, v) / k[..., None, :, :]
    dinv = jnp.asarray(
        1.0 / np.sqrt(w_f * mu_f), dtype=dt
    )[None, :, None, None]
    x = 0.5 * dinv * (f_hat - g_hat)                    # [P, K, A, W]
    y = 0.5 * dinv * (f_hat + g_hat)

    is_m0 = jnp.where(m_idx == 0, 1.0, 0.0).astype(dt)
    two_minus_delta = jnp.where(m_idx == 0, 1.0, 2.0).astype(dt)

    # --- beam source vectors --------------------------------------------
    greeks2 = greeks_f.reshape(G, L, P, -1)[jnp.array([0, 3])].reshape(
        2 * L, P, -1
    )  # a1, b1 rows
    cq = two_minus_delta * omega / (4.0 * jnp.pi)       # [P, W]
    qp = cq[:, None, :] * jnp.einsum(
        "lk,lpw->pkw", qp_tab.reshape(2 * L, K), greeks2
    )
    qm = cq[:, None, :] * jnp.einsum(
        "lk,lpw->pkw", qm_tab.reshape(2 * L, K), greeks2
    )

    wq = jnp.asarray(w_f, dtype=dt)[None, :, None]

    def greens(qp_, qm_):
        proj_v = jnp.sum(
            (qp_ * wq)[..., None, :] * x + (qm_ * wq)[..., None, :] * y,
            axis=-3,
        )                                               # [P, A, W]
        proj_u = jnp.sum(
            (qp_ * wq)[..., None, :] * y + (qm_ * wq)[..., None, :] * x,
            axis=-3,
        )
        return k * proj_v, -k * proj_u

    amp_beam = (t_top * f0[None, :])[:, None, :]        # [P, 1, W]
    sb = sbar[:, None, :]
    c_minus, c_plus = greens(qp, qm)

    # --- particular boundary values -------------------------------------
    d1 = dtau[:, None, :]
    phi_mb = c_minus * amp_beam * ediff(sb, k, d1)
    phi_pt = -c_plus * amp_beam * ediff(jnp.zeros_like(k), k + sb, d1)

    def project(mat, vec):
        return jnp.sum(mat * vec[..., None, :, :], axis=-2)

    ip_plus_top = project(y, phi_pt)
    ip_minus_top = project(x, phi_pt)
    ip_plus_bot = project(x, phi_mb)
    ip_minus_bot = project(y, phi_mb)

    # --- BVP blocks ------------------------------------------------------
    e = jnp.exp(-k * d1)                                # [P, A, W]
    xe = x * e[:, None, :, :]
    ye = y * e[:, None, :, :]

    # Lambertian ground reflects I only: refl[(is),(jt),w] =
    # 2 a delta_{s0} delta_{t0} w_j mu_j
    e1mask = np.zeros(K)
    e1mask[0::NS] = 1.0
    wmu_I = np.zeros(K)
    wmu_I[0::NS] = w * mu
    refl = (
        2.0 * is_m0 * albedo[None, None, :]
        * jnp.asarray(
            e1mask[:, None] * wmu_I[None, :], dtype=dt
        )[:, :, None]
    )                                                   # [K, K, W]
    ground_sun = is_m0 * albedo * mu0 * t_ground * f0 / jnp.pi   # [W]
    ground_direct = ground_sun[None, :] * jnp.asarray(
        e1mask[:, None], dtype=dt
    )                                                   # [K, W]

    idx = jnp.arange(P)
    first_m = (idx == 0)[:, None, None, None]
    last_m = (idx == P - 1)[:, None, None, None]
    first_v = (idx == 0)[:, None, None]
    last_v = (idx == P - 1)[:, None, None]

    def two_by_two(tl, tr, bl, br):
        top = jnp.concatenate([tl, tr], axis=-2)
        bot = jnp.concatenate([bl, br], axis=-2)
        return jnp.concatenate([top, bot], axis=-3)

    zero_n = jnp.zeros_like(x)

    diag_tl = jnp.where(first_m, y, -y)
    diag_tr = jnp.where(first_m, xe, -xe)
    refl_b = refl[None]                                 # [1, K, K, W]
    grd_bl = xe - lane_mm(refl_b, ye)
    grd_br = y - lane_mm(refl_b, x)
    diag_bl = jnp.where(last_m, grd_bl, xe)
    diag_br = jnp.where(last_m, grd_br, y)
    diag_blocks = two_by_two(diag_tl, diag_tr, diag_bl, diag_br)

    xn = jnp.roll(x, -1, axis=0)
    yen = jnp.roll(ye, -1, axis=0)
    upper = two_by_two(zero_n, zero_n, -xn, -yen)

    xprev = jnp.roll(x, 1, axis=0)
    yeprev = jnp.roll(ye, 1, axis=0)
    lower = two_by_two(yeprev, xprev, zero_n, zero_n)

    rhs_top = jnp.where(
        first_v, -ip_minus_top,
        ip_minus_top - jnp.roll(ip_minus_bot, 1, axis=0),
    )
    rhs_ground = (
        ground_direct[None] - ip_plus_bot
        + jnp.sum(refl_b * ip_minus_bot[..., None, :, :], axis=-2)
    )
    rhs_bot = jnp.where(
        last_v, rhs_ground, jnp.roll(ip_plus_top, -1, axis=0) - ip_plus_bot
    )
    rhs = jnp.concatenate([rhs_top, rhs_bot], axis=-2)  # [P, 2K, W]

    sol = lane_block_thomas_solve(lower, diag_blocks, upper, rhs)
    coeff_l = sol[..., :K, :]                           # [P, K(A), W]
    coeff_m = sol[..., K:, :]

    if with_levels:
        # level stream fields at layer tops/bottoms (transformed frame,
        # flattened K), lane-minor — for the limb ray-source evaluation
        def project_lv(mat, vec):
            return jnp.sum(mat * vec[..., None, :, :], axis=-2)

        ea = e[:, None, :, :]
        levels = {
            "i_plus_top": project_lv(x, coeff_l)
            + project_lv(y * ea, coeff_m) + project_lv(y, phi_pt),
            "i_minus_top": project_lv(y, coeff_l)
            + project_lv(x * ea, coeff_m) + project_lv(x, phi_pt),
            "i_plus_bot": project_lv(x * ea, coeff_l)
            + project_lv(y, coeff_m) + project_lv(x, phi_mb),
            "i_minus_bot": project_lv(y * ea, coeff_l)
            + project_lv(x, coeff_m) + project_lv(y, phi_mb),
        }

    # --- post-processing --------------------------------------------------
    # stream sums: t1[p, l, c, a, w] = sum_k S[l, c, k] X[p, k, a, w]
    t1 = jnp.einsum("lck,pkaw->plcaw", s_tab, x)
    t2 = jnp.einsum("lck,pkaw->plcaw", s_tab, y)
    pd = par_d[:, :, None, None]                        # [L, 3, 1, 1]
    g_v = t1 + pd * t2
    g_u = t2 + pd * t1

    # user projections per greek: [P, U, 3(stokes), A, W]
    half_om = 0.5 * omega[:, None, None, None, :]
    uu = uu_tab.reshape(G * L, *uu_tab.shape[2:])       # [GL, U, 3, 3]
    ud = ud_tab.reshape(G * L, *ud_tab.shape[2:])
    gv_f = jnp.einsum(
        "lpw,plbaw->lpbaw",
        greeks_f, jnp.tile(g_v, (G, 1, 1, 1, 1)).reshape(
            G * L, *g_v.shape[1:]
        ).transpose(1, 0, 2, 3, 4),
    ) if False else None  # (kept simple below)

    # greeks_f [GL, P, W]; g_v [P, L, 3, A, W] tiled over G via indexing
    g_v_t = jnp.concatenate([g_v] * G, axis=1)          # [P, GL, 3, A, W]
    g_u_t = jnp.concatenate([g_u] * G, axis=1)
    pv_up = half_om * jnp.einsum(
        "lusb,lpw,plbaw->pusaw", uu, greeks_f, g_v_t
    )
    pu_up = half_om * jnp.einsum(
        "lusb,lpw,plbaw->pusaw", uu, greeks_f, g_u_t
    )
    pv_dn = half_om * jnp.einsum(
        "lusb,lpw,plbaw->pusaw", ud, greeks_f, g_v_t
    )
    pu_dn = half_om * jnp.einsum(
        "lusb,lpw,plbaw->pusaw", ud, greeks_f, g_u_t
    )

    # direct beam into user directions: [P, U, 3, W]
    cbeam = (two_minus_delta * omega / (4.0 * jnp.pi))[:, None, None, :]
    bu = bu_tab.reshape(2 * L, *bu_tab.shape[2:])       # [2L, U, 3]
    bd = bd_tab.reshape(2 * L, *bd_tab.shape[2:])
    beam_up = cbeam * jnp.einsum("lus,lpw->pusw", bu, greeks2)
    beam_dn = cbeam * jnp.einsum("lus,lpw->pusw", bd, greeks2)

    # --- layer source integrals (scalar multipliers per mode a) ----------
    user_mu_j = jnp.asarray(user_mu, dtype=dt)
    cu = (1.0 / user_mu_j)[None, :, None, None]         # [1, U, 1, 1]
    inv_mu = cu
    du = dtau[:, None, None, :]                         # [P, 1, 1, W]
    ku = k[:, None, :, :]                               # [P, 1, A, W]
    zero = jnp.zeros_like(ku)

    efwd_k = ediff(zero, ku + cu, du) * inv_mu
    erev_k = ediff(ku, cu + zero, du) * inv_mu

    lu_c = coeff_l[:, None, :, :]                       # [P, 1, A, W]
    mu_c = coeff_m[:, None, :, :]
    # pv_up [P, U, 3, A, W] x (lu_c efwd)[P, U, A, W] -> [P, U, 3, W]
    s_up = jnp.sum(
        pv_up * (lu_c * efwd_k)[:, :, None] + pu_up * (mu_c * erev_k)[:, :, None],
        axis=-2,
    )
    s_dn = jnp.sum(
        pv_dn * (lu_c * erev_k)[:, :, None] + pu_dn * (mu_c * efwd_k)[:, :, None],
        axis=-2,
    )

    sbu = sb[:, None, :, :]                             # [P, 1, 1, W]
    ampu = amp_beam[:, None, :, :]
    efwd_s = ediff(jnp.zeros_like(sbu), sbu + cu, du) * inv_mu
    erev_s = ediff(sbu, cu + jnp.zeros_like(sbu), du) * inv_mu
    green_minus_up = ddiff2(zero, sbu + cu, ku + cu, du) * inv_mu
    green_plus_up = (
        efwd_s - ediff(ku + sbu, sbu + cu, du) * inv_mu
    ) / (ku + sbu)
    green_minus_dn = ddiff2(ku, cu + zero, sbu + zero, du) * inv_mu
    green_plus_dn = (
        erev_s - ediff(sbu, ku + sbu + cu, du) * inv_mu
    ) / (ku + sbu)

    cmu = c_minus[:, None, :, :]
    cpu = c_plus[:, None, :, :]
    s_up = s_up + jnp.sum(
        pv_up * (cmu * ampu * green_minus_up)[:, :, None]
        - pu_up * (cpu * ampu * green_plus_up)[:, :, None],
        axis=-2,
    )
    s_dn = s_dn + jnp.sum(
        pv_dn * (cmu * ampu * green_minus_dn)[:, :, None]
        - pu_dn * (cpu * ampu * green_plus_dn)[:, :, None],
        axis=-2,
    )
    if include_ss:
        s_up = s_up + beam_up * (ampu * efwd_s)[..., 0, :][:, :, None]
        s_dn = s_dn + beam_dn * (ampu * erev_s)[..., 0, :][:, :, None]

    # attenuate + sum layers
    od_user = dtau[:, None, :] * cu[0, :, 0, :][None]   # [P, U, W]
    cum_above = jnp.cumsum(od_user, axis=0) - od_user
    cum_below = jnp.cumsum(od_user[::-1], axis=0)[::-1] - od_user
    rad_up = jnp.sum(jnp.exp(-cum_above)[:, :, None] * s_up, axis=0)
    rad_dn = jnp.sum(jnp.exp(-cum_below)[:, :, None] * s_dn, axis=0)
    # [U, 3, W]

    # ground reflection of the downwelling diffuse field (I only)
    i_minus_ground = (
        jnp.sum(ye[P - 1] * coeff_l[P - 1][None], axis=-2)
        + jnp.sum(x[P - 1] * coeff_m[P - 1][None], axis=-2)
        + jnp.sum(y[P - 1] * phi_mb[P - 1][None], axis=-2)
    )                                                   # [K, W]
    i_minus_I = i_minus_ground[0::NS]                   # [N, W]
    wmu = jnp.asarray(w * mu, dtype=dt)
    refl_sum = 2.0 * is_m0 * albedo * jnp.sum(
        wmu[:, None] * i_minus_I, axis=0
    )                                                   # [W]
    ground_up_I = refl_sum + (ground_sun if include_ss else 0.0)
    total_od_user = jnp.sum(od_user, axis=0)            # [U, W]
    U = len(user_mu)
    ground_vec = jnp.zeros((U, NS) + total_od_user.shape[-1:], dtype=dt)
    ground_vec = ground_vec.at[:, 0, :].set(
        jnp.exp(-total_od_user) * ground_up_I[None, :]
    )
    rad_up = rad_up + ground_vec

    # NOTE: rad_dn stays in the TRANSFORMED frame; the caller's azimuth
    # synthesis table carries the D untransform (sin-mode U sign)
    rad = jnp.where(
        jnp.asarray(user_up)[:, None, None], rad_up, rad_dn
    )
    if with_levels:
        return rad, levels
    return rad


def solve_nstream_vector(
    dtau,
    omega,
    a1, a2, a3, b1,
    albedo,
    tables: VectorMinorTables,
    user_up,
    user_azimuth,
    include_ss: bool = True,
    chapman=None,
    num_azimuth: int | None = None,
    f0=None,
    return_internal: bool = False,
):
    """Polarized N-stream plane-parallel DO radiance, wavelength-minor.

    dtau/omega [P, W] (TOA first); a1/a2/a3/b1 [L, P, W]; albedo [W].
    Returns radiance [U, 3, W] (I, Q, U), sun-normalized. Same physics as
    ``disco_vec.solve_plane_parallel_vector``.
    """
    mu0 = tables.mu0
    mu = np.asarray(tables.mu)
    w = np.asarray(tables.w)
    P = dtau.shape[0]
    dt = dtau.dtype

    if chapman is None:
        chapman_m = jnp.tril(jnp.ones((P, P), dtype=dt)) / mu0
    else:
        chapman_m = jnp.asarray(chapman, dtype=dt)
    slant_bottom = jnp.einsum("pq,qw->pw", chapman_m, dtau)
    slant_top = jnp.concatenate(
        [jnp.zeros_like(slant_bottom[:1]), slant_bottom[:-1]], axis=0
    )
    t_top = jnp.exp(-slant_top)
    t_ground = jnp.exp(-slant_bottom[-1])
    sbar = (slant_bottom - slant_top) / jnp.maximum(dtau, 1e-30)

    M = tables.kernel_a.shape[0]
    if num_azimuth is not None:
        M = min(M, num_azimuth)
    nstr = 2 * len(mu)
    luse = min(a1.shape[0], tables.kernel_a.shape[2], max(nstr, 1))
    greeks = jnp.stack(
        [v[:luse] for v in (a1, a2, a3, b1)], axis=0
    ).astype(dt)                                        # [4, L, P, W]

    user_mu = np.asarray(tables.user_mu)
    user_up_np = np.asarray(user_up)
    user_azimuth = jnp.asarray(user_azimuth, dtype=dt)

    if f0 is None:
        f0 = jnp.ones(albedo.shape, dtype=dt)
    else:
        f0 = jnp.broadcast_to(jnp.asarray(f0, dtype=dt), albedo.shape)

    xs = (
        jnp.arange(M),
        (
            jnp.asarray(tables.kernel_a[:M, :, :luse], dtype=dt),
            jnp.asarray(tables.kernel_b[:M, :, :luse], dtype=dt),
            jnp.asarray(tables.q_plus[:M, :, :luse], dtype=dt),
            jnp.asarray(tables.q_minus[:M, :, :luse], dtype=dt),
            jnp.asarray(tables.stream_sum[:M, :luse], dtype=dt),
            jnp.asarray(tables.par_d[:M, :luse], dtype=dt),
            jnp.asarray(tables.user_up[:M, :, :luse], dtype=dt),
            jnp.asarray(tables.user_dn[:M, :, :luse], dtype=dt),
            jnp.asarray(tables.beam_user_up[:M, :, :luse], dtype=dt),
            jnp.asarray(tables.beam_user_dn[:M, :, :luse], dtype=dt),
        ),
    )
    U = len(user_mu)
    W = dtau.shape[-1]

    @jax.checkpoint
    def _mode_ckpt(m_idx, tab):
        return _mode_radiance_vec(
            m_idx, tab,
            dtau, omega, greeks, t_top, sbar, t_ground,
            albedo, mu, w, mu0, user_mu, user_up_np, include_ss, f0,
            with_levels=return_internal,
        )

    # azimuth synthesis: (I, Q) ~ cos m dphi; U ~ sin m dphi, with the
    # downwelling D-untransform folded into the sign of the U weight
    dphi = jnp.pi - user_azimuth                        # [U]
    dsign_dn = jnp.where(
        jnp.asarray(user_up_np), 1.0, -1.0
    ).astype(dt)                                        # U-comp untransform

    def mode_body(acc, x):
        m_idx, tab = x
        out = _mode_ckpt(m_idx, tab)
        r_m, lv = out if return_internal else (out, None)
        cosm = jnp.cos(m_idx * dphi)[:, None]
        sinm = jnp.sin(m_idx * dphi)[:, None]
        az = jnp.stack(
            [cosm, cosm, sinm * dsign_dn[:, None]], axis=1
        )                                               # [U, 3, 1]
        return acc + az * r_m, lv

    rad, levels = jax.lax.scan(
        mode_body, jnp.zeros((U, NS, W), dtype=dt), xs
    )
    if return_internal:
        # levels entries stacked over modes: [M, P, K, W]
        from ..ops.wigner import wigner_d

        theta0 = np.arccos(np.clip(mu0, -1.0, 1.0))
        L = luse
        d0_sun = np.stack([
            wigner_d(np.array(theta0), m, 0, L) for m in range(M)
        ])
        ls = np.arange(L)
        parity = np.stack([(-1.0) ** (ls + m) for m in range(M)])
        internal = {
            "levels": levels,
            "omega": clamp_ssa(omega),
            "greeks": greeks,                     # [4, L, P, W]
            "t_top": t_top,
            "sbar": sbar,
            "dtau": dtau,
            "d0_sun": d0_sun,                     # [M, L]
            "parity": parity,                     # [M, L]
            "stream_sum": np.asarray(tables.stream_sum[:M, :luse]),
            "par_d": np.asarray(tables.par_d[:M, :luse]),
            "mu0": mu0,
            "f0": f0,
        }
        return rad, internal
    return rad
