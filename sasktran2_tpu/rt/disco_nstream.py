"""Wavelength-minor N-stream discrete-ordinates solver.

Same physics as the generic solver (``rt/disco.py`` — the TPU rework of the
reference's ``cpp/lib/sktran_disco/sktran_do_rte.cpp``): exact
symmetrization -> Cholesky + Jacobi eigensolve, Green's-function particular
solution with the analytic -1/k J-norms, block-tridiagonal BVP, and the
divided-difference post-processing multipliers. The difference is purely
layout: every array carries the wavelength axis LAST so the (8, 128)
register tiling packs wavelengths into the vector lanes, where the generic
wavelength-leading layout pads its trailing [N, N] stream dims 16-64x
(round-2 bench measurement; this is the "wavelength-minor layouts for the
BVP + postprocessing hot paths" item). Validated against ``rt/disco.py``
at 1e-10 in ``tests/test_nstream.py``.

Scope: scalar (I-only) radiance, Lambertian surface, beam + optional
thermal sources — the headline benchmark configuration. BRDF surfaces and
polarization stay on the generic path.

Shapes: dtau/omega [P, W], beta [L, P, W], albedo/f0 [W]; radiance [U, W].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

import jax

from ..ops.lanes import (
    lane_block_thomas_solve,
    lane_cholesky,
    lane_jacobi_eigh_scan,
    lane_mm,
    lane_solve_upper,
    lane_t,
)
from ..ops.linalg import ddiff2, ediff
from .disco import KMIN, ModeTables, build_mode_tables, clamp_ssa

__all__ = ["build_mode_tables", "solve_nstream"]


def _contract_legendre(weights, beta):
    """sum_l weights[l, ...] beta[l, p, w] -> [p, ..., w].

    weights: static [L] or [L, I] or [L, I, J] numpy/jnp table.
    Returns [P, W], [P, I, W] or [P, I, J, W] respectively (a matmul over
    the small static Legendre dim; XLA maps it onto the MXU with the
    (p, w) product in the lane-major output).
    """
    w = jnp.asarray(weights, dtype=beta.dtype)
    if w.ndim == 1:
        return jnp.einsum("l,lpw->pw", w, beta)
    if w.ndim == 2:
        return jnp.einsum("li,lpw->piw", w, beta)
    return jnp.einsum("lij,lpw->pijw", w, beta)


def _mode_radiance(
    m_idx, lam, lam_sun, lam_user, parity,
    dtau, omega, beta, t_top, sbar, t_ground,
    albedo, mu, w, mu0, user_mu, user_up, include_ss, f0, thermal,
    with_levels=False, surface_ops=None,
):
    """One azimuth mode, wavelength-minor. lam [L, N] / lam_sun [L] /
    lam_user [L, U] / parity [L] may be traced (lax.scan over modes) or
    static. ``surface_ops``: per-mode BRDF azimuth moments in lane
    layout (rho_stream [N, N, W], rho_user [U, N, W], rho_sun_stream
    [N, W], rho_sun_user [U, W]); None = Lambertian. Returns radiance
    [U, W]."""
    dt = dtau.dtype
    N = len(mu)
    P = dtau.shape[0]
    omega = clamp_ssa(omega)
    even = (parity > 0).astype(dt)

    # --- symmetrized layer matrices (disco._assemble_symmetric) ---------
    ll = lam[:, :, None] * lam[:, None, :]              # [L, N, N]
    cb = _contract_legendre(ll * even[:, None, None], beta)  # [P, N, N, W]
    ca = _contract_legendre(ll * (1.0 - even)[:, None, None], beta)
    s = np.sqrt(w / mu)
    scale = jnp.asarray(s[:, None] * s[None, :], dtype=dt)[None, :, :, None]
    diag = jnp.asarray(np.diag(1.0 / mu), dtype=dt)[None, :, :, None]
    om = omega[:, None, None, :]
    a_hat = diag - om * ca * scale
    b_hat = diag - om * cb * scale

    # --- eigensolve (disco._eigensolve, lane-minor) ---------------------
    chol = lane_cholesky(b_hat)
    m_sym = lane_mm(lane_mm(lane_t(chol), a_hat), chol)
    m_sym = 0.5 * (m_sym + lane_t(m_sym))
    k2, v = lane_jacobi_eigh_scan(m_sym)
    k = jnp.sqrt(jnp.maximum(k2, KMIN * KMIN))          # [P, A, W]
    f_hat = lane_solve_upper(lane_t(chol), v)
    g_hat = lane_mm(chol, v) / k[..., None, :, :]
    dinv = jnp.asarray(
        1.0 / np.sqrt(w * mu), dtype=dt
    )[None, :, None, None]
    x = 0.5 * dinv * (f_hat - g_hat)                    # [P, N, A, W]
    y = 0.5 * dinv * (f_hat + g_hat)

    is_m0 = jnp.where(m_idx == 0, 1.0, 0.0).astype(dt)
    two_minus_delta = jnp.where(m_idx == 0, 1.0, 2.0).astype(dt)

    # --- beam source vectors (disco._beam_sources) ----------------------
    cq = two_minus_delta * omega / (4.0 * jnp.pi)       # [P, W]
    qp = cq[:, None, :] * _contract_legendre(
        (parity * lam_sun)[:, None] * lam, beta
    )                                                   # [P, N, W]
    qm = cq[:, None, :] * _contract_legendre(lam_sun[:, None] * lam, beta)

    wq = jnp.asarray(w, dtype=dt)[None, :, None]

    def greens(qp_, qm_):
        # c_minus = +k <Q, [X; Y]>, c_plus = -k <Q, [Y; X]> (analytic -1/k
        # J-norms, disco._greens_coefficients)
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
    sources = [(*greens(qp, qm), amp_beam, sb, "beam")]

    if thermal is not None:
        b0, b1, _surf_em = thermal
        q_th = is_m0 * (1.0 - omega)[:, None, :] * jnp.ones(
            (N,), dtype=dt
        )[None, :, None]                                # [P, N, W]
        c_m_th, c_p_th = greens(q_th, q_th)
        sources.append(
            (c_m_th, c_p_th, b0[:, None, :], b1[:, None, :], "thermal")
        )

    # --- particular boundary values (disco._particular_boundary) --------
    d1 = dtau[:, None, :]
    phi_mb = 0.0
    phi_pt = 0.0
    for c_m, c_p, amp, decay, _kind in sources:
        phi_mb = phi_mb + c_m * amp * ediff(decay, k, d1)
        phi_pt = phi_pt - c_p * amp * ediff(jnp.zeros_like(k), k + decay, d1)

    def project(mat, vec):
        # [P, N, A, W] x [P, A, W] -> [P, N, W]
        return jnp.sum(mat * vec[..., None, :, :], axis=-2)

    ip_plus_top = project(y, phi_pt)
    ip_minus_top = project(x, phi_pt)
    ip_plus_bot = project(x, phi_mb)
    ip_minus_bot = project(y, phi_mb)

    # --- BVP blocks (disco._bvp_blocks, lane-minor) ----------------------
    e = jnp.exp(-k * d1)                                # [P, A, W]
    xe = x * e[:, None, :, :]
    ye = y * e[:, None, :, :]

    # Ground reflection operator: Lambertian rank-one 2 a w_j mu_j at
    # m=0, or the BRDF azimuth moments 2 pi rho_m (disco surface_ops)
    wmu = jnp.asarray(w * mu, dtype=dt)
    ground_thermal = (
        is_m0 * (1.0 - albedo) * thermal[2] if thermal is not None else 0.0
    )
    # BVP drive is UNGATED by include_ss: beam->ground->rescatter is a
    # multiple-scatter path (matches disco._solve_one_mode; the include_ss
    # gate applies only to the user-direction ground_up term below).
    if surface_ops is None:
        refl = (
            2.0 * is_m0 * albedo[None, None, :]
            * wmu[None, :, None] * jnp.ones((N, 1, 1), dtype=dt)
        )                                               # [N, N, W]
        ground_sun = is_m0 * albedo * mu0 * t_ground * f0 / jnp.pi  # [W]
        ground_direct_scalar = ground_sun + ground_thermal
        ground_direct = ground_direct_scalar[None, :] * jnp.ones(
            (N, 1), dtype=dt
        )                                               # [N, W]
    else:
        refl = (
            2.0 * jnp.pi * surface_ops["rho_stream"] * wmu[None, :, None]
        )                                               # [N, N, W]
        gs_stream = (
            two_minus_delta
            * surface_ops["rho_sun_stream"]
            * (mu0 * t_ground * f0)[None, :]
        )                                               # [N, W]
        ground_direct = gs_stream + (
            ground_thermal[None, :] if thermal is not None else 0.0
        )

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
    refl_b = refl[None]                                 # [1, N, N, W]
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
    rhs = jnp.concatenate([rhs_top, rhs_bot], axis=-2)  # [P, 2N, W]

    sol = lane_block_thomas_solve(lower, diag_blocks, upper, rhs)
    coeff_l = sol[..., :N, :]                           # [P, N(A), W]
    coeff_m = sol[..., N:, :]

    if with_levels:
        # level stream fields at layer tops/bottoms (disco._solve_one_mode
        # levels block, lane-minor): project over the eigenmode axis
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

    # --- post-processing (disco._postprocess_mode, lane-minor) ----------
    # t1[p, l, a, w] = sum_j w_j lam_lj X_jaw ; t2 with Y
    lamw = lam * jnp.asarray(w, dtype=dt)[None, :]      # [L, N]
    t1 = jnp.einsum("lj,pjaw->plaw", lamw, x)
    t2 = jnp.einsum("lj,pjaw->plaw", lamw, y)
    par = jnp.asarray(parity, dtype=dt)[None, :, None, None]
    tt_v = t1 + par * t2                                # v-mode ang. shape
    tt_u = t2 + par * t1
    half_om = 0.5 * omega[:, None, None, :]
    lu_tab = jnp.asarray(lam_user, dtype=dt)            # [L, U]
    lupar_tab = jnp.asarray(parity[:, None] * lam_user, dtype=dt)

    pv_up = half_om * jnp.einsum("lu,lpw,plaw->puaw", lu_tab, beta, tt_v)
    pu_up = half_om * jnp.einsum("lu,lpw,plaw->puaw", lu_tab, beta, tt_u)
    pv_dn = half_om * jnp.einsum("lu,lpw,plaw->puaw", lupar_tab, beta, tt_v)
    pu_dn = half_om * jnp.einsum("lu,lpw,plaw->puaw", lupar_tab, beta, tt_u)

    cbeam = two_minus_delta * omega[:, None, :] / (4.0 * jnp.pi)  # [P,1,W]
    beam_up = cbeam * _contract_legendre(
        lam_user * (parity * lam_sun)[:, None], beta
    )                                                   # [P, U, W]
    beam_dn = cbeam * _contract_legendre(lam_sun[:, None] * lam_user, beta)

    user_mu_j = jnp.asarray(user_mu, dtype=dt)
    cu = (1.0 / user_mu_j)[None, :, None, None]         # [1, U, 1, 1]
    inv_mu = cu
    du = dtau[:, None, None, :]                         # [P, 1, 1, W]
    ku = k[:, None, :, :]                               # [P, 1, A, W]
    zero = jnp.zeros_like(ku)

    efwd_k = ediff(zero, ku + cu, du) * inv_mu
    erev_k = ediff(ku, cu + zero, du) * inv_mu

    lu_c = coeff_l[:, None, :, :]
    mu_c = coeff_m[:, None, :, :]
    s_up = jnp.sum(pv_up * lu_c * efwd_k + pu_up * mu_c * erev_k, axis=-2)
    s_dn = jnp.sum(pv_dn * lu_c * erev_k + pu_dn * mu_c * efwd_k, axis=-2)

    for c_m, c_p, amp, decay, kind in sources:
        sbu = decay[:, None, :, :]                      # [P, 1, 1, W]
        ampu = amp[:, None, :, :]
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

        cmu = c_m[:, None, :, :]
        cpu = c_p[:, None, :, :]
        s_up = s_up + jnp.sum(
            pv_up * cmu * ampu * green_minus_up
            - pu_up * cpu * ampu * green_plus_up,
            axis=-2,
        )
        s_dn = s_dn + jnp.sum(
            pv_dn * cmu * ampu * green_minus_dn
            - pu_dn * cpu * ampu * green_plus_dn,
            axis=-2,
        )
        if kind == "beam":
            if include_ss:
                s_up = s_up + beam_up * ampu[..., 0, :] * efwd_s[..., 0, :]
                s_dn = s_dn + beam_dn * ampu[..., 0, :] * erev_s[..., 0, :]
        else:  # thermal: isotropic direct source, m=0 only
            one_minus_om = (1.0 - omega)[:, None, :]
            s_up = s_up + (
                is_m0 * one_minus_om * ampu[..., 0, :] * efwd_s[..., 0, :]
            )
            s_dn = s_dn + (
                is_m0 * one_minus_om * ampu[..., 0, :] * erev_s[..., 0, :]
            )

    # attenuate + sum layers
    od_user = dtau[:, None, :] * cu[0, :, :, 0][None]   # [P, U, W]
    cum_above = jnp.cumsum(od_user, axis=0) - od_user
    cum_below = jnp.cumsum(od_user[::-1], axis=0)[::-1] - od_user
    rad_up = jnp.sum(jnp.exp(-cum_above) * s_up, axis=0)      # [U, W]
    rad_dn = jnp.sum(jnp.exp(-cum_below) * s_dn, axis=0)

    # ground reflection of the downwelling diffuse field
    i_minus_ground = (
        jnp.sum(ye[P - 1] * coeff_l[P - 1][None], axis=-2)
        + jnp.sum(x[P - 1] * coeff_m[P - 1][None], axis=-2)
        + jnp.sum(y[P - 1] * phi_mb[P - 1][None], axis=-2)
    )                                                   # [N, W]
    if surface_ops is None:
        # user-angle Lambertian reflection: 2 a sum_j w_j mu_j I-_j
        refl_sum = 2.0 * is_m0 * albedo * jnp.sum(
            wmu[:, None] * i_minus_ground, axis=0
        )                                               # [W]
        ground_up = refl_sum[None, :] * jnp.ones(
            (len(user_mu), 1), dtype=dt
        )
        if include_ss:
            ground_up = ground_up + ground_sun[None, :]
    else:
        ground_up = 2.0 * jnp.pi * jnp.einsum(
            "ujw,j,jw->uw", surface_ops["rho_user"], wmu, i_minus_ground
        )
        if include_ss:
            ground_up = ground_up + (
                two_minus_delta
                * surface_ops["rho_sun_user"]
                * (mu0 * t_ground * f0)[None, :]
            )
    if thermal is not None:
        ground_up = ground_up + ground_thermal[None, :]
    total_od_user = jnp.sum(od_user, axis=0)
    rad_up = rad_up + jnp.exp(-total_od_user) * ground_up

    rad = jnp.where(jnp.asarray(user_up)[:, None], rad_up, rad_dn)
    if with_levels:
        return rad, levels
    return rad


def solve_nstream(
    dtau,
    omega,
    beta,
    albedo,
    tables: ModeTables,
    user_up,
    user_azimuth,
    include_ss: bool = True,
    chapman=None,
    num_azimuth: int | None = None,
    f0=None,
    thermal_b0=None,
    thermal_b1_bottom=None,
    surface_emission=None,
    return_internal: bool = False,
    brdf=None,
    brdf_args=None,
):
    """N-stream plane-parallel DO radiance, wavelength-minor.

    dtau/omega [P, W] (TOA first); beta [L, P, W]; albedo [W]; ``tables``
    from ``disco.build_mode_tables``. thermal_b0/thermal_b1_bottom [P, W].
    ``brdf``/``brdf_args`` ([W, nargs]): non-Lambertian surface via the
    shared azimuth-moment quadrature (disco.brdf_azimuth_moments).
    Returns radiance [U, W]. Same physics as ``disco.solve_plane_parallel``
    (validated at 1e-10 in tests/test_nstream.py).
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

    M = tables.lam_stream.shape[0]
    if num_azimuth is not None:
        M = min(M, num_azimuth)
    nstr = 2 * len(mu)
    luse = min(beta.shape[0], max(nstr, 1))
    beta = beta[:luse]

    user_mu = np.asarray(tables.user_mu)
    user_up = np.asarray(user_up)
    user_azimuth = jnp.asarray(user_azimuth, dtype=dt)

    if f0 is None:
        f0 = jnp.ones(albedo.shape, dtype=dt)
    else:
        f0 = jnp.broadcast_to(jnp.asarray(f0, dtype=dt), albedo.shape)

    if thermal_b0 is not None:
        both_pos = (thermal_b0 > 0.0) & (thermal_b1_bottom > 0.0)
        b1 = jnp.where(
            both_pos,
            jnp.log(
                jnp.maximum(thermal_b0, 1e-300)
                / jnp.maximum(thermal_b1_bottom, 1e-300)
            )
            / jnp.maximum(dtau, 1e-30),
            jnp.zeros_like(dtau),
        )
        b0 = jnp.where(
            both_pos, thermal_b0, 0.5 * (thermal_b0 + thermal_b1_bottom)
        )
        thermal = (
            b0, b1,
            surface_emission
            if surface_emission is not None
            else jnp.zeros_like(albedo),
        )
    else:
        thermal = None

    surface_ops_all = None
    if brdf is not None:
        from .disco import brdf_azimuth_moments

        mom = brdf_azimuth_moments(
            brdf, brdf_args, jnp.asarray(mu, dtype=dt),
            jnp.asarray(user_mu, dtype=dt), mu0, jnp.arange(M), dt,
        )
        # wavelength-leading [M, W, ...] -> lane layout [M, ..., W]
        surface_ops_all = {
            k: jnp.moveaxis(v, 1, -1) for k, v in mom.items()
        }

    # scan over azimuth modes with stacked static tables: the traced graph
    # holds ONE mode body regardless of M, which is what keeps nstr=16
    # compile time flat (round-2 lesson: unrolling 16 modes of the unrolled
    # lane kernels produced an HLO graph XLA could not compile in 10 min)
    xs = (
        jnp.arange(M),
        jnp.asarray(np.asarray(tables.lam_stream[:M, :luse]), dtype=dt),
        jnp.asarray(np.asarray(tables.lam_sun[:M, :luse]), dtype=dt),
        jnp.asarray(np.asarray(tables.lam_user[:M, :luse]), dtype=dt),
        jnp.asarray(np.asarray(tables.parity[:M, :luse]), dtype=dt),
        surface_ops_all,
    )
    U = len(user_mu)
    W = dtau.shape[-1]

    # remat per mode: the scan's backward pass otherwise saves every
    # mode's [P, 2N, 2N, W] BVP residuals (M x 800 MB at nstr=16, P=100,
    # W=512) — recomputing a mode during the backward sweep is far cheaper
    # than spilling those to HBM
    @jax.checkpoint
    def _mode_ckpt(m_idx, lam, lam_sun, lam_user, parity, surf_m):
        return _mode_radiance(
            m_idx, lam, lam_sun, lam_user, parity,
            dtau, omega, beta, t_top, sbar, t_ground,
            albedo, mu, w, mu0, user_mu, user_up, include_ss, f0,
            thermal,
            with_levels=return_internal,
            surface_ops=surf_m,
        )

    def mode_body(acc, x):
        m_idx, lam, lam_sun, lam_user, parity, surf_m = x
        out = _mode_ckpt(m_idx, lam, lam_sun, lam_user, parity, surf_m)
        r_m, lv = out if return_internal else (out, None)
        az = jnp.cos(m_idx * (jnp.pi - user_azimuth))[:, None]
        return acc + az * r_m, lv

    rad, levels = jax.lax.scan(
        mode_body, jnp.zeros((U, W), dtype=dt), xs
    )
    if return_internal:
        # levels entries stacked over modes: [M, P, N, W]
        internal = {
            "levels": levels,
            "lam": np.asarray(tables.lam_stream[:M, :luse]),
            "lam_sun": np.asarray(tables.lam_sun[:M, :luse]),
            "parity": np.asarray(tables.parity[:M, :luse]),
            "omega": clamp_ssa(omega),
            "beta": beta,
            "t_top": t_top,
            "sbar": sbar,
            "dtau": dtau,
            "w_quad": np.asarray(w),
            "mu0": mu0,
            "f0": f0,
            "thermal": thermal,
        }
        return rad, internal
    return rad


def solve_nstream_m0_levels(
    dtau,
    omega,
    beta,
    albedo,
    tables: ModeTables,
    include_ss: bool = True,
    chapman=None,
    f0=None,
    thermal_b0=None,
    thermal_b1_bottom=None,
    surface_emission=None,
):
    """m=0 solve returning the level stream fields, wavelength-minor.

    Same inputs as ``solve_nstream``. Returns (levels, t_top, t_ground)
    with levels entries [P, N, W] (layer tops/bottoms stream fields) and
    t_top [P, W] / t_ground [W] the beam transmittances — everything the
    flux assembly needs (reference flux loop,
    ``do_source_planeparallel.cpp:536-560``).
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

    nstr = 2 * len(mu)
    luse = min(beta.shape[0], max(nstr, 1))
    beta = beta[:luse]

    if f0 is None:
        f0 = jnp.ones(albedo.shape, dtype=dt)
    else:
        f0 = jnp.broadcast_to(jnp.asarray(f0, dtype=dt), albedo.shape)

    if thermal_b0 is not None:
        both_pos = (thermal_b0 > 0.0) & (thermal_b1_bottom > 0.0)
        b1 = jnp.where(
            both_pos,
            jnp.log(
                jnp.maximum(thermal_b0, 1e-300)
                / jnp.maximum(thermal_b1_bottom, 1e-300)
            )
            / jnp.maximum(dtau, 1e-30),
            jnp.zeros_like(dtau),
        )
        b0 = jnp.where(
            both_pos, thermal_b0, 0.5 * (thermal_b0 + thermal_b1_bottom)
        )
        thermal = (
            b0, b1,
            surface_emission
            if surface_emission is not None
            else jnp.zeros_like(albedo),
        )
    else:
        thermal = None

    user_mu = np.asarray(tables.user_mu)
    user_up = np.ones(len(user_mu), dtype=bool)
    _, levels = _mode_radiance(
        jnp.asarray(0),
        jnp.asarray(np.asarray(tables.lam_stream[0, :luse]), dtype=dt),
        jnp.asarray(np.asarray(tables.lam_sun[0, :luse]), dtype=dt),
        jnp.asarray(np.asarray(tables.lam_user[0, :luse]), dtype=dt),
        jnp.asarray(np.asarray(tables.parity[0, :luse]), dtype=dt),
        dtau, omega, beta, t_top, sbar, t_ground,
        albedo, mu, w, mu0, user_mu, user_up, include_ss, f0,
        thermal,
        with_levels=True,
    )
    return levels, t_top, t_ground
