"""Wavelength-minor two-stream discrete-ordinates solver.

Role of the reference's dedicated SIMD two-stream engine
(``rust/sasktran2-core/src/twostream/solver.rs`` + ``explicit.rs``): the
nstr = 2 specialization of the plane-parallel DO problem with closed-form
homogeneous solutions (no eigensolver) and a pivot-free layer sweep for
the boundary-value problem (reference ``sktran_do_pentadiagonal.cpp``).

TPU-first layout: every array carries the wavelength axis LAST so the
(8, 128) register tiling packs wavelengths into lanes. The generic solver
(`rt/disco.py`) keeps wavelength leading, which pads its small trailing
stream/layer dims 25-64x on TPU (measured in round-2 bench sweeps); this
module is the layout-native fast path and is validated against the
generic solver at 1e-10.

All physics matches ``rt/disco.py`` exactly (same mode tables, Green's
function particular solution, post-processing multipliers), restricted to
N = 1 quadrature point per hemisphere, scalar (I-only), Lambertian
surface, and beam + optional thermal sources.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.linalg import ddiff2, ediff
from .disco import ModeTables, build_mode_tables, clamp_ssa

KMIN = 1e-8

__all__ = ["build_mode_tables", "solve_twostream"]


def _mode_radiance(
    m_idx, lam, lam_sun, lam_user, parity,
    dtau, omega, beta, t_top, sbar, t_ground,
    albedo, mu1, w1, mu0, user_mu, user_up, include_ss, f0, thermal,
):
    """One azimuth mode, wavelength-minor. Shapes: dtau/omega [P, W],
    beta [L, P, W], albedo/f0 [W], lam/lam_sun/parity [L], lam_user [L, U].
    Returns radiance [U, W]."""
    dt = dtau.dtype
    omega = clamp_ssa(omega)
    lam = jnp.asarray(lam, dtype=dt)
    lam_sun = jnp.asarray(lam_sun, dtype=dt)
    lam_user = jnp.asarray(lam_user, dtype=dt)
    parity = jnp.asarray(parity, dtype=dt)
    even = (parity > 0).astype(dt)

    # --- homogeneous solution (closed form, N = 1) ---------------------
    lam2 = lam * lam
    cb = jnp.einsum("l,lpw->pw", lam2 * even, beta)
    ca = jnp.einsum("l,lpw->pw", lam2 * (1.0 - even), beta)
    a_hat = 1.0 / mu1 - omega * ca * (w1 / mu1)
    b_hat = 1.0 / mu1 - omega * cb * (w1 / mu1)
    k = jnp.sqrt(jnp.maximum(a_hat * b_hat, KMIN * KMIN))
    sqrt_b = jnp.sqrt(b_hat)
    f_hat = 1.0 / sqrt_b
    g_hat = sqrt_b / k
    d = 1.0 / np.sqrt(w1 * mu1)
    x = 0.5 * d * (f_hat - g_hat)  # up component of v_a
    y = 0.5 * d * (f_hat + g_hat)  # down component

    is_m0 = jnp.where(m_idx == 0, 1.0, 0.0).astype(dt)
    two_minus_delta = jnp.where(m_idx == 0, 1.0, 2.0).astype(dt)

    # --- particular (Green's function) sources -------------------------
    cq = two_minus_delta * omega / (4.0 * jnp.pi)
    qp = cq * jnp.einsum("l,lpw->pw", lam * parity * lam_sun, beta)
    qm = cq * jnp.einsum("l,lpw->pw", lam * lam_sun, beta)
    proj_v = w1 * (qp * x + qm * y)
    proj_u = w1 * (qp * y + qm * x)
    amp_beam = t_top * f0[None, :]
    sources = [(k * proj_v, -k * proj_u, amp_beam, sbar, "beam")]

    if thermal is not None:
        b0, b1, surf_em = thermal
        q_th = is_m0 * (1.0 - omega)
        proj_v_th = w1 * (q_th * x + q_th * y)
        proj_u_th = w1 * (q_th * y + q_th * x)
        sources.append((k * proj_v_th, -k * proj_u_th, b0, b1, "thermal"))

    phi_mb = 0.0  # phi^- at layer bottom
    phi_pt = 0.0  # phi^+ at layer top
    for c_m, c_p, amp, decay, _kind in sources:
        phi_mb = phi_mb + c_m * amp * ediff(decay, k, dtau)
        phi_pt = phi_pt - c_p * amp * ediff(
            jnp.zeros_like(k), k + decay, dtau
        )

    ip_plus_top = y * phi_pt
    ip_minus_top = x * phi_pt
    ip_plus_bot = x * phi_mb
    ip_minus_bot = y * phi_mb

    # --- BVP: 2x2 block tridiagonal, pivot-free Thomas over layers ------
    refl = 2.0 * is_m0 * albedo * (w1 * mu1)  # [W]
    ground_sun = is_m0 * albedo * mu0 * t_ground * f0 / jnp.pi
    ground_thermal = (
        is_m0 * (1.0 - albedo) * thermal[2] if thermal is not None else 0.0
    )
    ground_direct = (
        (ground_sun if include_ss else 0.0 * ground_sun) + ground_thermal
    )

    e = jnp.exp(-k * dtau)
    xe = x * e
    ye = y * e

    P = dtau.shape[0]
    idx = jnp.arange(P)
    first = (idx == 0).astype(dt)[:, None]
    last = (idx == P - 1).astype(dt)[:, None]

    # diag blocks [[tl, tr], [bl, br]] per layer
    sgn = jnp.where(first > 0, 1.0, -1.0)
    d_tl = sgn * y
    d_tr = sgn * xe
    d_bl = jnp.where(last > 0, xe - refl[None, :] * ye, xe)
    d_br = jnp.where(last > 0, y - refl[None, :] * x, y)
    # upper blocks rows = bottom half: u_bl = -X_{p+1}, u_br = -Y_{p+1}E_{p+1}
    u_bl = -jnp.roll(x, -1, axis=0)
    u_br = -jnp.roll(ye, -1, axis=0)
    # lower blocks rows = top half: l_tl = Y_{p-1}E_{p-1}, l_tr = X_{p-1}
    l_tl = jnp.roll(ye, 1, axis=0)
    l_tr = jnp.roll(x, 1, axis=0)

    rhs_top = jnp.where(
        first > 0,
        -ip_minus_top,
        ip_minus_top - jnp.roll(ip_minus_bot, 1, axis=0),
    )
    rhs_bot = jnp.where(
        last > 0,
        ground_direct[None, :] - ip_plus_bot + refl[None, :] * ip_minus_bot,
        jnp.roll(ip_plus_top, -1, axis=0) - ip_plus_bot,
    )

    coeff_l, coeff_m = _thomas_2x2(
        (l_tl, l_tr), (d_tl, d_tr, d_bl, d_br), (u_bl, u_br),
        (rhs_top, rhs_bot),
    )

    # --- post-processing at user angles ---------------------------------
    # angular projections (scalars per mode/user)
    su1 = jnp.einsum("lu,lpw->upw", lam_user * lam[:, None], beta)
    su2 = jnp.einsum(
        "lu,lpw->upw", lam_user * (lam * parity)[:, None], beta
    )
    half_om_w = 0.5 * omega[None] * w1
    pv_up = half_om_w * (x[None] * su1 + y[None] * su2)
    pu_up = half_om_w * (y[None] * su1 + x[None] * su2)
    pv_dn = half_om_w * (x[None] * su2 + y[None] * su1)
    pu_dn = half_om_w * (y[None] * su2 + x[None] * su1)

    cbeam = two_minus_delta * omega[None] / (4.0 * jnp.pi)
    beam_up = cbeam * jnp.einsum(
        "lu,lpw->upw", lam_user * (parity * lam_sun)[:, None], beta
    )
    beam_dn = cbeam * jnp.einsum(
        "lu,lpw->upw", lam_user * lam_sun[:, None], beta
    )

    c_user = (1.0 / user_mu)[:, None, None]  # [U, 1, 1]
    du = dtau[None]
    ku = k[None]
    zero = jnp.zeros_like(ku)
    inv_mu = c_user

    efwd_k = ediff(zero, ku + c_user, du) * inv_mu
    erev_k = ediff(ku, c_user + zero, du) * inv_mu

    lu_c = coeff_l[None]
    mu_c = coeff_m[None]
    s_up = pv_up * lu_c * efwd_k + pu_up * mu_c * erev_k
    s_dn = pv_dn * lu_c * erev_k + pu_dn * mu_c * efwd_k

    for c_m, c_p, amp, decay, kind in sources:
        sbu = decay[None]
        ampu = amp[None]
        efwd_s = ediff(zero, sbu + c_user, du) * inv_mu
        erev_s = ediff(sbu, c_user + zero, du) * inv_mu
        green_minus_up = ddiff2(zero, sbu + c_user, ku + c_user, du) * inv_mu
        green_plus_up = (
            efwd_s - ediff(ku + sbu, sbu + c_user, du) * inv_mu
        ) / (ku + sbu)
        green_minus_dn = ddiff2(ku, c_user + zero, sbu, du) * inv_mu
        green_plus_dn = (
            erev_s - ediff(sbu, ku + sbu + c_user, du) * inv_mu
        ) / (ku + sbu)

        cmu = c_m[None]
        cpu = c_p[None]
        s_up = s_up + (
            pv_up * cmu * ampu * green_minus_up
            - pu_up * cpu * ampu * green_plus_up
        )
        s_dn = s_dn + (
            pv_dn * cmu * ampu * green_minus_dn
            - pu_dn * cpu * ampu * green_plus_dn
        )
        if kind == "beam":
            if include_ss:
                s_up = s_up + beam_up * ampu * efwd_s
                s_dn = s_dn + beam_dn * ampu * erev_s
        else:
            one_minus_om = (1.0 - omega)[None]
            s_up = s_up + is_m0 * one_minus_om * ampu * efwd_s
            s_dn = s_dn + is_m0 * one_minus_om * ampu * erev_s

    # attenuate + sum layers
    od_user = du * c_user                        # [U, P, W]
    cum_above = jnp.cumsum(od_user, axis=1) - od_user
    cum_below = (
        jnp.cumsum(od_user[:, ::-1], axis=1)[:, ::-1] - od_user
    )
    rad_up = jnp.sum(jnp.exp(-cum_above) * s_up, axis=1)  # [U, W]
    rad_dn = jnp.sum(jnp.exp(-cum_below) * s_dn, axis=1)

    # ground reflection of the downwelling diffuse field
    i_minus_ground = (
        ye[P - 1] * coeff_l[P - 1]
        + x[P - 1] * coeff_m[P - 1]
        + y[P - 1] * phi_mb[P - 1]
    )
    refl_user = 2.0 * is_m0 * albedo * (w1 * mu1)  # [W]
    ground_up = refl_user[None, :] * i_minus_ground[None, :]
    gd_user_ungated = (
        ground_thermal[None, :] * jnp.ones((len(user_mu), 1), dtype=dt)
        if thermal is not None
        else 0.0
    )
    ground_up = ground_up + gd_user_ungated
    if include_ss:
        ground_up = ground_up + ground_sun[None, :]
    total_od_user = jnp.sum(od_user, axis=1)
    rad_up = rad_up + jnp.exp(-total_od_user) * ground_up

    return jnp.where(user_up[:, None], rad_up, rad_dn)


def _thomas_2x2(lower, diag, upper, rhs):
    """Pivot-free block-Thomas sweep for the 2x2-block tridiagonal BVP,
    vectorized over the wavelength lane axis.

    lower = (l_tl, l_tr) with zero bottom row; upper = (u_bl, u_br) with
    zero top row; diag = (d_tl, d_tr, d_bl, d_br); rhs = (r_t, r_b). All
    [P, W]. Solves the same system as ``disco._bvp_blocks`` at N = 1
    (reference ``sktran_do_pentadiagonal.cpp``: bandwidth-2 LU without
    pivoting). Returns (L, M) each [P, W].
    """
    import jax

    l_tl, l_tr = lower
    d_tl, d_tr, d_bl, d_br = diag
    r_t, r_b = rhs

    def _fwd_step(a, b, c, dd, inv, rt_eff, rb_eff, ubl, ubr):
        # D'^{-1} = inv * [[dd, -b], [-c, a]]
        # -D'^{-1} U: U top row zero -> columns from (u_bl, u_br)
        g_tl = -inv * (-b * ubl)
        g_tr = -inv * (-b * ubr)
        g_bl = -inv * (a * ubl)
        g_br = -inv * (a * ubr)
        h_t = inv * (dd * rt_eff - b * rb_eff)
        h_b = inv * (-c * rt_eff + a * rb_eff)
        return (g_tl, g_tr, g_bl, g_br, h_t, h_b), (
            g_tl, g_tr, g_bl, g_br, h_t, h_b
        )

    def fwd_wrap(carry, inp):
        # carry: (G, h) of the previous layer with x_{p-1} = G x_p + h;
        # effective diagonal D' = D + L G_{p-1} (lower's bottom row is 0)
        ltl, ltr, dtl, dtr, dbl, dbr, rt, rb, ubl, ubr = inp
        g_tl, g_tr, g_bl, g_br, h_t, h_b = carry
        a = dtl + ltl * g_tl + ltr * g_bl
        b = dtr + ltl * g_tr + ltr * g_br
        c = dbl
        dd = dbr
        rt_eff = rt - (ltl * h_t + ltr * h_b)
        rb_eff = rb
        det = a * dd - b * c
        inv = 1.0 / det
        return _fwd_step(a, b, c, dd, inv, rt_eff, rb_eff, ubl, ubr)

    W = r_t.shape[-1]
    dt = r_t.dtype
    z = jnp.zeros((W,), dtype=dt)
    u_bl, u_br = upper
    init = (z, z, z, z, z, z)
    xs = (
        l_tl, l_tr, d_tl, d_tr, d_bl, d_br, r_t, r_b, u_bl, u_br,
    )
    _, (g_tl, g_tr, g_bl, g_br, h_t, h_b) = jax.lax.scan(fwd_wrap, init, xs)

    # back substitution: x_P-1 = h_{P-1}; x_p = G_p x_{p+1} + h_p
    def back(carry, inp):
        xt_next, xb_next = carry
        gtl, gtr, gbl, gbr, ht, hb = inp
        xt = gtl * xt_next + gtr * xb_next + ht
        xb = gbl * xt_next + gbr * xb_next + hb
        return (xt, xb), (xt, xb)

    initb = (g_tl[-1] * 0.0 + h_t[-1], h_b[-1])
    rest = tuple(
        a[-2::-1] for a in (g_tl, g_tr, g_bl, g_br, h_t, h_b)
    )
    _, (xt_rev, xb_rev) = jax.lax.scan(back, initb, rest)
    coeff_l = jnp.concatenate(
        [xt_rev[::-1], initb[0][None]], axis=0
    )
    coeff_m = jnp.concatenate(
        [xb_rev[::-1], initb[1][None]], axis=0
    )
    return coeff_l, coeff_m


def solve_twostream(
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
):
    """Two-stream plane-parallel DO radiance, wavelength-minor.

    dtau/omega [P, W] (TOA first); beta [L, P, W]; albedo [W];
    ``tables`` from ``disco.build_mode_tables(2, ...)``. Returns
    radiance [U, W] (sun-normalized unless f0 given). Same physics as
    ``disco.solve_plane_parallel`` at nstr = 2 (validated to 1e-10);
    thermal sources follow the exponential-in-OD layer model.
    """
    if len(tables.mu) != 1:
        msg = "solve_twostream requires nstr = 2 tables"
        raise ValueError(msg)
    mu0 = tables.mu0
    mu1 = float(tables.mu[0])
    w1 = float(tables.w[0])
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
    luse = min(beta.shape[0], 2)
    beta = beta[:luse]

    user_mu = jnp.asarray(tables.user_mu, dtype=dt)
    user_up = jnp.asarray(user_up)
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
        thermal = (b0, b1, surface_emission
                   if surface_emission is not None
                   else jnp.zeros_like(albedo))
    else:
        thermal = None

    rad = 0.0
    for m in range(M):
        r_m = _mode_radiance(
            jnp.asarray(m),
            tables.lam_stream[m, :luse, 0],
            tables.lam_sun[m, :luse],
            tables.lam_user[m, :luse, :],
            tables.parity[m, :luse],
            dtau, omega, beta, t_top, sbar, t_ground,
            albedo, mu1, w1, mu0, user_mu, user_up, include_ss, f0,
            thermal,
        )
        # reference relative-azimuth convention: cos(m (pi - dphi))
        az = jnp.cos(m * (jnp.pi - user_azimuth))[:, None]
        rad = rad + az * r_m
    return rad
