"""Polarized (I, Q, U) discrete-ordinates solver.

Replaces the reference's polarized DISCO templates
(``/root/reference/cpp/include/sktran_disco/sktran_do_polarization_types.h``,
``sktran_do_rte.cpp`` NSTOKES=3 instantiation, which uses a general real
eigensolver) with a TPU-first reduction to the *scalar* symmetric machinery:

With the generalized-spherical-function matrices

    Pi_l^m(mu) = [[ d^l_{m0},      0,        0    ],
                  [ 0,          P+_{lm},  -P-_{lm} ],
                  [ 0,         -P-_{lm},   P+_{lm} ]],
    P+- = (d^l_{m2} +- d^l_{m,-2}) / 2,

and the Greek matrix B_l = [[a1, -b1, 0], [-b1, a2, 0], [0, 0, a3]]_l,
the key observation is that after flipping the sign of the U component of
the *downwelling* field (the diagonal matrix D = diag(1, 1, -1); note
``B_l D = D B_l`` because b1 only couples I-Q), the vector system has
exactly the scalar structure: both parity kernels

    C^A = 1/2 sum_l Pi_i B_l diag(1-nu, 1-nu, 1+nu) Pi_j^T
    C^B = 1/2 sum_l Pi_i B_l diag(1+nu, 1+nu, 1-nu) Pi_j^T,
    nu_l = (-1)^{l+m},

are symmetric, so the Cholesky+eigh eigensolve, the analytic J-norms
(-1/k), the Green's-function particular solution, and the block-tridiagonal
BVP all apply verbatim on flattened (stream x stokes) vectors. Eigenvalues
are provably real — no complex-root handling needed.

Azimuth synthesis: (I, Q) ~ cos m(dphi), U ~ sin m(dphi).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.linalg import ediff
from ..ops.quadrature import streams
from ..ops.wigner import wigner_d
from . import disco
from .disco import (
    _bvp_blocks,
    _greens_coefficients,
    _particular_boundary,
    clamp_ssa,
)

NS = 3
DSIGN = np.array([1.0, 1.0, -1.0])


@dataclass(frozen=True)
class VectorModeTables:
    pi_stream: np.ndarray  # [M, L, N, 3, 3]
    pi_sun_d0: np.ndarray  # [M, L] (only d_{m0}(mu0) enters for a solar beam)
    pi_user: np.ndarray    # [M, L, U, 3, 3]
    parity: np.ndarray     # [M, L]
    mu: np.ndarray
    w: np.ndarray
    mu0: float
    user_mu: np.ndarray


def _pi_matrices(mu_vals: np.ndarray, m: int, lmax: int) -> np.ndarray:
    """Pi_l^m matrices at the given cosines: [L, n, 3, 3]."""
    mu_vals = np.asarray(mu_vals, dtype=np.float64)
    theta = np.arccos(np.clip(mu_vals, -1.0, 1.0))
    d0 = wigner_d(theta, m, 0, lmax)
    d2p = wigner_d(theta, m, 2, lmax)
    d2m = wigner_d(theta, m, -2, lmax)
    pp = 0.5 * (d2p + d2m)
    pm = 0.5 * (d2p - d2m)
    out = np.zeros((lmax,) + mu_vals.shape + (3, 3))
    out[..., 0, 0] = d0
    out[..., 1, 1] = pp
    out[..., 2, 2] = pp
    out[..., 1, 2] = -pm
    out[..., 2, 1] = -pm
    return out


def build_vector_mode_tables(
    nstr: int,
    nlegendre: int,
    mu0: float,
    user_mu: np.ndarray,
    num_azimuth: int | None = None,
) -> VectorModeTables:
    if num_azimuth is None:
        num_azimuth = nstr
    mu, w = streams(nstr)
    L = max(nlegendre, 1)
    user_mu = np.asarray(user_mu, dtype=np.float64)
    pi_stream = np.zeros((num_azimuth, L, len(mu), 3, 3))
    pi_sun_d0 = np.zeros((num_azimuth, L))
    pi_user = np.zeros((num_azimuth, L, len(user_mu), 3, 3))
    parity = np.zeros((num_azimuth, L))
    ls = np.arange(L)
    theta0 = np.arccos(np.clip(mu0, -1.0, 1.0))
    for m in range(num_azimuth):
        pi_stream[m] = _pi_matrices(mu, m, L)
        pi_user[m] = _pi_matrices(user_mu, m, L)
        pi_sun_d0[m] = wigner_d(np.array(theta0), m, 0, L)
        parity[m] = (-1.0) ** (ls + m)
    return VectorModeTables(
        pi_stream=pi_stream,
        pi_sun_d0=pi_sun_d0,
        pi_user=pi_user,
        parity=parity,
        mu=mu,
        w=w,
        mu0=float(mu0),
        user_mu=user_mu,
    )


def _greek_matrices(a1, a2, a3, b1):
    """B_l matrices [..., P, L, 3, 3] from the greek coefficient arrays
    [..., P, L]."""
    z = jnp.zeros_like(a1)
    row0 = jnp.stack([a1, -b1, z], axis=-1)
    row1 = jnp.stack([-b1, a2, z], axis=-1)
    row2 = jnp.stack([z, z, a3], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)  # [..., P, L, 3, 3]


def _assemble_symmetric_vec(omega, bgreek, pi, parity, mu, w):
    """Flattened symmetrized matrices: [..., P, K, K], K = N * 3."""
    N = pi.shape[1]
    gplus = jnp.stack(
        [1.0 + parity, 1.0 + parity, 1.0 - parity], axis=-1
    )  # [L, 3]
    gminus = jnp.stack(
        [1.0 - parity, 1.0 - parity, 1.0 + parity], axis=-1
    )
    # kernel[..., p, i, s, j, t] = 1/2 sum_l (Pi_i B_l G)_[s,b] Pi_j[t,b]
    def kernel(g):
        bg = jnp.einsum("...plab,lb->...plab", bgreek, g)
        pib = jnp.einsum("lisa,...plab->...plisb", pi, bg)
        return 0.5 * jnp.einsum("...plisb,ljtb->...pisjt", pib, pi)

    ca = kernel(gminus)
    cb = kernel(gplus)
    K = N * NS
    shape = ca.shape[:-4] + (K, K)
    ca = ca.reshape(shape)
    cb = cb.reshape(shape)

    mu_f = jnp.repeat(mu, NS)
    w_f = jnp.repeat(w, NS)
    s = jnp.sqrt(w_f / mu_f)
    scale = s[:, None] * s[None, :]
    diag = jnp.diag(1.0 / mu_f)
    a_hat = diag - omega[..., None, None] * ca * scale
    b_hat = diag - omega[..., None, None] * cb * scale
    return a_hat, b_hat, mu_f, w_f


def _eigensolve_vec(a_hat, b_hat, mu_f, w_f):
    chol = jnp.linalg.cholesky(b_hat)
    m_sym = jnp.einsum("...ji,...jk,...kl->...il", chol, a_hat, chol)
    m_sym = 0.5 * (m_sym + jnp.swapaxes(m_sym, -1, -2))
    if disco.USE_JACOBI_EIGH:
        from ..ops.eigen import jacobi_eigh

        k2, v = jacobi_eigh(m_sym)
    else:
        k2, v = jnp.linalg.eigh(m_sym)
    k = jnp.sqrt(jnp.maximum(k2, disco.KMIN * disco.KMIN))
    f_hat = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(chol, -1, -2), v, lower=False
    )
    g_hat = jnp.einsum("...ij,...jk->...ik", chol, v) / k[..., None, :]
    dinv = 1.0 / jnp.sqrt(w_f * mu_f)
    x = 0.5 * dinv[:, None] * (f_hat - g_hat)
    y = 0.5 * dinv[:, None] * (f_hat + g_hat)
    return k, x, y


def _beam_sources_vec(omega, bgreek, pi, d0_sun, parity, m_idx):
    """Q~+/- flattened beam source vectors [..., P, K].

    Q~+_(i,:) = c sum_l nu_l d0_sun_l (Pi_i B_l) e1
    Q~-_(i,:) = c sum_l      d0_sun_l (Pi_i B_l) e1
    """
    two_minus_delta = jnp.where(m_idx == 0, 1.0, 2.0)
    c = two_minus_delta * omega / (4.0 * jnp.pi)
    be1 = bgreek[..., :, 0]  # [..., P, L, 3] first column of B_l
    base_p = jnp.einsum("lisa,...pla,l->...pis", pi, be1, parity * d0_sun)
    base_m = jnp.einsum("lisa,...pla,l->...pis", pi, be1, d0_sun)
    shape = base_p.shape[:-2] + (base_p.shape[-2] * NS,)
    qp = c[..., None] * base_p.reshape(shape)
    qm = c[..., None] * base_m.reshape(shape)
    return qp, qm


def solve_plane_parallel_vector(
    dtau,
    omega,
    a1, a2, a3, b1,
    albedo,
    tables: VectorModeTables,
    user_up,
    user_azimuth,
    include_ss: bool = True,
    chapman=None,
    num_azimuth: int | None = None,
    f0=None,
    return_internal: bool = False,
    thermal_b0=None,
    thermal_b1_bottom=None,
    surface_emission=None,
    brdf=None,
    brdf_args=None,
):
    """Polarized DO solve. Greek coefficient arrays a1/a2/a3/b1: [..., P, L].

    ``thermal_b0``/``thermal_b1_bottom`` [..., P] are the Planck emission at
    each layer's top/bottom (TOA-first) for the exponential-in-OD thermal
    source — unpolarized (I-only), m=0, exactly the scalar convention
    (reference ``sktran_do_rte.cpp:1345`` polarized instantiation emits into
    the I stokes slot only). ``surface_emission`` [...] is the ground Planck
    emission reflected as (1-albedo)*B into I.

    Returns radiance [..., U, 3] (I, Q, U) sun-normalized; with
    ``return_internal`` also a dict of per-mode level stream fields and the
    layer quantities needed to evaluate the vector source along rays.
    """
    mu0 = tables.mu0
    P = dtau.shape[-1]
    dt = dtau.dtype
    if chapman is None:
        chapman = jnp.tril(jnp.ones((P, P), dtype=dt)) / mu0
    slant_bottom = jnp.einsum("pq,...q->...p", chapman, dtau)
    slant_top = jnp.concatenate(
        [jnp.zeros_like(slant_bottom[..., :1]), slant_bottom[..., :-1]], axis=-1
    )
    t_top = jnp.exp(-slant_top)
    t_ground = jnp.exp(-slant_bottom[..., -1])
    sbar = (slant_bottom - slant_top) / jnp.maximum(dtau, 1e-30)

    M = tables.pi_stream.shape[0]
    if num_azimuth is not None:
        M = min(M, num_azimuth)
    nstr = 2 * len(tables.mu)
    luse = min(a1.shape[-1], max(nstr, 1))
    a1, a2, a3, b1 = (v[..., :luse] for v in (a1, a2, a3, b1))
    pi = jnp.asarray(tables.pi_stream[:M, :luse], dtype=dt)
    d0_sun = jnp.asarray(tables.pi_sun_d0[:M, :luse], dtype=dt)
    pi_user = jnp.asarray(tables.pi_user[:M, :luse], dtype=dt)
    parity = jnp.asarray(tables.parity[:M, :luse], dtype=dt)
    mu = jnp.asarray(tables.mu, dtype=dt)
    w = jnp.asarray(tables.w, dtype=dt)
    user_mu = jnp.asarray(tables.user_mu, dtype=dt)
    user_up_j = jnp.asarray(user_up)
    user_azimuth = jnp.asarray(user_azimuth, dtype=dt)
    m_indices = jnp.arange(M)

    if f0 is None:
        f0 = jnp.ones(albedo.shape, dtype=dt)
    else:
        f0 = jnp.broadcast_to(jnp.asarray(f0, dtype=dt), albedo.shape)

    bgreek = _greek_matrices(a1, a2, a3, b1)
    omega_c = clamp_ssa(omega)

    if thermal_b0 is not None:
        # exponential-in-OD emission B(t) = b0 e^{-b1 t} (same fit as the
        # scalar solver; reference sktran_do_layerarray.cpp:342)
        both_pos = (thermal_b0 > 0.0) & (thermal_b1_bottom > 0.0)
        tb1 = jnp.where(
            both_pos,
            jnp.log(
                jnp.maximum(thermal_b0, 1e-300)
                / jnp.maximum(thermal_b1_bottom, 1e-300)
            )
            / jnp.maximum(dtau, 1e-30),
            jnp.zeros_like(dtau),
        )
        tb0 = jnp.where(
            both_pos, thermal_b0, 0.5 * (thermal_b0 + thermal_b1_bottom)
        )
        thermal = (tb0, tb1, surface_emission
                   if surface_emission is not None
                   else jnp.zeros_like(albedo))
    else:
        thermal = None

    surface_ops_all = None
    if brdf is not None:
        surface_ops_all = disco.brdf_azimuth_moments(
            brdf, brdf_args, mu, user_mu, mu0, m_indices, dt
        )

    def run_mode(m_idx, pi_m, d0_sun_m, pi_user_m, parity_m, surf_m):
        return _solve_one_mode_vec(
            m_idx, pi_m, d0_sun_m, pi_user_m, parity_m,
            dtau, omega_c, bgreek, t_top, sbar, t_ground,
            albedo, mu, w, mu0, user_mu, user_up_j, include_ss, f0,
            thermal, surf_m,
        )

    rad_modes, levels = jax.vmap(
        run_mode,
        in_axes=(0, 0, 0, 0, 0, 0 if surface_ops_all else None),
    )(
        m_indices, pi, d0_sun, pi_user, parity, surface_ops_all
    )  # [M, ..., U, 3]

    # pi - dphi matches the reference's relative-azimuth convention
    dphi = jnp.pi - user_azimuth  # [U]
    cosm = jnp.cos(m_indices[:, None] * dphi[None, :])  # [M, U]
    sinm = jnp.sin(m_indices[:, None] * dphi[None, :])
    weights = jnp.stack([cosm, cosm, sinm], axis=-1)  # [M, U, 3]
    radiance = jnp.einsum("m...us,mus->...us", rad_modes, weights)
    if return_internal:
        internal = {
            "levels": levels,        # [M, ..., P, K] transformed fields
            "omega": omega_c,
            "bgreek": bgreek,
            "dtau": dtau,
            "t_top": t_top,
            "sbar": sbar,
            "t_ground": t_ground,
            "d0_sun": d0_sun,        # [M, L]
            "parity": parity,        # [M, L]
            "pi_stream": pi,         # [M, L, N, 3, 3]
            "w_quad": w,
            "mu0": mu0,
            "f0": f0,
            "thermal": thermal,
        }
        return radiance, internal
    return radiance


def _solve_one_mode_vec(
    m_idx, pi, d0_sun, pi_user, parity,
    dtau, omega, bgreek, t_top, sbar, t_ground,
    albedo, mu, w, mu0, user_mu, user_up, include_ss, f0,
    thermal=None, surface_ops=None,
):
    N = pi.shape[1]
    K = N * NS
    U = pi_user.shape[1]
    a_hat, b_hat, mu_f, w_f = _assemble_symmetric_vec(
        omega, bgreek, pi, parity, mu, w
    )
    k, x, y = _eigensolve_vec(a_hat, b_hat, mu_f, w_f)

    is_m0 = jnp.where(m_idx == 0, 1.0, 0.0)

    # sources: (c_minus*amp, c_plus*amp, amp, decay, kind) — amp folded into
    # the coefficients for _particular_boundary (it multiplies linearly)
    amp_beam = t_top * f0[..., None]
    qp, qm = _beam_sources_vec(omega, bgreek, pi, d0_sun, parity, m_idx)
    c_minus, c_plus = _greens_coefficients(k, x, y, qp, qm, w_f)
    sources = [(
        c_minus * amp_beam[..., None], c_plus * amp_beam[..., None],
        amp_beam, sbar, "beam",
    )]

    if thermal is not None:
        # unpolarized isotropic thermal source: (1-omega) B on the I slots
        # only; D e1 = e1 so Q~+ = Q~- in the transformed frame too
        b0, tb1, _surf_em = thermal
        e1_pattern = jnp.zeros((K,)).at[0::NS].set(1.0)
        q_th = (
            is_m0 * (1.0 - omega)[..., None] * e1_pattern
        )
        c_minus_th, c_plus_th = _greens_coefficients(k, x, y, q_th, q_th, w_f)
        sources.append((
            c_minus_th * b0[..., None], c_plus_th * b0[..., None],
            b0, tb1, "thermal",
        ))

    phi_mb = 0.0
    phi_pt = 0.0
    for c_m_amp, c_p_amp, _amp, decay, _kind in sources:
        mb, pt = _particular_boundary(
            k, c_m_amp, c_p_amp, jnp.ones_like(t_top), decay, dtau
        )
        phi_mb = phi_mb + mb
        phi_pt = phi_pt + pt

    # Ground reflection: the surface couples the I components only (the
    # scalar BRDF kernel enters the (1,1) block of the polarized surface,
    # reference ``surface.h:246-617``); Lambertian is the m=0 rank-one
    # special case.
    e1mask = jnp.zeros((K,)).at[0::NS].set(1.0)
    wmu_f = (w * mu)
    U_user = pi_user.shape[1]
    if surface_ops is None:
        refl_I = (
            2.0 * is_m0 * albedo[..., None, None]
            * jnp.broadcast_to(wmu_f, albedo.shape + (1, len(mu)))
        )
        refl_I = jnp.broadcast_to(refl_I, albedo.shape + (len(mu), len(mu)))
        ground_sun = is_m0 * albedo * mu0 * t_ground * f0 / jnp.pi
        gs_stream = ground_sun[..., None] * jnp.ones((len(mu),))
        refl_user_I = (
            2.0 * is_m0 * albedo[..., None, None]
            * jnp.broadcast_to(wmu_f, albedo.shape + (1, len(mu)))
        )
        refl_user_I = jnp.broadcast_to(
            refl_user_I, albedo.shape + (U_user, len(mu))
        )
        gd_user_sun = ground_sun[..., None] * jnp.ones((U_user,))
    else:
        two_minus_delta = jnp.where(m_idx == 0, 1.0, 2.0)
        refl_I = 2.0 * jnp.pi * surface_ops["rho_stream"] * wmu_f
        refl_user_I = 2.0 * jnp.pi * surface_ops["rho_user"] * wmu_f
        gs_stream = (
            two_minus_delta
            * surface_ops["rho_sun_stream"]
            * (mu0 * t_ground * f0)[..., None]
        )
        gd_user_sun = (
            two_minus_delta
            * surface_ops["rho_sun_user"]
            * (mu0 * t_ground * f0)[..., None]
        )
    ground_thermal = (
        is_m0 * (1.0 - albedo) * thermal[2] if thermal is not None else 0.0
    )
    batch = jnp.broadcast_shapes(refl_I.shape[:-2], albedo.shape)
    refl = jnp.zeros(batch + (K, K), dtype=x.dtype)
    refl = refl.at[..., 0::NS, 0::NS].set(refl_I)
    ground_direct = jnp.zeros(batch + (K,), dtype=x.dtype)
    ground_direct = ground_direct.at[..., 0::NS].set(
        gs_stream
        + (
            ground_thermal[..., None]
            if thermal is not None else 0.0
        )
    )

    coeff_l, coeff_m, _ = _bvp_blocks(
        k, x, y, dtau, phi_mb, phi_pt, refl, ground_direct
    )

    rad = _postprocess_mode_vec(
        k, x, y, coeff_l, coeff_m, sources,
        omega, bgreek, dtau,
        pi, pi_user, d0_sun, parity, mu, w, m_idx,
        user_mu, user_up, refl_user_I, gd_user_sun, ground_thermal,
        include_ss, phi_mb,
    )

    # Level diffuse fields (transformed frame, flattened K) at layer
    # tops/bottoms — for the limb ray-source evaluation and fluxes (same
    # structure as the scalar solver's level fields).
    e = jnp.exp(-k * dtau[..., None])
    xe = x * e[..., None, :]
    ye = y * e[..., None, :]
    levels = {
        "i_plus_top": (
            jnp.einsum("...pia,...pa->...pi", x, coeff_l)
            + jnp.einsum("...pia,...pa->...pi", ye, coeff_m)
            + jnp.einsum("...pia,...pa->...pi", y, phi_pt)
        ),
        "i_minus_top": (
            jnp.einsum("...pia,...pa->...pi", y, coeff_l)
            + jnp.einsum("...pia,...pa->...pi", xe, coeff_m)
            + jnp.einsum("...pia,...pa->...pi", x, phi_pt)
        ),
        "i_plus_bot": (
            jnp.einsum("...pia,...pa->...pi", xe, coeff_l)
            + jnp.einsum("...pia,...pa->...pi", y, coeff_m)
            + jnp.einsum("...pia,...pa->...pi", x, phi_mb)
        ),
        "i_minus_bot": (
            jnp.einsum("...pia,...pa->...pi", ye, coeff_l)
            + jnp.einsum("...pia,...pa->...pi", x, coeff_m)
            + jnp.einsum("...pia,...pa->...pi", y, phi_mb)
        ),
    }
    return rad, levels


def _postprocess_mode_vec(
    k, x, y, coeff_l, coeff_m, sources,
    omega, bgreek, dtau,
    pi, pi_user, d0_sun, parity, mu, w, m_idx,
    user_mu, user_up, refl_user_I, gd_user_sun, ground_thermal,
    include_ss, phi_mb,
):
    """Vector user-angle postprocessing. Returns [..., U, 3].

    ``sources`` is the list built in ``_solve_one_mode_vec``:
    ``(c_minus*amp, c_plus*amp, amp, decay, kind)`` with kind "beam"
    (direct term gated by include_ss) or "thermal" (isotropic I-only
    direct term, m=0, always included)."""
    from ..ops.linalg import ddiff2

    P = k.shape[-2]
    N = pi.shape[1]
    K = N * NS
    U = pi_user.shape[1]
    A = k.shape[-1]

    # --- stream sums of the homogeneous modes ---------------------------
    # X reshaped [..., P, N, 3, A]
    xs = x.reshape(x.shape[:-2] + (N, NS, A))
    ys = y.reshape(y.shape[:-2] + (N, NS, A))
    dsign = jnp.asarray(DSIGN, dtype=x.dtype)
    # S_l for v-modes: sum_j w_j (Pi_j^T X_j + nu_l D Pi_j^T Y_j)
    t1 = jnp.einsum("ljsc,...pjsa,j->...plca", pi, xs, w)
    t2 = jnp.einsum("ljsc,...pjsa,j->...plca", pi, ys, w)
    g_v = t1 + parity[:, None, None] * dsign[:, None] * t2
    g_u = t2 + parity[:, None, None] * dsign[:, None] * t1

    # user projections: P_v[..., p, u, s(stokes), a(mode)] =
    #   (omega/2) sum_l (Pi_u B_l g_l)_s; downwelling (transformed):
    #   J~ = sum_l nu_l Pi_u B_l (D g_l)  (D commutes with B)
    half_om = 0.5 * omega[..., None, None, None]
    bv = jnp.einsum("...plab,...plbc->...plac", bgreek, g_v)
    bu = jnp.einsum("...plab,...plbc->...plac", bgreek, g_u)
    pv_up = half_om * jnp.einsum("lusa,...plac->...pusc", pi_user, bv)
    pu_up = half_om * jnp.einsum("lusa,...plac->...pusc", pi_user, bu)
    pv_dn = half_om * jnp.einsum(
        "lusa,a,...plac,l->...pusc", pi_user, dsign, bv, parity
    )
    pu_dn = half_om * jnp.einsum(
        "lusa,a,...plac,l->...pusc", pi_user, dsign, bu, parity
    )

    # beam into user directions
    two_minus_delta = jnp.where(m_idx == 0, 1.0, 2.0)
    cbeam = two_minus_delta * omega / (4.0 * jnp.pi)
    be1 = bgreek[..., :, 0]  # [..., P, L, 3]
    beam_up = cbeam[..., None, None] * jnp.einsum(
        "lusa,...pla,l->...pus", pi_user, be1, parity * d0_sun
    )
    beam_dn = cbeam[..., None, None] * jnp.einsum(
        "lusa,a,...pla,l->...pus", pi_user, dsign, be1, d0_sun
    )

    # --- layer source integrals (same scalar multipliers, per mode a) ---
    c = 1.0 / user_mu
    cb = c[:, None]
    du = dtau[..., None, None]
    ku = k[..., None, :]

    efwd_k = ediff(jnp.zeros_like(ku), ku + cb, du) / user_mu[:, None]
    erev_k = ediff(ku, cb + jnp.zeros_like(ku), du) / user_mu[:, None]

    lu = coeff_l[..., None, :]
    mu_c = coeff_m[..., None, :]

    # homogeneous contribution [..., P, U, 3]
    s_up = jnp.sum(
        pv_up * (lu * efwd_k)[..., None, :]
        + pu_up * (mu_c * erev_k)[..., None, :],
        axis=-1,
    )
    s_dn = jnp.sum(
        pv_dn * (lu * erev_k)[..., None, :]
        + pu_dn * (mu_c * efwd_k)[..., None, :],
        axis=-1,
    )

    is_m0 = jnp.where(m_idx == 0, 1.0, 0.0)
    for c_minus_amp, c_plus_amp, amp, decay, kind in sources:
        sbu = decay[..., None, None]
        efwd_s = ediff(jnp.zeros_like(sbu), sbu + cb, du) / user_mu[:, None]
        erev_s = ediff(sbu, cb + jnp.zeros_like(sbu), du) / user_mu[:, None]
        green_minus_up = ddiff2(
            jnp.zeros_like(ku), sbu + cb, ku + cb, du
        ) / user_mu[:, None]
        green_plus_up = (
            efwd_s - ediff(ku + sbu, sbu + cb, du) / user_mu[:, None]
        ) / (ku + sbu)
        green_minus_dn = ddiff2(
            ku, cb + jnp.zeros_like(ku), sbu, du
        ) / user_mu[:, None]
        green_plus_dn = (
            erev_s - ediff(sbu, ku + sbu + cb, du) / user_mu[:, None]
        ) / (ku + sbu)

        cmu = c_minus_amp[..., None, :]  # [..., P, 1, A]
        cpu = c_plus_amp[..., None, :]
        s_up = s_up + jnp.sum(
            pv_up * (cmu * green_minus_up)[..., None, :]
            - pu_up * (cpu * green_plus_up)[..., None, :],
            axis=-1,
        )
        s_dn = s_dn + jnp.sum(
            pv_dn * (cmu * green_minus_dn)[..., None, :]
            - pu_dn * (cpu * green_plus_dn)[..., None, :],
            axis=-1,
        )
        if kind == "beam":
            if include_ss:
                amp_u = amp[..., None, None]
                s_up = s_up + beam_up * (amp_u * efwd_s[..., 0:1])
                s_dn = s_dn + beam_dn * (amp_u * erev_s[..., 0:1])
        else:  # thermal: isotropic I-only direct source, m=0
            one_minus_om = (1.0 - omega)[..., None]
            amp_d = amp[..., None]
            th_up = is_m0 * one_minus_om * amp_d * efwd_s[..., 0]
            th_dn = is_m0 * one_minus_om * amp_d * erev_s[..., 0]
            s_up = s_up.at[..., 0].add(th_up)
            s_dn = s_dn.at[..., 0].add(th_dn)

    od_user = dtau[..., :, None] * c
    cum_above = jnp.cumsum(od_user, axis=-2) - od_user
    cum_below = jnp.cumsum(od_user[..., ::-1, :], axis=-2)[..., ::-1, :] - od_user

    rad_up = jnp.sum(jnp.exp(-cum_above)[..., None] * s_up, axis=-3)

    # ground: Lambertian reflects I only, isotropically
    e = jnp.exp(-k * dtau[..., None])
    i_minus_ground_f = (
        jnp.einsum("...ia,...a->...i", (y * e[..., None, :])[..., P - 1, :, :],
                   coeff_l[..., P - 1, :])
        + jnp.einsum("...ia,...a->...i", x[..., P - 1, :, :],
                     coeff_m[..., P - 1, :])
        + jnp.einsum("...ia,...a->...i", y[..., P - 1, :, :],
                     phi_mb[..., P - 1, :])
    )  # [..., K] transformed downwelling at ground
    i_minus_I = i_minus_ground_f[..., 0::NS]  # I components (D leaves I alone)
    ground_refl = jnp.einsum(
        "...uj,...j->...u", refl_user_I, i_minus_I
    )
    # sun reflection gated by include_ss; surface thermal emission ungated
    gt_user = (
        ground_thermal
        if isinstance(ground_thermal, float)
        else ground_thermal[..., None]
    )
    ground_up_I = (
        ground_refl + (gd_user_sun if include_ss else 0.0) + gt_user
    )
    total_od_user = jnp.sum(od_user, axis=-2)
    ground_vec = jnp.zeros(rad_up.shape[:-2] + (U, NS), dtype=rad_up.dtype)
    ground_vec = ground_vec.at[..., 0].set(
        jnp.exp(-total_od_user) * ground_up_I
    )
    rad_up = rad_up + ground_vec

    rad_dn_t = jnp.sum(jnp.exp(-cum_below)[..., None] * s_dn, axis=-3)
    # untransform the downwelling output: physical = D J~
    rad_dn = rad_dn_t * jnp.asarray(DSIGN, dtype=rad_dn_t.dtype)

    return jnp.where(user_up[:, None], rad_up, rad_dn)
