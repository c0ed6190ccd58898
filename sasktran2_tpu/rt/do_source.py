"""Discrete-ordinates multiple-scatter source evaluated along spherical rays.

The reference stores DO solutions on an (SZA x altitude x angle) grid and
interpolates onto limb lines of sight
(``/root/reference/cpp/lib/sktran_disco/source_term/do_source_interpolated_pp.cpp``,
``do_source_diffuse_storage.cpp``). Here the DO solution's source function
is evaluated *analytically* at every traced-ray segment endpoint — exact
level fields with linear-in-altitude interpolation only at the tangent-point
interior — at the segment's exact propagation direction and azimuth.

Fixed shapes (B = wavelength batch inside the engine closure, usually 1):
  lam [M, L, N]; parity/lam_sun [M, L]
  omega/t_top/sbar/dtau [B, P]; beta [B, P, L]
  level fields [M, B, P, N]
  ray tables: lam_b [M, L, R, S+1], cosm [M, R, S+1], seg_layer [R, S]
Output: per-segment endpoint sources [B, R, S].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.wigner import normalized_alp
from .disco_vec import DSIGN, NS
from .raytrace import TracedRays


def build_ray_angular_tables(traced: TracedRays, nleg: int, num_azimuth: int):
    """Static angular tables: normalized ALP at each boundary's *signed*
    propagation cosine and the per-boundary azimuth cosines."""
    mu_signed = traced.cos_zenith  # [R, S+1]
    lam_b = np.zeros((num_azimuth, nleg) + mu_signed.shape)
    cosm = np.zeros((num_azimuth,) + mu_signed.shape)
    for m in range(num_azimuth):
        lam_b[m] = normalized_alp(mu_signed, m, nleg)
        cosm[m] = np.cos(m * (np.pi - traced.boundary_relazi))
    return {"lam_b": lam_b, "cosm": cosm}


def build_level_direction_tables(mu_d, phi_d, nleg: int, num_azimuth: int):
    """Static tables for evaluating the scalar DO source on a (level x
    direction) grid: normalized ALP at the signed direction cosines and the
    azimuth cosines (for initializing successive orders from the DO
    solution; reference ``diffuse_table.cpp:306-331`` builds the analogous
    DO-storage -> diffuse-outgoing interpolator)."""
    mu_d = np.asarray(mu_d, dtype=np.float64)
    D = len(mu_d)
    lam_d = np.zeros((num_azimuth, nleg, D))
    cosm = np.zeros((num_azimuth, D))
    for m in range(num_azimuth):
        lam_d[m] = normalized_alp(mu_d, m, nleg)
        cosm[m] = np.cos(m * (np.pi - np.asarray(phi_d)))
    return {"lam_d": lam_d, "cosm": cosm}


def ms_source_on_levels(internal, tables):
    """Scalar DO diffuse (multiple-scatter-only) source per unit optical
    depth on a (level x direction) grid: [B, V, D] with V bottom-up levels.

    Used to initialize the successive-orders iteration from the DO solution
    (reference ``initialize_hr_with_do``, ``diffuse_table.cpp:739-750``).
    The direct-beam scattering term is excluded — the SO field's first
    order already contains it.
    """
    lam = internal["lam"]          # [M, L, N]
    parity = internal["parity"]    # [M, L]
    omega = internal["omega"]      # [B, P]
    beta = internal["beta"]        # [B, P, L]
    levels = internal["levels"]    # [M, B, P, N]
    wq = internal["w_quad"]

    dt = omega.dtype
    lam_d = jnp.asarray(tables["lam_d"], dtype=dt)  # [M, L', D]
    cosm = jnp.asarray(tables["cosm"], dtype=dt)    # [M, D]
    M, L = lam.shape[:2]
    # tables may carry more azimuth modes than the (possibly truncated)
    # solve used — slice to the internal's mode count
    lam_d = lam_d[:M, :L]
    cosm = cosm[:M]

    def stream_sums(ip, im):
        s1 = jnp.einsum("mln,mbpn->mbpl", lam, ip * wq)
        s2 = jnp.einsum("mln,mbpn->mbpl", lam, im * wq)
        return s1 + parity[:, None, None, :] * s2

    g_top = stream_sums(levels["i_plus_top"], levels["i_minus_top"])
    g_bot = stream_sums(levels["i_plus_bot"], levels["i_minus_bot"])
    # boundary fields TOA-first: layer tops + ground (bottom of last layer)
    g_b = jnp.concatenate([g_top, g_bot[:, :, -1:]], axis=2)  # [M,B,P+1,L]
    om_b = jnp.concatenate([omega, omega[..., -1:]], axis=-1)  # [B, P+1]
    beta_b = jnp.concatenate([beta, beta[..., -1:, :]], axis=-2)

    j_m = 0.5 * om_b[..., None] * jnp.einsum(
        "bvl,mld,mbvl->mbvd", beta_b, lam_d, g_b
    )
    j = jnp.einsum("mbvd,md->bvd", j_m, cosm)  # [B, P+1, D] TOA-first
    return j[:, ::-1]  # bottom-up levels


def ms_source_along_rays_minor(
    internal, traced: TracedRays, tables, include_ss: bool,
    ray_chunk: int = 2,
):
    """Wavelength-minor analog of ``ms_source_along_rays``: ``internal``
    comes from ``disco_nstream.solve_nstream(..., return_internal=True)``
    (fields [M, P, N, W] with W in the lane axis).

    The per-segment Legendre contraction is evaluated in ``ray_chunk``-ray
    slices via ``lax.map`` so the [chunk, S, L, W] gather intermediate
    stays a few MB instead of the [M, R, S, L, W] tensor a direct einsum
    would materialize at production W. Under a broadcast-seeded vjp the
    backward temp additionally carries the output (LOS) axis, so the
    default chunk is small: peak HBM ~ M * chunk * S * L * W * nout * 4 B
    inside the transpose loop (measured: chunk=8 OOMs a 16 GB v5e at
    W=512, nstr=16, 20 limb LOS; chunk=2 fits).

    Returns (j_entrance, j_exit) each [R, S, W].
    """
    levels = internal["levels"]    # [M, P, N, W]
    omega = internal["omega"]      # [P, W]
    beta = internal["beta"]        # [L, P, W]
    t_top = internal["t_top"]
    sbar = internal["sbar"]
    dtau = internal["dtau"]
    lam = jnp.asarray(internal["lam"], dtype=omega.dtype)      # [M, L, N]
    lam_sun = jnp.asarray(internal["lam_sun"], dtype=omega.dtype)
    parity = jnp.asarray(internal["parity"], dtype=omega.dtype)
    wq = jnp.asarray(internal["w_quad"], dtype=omega.dtype)    # [N]
    f0 = internal["f0"]

    dt = omega.dtype
    lam_b = jnp.asarray(tables["lam_b"], dtype=dt)  # [M, L', R, S+1]
    cosm = jnp.asarray(tables["cosm"], dtype=dt)    # [M, R, S+1]
    seg_layer = jnp.asarray(traced.seg_layer)       # [R, S]
    f_in = jnp.asarray(traced.seg_entrance_frac, dtype=dt)
    f_out = jnp.asarray(traced.seg_exit_frac, dtype=dt)

    M, L = parity.shape
    # slice the table mode axis to the solve's (possibly truncated) M
    lam_b = lam_b[:M, :L]
    cosm = cosm[:M]
    R, S = seg_layer.shape

    def stream_sums(ip, im):
        # [M, P, L, W]
        s1 = jnp.einsum("mln,mpnw->mplw", lam, ip * wq[:, None])
        s2 = jnp.einsum("mln,mpnw->mplw", lam, im * wq[:, None])
        return s1 + parity[:, None, :, None] * s2

    g_top = stream_sums(levels["i_plus_top"], levels["i_minus_top"])
    g_bot = stream_sums(levels["i_plus_bot"], levels["i_minus_bot"])

    # fold omega/beta into layer-space coefficients once: [M, P, L, W]
    beta_plw = jnp.moveaxis(beta, 0, 1)              # [P, L, W]
    cdiff_top = 0.5 * omega[None, :, None, :] * beta_plw[None] * g_top
    cdiff_bot = 0.5 * omega[None, :, None, :] * beta_plw[None] * g_bot
    mvals = jnp.arange(M)
    two_minus_delta = jnp.where(mvals == 0, 1.0, 2.0).astype(dt)
    cbeam = (
        omega[None, :, None, :] / (4.0 * jnp.pi)
        * beta_plw[None]
        * (parity * lam_sun * two_minus_delta[:, None])[:, None, :, None]
    )                                                # [M, P, L, W]

    beam_amp = t_top * f0[None, :]                   # [P, W]

    pad = (-R) % ray_chunk
    seg_layer_p = jnp.pad(seg_layer, ((0, pad), (0, 0)))
    lam_b_p = jnp.pad(lam_b, ((0, 0), (0, 0), (0, pad), (0, 0)))
    cosm_p = jnp.pad(cosm, ((0, 0), (0, pad), (0, 0)))
    f_in_p = jnp.pad(f_in, ((0, pad), (0, 0)))
    f_out_p = jnp.pad(f_out, ((0, pad), (0, 0)))
    nch = (R + pad) // ray_chunk

    def chunk_body(args):
        sl, lb, cm, fi, fo = args   # [C,S], [M,L,C,S+1], [M,C,S+1], [C,S]
        ct = cdiff_top[:, sl]       # [M, C, S, L, W]
        cb = cdiff_bot[:, sl]
        cbm = cbeam[:, sl]
        om_t = omega[sl]            # [C, S, W]
        amp = beam_amp[sl]
        sb = sbar[sl]
        dtv = dtau[sl]

        def endpoint(frac, off):
            lam_pts = lb[:, :, :, off:S + off]          # [M, L, C, S]
            cos_pts = cm[:, :, off:S + off]             # [M, C, S]
            c = ct * (1.0 - frac)[None, :, :, None, None] + cb * frac[
                None, :, :, None, None
            ]
            j = jnp.einsum("mlcs,mcslw->mcsw", lam_pts, c)
            if include_ss:
                tb = amp * jnp.exp(-sb * dtv * frac[..., None])
                j = j + jnp.einsum("mlcs,mcslw->mcsw", lam_pts, cbm) * tb
            out = jnp.einsum("mcsw,mcs->csw", j, cos_pts)
            thermal = internal.get("thermal")
            if thermal is not None:
                b0, b1, _ = thermal
                out = out + (1.0 - om_t) * b0[sl] * jnp.exp(
                    -b1[sl] * dtv * frac[..., None]
                )
            return out

        return endpoint(fi, 0), endpoint(fo, 1)

    xs = (
        seg_layer_p.reshape(nch, ray_chunk, S),
        jnp.moveaxis(
            lam_b_p.reshape(M, L, nch, ray_chunk, S + 1), 2, 0
        ),
        jnp.moveaxis(cosm_p.reshape(M, nch, ray_chunk, S + 1), 1, 0),
        f_in_p.reshape(nch, ray_chunk, S),
        f_out_p.reshape(nch, ray_chunk, S),
    )
    j_in_ch, j_out_ch = jax.lax.map(chunk_body, xs)
    W = omega.shape[-1]
    j_in = j_in_ch.reshape(nch * ray_chunk, S, W)[:R]
    j_out = j_out_ch.reshape(nch * ray_chunk, S, W)[:R]
    return j_in, j_out


def build_ray_vector_tables(traced: TracedRays, nleg: int, num_azimuth: int):
    """Static angular tables for the polarized ray source: the three
    independent generalized-spherical-function entries of Pi_l^m at each
    boundary's *signed* propagation cosine, plus the per-boundary azimuth
    weights (cos for I/Q, sin for U — the U sign needs the signed relative
    azimuth traced per boundary)."""
    from ..ops.wigner import wigner_d

    mu_signed = traced.cos_zenith  # [R, S+1]
    theta = np.arccos(np.clip(mu_signed, -1.0, 1.0))
    d0 = np.zeros((num_azimuth, nleg) + mu_signed.shape)
    pp = np.zeros_like(d0)
    pm = np.zeros_like(d0)
    cosm = np.zeros((num_azimuth,) + mu_signed.shape)
    sinm = np.zeros_like(cosm)
    dphi = np.pi - traced.boundary_relazi
    for m in range(num_azimuth):
        d0[m] = wigner_d(theta, m, 0, nleg)
        d2p = wigner_d(theta, m, 2, nleg)
        d2m = wigner_d(theta, m, -2, nleg)
        pp[m] = 0.5 * (d2p + d2m)
        pm[m] = 0.5 * (d2p - d2m)
        cosm[m] = np.cos(m * dphi)
        sinm[m] = np.sin(m * dphi)
    return {"d0": d0, "pp": pp, "pm": pm, "cosm": cosm, "sinm": sinm}


def ms_source_along_rays_vec(
    internal, traced: TracedRays, tables, include_ss: bool
):
    """Polarized multiple-scatter source per unit optical depth at segment
    endpoints, in the ray meridian frame (the same frame as the polarized
    exact single scatter — for straight rays every local meridian plane
    along the ray coincides with the ray plane, so no extra rotation is
    needed between boundaries).

    Physical Stokes source at a signed direction cosine mu_s follows from
    evaluating the generalized-spherical expansion directly at mu_s with
    the *transformed* level fields (U of downwelling negated): with
    Pi_l(-mu) = nu_l D Pi_l(mu) D and [B_l, D] = 0,

      J_m(mu_s) = (omega/2) sum_l Pi_l(mu_s) B_l g_l,
      g_l = sum_j w_j (Pi_l(mu_j)^T I+~_j + nu_l D Pi_l(mu_j)^T I-~_j),

    comes out already in the physical (untransformed) frame for both
    hemispheres. Replaces the reference's polarized interpolated DO source
    with its Stokes rotations (``do_source_diffuse_storage.cpp`` NSTOKES=3).

    Returns (j_entrance, j_exit) each [B, R, S, 3]. ``internal`` comes from
    ``disco_vec.solve_plane_parallel_vector(..., return_internal=True)``.
    """
    levels = internal["levels"]      # [M, B, P, K] transformed
    omega = internal["omega"]        # [B, P]
    bgreek = internal["bgreek"]      # [B, P, L, 3, 3]
    t_top = internal["t_top"]
    sbar = internal["sbar"]
    dtau = internal["dtau"]
    d0_sun = internal["d0_sun"]      # [M, L]
    parity = internal["parity"]      # [M, L]
    pi = internal["pi_stream"]       # [M, L, N, 3, 3]
    wq = internal["w_quad"]          # [N]
    f0 = internal["f0"]

    dt = omega.dtype
    d0_b = jnp.asarray(tables["d0"], dtype=dt)   # [M, L', R, S+1]
    pp_b = jnp.asarray(tables["pp"], dtype=dt)
    pm_b = jnp.asarray(tables["pm"], dtype=dt)
    cosm = jnp.asarray(tables["cosm"], dtype=dt)  # [M, R, S+1]
    sinm = jnp.asarray(tables["sinm"], dtype=dt)
    seg_layer = jnp.asarray(traced.seg_layer)     # [R, S]
    f_in = jnp.asarray(traced.seg_entrance_frac, dtype=dt)
    f_out = jnp.asarray(traced.seg_exit_frac, dtype=dt)

    M, L = parity.shape
    N = pi.shape[2]
    # slice the table mode axis to the solve's (possibly truncated) M
    d0_b, pp_b, pm_b = d0_b[:M, :L], pp_b[:M, :L], pm_b[:M, :L]
    cosm, sinm = cosm[:M], sinm[:M]
    dsign = jnp.asarray(DSIGN, dtype=dt)

    def stream_sums(ip, im):
        # Pi^T contraction over (stream j, stokes row s): [M, B, P, L, 3]
        ipr = ip.reshape(ip.shape[:-1] + (N, NS))
        imr = im.reshape(im.shape[:-1] + (N, NS))
        t1 = jnp.einsum("mljst,mbpjs,j->mbplt", pi, ipr, wq)
        t2 = jnp.einsum("mljst,mbpjs,j->mbplt", pi, imr, wq)
        return t1 + parity[:, None, None, :, None] * dsign * t2

    g_top = stream_sums(levels["i_plus_top"], levels["i_minus_top"])
    g_bot = stream_sums(levels["i_plus_bot"], levels["i_minus_bot"])

    # B_l g_l  [M, B, P, L, 3]
    bg_top = jnp.einsum("bplst,mbplt->mbpls", bgreek, g_top)
    bg_bot = jnp.einsum("bplst,mbplt->mbpls", bgreek, g_bot)

    # beam column: B_l e1 * nu_l d^l_{m0}(mu0)  [M, B, P, L, 3]
    bg_beam = jnp.einsum(
        "bpls,ml->mbpls", bgreek[..., 0], parity * d0_sun
    )

    # gather per-segment layer quantities
    bg_top_seg = bg_top[:, :, seg_layer]   # [M, B, R, S, L, 3]
    bg_bot_seg = bg_bot[:, :, seg_layer]
    bg_beam_seg = bg_beam[:, :, seg_layer]
    om_seg = omega[:, seg_layer]           # [B, R, S]
    ttop_seg = t_top[:, seg_layer]
    sbar_seg = sbar[:, seg_layer]
    dtau_seg = dtau[:, seg_layer]

    S = seg_layer.shape[1]
    mvals = jnp.arange(M)
    two_minus_delta = jnp.where(mvals == 0, 1.0, 2.0).astype(dt)

    def endpoint_source(frac, offset):
        d0_pts = d0_b[:, :, :, offset : S + offset]   # [M, L, R, S]
        pp_pts = pp_b[:, :, :, offset : S + offset]
        pm_pts = pm_b[:, :, :, offset : S + offset]
        cos_pts = cosm[:, :, offset : S + offset]     # [M, R, S]
        sin_pts = sinm[:, :, offset : S + offset]

        bg = bg_top_seg * (1.0 - frac)[..., None, None] + (
            bg_bot_seg * frac[..., None, None]
        )
        if include_ss:
            tbeam = (
                two_minus_delta[:, None, None, None]
                / (4.0 * jnp.pi)
                * (f0[..., None, None] if f0 is not None else 1.0)
                * ttop_seg
                * jnp.exp(-sbar_seg * dtau_seg * frac)
            )[..., None, None]
            bg = 0.5 * om_seg[..., None, None] * bg + (
                om_seg[..., None, None] * tbeam * bg_beam_seg
            )
        else:
            bg = 0.5 * om_seg[..., None, None] * bg

        # Pi_l(mu_s) rows applied per boundary, then the azimuth synthesis
        j_i = jnp.einsum("mbrsl,mlrs->mbrs", bg[..., 0], d0_pts)
        j_q = jnp.einsum("mbrsl,mlrs->mbrs", bg[..., 1], pp_pts) - (
            jnp.einsum("mbrsl,mlrs->mbrs", bg[..., 2], pm_pts)
        )
        j_u = -jnp.einsum("mbrsl,mlrs->mbrs", bg[..., 1], pm_pts) + (
            jnp.einsum("mbrsl,mlrs->mbrs", bg[..., 2], pp_pts)
        )
        out_i = jnp.einsum("mbrs,mrs->brs", j_i, cos_pts)
        out_q = jnp.einsum("mbrs,mrs->brs", j_q, cos_pts)
        out_u = jnp.einsum("mbrs,mrs->brs", j_u, sin_pts)
        thermal = internal.get("thermal")
        if thermal is not None:
            # isotropic I-only direct thermal source (1 - omega) B(t), m=0
            b0, b1, _ = thermal
            b0_seg = b0[:, seg_layer]
            b1_seg = b1[:, seg_layer]
            out_i = out_i + (1.0 - om_seg) * b0_seg * jnp.exp(
                -b1_seg * dtau_seg * frac
            )
        return jnp.stack([out_i, out_q, out_u], axis=-1)

    return endpoint_source(f_in, 0), endpoint_source(f_out, 1)


def ms_source_along_rays_vec_minor(
    internal, traced: TracedRays, tables, include_ss: bool,
    ray_chunk: int = 2,
):
    """Wavelength-minor analog of ``ms_source_along_rays_vec``:
    ``internal`` comes from ``disco_vec_minor.solve_nstream_vector(...,
    return_internal=True)`` (levels [M, P, K, W], greeks [4, L, P, W],
    W in the lane axis). Same physics — the generalized-spherical
    expansion evaluated at the signed boundary cosines with the
    transformed level fields — with the B_l g_l product decomposed onto
    the four greek arrays (bg0 = a1 g0 - b1 g1, bg1 = a2 g1 - b1 g0,
    bg2 = a3 g2) and the per-segment contraction chunked over rays like
    the scalar minor path.

    Returns (j_entrance, j_exit) each [R, S, 3, W].
    """
    levels = internal["levels"]      # [M, P, K, W]
    omega = internal["omega"]        # [P, W]
    greeks = internal["greeks"]      # [4, L, P, W]
    t_top = internal["t_top"]
    sbar = internal["sbar"]
    dtau = internal["dtau"]
    f0 = internal["f0"]
    dt = omega.dtype
    d0_sun = jnp.asarray(internal["d0_sun"], dtype=dt)   # [M, L]
    parity = jnp.asarray(internal["parity"], dtype=dt)
    s_tab = jnp.asarray(internal["stream_sum"], dtype=dt)  # [M, L, 3, K]
    par_d = jnp.asarray(internal["par_d"], dtype=dt)       # [M, L, 3]

    d0_b = jnp.asarray(tables["d0"], dtype=dt)   # [M, L', R, S+1]
    pp_b = jnp.asarray(tables["pp"], dtype=dt)
    pm_b = jnp.asarray(tables["pm"], dtype=dt)
    cosm = jnp.asarray(tables["cosm"], dtype=dt)  # [M, R, S+1]
    sinm = jnp.asarray(tables["sinm"], dtype=dt)
    seg_layer = jnp.asarray(traced.seg_layer)     # [R, S]
    f_in = jnp.asarray(traced.seg_entrance_frac, dtype=dt)
    f_out = jnp.asarray(traced.seg_exit_frac, dtype=dt)

    M, L = parity.shape
    # slice the table mode axis to the solve's (possibly truncated) M
    d0_b, pp_b, pm_b = d0_b[:M, :L], pp_b[:M, :L], pm_b[:M, :L]
    cosm, sinm = cosm[:M], sinm[:M]
    R, S = seg_layer.shape
    a1, a2, a3, b1 = greeks[0], greeks[1], greeks[2], greeks[3]

    def stream_sums(ip, im):
        # [M, P, L, 3, W]
        t1 = jnp.einsum("mlck,mpkw->mplcw", s_tab, ip)
        t2 = jnp.einsum("mlck,mpkw->mplcw", s_tab, im)
        return t1 + par_d[:, None, :, :, None] * t2

    def bg_components(g):
        # B_l g decomposed onto the greek arrays; a*/b1 are [L, P, W]
        g0, g1, g2 = g[..., 0, :], g[..., 1, :], g[..., 2, :]
        a1_pl = jnp.moveaxis(a1, 0, 1)[None]   # [1, P, L, W]
        a2_pl = jnp.moveaxis(a2, 0, 1)[None]
        a3_pl = jnp.moveaxis(a3, 0, 1)[None]
        b1_pl = jnp.moveaxis(b1, 0, 1)[None]
        bg0 = a1_pl * g0 - b1_pl * g1
        bg1 = a2_pl * g1 - b1_pl * g0
        bg2 = a3_pl * g2
        return bg0, bg1, bg2           # each [M, P, L, W]

    g_top = stream_sums(levels["i_plus_top"], levels["i_minus_top"])
    g_bot = stream_sums(levels["i_plus_bot"], levels["i_minus_bot"])
    bg_top = bg_components(g_top)
    bg_bot = bg_components(g_bot)

    nu_d0 = parity * d0_sun            # [M, L]
    bgb0 = jnp.einsum("lpw,ml->mplw", a1, nu_d0)
    bgb1 = -jnp.einsum("lpw,ml->mplw", b1, nu_d0)

    mvals = jnp.arange(M)
    two_minus_delta = jnp.where(mvals == 0, 1.0, 2.0).astype(dt)
    beam_amp = t_top * (f0[None, :] if f0 is not None else 1.0)  # [P, W]

    pad = (-R) % ray_chunk
    seg_layer_p = jnp.pad(seg_layer, ((0, pad), (0, 0)))
    d0_p = jnp.pad(d0_b, ((0, 0), (0, 0), (0, pad), (0, 0)))
    pp_p = jnp.pad(pp_b, ((0, 0), (0, 0), (0, pad), (0, 0)))
    pm_p = jnp.pad(pm_b, ((0, 0), (0, 0), (0, pad), (0, 0)))
    cosm_p = jnp.pad(cosm, ((0, 0), (0, pad), (0, 0)))
    sinm_p = jnp.pad(sinm, ((0, 0), (0, pad), (0, 0)))
    f_in_p = jnp.pad(f_in, ((0, pad), (0, 0)))
    f_out_p = jnp.pad(f_out, ((0, pad), (0, 0)))
    nch = (R + pad) // ray_chunk

    def chunk_body(args):
        sl, d0c, ppc, pmc, cmc, smc, fi, fo = args
        bgt = [v[:, sl] for v in bg_top]      # each [M, C, S, L, W]
        bgb = [v[:, sl] for v in bg_bot]
        bgm0 = bgb0[:, sl]
        bgm1 = bgb1[:, sl]
        om_t = omega[sl]                      # [C, S, W]
        amp = beam_amp[sl]
        sb = sbar[sl]
        dtv = dtau[sl]

        def endpoint(frac, off):
            d0s = d0c[:, :, :, off:S + off]   # [M, L, C, S]
            pps = ppc[:, :, :, off:S + off]
            pms = pmc[:, :, :, off:S + off]
            cms = cmc[:, :, off:S + off]      # [M, C, S]
            sms = smc[:, :, off:S + off]
            w1 = (1.0 - frac)[None, :, :, None, None]
            w2 = frac[None, :, :, None, None]
            c0 = bgt[0] * w1 + bgb[0] * w2
            c1 = bgt[1] * w1 + bgb[1] * w2
            c2 = bgt[2] * w1 + bgb[2] * w2
            half_om = 0.5 * om_t[None, :, :, None, :]
            c0 = half_om * c0
            c1 = half_om * c1
            c2 = half_om * c2
            if include_ss:
                tb = (
                    two_minus_delta[:, None, None, None]
                    / (4.0 * jnp.pi)
                    * (amp * jnp.exp(-sb * dtv * frac[..., None]))[None]
                )[:, :, :, None, :]           # [M, C, S, 1, W]
                omb = om_t[None, :, :, None, :]
                c0 = c0 + omb * tb * bgm0
                c1 = c1 + omb * tb * bgm1
            j_i = jnp.einsum("mcslw,mlcs->mcsw", c0, d0s)
            j_q = (
                jnp.einsum("mcslw,mlcs->mcsw", c1, pps)
                - jnp.einsum("mcslw,mlcs->mcsw", c2, pms)
            )
            j_u = (
                -jnp.einsum("mcslw,mlcs->mcsw", c1, pms)
                + jnp.einsum("mcslw,mlcs->mcsw", c2, pps)
            )
            out_i = jnp.einsum("mcsw,mcs->csw", j_i, cms)
            out_q = jnp.einsum("mcsw,mcs->csw", j_q, cms)
            out_u = jnp.einsum("mcsw,mcs->csw", j_u, sms)
            return jnp.stack([out_i, out_q, out_u], axis=-2)  # [C,S,3,W]

        return endpoint(fi, 0), endpoint(fo, 1)

    xs = (
        seg_layer_p.reshape(nch, ray_chunk, S),
        jnp.moveaxis(
            d0_p.reshape(M, L, nch, ray_chunk, S + 1), 2, 0
        ),
        jnp.moveaxis(
            pp_p.reshape(M, L, nch, ray_chunk, S + 1), 2, 0
        ),
        jnp.moveaxis(
            pm_p.reshape(M, L, nch, ray_chunk, S + 1), 2, 0
        ),
        jnp.moveaxis(cosm_p.reshape(M, nch, ray_chunk, S + 1), 1, 0),
        jnp.moveaxis(sinm_p.reshape(M, nch, ray_chunk, S + 1), 1, 0),
        f_in_p.reshape(nch, ray_chunk, S),
        f_out_p.reshape(nch, ray_chunk, S),
    )
    j_in_ch, j_out_ch = jax.lax.map(chunk_body, xs)
    W = omega.shape[-1]
    j_in = j_in_ch.reshape(nch * ray_chunk, S, NS, W)[:R]
    j_out = j_out_ch.reshape(nch * ray_chunk, S, NS, W)[:R]
    return j_in, j_out


def ms_source_along_rays(internal, traced: TracedRays, tables, include_ss: bool):
    """Multiple-scatter source per unit optical depth at segment endpoints.

    Returns (j_entrance, j_exit) each [B, R, S]. ``internal`` comes from
    ``disco.solve_plane_parallel(..., return_internal=True)``.
    ``include_ss`` adds the direct-beam scattering term (normally False:
    exact single scatter is integrated separately; reference
    ``do_source.cpp:23-25``).
    """
    lam = internal["lam"]          # [M, L, N]
    lam_sun = internal["lam_sun"]  # [M, L]
    parity = internal["parity"]    # [M, L]
    omega = internal["omega"]      # [B, P]
    beta = internal["beta"]        # [B, P, L]
    levels = internal["levels"]    # [M, B, P, N] fields
    t_top = internal["t_top"]
    sbar = internal["sbar"]
    dtau = internal["dtau"]
    wq = internal["w_quad"]        # [N]

    dt = omega.dtype
    lam_b = jnp.asarray(tables["lam_b"], dtype=dt)  # [M, L, R, S+1]
    cosm = jnp.asarray(tables["cosm"], dtype=dt)    # [M, R, S+1]
    seg_layer = jnp.asarray(traced.seg_layer)       # [R, S]
    f_in = jnp.asarray(traced.seg_entrance_frac, dtype=dt)   # [R, S]
    f_out = jnp.asarray(traced.seg_exit_frac, dtype=dt)

    # Truncate the ray tables to the solver's Legendre count and
    # (possibly truncated) azimuth mode count
    M, L = lam.shape[:2]
    lam_b = lam_b[:M, :L]
    cosm = cosm[:M]

    def stream_sums(ip, im):
        s1 = jnp.einsum("mln,mbpn->mbpl", lam, ip * wq)
        s2 = jnp.einsum("mln,mbpn->mbpl", lam, im * wq)
        return s1 + parity[:, None, None, :] * s2

    g_top = stream_sums(levels["i_plus_top"], levels["i_minus_top"])
    g_bot = stream_sums(levels["i_plus_bot"], levels["i_minus_bot"])

    # gather per-segment layer quantities
    g_top_seg = g_top[:, :, seg_layer, :]   # [M, B, R, S, L]
    g_bot_seg = g_bot[:, :, seg_layer, :]
    beta_seg = beta[:, seg_layer, :]        # [B, R, S, L]
    om_seg = omega[:, seg_layer]            # [B, R, S]
    ttop_seg = t_top[:, seg_layer]
    sbar_seg = sbar[:, seg_layer]
    dtau_seg = dtau[:, seg_layer]

    S = seg_layer.shape[1]
    mvals = jnp.arange(lam.shape[0])
    two_minus_delta = jnp.where(mvals == 0, 1.0, 2.0).astype(dt)

    def endpoint_source(frac, offset):
        lam_pts = lam_b[:, :, :, offset : S + offset]   # [M, L, R, S]
        cos_pts = cosm[:, :, offset : S + offset]       # [M, R, S]
        g = g_top_seg * (1.0 - frac)[..., None] + g_bot_seg * frac[..., None]
        j_diff = 0.5 * om_seg * jnp.einsum(
            "brsl,mlrs,mbrsl->mbrs", beta_seg, lam_pts, g
        )
        f0 = internal.get("f0")
        beam_amp = ttop_seg * (f0[..., None, None] if f0 is not None else 1.0)
        tbeam = beam_amp * jnp.exp(-sbar_seg * dtau_seg * frac)
        j_beam = (
            jnp.einsum(
                "brsl,mlrs,ml->mbrs",
                beta_seg,
                lam_pts,
                parity * lam_sun * two_minus_delta[:, None],
            )
            * (om_seg / (4.0 * jnp.pi) * tbeam)
        )
        j = j_diff + (j_beam if include_ss else 0.0)
        out = jnp.einsum("mbrs,mrs->brs", j, cos_pts)
        thermal = internal.get("thermal")
        if thermal is not None:
            # isotropic direct thermal source (1 - omega) B(t), azimuth m=0
            b0, b1, _ = thermal
            b0_seg = b0[:, seg_layer]
            b1_seg = b1[:, seg_layer]
            out = out + (1.0 - om_seg) * b0_seg * jnp.exp(
                -b1_seg * dtau_seg * frac
            )
        return out

    return endpoint_source(f_in, 0), endpoint_source(f_out, 1)
