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

import numpy as np
import jax.numpy as jnp

from ..ops.wigner import normalized_alp
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

    # Truncate the ray tables to the solver's Legendre count
    L = lam.shape[1]
    lam_b = lam_b[:, :L]

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
