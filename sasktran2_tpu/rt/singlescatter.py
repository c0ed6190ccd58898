"""Exact single scatter source + Beer-Lambert LOS integration.

Replaces the reference's per-quadrature-point C++ single-scatter kernels
(``/root/reference/cpp/lib/solar/singlescattersource.cpp:60-777``) with fully
vectorized JAX over (wavelength x ray x segment):

 * segment and solar optical depths are dense matmuls of static ray-tracing
   weight tables against the extinction profile;
 * the phase function at each segment boundary is a Legendre-coefficient
   contraction with static ``P_l(cos Theta)`` tables;
 * per-layer integration uses the reference's endpoint-blended constant
   source model ``(1 - e^-od)/od * (J_in + J_out)/2 * ds``
   (``singlescattersource.cpp:565-612``);
 * the along-ray accumulation ``I = sum_s J_s exp(-tau_closer)`` is a
   cumulative-sum weighting, not a sequential scan.

All functions are differentiable w.r.t. extinction / ssa / legendre /
albedo, giving weighting functions by autodiff.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.wigner import legendre_p
from .raytrace import TracedRays


def phase_tables(traced: TracedRays, nlegendre: int) -> np.ndarray:
    """P_l(cos Theta) at every segment boundary: [R, S+1, L] (static)."""
    return np.moveaxis(
        legendre_p(traced.cos_scatter, nlegendre), 0, -1
    )


def phase_tables_d02(traced: TracedRays, nlegendre: int) -> np.ndarray:
    """d^l_{02}(Theta) at every segment boundary: [R, S+1, L] (static).

    Contracted with the b1 greek coefficients this gives the I->Q element of
    the scattering matrix (the reference's generalized-spherical phase
    expansion, ``cpp/lib/solar/singlescattersource.cpp`` NSTOKES=3 path).
    """
    from ..ops.wigner import wigner_d

    theta = np.arccos(np.clip(traced.cos_scatter, -1.0, 1.0))
    return np.moveaxis(wigner_d(theta, 0, 2, nlegendre), 0, -1)


def integrate_single_scatter(
    extinction,
    ssa,
    leg_coeff,
    albedo,
    traced: TracedRays,
    phase_tab,
    emission=None,
    include_emission: bool = False,
):
    """Single-scatter (+optional thermal emission) radiance for every ray.

    Parameters
    ----------
    extinction : [W, A] per-level extinction [1/m] (W = wavelength batch)
    ssa : [W, A] single scatter albedo at levels
    leg_coeff : [W, A, L] Legendre coefficients (beta_0 = 1)
    albedo : [W] Lambertian surface albedo
    traced : static ray tables
    phase_tab : [R, S+1, L] static P_l(cos Theta) tables
    emission : optional [W, A] emission source (radiance units)

    Returns
    -------
    radiance [W, R] (sun-normalized, F0 = 1)
    """
    odw = jnp.asarray(traced.od_weights, dtype=extinction.dtype)
    sunw = jnp.asarray(traced.sun_weights, dtype=extinction.dtype)
    intw = jnp.asarray(traced.interp_weights, dtype=extinction.dtype)
    lengths = jnp.asarray(traced.lengths, dtype=extinction.dtype)
    mask = jnp.asarray(traced.mask, dtype=extinction.dtype)
    pt = jnp.asarray(phase_tab, dtype=extinction.dtype)

    # [W, R, S] segment OD along LOS ; [W, R, S+1] OD to sun at boundaries
    seg_od = jnp.einsum("rsa,wa->wrs", odw, extinction)
    sun_od = jnp.einsum("rba,wa->wrb", sunw, extinction)
    t_sun = jnp.exp(-jnp.minimum(sun_od, 300.0))

    # level scattering extinction interpolated to boundaries
    kscat = extinction * ssa  # [W, A]
    kscat_b = jnp.einsum("rba,wa->wrb", intw, kscat)
    # phase at boundaries: sum_l beta_l(boundary) P_l(cos Theta)
    # beta interpolated onto boundaries as scattering-weighted mean.
    # Safe division: padded boundaries have all-zero weights -> 0/0; both
    # value AND gradients must stay finite there (where on the denominator
    # alone still produces NaN cotangents).
    beta_num = jnp.einsum("rba,wal->wrbl", intw, leg_coeff * kscat[..., None])
    denom = kscat_b[..., None]
    beta_b = jnp.where(
        denom > 0.0, beta_num / jnp.where(denom > 0.0, denom, 1.0), 0.0
    )
    phase_b = jnp.einsum("wrbl,rbl->wrb", beta_b, pt)

    # J per unit length at boundaries (source toward the observer)
    j_b = kscat_b * phase_b / (4.0 * jnp.pi) * t_sun
    if include_emission and emission is not None:
        k_b = jnp.einsum("rba,wa->wrb", intw, extinction)
        kabs_b = k_b - kscat_b
        j_b = j_b + kabs_b * jnp.einsum("rba,wa->wrb", intw, emission)

    # endpoint blend: segment s has entrance boundary s (far) and exit
    # boundary s+1 (near the observer)
    j_in = j_b[..., :-1]
    j_out = j_b[..., 1:]
    od = jnp.maximum(seg_od, 0.0)
    source_factor = jnp.where(
        od < 1e-12, 1.0 - 0.5 * od, -jnp.expm1(-od) / jnp.maximum(od, 1e-12)
    )
    seg_src = source_factor * 0.5 * (j_in + j_out) * lengths * mask

    # attenuate by the OD between each segment and the observer: segments
    # are ordered far -> near, so the OD closer to the observer is the
    # suffix sum of seg_od (excluding self)
    od_m = seg_od * mask
    closer = jnp.flip(jnp.cumsum(jnp.flip(od_m, axis=-1), axis=-1), axis=-1) - od_m
    radiance = jnp.sum(seg_src * jnp.exp(-closer), axis=-1)

    # ground reflection of the direct beam at the far end (ground-hitting
    # rays): Lambertian rho * mu0 * T_sun(ground) / pi attenuated along the
    # full LOS
    ground = jnp.asarray(traced.ground_hit, dtype=extinction.dtype)
    mu0_g = jnp.asarray(
        np.maximum(traced.ground_cos_sza, 0.0), dtype=extinction.dtype
    )
    t_sun_ground = t_sun[..., 0]  # boundary 0 = far end = ground for those rays
    total_od = jnp.sum(od_m, axis=-1)
    ground_term = (
        ground * albedo[..., None] * mu0_g * t_sun_ground / jnp.pi
    ) * jnp.exp(-total_od)
    return radiance + ground_term


def integrate_single_scatter_polarized(
    extinction,
    ssa,
    leg_a1,
    leg_b1,
    albedo,
    traced: TracedRays,
    phase_tab,
    d02_tab,
):
    """Polarized (I, Q, U) exact single scatter for every ray.

    The sun is unpolarized, so only the first column of the scattering
    matrix enters: in the scattering plane the scattered Stokes vector is
    (a1(Theta), -sum_l b1_l d^l_{02}(Theta), 0); it is then rotated into the
    ray meridian basis with the traced (cos 2s, sin 2s) tables (reference
    NSTOKES=3 single scatter, ``cpp/lib/solar/singlescattersource.cpp`` +
    ``math/scattering.h`` rotations). Attenuation is scalar; the Lambertian
    ground term is unpolarized.

    leg_a1/leg_b1: [W, A, L]; returns radiance [W, R, 3].
    """
    odw = jnp.asarray(traced.od_weights, dtype=extinction.dtype)
    sunw = jnp.asarray(traced.sun_weights, dtype=extinction.dtype)
    intw = jnp.asarray(traced.interp_weights, dtype=extinction.dtype)
    lengths = jnp.asarray(traced.lengths, dtype=extinction.dtype)
    mask = jnp.asarray(traced.mask, dtype=extinction.dtype)
    pt = jnp.asarray(phase_tab, dtype=extinction.dtype)
    d02 = jnp.asarray(d02_tab, dtype=extinction.dtype)
    c2 = jnp.asarray(traced.cos2rot, dtype=extinction.dtype)
    s2 = jnp.asarray(traced.sin2rot, dtype=extinction.dtype)

    seg_od = jnp.einsum("rsa,wa->wrs", odw, extinction)
    sun_od = jnp.einsum("rba,wa->wrb", sunw, extinction)
    t_sun = jnp.exp(-jnp.minimum(sun_od, 300.0))

    kscat = extinction * ssa
    kscat_b = jnp.einsum("rba,wa->wrb", intw, kscat)
    denom = kscat_b[..., None]

    def beta_boundary(lc):
        num = jnp.einsum("rba,wal->wrbl", intw, lc * kscat[..., None])
        return jnp.where(
            denom > 0.0, num / jnp.where(denom > 0.0, denom, 1.0), 0.0
        )

    phase_i = jnp.einsum("wrbl,rbl->wrb", beta_boundary(leg_a1), pt)
    # I -> Q scattering-plane element: F21(Theta) = -sum_l b1_l d^l_{02}
    f21 = -jnp.einsum("wrbl,rbl->wrb", beta_boundary(leg_b1), d02)

    base = kscat_b / (4.0 * jnp.pi) * t_sun
    j_b = jnp.stack(
        [base * phase_i, base * f21 * c2, base * f21 * s2], axis=-1
    )  # [W, R, S+1, 3]

    j_in = j_b[..., :-1, :]
    j_out = j_b[..., 1:, :]
    od = jnp.maximum(seg_od, 0.0)
    source_factor = jnp.where(
        od < 1e-12, 1.0 - 0.5 * od, -jnp.expm1(-od) / jnp.maximum(od, 1e-12)
    )
    blend = (source_factor * lengths * mask)[..., None]
    seg_src = blend * 0.5 * (j_in + j_out)

    od_m = seg_od * mask
    closer = jnp.flip(jnp.cumsum(jnp.flip(od_m, axis=-1), axis=-1), axis=-1) - od_m
    radiance = jnp.sum(seg_src * jnp.exp(-closer)[..., None], axis=-2)

    ground = jnp.asarray(traced.ground_hit, dtype=extinction.dtype)
    mu0_g = jnp.asarray(
        np.maximum(traced.ground_cos_sza, 0.0), dtype=extinction.dtype
    )
    t_sun_ground = t_sun[..., 0]
    total_od = jnp.sum(od_m, axis=-1)
    ground_term = (
        ground * albedo[..., None] * mu0_g * t_sun_ground / jnp.pi
    ) * jnp.exp(-total_od)
    return radiance.at[..., 0].add(ground_term)


def emission_radiance(extinction, ssa, emission, albedo, surface_emission,
                      traced: TracedRays):
    """Thermal/VER emission integrated along the rays (reference
    ``cpp/lib/emission/emission_source.cpp``): source per unit length
    J = k_absorption * B at segment boundaries, plus surface emission
    (1 - albedo) * B_surf at the far end of ground-hitting rays.

    emission: [W, A] radiance-units source; surface_emission: [W].
    Returns [W, R].
    """
    odw = jnp.asarray(traced.od_weights, dtype=extinction.dtype)
    intw = jnp.asarray(traced.interp_weights, dtype=extinction.dtype)
    lengths = jnp.asarray(traced.lengths, dtype=extinction.dtype)
    mask = jnp.asarray(traced.mask, dtype=extinction.dtype)

    seg_od = jnp.einsum("rsa,wa->wrs", odw, extinction)
    k_b = jnp.einsum("rba,wa->wrb", intw, extinction)
    kscat_b = jnp.einsum("rba,wa->wrb", intw, extinction * ssa)
    kabs_b = k_b - kscat_b
    b_b = jnp.einsum("rba,wa->wrb", intw, emission)
    j_b = kabs_b * b_b

    j_in = j_b[..., :-1]
    j_out = j_b[..., 1:]
    od = jnp.maximum(seg_od, 0.0)
    source_factor = jnp.where(
        od < 1e-12, 1.0 - 0.5 * od, -jnp.expm1(-od) / jnp.maximum(od, 1e-12)
    )
    seg_src = source_factor * 0.5 * (j_in + j_out) * lengths * mask

    od_m = seg_od * mask
    closer = jnp.flip(jnp.cumsum(jnp.flip(od_m, axis=-1), axis=-1), axis=-1) - od_m
    radiance = jnp.sum(seg_src * jnp.exp(-closer), axis=-1)

    ground = jnp.asarray(traced.ground_hit, dtype=extinction.dtype)
    total_od = jnp.sum(od_m, axis=-1)
    ground_term = (
        ground * (1.0 - albedo[..., None]) * surface_emission[..., None]
    ) * jnp.exp(-total_od)
    return radiance + ground_term


def ver_emission_radiance(extinction, emission, traced: TracedRays):
    """Volume-emission-rate emission mode: the stored emission is a
    radiance *rate per meter* and each segment contributes
    ``length x avg(emission)`` attenuated by the optical depth of closer
    segments — no absorption-coefficient weighting and no within-layer
    (1 - e^-tau) factor (reference ``emission_source.cpp`` volume_emission_
    rate branch: ``source_factor = layer.layer_distance``).

    emission: [W, A]; returns [W, R].
    """
    odw = jnp.asarray(traced.od_weights, dtype=extinction.dtype)
    intw = jnp.asarray(traced.interp_weights, dtype=extinction.dtype)
    lengths = jnp.asarray(traced.lengths, dtype=extinction.dtype)
    mask = jnp.asarray(traced.mask, dtype=extinction.dtype)

    seg_od = jnp.einsum("rsa,wa->wrs", odw, extinction)
    e_b = jnp.einsum("rba,wa->wrb", intw, emission)
    seg_src = 0.5 * (e_b[..., :-1] + e_b[..., 1:]) * lengths * mask

    od_m = seg_od * mask
    closer = (
        jnp.flip(jnp.cumsum(jnp.flip(od_m, axis=-1), axis=-1), axis=-1)
        - od_m
    )
    return jnp.sum(seg_src * jnp.exp(-closer), axis=-1)


def integrate_od_source(extinction, j_in, j_out, traced: TracedRays):
    """Integrate a per-unit-optical-depth source along the traced rays:
    I = sum_s T_closer(s) (1 - e^{-dtau_s}) (J_in + J_out)/2.

    j_in/j_out: [W, R, S] source at segment entrance/exit; extinction
    [W, A]. Same endpoint-blended constant-source model as the reference
    (``source_algorithms.cpp:5-19``). Returns [W, R].
    """
    odw = jnp.asarray(traced.od_weights, dtype=extinction.dtype)
    mask = jnp.asarray(traced.mask, dtype=extinction.dtype)
    seg_od = jnp.einsum("rsa,wa->wrs", odw, extinction)
    od_m = seg_od * mask
    factor = -jnp.expm1(-od_m)
    seg_src = factor * 0.5 * (j_in + j_out) * mask
    closer = jnp.flip(jnp.cumsum(jnp.flip(od_m, axis=-1), axis=-1), axis=-1) - od_m
    return jnp.sum(seg_src * jnp.exp(-closer), axis=-1)


def optical_depth(extinction, traced: TracedRays):
    """Total LOS optical depth per ray: [W, R] (reference
    ``SourceIntegrator::integrate_optical_depth``)."""
    odw = jnp.asarray(traced.od_weights, dtype=extinction.dtype)
    mask = jnp.asarray(traced.mask, dtype=extinction.dtype)
    seg_od = jnp.einsum("rsa,wa->wrs", odw, extinction)
    return jnp.sum(seg_od * mask, axis=-1)


def occultation_radiance(extinction, traced: TracedRays):
    """Occultation source: transmission of a unit source at the far end of
    every non-ground ray (reference ``cpp/lib/solar/occultation.cpp``)."""
    od = optical_depth(extinction, traced)
    not_ground = 1.0 - jnp.asarray(traced.ground_hit, dtype=extinction.dtype)
    return jnp.exp(-od) * not_ground


def integrate_single_scatter_2d(extinction, ssa, leg_coeff, traced2d,
                                phase_tab):
    """2D-atmosphere single scatter along in-plane rays (sparse gathers).

    extinction/ssa: [W, nloc] flattened [angle, altitude] fields;
    leg_coeff: [W, nloc, L]; traced2d: TracedRays2D; phase_tab [R, S+1, L].
    Returns radiance [W, R].
    """
    dt = extinction.dtype
    od_idx = jnp.asarray(traced2d.od_idx)
    od_w = jnp.asarray(traced2d.od_w, dtype=dt)
    sun_idx = jnp.asarray(traced2d.sun_idx)
    sun_w = jnp.asarray(traced2d.sun_w, dtype=dt)
    iidx = jnp.asarray(traced2d.interp_idx)
    iw = jnp.asarray(traced2d.interp_w, dtype=dt)
    mask = jnp.asarray(traced2d.mask, dtype=dt)
    pt = jnp.asarray(phase_tab, dtype=dt)

    seg_od = jnp.einsum("wrsk,rsk->wrs", extinction[:, od_idx], od_w)
    sun_od = jnp.einsum("wrbk,rbk->wrb", extinction[:, sun_idx], sun_w)
    t_sun = jnp.exp(-jnp.minimum(sun_od, 300.0))

    kscat = extinction * ssa
    kscat_b = jnp.einsum("wrbk,rbk->wrb", kscat[:, iidx], iw)
    k_b = jnp.einsum("wrbk,rbk->wrb", extinction[:, iidx], iw)
    beta_num = jnp.einsum(
        "wrbkl,rbk->wrbl", (leg_coeff * kscat[..., None])[:, iidx], iw
    )
    denom = kscat_b[..., None]
    beta_b = jnp.where(
        denom > 0.0, beta_num / jnp.where(denom > 0.0, denom, 1.0), 0.0
    )
    phase_b = jnp.einsum("wrbl,rbl->wrb", beta_b, pt)

    # source per unit length with the reference's endpoint-blended model
    # (1 - e^-od)/od * mean(J) * len  (singlescattersource.cpp:565-612)
    j_b = kscat_b * phase_b / (4.0 * jnp.pi) * t_sun
    j_in = j_b[..., :-1]
    j_out = j_b[..., 1:]
    lengths = jnp.asarray(traced2d.lengths, dtype=dt)
    od = jnp.maximum(seg_od, 0.0) * mask
    source_factor = jnp.where(
        od < 1e-12, 1.0 - 0.5 * od, -jnp.expm1(-od) / jnp.maximum(od, 1e-12)
    )
    seg_src = source_factor * 0.5 * (j_in + j_out) * lengths * mask
    closer = jnp.flip(jnp.cumsum(jnp.flip(od, axis=-1), axis=-1), axis=-1) - od
    return jnp.sum(seg_src * jnp.exp(-closer), axis=-1)


def emission_radiance_2d(extinction, ssa, emission, traced2d):
    """Standard (thermal) emission along 2D in-plane rays.

    Mirrors :func:`emission_radiance` with the 2D gather tables: per
    segment J = k_abs * B interpolated at the boundaries, endpoint-blended
    constant-source model, attenuated by the OD of closer segments.
    Reference capability: ``EmissionSource.Standard`` with Geometry2D
    (``/root/reference/src/sasktran2/engine.py:89-93``,
    ``tests/engine/test_geometry2d_emission.py``).

    extinction/ssa/emission: [W, nloc]; returns [W, R].
    """
    dt = extinction.dtype
    od_idx = jnp.asarray(traced2d.od_idx)
    od_w = jnp.asarray(traced2d.od_w, dtype=dt)
    iidx = jnp.asarray(traced2d.interp_idx)
    iw = jnp.asarray(traced2d.interp_w, dtype=dt)
    lengths = jnp.asarray(traced2d.lengths, dtype=dt)
    mask = jnp.asarray(traced2d.mask, dtype=dt)

    seg_od = jnp.einsum("wrsk,rsk->wrs", extinction[:, od_idx], od_w)
    k_b = jnp.einsum("wrbk,rbk->wrb", extinction[:, iidx], iw)
    kscat_b = jnp.einsum(
        "wrbk,rbk->wrb", (extinction * ssa)[:, iidx], iw
    )
    kabs_b = k_b - kscat_b
    b_b = jnp.einsum("wrbk,rbk->wrb", emission[:, iidx], iw)
    j_b = kabs_b * b_b

    j_in = j_b[..., :-1]
    j_out = j_b[..., 1:]
    od = jnp.maximum(seg_od, 0.0) * mask
    source_factor = jnp.where(
        od < 1e-12, 1.0 - 0.5 * od, -jnp.expm1(-od) / jnp.maximum(od, 1e-12)
    )
    seg_src = source_factor * 0.5 * (j_in + j_out) * lengths * mask
    closer = (
        jnp.flip(jnp.cumsum(jnp.flip(od, axis=-1), axis=-1), axis=-1) - od
    )
    return jnp.sum(seg_src * jnp.exp(-closer), axis=-1)


def ver_emission_radiance_2d(extinction, emission, traced2d):
    """Volume-emission-rate emission along 2D in-plane rays: segment
    contribution = length * mean(boundary emission rate), attenuated by
    closer-segment OD (mirrors :func:`ver_emission_radiance`).

    extinction/emission: [W, nloc]; returns [W, R].
    """
    dt = extinction.dtype
    od_idx = jnp.asarray(traced2d.od_idx)
    od_w = jnp.asarray(traced2d.od_w, dtype=dt)
    iidx = jnp.asarray(traced2d.interp_idx)
    iw = jnp.asarray(traced2d.interp_w, dtype=dt)
    lengths = jnp.asarray(traced2d.lengths, dtype=dt)
    mask = jnp.asarray(traced2d.mask, dtype=dt)

    seg_od = jnp.einsum("wrsk,rsk->wrs", extinction[:, od_idx], od_w)
    e_b = jnp.einsum("wrbk,rbk->wrb", emission[:, iidx], iw)
    seg_src = 0.5 * (e_b[..., :-1] + e_b[..., 1:]) * lengths * mask

    od_m = jnp.maximum(seg_od, 0.0) * mask
    closer = (
        jnp.flip(jnp.cumsum(jnp.flip(od_m, axis=-1), axis=-1), axis=-1)
        - od_m
    )
    return jnp.sum(seg_src * jnp.exp(-closer), axis=-1)


def optical_depth_2d(extinction, traced2d):
    dt = extinction.dtype
    od_idx = jnp.asarray(traced2d.od_idx)
    od_w = jnp.asarray(traced2d.od_w, dtype=dt)
    mask = jnp.asarray(traced2d.mask, dtype=dt)
    seg_od = jnp.einsum("wrsk,rsk->wrs", extinction[:, od_idx], od_w)
    return jnp.sum(seg_od * mask, axis=-1)
