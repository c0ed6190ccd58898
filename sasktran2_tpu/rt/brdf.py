"""Surface BRDF kernels.

Behavior matches the reference BRDFs
(``/root/reference/cpp/include/sasktran2/atmosphere/surface.h:112-617``):
Lambertian, Kokhanovsky snow, and the MODIS RossThick/LiSparse-R kernel
model. Each kernel is a jax-traceable function of (mu_out, mu_in,
geometric relative azimuth, args) returning the BRDF in 1/sr; the
discrete-ordinates solver computes per-azimuth-mode moments by static
quadrature inside the trace, so weighting functions w.r.t. the BRDF
arguments come from autodiff like every other input.
"""

from __future__ import annotations

import jax.numpy as jnp


class LambertianKernel:
    """rho = albedo / pi. args: [..., 1] (albedo)."""

    num_args = 1

    def kernel(self, mu_out, mu_in, phi, args):
        alb = args[..., 0]
        shape = jnp.broadcast_shapes(
            mu_out.shape, mu_in.shape, phi.shape
        )
        return (alb[..., None, None, None] / jnp.pi) * jnp.ones(shape)


class SnowKokhanovskyKernel:
    """Kokhanovsky-Breon snow BRDF (reference ``surface.h:151-236``).

    args: [..., 1] = (chi + M) / wavelen_nm * L (the single absorption
    parameter); R = R0 exp(-alpha K0(mu_s) K0(mu_v) / R0) / pi with
    alpha = sqrt(4 pi args0).
    """

    num_args = 1

    @staticmethod
    def _k0(mu):
        return (3.0 / 7.0) * (1.0 + 2.0 * mu)

    def kernel(self, mu_out, mu_in, phi, args):
        mus = mu_in
        muv = mu_out
        ss = jnp.sqrt(jnp.clip(1.0 - mus * mus, 0.0, 1.0))
        sv = jnp.sqrt(jnp.clip(1.0 - muv * muv, 0.0, 1.0))
        cost = jnp.clip(-mus * muv + ss * sv * jnp.cos(phi), -1.0, 1.0)
        theta_deg = jnp.rad2deg(jnp.arccos(cost))
        p = 11.1 * jnp.exp(-0.087 * theta_deg) + 1.1 * jnp.exp(
            -0.014 * theta_deg
        )
        a, b, c = 1.247, 1.186, 5.157
        r0 = (a + b * (mus + muv) + c * mus * muv + p) / (
            4.0 * (mus + muv)
        )
        alpha = jnp.sqrt(4.0 * jnp.pi * args[..., 0])
        alpha = alpha[..., None, None, None]
        return (
            r0
            * jnp.exp(-alpha * self._k0(mus) * self._k0(muv) / r0)
            / jnp.pi
        )


class WeightedKernel:
    """Linear combination of BRDF kernels (reference ``WeightedBRDF``,
    ``surface.h:99`` — declared there but left as an empty stub; this is a
    functional implementation).

    args layout: [..., sum(num_args_i) + K] = the member kernels' args
    concatenated in order, followed by the K mixing weights. Weights enter
    linearly, so weighting functions w.r.t. both the member args and the
    weights flow through autodiff unchanged.
    """

    def __init__(self, kernels):
        self.kernels = list(kernels)
        self.num_args = sum(k.num_args for k in self.kernels) + len(
            self.kernels
        )

    def kernel(self, mu_out, mu_in, phi, args):
        n_member = sum(k.num_args for k in self.kernels)
        out = 0.0
        off = 0
        for i, k in enumerate(self.kernels):
            sub = args[..., off:off + k.num_args]
            w = args[..., n_member + i][..., None, None, None]
            out = out + w * k.kernel(mu_out, mu_in, phi, sub)
            off += k.num_args
        return out


class MODISKernel:
    """MODIS RossThick + LiSparse-Reciprocal kernel BRDF (reference
    ``surface.h:246-360``). args: [..., 3] = (f_iso, f_vol, f_geo)."""

    num_args = 3

    def kernel(self, mu_out, mu_in, phi, args):
        csza = mu_in
        cvza = mu_out
        ssza = jnp.sqrt(jnp.clip(1.0 - csza * csza, 0.0, 1.0))
        svza = jnp.sqrt(jnp.clip(1.0 - cvza * cvza, 0.0, 1.0))
        tsza = ssza / csza
        tvza = svza / cvza
        # the reference negates cos(phi_diff): raa = 0 is the forward plane
        craa = -jnp.cos(phi)
        sraa = jnp.sin(phi)
        csa = jnp.clip(csza * cvza + ssza * svza * craa, -1.0, 1.0)
        sa = jnp.arccos(csa)
        ssa = jnp.sin(sa)

        k_vol = ((0.5 * jnp.pi - sa) * csa + ssa) / (csza + cvza) - (
            0.25 * jnp.pi
        )

        d2 = tsza * tsza + tvza * tvza - 2.0 * tsza * tvza * craa
        ct = jnp.clip(
            2.0
            * jnp.sqrt(d2 + tsza * tsza * tvza * tvza * sraa * sraa)
            * csza
            * cvza
            / (csza + cvza),
            -1.0,
            1.0,
        )
        t = jnp.arccos(ct)
        st = jnp.sin(t)
        o = (t - st * ct) * (csza + cvza) / (jnp.pi * csza * cvza)
        k_geo = o - (csza + cvza - 0.5 * (1.0 + csa)) / (csza * cvza)

        f_iso = args[..., 0][..., None, None, None]
        f_vol = args[..., 1][..., None, None, None]
        f_geo = args[..., 2][..., None, None, None]
        return (f_iso + f_vol * k_vol + f_geo * k_geo) / jnp.pi
