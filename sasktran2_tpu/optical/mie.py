"""Mie scattering: batched JAX implementation.

Replaces the reference's Rust Mie engine
(``/root/reference/rust/sasktran2-rs/src/mie/mod.rs:300-360``,
``src/optical/mie/worker.rs``) with a vectorized JAX computation: the
Dn continued-fraction/downward recurrence and the Riccati-Bessel upward
recurrences run as ``lax.scan`` over the multipole order with the size-
parameter batch as the vector axis, so one call evaluates an entire
wavelength x particle-size grid.

Conventions match standard Mie theory (Bohren & Huffman):
  an, bn multipole coefficients; Qext = 2/x^2 sum (2n+1) Re(an+bn);
  S1/S2 amplitude functions via pi_n/tau_n angular functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _nmax_for(x_max: float) -> int:
    return int(np.ceil(x_max + 4.05 * x_max ** (1.0 / 3.0) + 2.0)) + 1


def mie_coefficients(x, m, nmax: int | None = None):
    """Mie an/bn for a batch of size parameters.

    x : [...] real size parameters (> 0)
    m : complex refractive index (scalar or broadcastable to x)
    Returns (an, bn) each [..., nmax] complex.
    """
    x = jnp.asarray(x)
    cdtype = jnp.complex128 if x.dtype == jnp.float64 else jnp.complex64
    if nmax is None:
        nmax = _nmax_for(float(jnp.max(x)))
    m = jnp.asarray(m, dtype=cdtype)
    mx = m * x.astype(cdtype)

    # Downward recurrence for D_n(mx), starting well above nmax
    nstart = nmax + 15
    def d_down(carry, n):
        d = carry
        rn = n / mx
        d_prev = rn - 1.0 / (d + rn)
        return d_prev, d_prev

    # iterate n = nstart .. 1; collect D_{n-1}; we need D_1..D_nmax
    ns = jnp.arange(nstart, 0, -1, dtype=x.dtype)
    d_init = jnp.zeros_like(mx)
    _, d_all = jax.lax.scan(d_down, d_init, ns)
    # d_all[i] = D_{ns[i]-1}; so D_n = d_all[nstart - 1 - n] for n in 0..nstart-1
    d_all = jnp.flip(d_all, axis=0)  # now index n-1 -> D_{n-1}? reorder below
    # After flip: d_all[k] = D_k for k = 0..nstart-1
    d_n = jnp.moveaxis(d_all[1 : nmax + 1], 0, -1)  # D_1..D_nmax [..., nmax]

    # Upward recurrences for psi_n(x), chi_n(x)
    psi_m1 = jnp.cos(x)  # psi_{-1}
    psi_0 = jnp.sin(x)
    chi_m1 = -jnp.sin(x)  # chi_{-1}
    chi_0 = jnp.cos(x)

    def ricc_up(carry, n):
        (p_prev, p_curr, c_prev, c_curr) = carry
        fac = (2.0 * n - 1.0) / x
        p_next = fac * p_curr - p_prev
        # chi_n grows like (2n-1)!!/x^n for n >> x; in a batch whose nmax
        # is set by its largest member this overflows for the small-x
        # members. Clamp it: the clamped xi only enters a_n/b_n
        # denominators, which then correctly evaluate to ~0 (the true
        # coefficients underflow there anyway).
        c_next = jnp.clip(fac * c_curr - c_prev, -1e250, 1e250)
        return (p_curr, p_next, c_curr, c_next), (p_next, c_next)

    ns_up = jnp.arange(1, nmax + 1, dtype=x.dtype)
    _, (psi, chi) = jax.lax.scan(
        ricc_up, (psi_m1, psi_0, chi_m1, chi_0), ns_up
    )
    psi = jnp.moveaxis(psi, 0, -1)  # psi_1..psi_nmax
    chi = jnp.moveaxis(chi, 0, -1)
    psi_nm1 = jnp.concatenate([psi_0[..., None], psi[..., :-1]], axis=-1)
    chi_nm1 = jnp.concatenate([chi_0[..., None], chi[..., :-1]], axis=-1)

    xi = psi.astype(cdtype) - 1j * chi.astype(cdtype)
    xi_nm1 = psi_nm1.astype(cdtype) - 1j * chi_nm1.astype(cdtype)

    nvec = jnp.arange(1, nmax + 1, dtype=x.dtype)
    nx = nvec / x[..., None]
    da = d_n / m + nx.astype(cdtype)
    db = d_n * m + nx.astype(cdtype)
    an = (da * psi - psi_nm1) / (da * xi - xi_nm1)
    bn = (db * psi - psi_nm1) / (db * xi - xi_nm1)
    return an, bn


def mie_efficiencies(x, m, nmax: int | None = None):
    """(Qext, Qsca) for a batch of size parameters."""
    x = jnp.asarray(x)
    an, bn = mie_coefficients(x, m, nmax)
    n = jnp.arange(1, an.shape[-1] + 1, dtype=x.dtype)
    two_np1 = 2.0 * n + 1.0
    qext = 2.0 / (x * x) * jnp.sum(two_np1 * jnp.real(an + bn), axis=-1)
    qsca = 2.0 / (x * x) * jnp.sum(
        two_np1 * (jnp.abs(an) ** 2 + jnp.abs(bn) ** 2), axis=-1
    )
    return qext, qsca


def _pi_tau(cos_theta, nmax):
    """Angular functions pi_n, tau_n for n = 1..nmax: [..., nmax]."""
    mu = jnp.asarray(cos_theta)

    def step(carry, n):
        pi_nm1, pi_n = carry
        # recurrence: pi_{n+1} = ((2n+1) mu pi_n - (n+1) pi_{n-1}) / n
        pi_np1 = ((2 * n + 1) * mu * pi_n - (n + 1) * pi_nm1) / n
        tau_n = n * mu * pi_n - (n + 1) * pi_nm1
        return (pi_n, pi_np1), (pi_n, tau_n)

    ns = jnp.arange(1, nmax + 1, dtype=mu.dtype)
    init = (jnp.zeros_like(mu), jnp.ones_like(mu))
    _, (pis, taus) = jax.lax.scan(step, init, ns)
    return jnp.moveaxis(pis, 0, -1), jnp.moveaxis(taus, 0, -1)


def mie_amplitudes(x, m, cos_theta, nmax: int | None = None):
    """Scattering amplitudes S1, S2 at the given angles.

    x: [B] size parameters; cos_theta: [T]; returns S1, S2 [B, T] complex.
    """
    x = jnp.asarray(x)
    an, bn = mie_coefficients(x, m, nmax)
    nmax_eff = an.shape[-1]
    pi_n, tau_n = _pi_tau(jnp.asarray(cos_theta), nmax_eff)  # [T, n]
    n = jnp.arange(1, nmax_eff + 1, dtype=x.dtype)
    fac = (2.0 * n + 1.0) / (n * (n + 1.0))
    s1 = jnp.einsum(
        "bn,tn->bt", an * fac, pi_n.astype(an.dtype)
    ) + jnp.einsum("bn,tn->bt", bn * fac, tau_n.astype(an.dtype))
    s2 = jnp.einsum(
        "bn,tn->bt", an * fac, tau_n.astype(an.dtype)
    ) + jnp.einsum("bn,tn->bt", bn * fac, pi_n.astype(an.dtype))
    return s1, s2


class MieOutput:
    """Container mirroring the reference's Mie output surface."""

    def __init__(self, size_parameter, Qext, Qsca, S1=None, S2=None):
        self.size_parameter = np.asarray(size_parameter)
        self.Qext = np.asarray(Qext)
        self.Qsca = np.asarray(Qsca)
        self.S1 = None if S1 is None else np.asarray(S1)
        self.S2 = None if S2 is None else np.asarray(S2)


def compute_mie(size_parameters, refractive_index, cos_angles=None):
    """User-facing Mie evaluation (reference ``sk.mie`` behavior)."""
    x = jnp.asarray(np.atleast_1d(size_parameters), dtype=jnp.float64)
    qext, qsca = mie_efficiencies(x, refractive_index)
    s1 = s2 = None
    if cos_angles is not None:
        s1, s2 = mie_amplitudes(
            x, refractive_index, jnp.asarray(cos_angles, dtype=jnp.float64)
        )
    return MieOutput(size_parameters, qext, qsca, s1, s2)
