"""Independent brute-force discrete-ordinates reference for tests.

Solves the same discretized DO equations as ``sasktran2_tpu.rt.disco`` but
with a completely different algorithm: dense matrix exponentials per layer,
a global 2N x 2N transfer-matrix boundary-value solve, and numerical
(Simpson) source-function integration at user angles. No eigendecomposition,
no Green's functions, no divided differences — so shared-bug risk with the
production solver is minimal. Only usable for small cases (moderate optical
depth, few layers) due to transfer-matrix growth.
"""

from __future__ import annotations

import numpy as np
from scipy.linalg import expm

from sasktran2_tpu.ops.quadrature import streams
from sasktran2_tpu.ops.wigner import normalized_alp


def solve_brute(
    dtau,
    omega,
    beta,
    albedo,
    mu0,
    nstr,
    user_mu,
    user_up,
    user_azimuth,
    num_azimuth=None,
    include_ss=True,
    nsub=250,
):
    """Scalar DO solve for one wavelength; returns radiance[U] (F0=1).

    dtau, omega: [P]; beta: [P, L] (beta_0=1); albedo, mu0 scalars.
    """
    dtau = np.asarray(dtau, dtype=np.float64)
    omega = np.minimum(np.asarray(omega, dtype=np.float64), 1 - 1e-9)
    beta = np.asarray(beta, dtype=np.float64)
    P, L = beta.shape
    N = nstr // 2
    mu, w = streams(nstr)
    if num_azimuth is None:
        num_azimuth = min(nstr, L)
    # match the production truncation: at most nstr moments in the DO solve
    L = min(L, nstr)
    beta = beta[:, :L]

    U = len(user_mu)
    rad = np.zeros(U)
    for m in range(num_azimuth):
        lam = normalized_alp(mu, m, L)  # [L, N]
        lam0 = normalized_alp(np.array(mu0), m, L)  # [L]
        lamu = normalized_alp(np.asarray(user_mu), m, L)  # [L, U]
        nu = (-1.0) ** (np.arange(L) + m)

        rad_m = _solve_mode(
            m, dtau, omega, beta, albedo, mu0, mu, w, lam, lam0, lamu, nu,
            user_mu, user_up, include_ss, nsub,
        )
        rad += rad_m * np.cos(m * (np.pi - np.asarray(user_azimuth)))
    return rad


def _solve_mode(
    m, dtau, omega, beta, albedo, mu0, mu, w, lam, lam0, lamu, nu,
    user_mu, user_up, include_ss, nsub,
):
    P, L = beta.shape
    N = len(mu)
    M = np.diag(mu)
    Minv = np.diag(1.0 / mu)
    W = np.diag(w)

    # Per-layer system matrices and beam sources
    Hs, vs, q0s = [], [], []
    sbar = np.full(P, 1.0 / mu0)
    cum = np.concatenate([[0.0], np.cumsum(dtau)])
    t_top = np.exp(-cum[:-1] / mu0)
    for p in range(P):
        s_same = 0.5 * omega[p] * (lam.T * beta[p]) @ lam
        s_diff = 0.5 * omega[p] * (lam.T * (beta[p] * nu)) @ lam
        alpha = Minv @ (np.eye(N) - s_same @ W)
        betam = Minv @ (s_diff @ W)
        H = np.block([[alpha, -betam], [betam, -alpha]])
        cfac = (2.0 - (m == 0)) * omega[p] / (4 * np.pi)
        qp = cfac * (lam.T * beta[p]) @ (nu * lam0)
        qm = cfac * (lam.T * beta[p]) @ lam0
        q0 = np.concatenate([-Minv @ qp, Minv @ qm]) * t_top[p]
        v = -np.linalg.solve(H + sbar[p] * np.eye(2 * N), q0)
        Hs.append(H)
        vs.append(v)
        q0s.append(q0)

    # Global dense BVP on the layer-top states s_p (2N each, p = 0..P-1)
    # plus the ground state s_P. Within-layer propagation:
    #   s_{p+1} = E_p (s_p - v_p) + v_p decay_p
    # Composing transfer matrices across layers overflows (e^{+k tau}
    # growth), so assemble one dense (P+1)*2N system with per-layer blocks
    # and solve with partial pivoting instead.
    n2 = 2 * N
    nun = (P + 1) * n2
    G = np.zeros((nun, nun))
    r = np.zeros(nun)
    row = 0
    # TOA: I-(top of layer 0) = 0
    G[row : row + N, N:n2] = np.eye(N)
    row += N
    for p in range(P):
        E = expm(Hs[p] * dtau[p])
        decay = np.exp(-sbar[p] * dtau[p])
        G[row : row + n2, p * n2 : (p + 1) * n2] = E
        G[row : row + n2, (p + 1) * n2 : (p + 2) * n2] = -np.eye(n2)
        r[row : row + n2] = E @ vs[p] - vs[p] * decay
        row += n2
    refl = np.zeros((N, N))
    direct = np.zeros(N)
    if m == 0:
        refl = 2.0 * albedo * np.ones((N, 1)) @ (w * mu)[None, :]
        direct = albedo * mu0 / np.pi * np.exp(-cum[-1] / mu0) * np.ones(N)
    # Ground: I+g - R I-g = direct
    G[row : row + N, P * n2 : P * n2 + N] = np.eye(N)
    G[row : row + N, P * n2 + N : (P + 1) * n2] = -refl
    r[row : row + N] = direct
    states = np.linalg.solve(G, r).reshape(P + 1, n2)

    def layer_fields(p):
        """Fields at nsub+1 equally spaced depths within layer p via iterated
        sub-step propagation (one expm per layer)."""
        ts = np.linspace(0, dtau[p], nsub + 1)
        e_sub = expm(Hs[p] * (dtau[p] / nsub))
        xs = np.empty((nsub + 1, 2 * N))
        h = states[p] - vs[p]
        for j in range(nsub + 1):
            xs[j] = h
            h = e_sub @ h
        return ts, xs + vs[p] * np.exp(-sbar[p] * ts)[:, None]

    def sources_layer(p, mu_dir_sign):
        """J at user directions for all sub-points: [nsub+1, U]."""
        ts, I_all = layer_fields(p)
        Ip, Im = I_all[:, :N], I_all[:, N:]
        lam_dir = lamu * np.where(mu_dir_sign < 0, nu[:, None], 1.0)  # [L, U]
        stream = (Ip @ (w * lam).T) + (Im @ (w * lam).T) * nu[None, :]  # [T, L]
        jvals = 0.5 * omega[p] * stream @ (beta[p][:, None] * lam_dir)  # [T, U]
        cfac = (2.0 - (m == 0)) * omega[p] / (4 * np.pi)
        beam_amp = (beta[p] * nu * lam0) @ lam_dir  # [U]
        if include_ss:
            jvals = jvals + cfac * beam_amp[None, :] * (
                t_top[p] * np.exp(-sbar[p] * ts)
            )[:, None]
        return ts, jvals

    U = len(user_mu)
    out = np.zeros(U)
    up_sel = np.asarray(user_up, dtype=bool)
    if np.any(up_sel):
        Ig = states[P]
        ground_up = refl @ Ig[N:]
        gval = ground_up[0] if m == 0 else 0.0
        if include_ss and m == 0:
            gval += direct[0]
        for p in range(P):
            ts, js = sources_layer(p, +1)
            for ui in np.where(up_sel)[0]:
                muu = user_mu[ui]
                integrand = js[:, ui] * np.exp(-ts / muu) / muu
                out[ui] += np.exp(-cum[p] / muu) * np.trapezoid(integrand, ts)
        for ui in np.where(up_sel)[0]:
            out[ui] += np.exp(-cum[-1] / user_mu[ui]) * gval
    if np.any(~up_sel):
        for p in range(P):
            ts, js = sources_layer(p, -1)
            for ui in np.where(~up_sel)[0]:
                muu = user_mu[ui]
                integrand = js[:, ui] * np.exp(-(dtau[p] - ts) / muu) / muu
                below = cum[-1] - cum[p + 1]
                out[ui] += np.exp(-below / muu) * np.trapezoid(integrand, ts)
    return out
