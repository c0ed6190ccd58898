"""Independent brute-force discrete-ordinates reference for tests.

Solves the same discretized DO equations as ``sasktran2_tpu.rt.disco`` but
with a completely different algorithm: dense matrix exponentials per layer,
a global 2N x 2N transfer-matrix boundary-value solve, and numerical
(Simpson) source-function integration at user angles. No eigendecomposition,
no Green's functions, no divided differences — so shared-bug risk with the
production solver is minimal. Only usable for small cases (moderate optical
depth, few layers) due to transfer-matrix growth.

``solve_brute_vector`` is the polarized (I, Q, U) analog: the same
generalized-spherical mode formulation as ``rt/disco_vec.py`` (transformed
frame with the downwelling-U sign flip) but again solved with dense
``expm`` + a global pivoted BVP + trapezoid source integration.
"""

from __future__ import annotations

import numpy as np
from scipy.linalg import expm

from sasktran2_tpu.ops.quadrature import streams
from sasktran2_tpu.ops.wigner import normalized_alp, wigner_d


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


def _pi_matrices_np(mu_vals, m, lmax):
    """Pi_l^m matrices [L, n, 3, 3] (same generalized-spherical basis as
    disco_vec._pi_matrices — the basis is shared, the solver is not)."""
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


def solve_brute_vector(
    dtau, omega, a1, a2, a3, b1, albedo, mu0, nstr,
    user_mu, user_up, user_azimuth,
    num_azimuth=None, include_ss=True, nsub=250,
):
    """Polarized DO solve for one wavelength; returns radiance [U, 3]
    (F0=1, sun-normalized, output Stokes in the meridian convention of
    disco_vec: (I, Q) ~ cos m(pi - dphi), U ~ sin m(pi - dphi))."""
    dtau = np.asarray(dtau, dtype=np.float64)
    omega = np.minimum(np.asarray(omega, dtype=np.float64), 1 - 1e-9)
    a1 = np.asarray(a1, dtype=np.float64)
    P, L = a1.shape
    N = nstr // 2
    K = 3 * N
    mu, w = streams(nstr)
    if num_azimuth is None:
        num_azimuth = min(nstr, L)
    L = min(L, nstr)
    a1, a2, a3, b1 = (x[:, :L] for x in (a1, a2, a3, b1))

    # B_l greek matrices [P, L, 3, 3]
    z = np.zeros_like(a1)
    bg = np.zeros((P, L, 3, 3))
    bg[..., 0, 0] = a1
    bg[..., 0, 1] = -b1
    bg[..., 1, 0] = -b1
    bg[..., 1, 1] = a2
    bg[..., 2, 2] = a3

    mu_f = np.repeat(mu, 3)
    w_f = np.repeat(w, 3)
    Minv = np.diag(1.0 / mu_f)
    Wf = np.diag(w_f)
    dsign = np.array([1.0, 1.0, -1.0])
    theta0 = np.arccos(np.clip(mu0, -1.0, 1.0))

    U = len(user_mu)
    rad = np.zeros((U, 3))
    up_sel = np.asarray(user_up, dtype=bool)
    cum = np.concatenate([[0.0], np.cumsum(dtau)])
    t_top = np.exp(-cum[:-1] / mu0)
    sbar = np.full(P, 1.0 / mu0)

    for m in range(num_azimuth):
        pi_s = _pi_matrices_np(mu, m, L)           # [L, N, 3, 3]
        pi_u = _pi_matrices_np(np.asarray(user_mu), m, L)
        d0_sun = wigner_d(np.array(theta0), m, 0, L)  # [L]
        nu = (-1.0) ** (np.arange(L) + m)
        nud = nu[:, None, None] * np.diag(dsign)[None]  # [L, 3, 3]

        Hs, vs = [], []
        for p in range(P):
            # same/diff kernels [K, K] (transformed frame)
            s_same = np.zeros((K, K))
            s_diff = np.zeros((K, K))
            for l in range(L):
                pb = pi_s[l] @ bg[p, l]            # [N, 3, 3]
                for i in range(N):
                    for j in range(N):
                        blk = pb[i] @ pi_s[l][j].T
                        s_same[3*i:3*i+3, 3*j:3*j+3] += 0.5 * omega[p] * blk
                        s_diff[3*i:3*i+3, 3*j:3*j+3] += (
                            0.5 * omega[p] * pb[i] @ nud[l] @ pi_s[l][j].T
                        )
            alpha = Minv @ (np.eye(K) - s_same @ Wf)
            betam = Minv @ (s_diff @ Wf)
            H = np.block([[alpha, -betam], [betam, -alpha]])
            cfac = (2.0 - (m == 0)) * omega[p] / (4 * np.pi)
            qp = np.zeros(K)
            qm = np.zeros(K)
            for l in range(L):
                col = (pi_s[l] @ bg[p, l])[..., :, 0]  # [N, 3]
                qp += (nu[l] * d0_sun[l]) * col.ravel()
                qm += d0_sun[l] * col.ravel()
            qp *= cfac
            qm *= cfac
            q0 = np.concatenate([-Minv @ qp, Minv @ qm]) * t_top[p]
            v = -np.linalg.solve(H + sbar[p] * np.eye(2 * K), q0)
            Hs.append(H)
            vs.append(v)

        n2 = 2 * K
        nun = (P + 1) * n2
        G = np.zeros((nun, nun))
        r = np.zeros(nun)
        row = 0
        G[row:row + K, K:n2] = np.eye(K)
        row += K
        for p in range(P):
            E = expm(Hs[p] * dtau[p])
            decay = np.exp(-sbar[p] * dtau[p])
            G[row:row + n2, p * n2:(p + 1) * n2] = E
            G[row:row + n2, (p + 1) * n2:(p + 2) * n2] = -np.eye(n2)
            r[row:row + n2] = E @ vs[p] - vs[p] * decay
            row += n2
        refl = np.zeros((K, K))
        direct = np.zeros(K)
        if m == 0:
            # Lambertian: reflects the I components only
            iidx = 3 * np.arange(N)
            refl[np.ix_(iidx, iidx)] = (
                2.0 * albedo * np.ones((N, 1)) @ (w * mu)[None, :]
            )
            direct[iidx] = albedo * mu0 / np.pi * np.exp(-cum[-1] / mu0)
        G[row:row + K, P * n2:P * n2 + K] = np.eye(K)
        G[row:row + K, P * n2 + K:(P + 1) * n2] = -refl
        r[row:row + K] = direct
        states = np.linalg.solve(G, r).reshape(P + 1, n2)

        def layer_fields(p):
            ts = np.linspace(0, dtau[p], nsub + 1)
            e_sub = expm(Hs[p] * (dtau[p] / nsub))
            xs = np.empty((nsub + 1, n2))
            h = states[p] - vs[p]
            for j_ in range(nsub + 1):
                xs[j_] = h
                h = e_sub @ h
            return ts, xs + vs[p] * np.exp(-sbar[p] * ts)[:, None]

        def sources_layer(p, up):
            """Transformed-frame Stokes J at user dirs: [T, U, 3]."""
            ts, I_all = layer_fields(p)
            T = len(ts)
            Ip = I_all[:, :K].reshape(T, N, 3)
            Im = I_all[:, K:].reshape(T, N, 3)
            jvals = np.zeros((T, U, 3))
            cfac = (2.0 - (m == 0)) * omega[p] / (4 * np.pi)
            for l in range(L):
                # stream sums g_l [T, 3]: sum_j w_j [Pi^T I+ + nu D Pi^T I-]
                t1 = np.einsum("jts,Tjt,j->Ts", pi_s[l], Ip, w)
                t2 = np.einsum("jts,Tjt,j->Ts", pi_s[l], Im, w)
                g = t1 + (t2 * dsign[None, :]) * nu[l]   # [T, 3]
                if up:
                    piu = pi_u[l]                        # [U, 3, 3]
                else:
                    # Pi_l(-mu) = nu_l D Pi_l(mu) D
                    piu = nu[l] * (
                        dsign[:, None] * pi_u[l] * dsign[None, :]
                    )
                jvals += 0.5 * omega[p] * np.einsum(
                    "ust,Tt->Tus", piu @ bg[p, l], g
                )
            if include_ss:
                beam = np.zeros((U, 3))
                for l in range(L):
                    if up:
                        piu = pi_u[l]
                        fac = nu[l] * d0_sun[l]
                    else:
                        piu = nu[l] * (
                            dsign[:, None] * pi_u[l] * dsign[None, :]
                        )
                        fac = nu[l] * d0_sun[l]
                    beam += fac * (piu @ bg[p, l])[..., :, 0]
                decay_t = (t_top[p] * np.exp(-sbar[p] * ts))[:, None, None]
                jvals = jvals + cfac * beam[None] * decay_t
            return ts, jvals

        out_m = np.zeros((U, 3))
        if np.any(up_sel):
            Ig = states[P]
            ground_up = (refl @ Ig[K:])  # [K]
            gval = ground_up[:3] if m == 0 else np.zeros(3)
            if include_ss and m == 0:
                gval = gval + direct[:3]
            for p in range(P):
                ts, js = sources_layer(p, True)
                for ui in np.where(up_sel)[0]:
                    muu = user_mu[ui]
                    integ = js[:, ui, :] * (
                        np.exp(-ts / muu) / muu
                    )[:, None]
                    out_m[ui] += np.exp(-cum[p] / muu) * np.trapezoid(
                        integ, ts, axis=0
                    )
            for ui in np.where(up_sel)[0]:
                out_m[ui] += np.exp(-cum[-1] / user_mu[ui]) * gval
        if np.any(~up_sel):
            for p in range(P):
                ts, js = sources_layer(p, False)
                for ui in np.where(~up_sel)[0]:
                    muu = user_mu[ui]
                    integ = js[:, ui, :] * (
                        np.exp(-(dtau[p] - ts) / muu) / muu
                    )[:, None]
                    below = cum[-1] - cum[p + 1]
                    out_m[ui] += np.exp(-below / muu) * np.trapezoid(
                        integ, ts, axis=0
                    )

        # azimuth synthesis; downwelling sources were evaluated with the
        # physical Pi(-mu) = nu D Pi D, so they are already untransformed
        dphi = np.asarray(user_azimuth)
        cosm = np.cos(m * (np.pi - dphi))
        sinm = np.sin(m * (np.pi - dphi))
        for ui in range(U):
            rad[ui, 0] += cosm[ui] * out_m[ui, 0]
            rad[ui, 1] += cosm[ui] * out_m[ui, 1]
            rad[ui, 2] += sinm[ui] * out_m[ui, 2]
    return rad
