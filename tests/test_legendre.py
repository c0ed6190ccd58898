"""Greek-coefficient expansion (reference src/sasktran2/legendre)."""

import numpy as np

from sasktran2_tpu.legendre import compute_greek_coefficients


def _rayleigh_matrix(theta_deg):
    mu = np.cos(np.deg2rad(theta_deg))
    p11 = 0.75 * (1.0 + mu**2)
    p12 = -0.75 * (1.0 - mu**2)
    p22 = p11.copy()
    p33 = 1.5 * mu
    p44 = 1.5 * mu
    p34 = np.zeros_like(mu)
    return p11, p12, p22, p33, p34, p44


def test_rayleigh_greek_coefficients():
    theta = np.linspace(0.0, 180.0, 721)
    p11, p12, p22, p33, p34, p44 = (
        x[None, :] for x in _rayleigh_matrix(theta)
    )
    a1, a2, a3, a4, b1, b2 = compute_greek_coefficients(
        p11, p12, p22, p33, p34, p44, theta, 6
    )
    np.testing.assert_allclose(a1[0, :4], [1.0, 0.0, 0.5, 0.0], atol=2e-4)
    np.testing.assert_allclose(a2[0, :4], [0.0, 0.0, 3.0, 0.0], atol=6e-4)
    np.testing.assert_allclose(a3[0, :4], 0.0, atol=6e-4)
    np.testing.assert_allclose(a4[0, :4], [0.0, 1.5, 0.0, 0.0], atol=2e-4)
    np.testing.assert_allclose(
        b1[0, :4], [0.0, 0.0, -np.sqrt(6.0) / 2.0, 0.0], atol=4e-4
    )
    np.testing.assert_allclose(b2[0], 0.0, atol=1e-10)


def test_hg_phase_function_expansion():
    """Scalar HG phase recovers beta_l = (2l+1) g^l in the a1 channel."""
    g = 0.6
    theta = np.linspace(0.0, 180.0, 2001)
    mu = np.cos(np.deg2rad(theta))
    p = (1.0 - g**2) / (1.0 + g**2 - 2.0 * g * mu) ** 1.5
    zeros = np.zeros_like(p)
    # num_coeff controls the quadrature resolution too; request more
    # coefficients than checked so the projection integral is converged
    nc = 32
    a1, *_ = compute_greek_coefficients(
        p[None], zeros[None], zeros[None], zeros[None], zeros[None],
        zeros[None], theta, nc,
    )
    ls = np.arange(12)
    np.testing.assert_allclose(
        a1[0, :12], (2 * ls + 1) * g**ls, rtol=1e-6
    )
