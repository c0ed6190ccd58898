"""Line-shape functions: complex probability function and Voigt profile.

Replaces the reference's optimized Rust error functions
(``/root/reference/rust/sasktran2-rs/src/math/errorfunctions/optimized.rs``)
with a JAX implementation of Humlicek's w4 rational approximations —
region-selected with ``jnp.where`` so the whole spectral grid evaluates
branch-free and fully batched on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

SQRT_PI = 1.7724538509055159
INV_SQRT_PI = 1.0 / SQRT_PI


def wofz(z):
    """Faddeeva function w(z) = exp(-z^2) erfc(-iz) for Im(z) >= 0.

    Humlicek (1982) w4 algorithm, vectorized with region masks.
    Relative accuracy ~1e-4 (sufficient for Voigt in radiative transfer;
    the reference uses similarly-accurate optimized approximations).
    """
    z = jnp.asarray(z)
    x = jnp.real(z)
    y = jnp.imag(z)
    t = y - 1j * x
    s = jnp.abs(x) + y

    # region 1: s >= 15
    w1 = t * INV_SQRT_PI / (0.5 + t * t)

    # region 2: 5.5 <= s < 15
    u = t * t
    w2 = t * (1.410474 + u * INV_SQRT_PI) / (0.75 + u * (3.0 + u))

    # region 3: s < 5.5 and y >= 0.195 |x| - 0.176
    w3 = (
        16.4955
        + t * (20.20933 + t * (11.96482 + t * (3.778987 + t * 0.5642236)))
    ) / (
        16.4955
        + t * (38.82363 + t * (39.27121 + t * (21.69274 + t * (6.699398 + t))))
    )

    # region 4: remainder
    u = t * t
    numer = t * (
        36183.31
        - u * (3321.9905
               - u * (1540.787
                      - u * (219.0313
                             - u * (35.76683
                                    - u * (1.320522 - u * 0.56419)))))
    )
    denom = (
        32066.6
        - u * (24322.84
               - u * (9022.228
                      - u * (2186.181
                             - u * (364.2191
                                    - u * (61.57037
                                           - u * (1.841439 - u))))))
    )
    w4 = jnp.exp(u) - numer / denom

    out = jnp.where(
        s >= 15.0,
        w1,
        jnp.where(
            s >= 5.5,
            w2,
            jnp.where(y >= 0.195 * jnp.abs(x) - 0.176, w3, w4),
        ),
    )
    return out


def voigt_profile(nu, nu0, doppler_width, lorentz_width):
    """Voigt line shape [1/(same units as nu)] normalized to unit area.

    doppler_width: Gaussian HWHM/sqrt(ln 2) parameter alpha_d such that the
    Gaussian part is exp(-(nu-nu0)^2/alpha_d^2)/(alpha_d sqrt(pi)).
    """
    x = (nu - nu0) / doppler_width
    y = lorentz_width / doppler_width
    z = x + 1j * y
    return jnp.real(wofz(z)) / (doppler_width * SQRT_PI)


def voigt_profile_complex(nu, nu0, doppler_width, lorentz_width):
    """(absorption, dispersion) components of the Voigt profile:
    ``Re w(z) / (alpha_d sqrt(pi))`` and ``Im w(z) / (alpha_d sqrt(pi))``.
    The dispersion part enters first-order Rosenkranz line mixing
    (reference ``line_absorber.rs w_jpole_assign`` coupling branch)."""
    x = (nu - nu0) / doppler_width
    y = lorentz_width / doppler_width
    w = wofz(x + 1j * y)
    norm = doppler_width * SQRT_PI
    return jnp.real(w) / norm, jnp.imag(w) / norm


def doppler_width(nu0, temperature_k, molar_mass_kg_mol):
    """alpha_d parameter [same units as nu0]."""
    kb = 1.380649e-23
    na = 6.02214076e23
    mass = molar_mass_kg_mol / na
    c = 299792458.0
    return nu0 / c * np.sqrt(2.0 * kb * temperature_k / mass)
