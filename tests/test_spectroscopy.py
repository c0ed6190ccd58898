"""Voigt/Faddeeva vs scipy.special.wofz + line absorber behavior."""

import numpy as np
from scipy.special import wofz as scipy_wofz

import jax.numpy as jnp

from sasktran2_tpu.optical.lineshape import voigt_profile, wofz
from sasktran2_tpu.optical.line_absorber import LineAbsorber, LineCatalogue


def test_wofz_vs_scipy():
    rng = np.random.default_rng(0)
    x = rng.uniform(-30, 30, 2000)
    y = 10 ** rng.uniform(-4, 1.5, 2000)
    z = x + 1j * y
    ours = np.asarray(wofz(jnp.asarray(z)))
    ref = scipy_wofz(z)
    rel = np.abs(ours - ref) / np.maximum(np.abs(ref), 1e-300)
    assert rel.max() < 2e-4


def test_voigt_normalization():
    """Voigt profile integrates to ~1."""
    nu = np.linspace(-150.0, 150.0, 400001)
    prof = np.asarray(voigt_profile(jnp.asarray(nu), 0.0, 0.5, 0.3))
    integral = np.trapezoid(prof, nu)
    # Lorentzian wings beyond +-150 hold ~0.13% of the area
    np.testing.assert_allclose(integral, 1.0, rtol=5e-3)


def test_line_absorber_basic():
    """Single line: peak at (shifted) center, integrated strength matches
    the temperature-scaled intensity, pressure broadening widens it."""
    cat = LineCatalogue(
        nu0=np.array([1000.0]),
        intensity=np.array([1e-20]),
        gamma_air=np.array([0.07]),
        gamma_self=np.array([0.09]),
        n_air=np.array([0.7]),
        delta_air=np.array([-0.005]),
        elower=np.array([100.0]),
        molar_mass=0.044,
    )
    absorber = LineAbsorber(cat)
    grid = np.linspace(995.0, 1005.0, 4001)
    xs_ref = absorber.cross_section_grid(grid, 101325.0, 296.0)[0]
    # at 296 K / 1 atm, integrated xs (cm^-1 * m^2) = S * 1e-4 (area ~ within cutoff)
    integral = np.trapezoid(xs_ref, grid)
    np.testing.assert_allclose(integral, 1e-20 * 1e-4, rtol=2e-2)
    ipeak = np.argmax(xs_ref)
    assert abs(grid[ipeak] - (1000.0 - 0.005)) < 0.01

    xs_low = absorber.cross_section_grid(grid, 10132.5, 296.0)[0]
    # lower pressure -> narrower, taller line
    assert xs_low.max() > xs_ref.max()
    # colder -> stronger line for low E" (Boltzmann)
    xs_cold = absorber.cross_section_grid(grid, 101325.0, 230.0)[0]
    assert np.trapezoid(xs_cold, grid) > integral
