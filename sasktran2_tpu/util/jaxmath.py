"""Small JAX numerics helpers shared across the solver stack."""

from __future__ import annotations

import jax.numpy as jnp


def safe_div(num, denom, fill=0.0):
    """``num / denom`` with zero (or ``fill``) where ``denom == 0``, safe in
    both the forward AND backward pass.

    The naive ``num / jnp.maximum(denom, tiny)`` guard is NOT autodiff-safe:
    the VJP of the division contains ``num / denom**2`` and ``tiny**2``
    underflows to zero, producing 0/0 = NaN cotangents that then poison
    every gradient contracted with them.  The double-where pattern keeps
    both branches finite in forward and reverse mode.
    """
    ok = denom != 0.0
    safe = jnp.where(ok, denom, 1.0)
    return jnp.where(ok, num / safe, fill)
