"""Multi-chip sharding of the radiative transfer pipeline.

The reference parallelizes wavelengths over OpenMP/Rayon threads
(``cpp/lib/engine/engine.cpp:560-572``, ``rust .../bindings/engine.rs:164-266``).
On TPU the same axis maps onto a device mesh: wavelength is the data-
parallel dimension, sharded with ``jax.sharding.NamedSharding`` so every
chip solves its own block of the (wavelength x SZA x azimuth) batch. The
forward+VJP pipeline is embarrassingly parallel along wavelength; XLA
inserts no collectives on the hot path, and output gathers ride ICI.

A second mesh axis ("los") is reserved for sharding very large line-of-
sight sets in the postprocessing contraction (useful for limb scans with
hundreds of rays); the solve itself is replicated over that axis.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_wavelength: int | None = None, n_los: int = 1, devices=None):
    """Create a (wavelength, los) device mesh. Defaults to all devices on
    the wavelength axis."""
    if devices is None:
        devices = jax.devices()
    if n_wavelength is None:
        n_wavelength = len(devices) // n_los
    dev_array = np.asarray(devices[: n_wavelength * n_los]).reshape(
        n_wavelength, n_los
    )
    return Mesh(dev_array, ("wavelength", "los"))


def shard_core(core: dict, mesh: Mesh):
    """Place a core-input pytree with the wavelength axis sharded."""
    spec = {
        "extinction": P("wavelength", None),
        "ssa": P("wavelength", None),
        "leg_coeff": P("wavelength", None, None),
        "albedo": P("wavelength"),
        "emission": P("wavelength", None),
        "solar_irradiance": P("wavelength"),
    }
    return {
        k: jax.device_put(v, NamedSharding(mesh, spec.get(k, P())))
        for k, v in core.items()
    }


def shard_core_wavelength(core: dict, mesh: Mesh):
    """Shard EVERY core array along its leading (wavelength) axis on the
    mesh's "wavelength" axis, zero-padding the batch up to a multiple of
    the axis size. Returns (sharded_core, original_W).

    This is the generic entry used by ``Engine.calculate_radiance(...,
    mesh=)`` — every core-pytree leaf is wavelength-leading by
    construction (the engine's batch convention), so the partition spec is
    uniform."""
    n_shard = mesh.shape["wavelength"]
    W = next(iter(core.values())).shape[0]
    pad = (-W) % n_shard
    out = {}
    for k, v in core.items():
        if pad:
            widths = [(0, pad)] + [(0, 0)] * (v.ndim - 1)
            import jax.numpy as jnp

            v = jnp.pad(v, widths)
        spec = P("wavelength", *([None] * (v.ndim - 1)))
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out, W


def sharded_radiance_fn(fn, mesh: Mesh):
    """jit ``fn(core) -> (radiance, grads)`` with wavelength-sharded inputs
    and outputs. ``fn`` must be vmapped over the leading wavelength axis."""
    in_spec = {
        "extinction": P("wavelength", None),
        "ssa": P("wavelength", None),
        "leg_coeff": P("wavelength", None, None),
        "albedo": P("wavelength"),
        "emission": P("wavelength", None),
        "solar_irradiance": P("wavelength"),
    }
    in_shardings = ({
        k: NamedSharding(mesh, s) for k, s in in_spec.items()
    },)
    return jax.jit(fn, in_shardings=in_shardings)
