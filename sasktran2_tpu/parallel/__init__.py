from .sharding import (
    make_mesh,
    shard_core,
    shard_core_wavelength,
    sharded_radiance_fn,
)

__all__ = [
    "make_mesh",
    "shard_core",
    "shard_core_wavelength",
    "sharded_radiance_fn",
]
