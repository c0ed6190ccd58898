from .sharding import make_mesh, shard_core, sharded_radiance_fn

__all__ = ["make_mesh", "shard_core", "sharded_radiance_fn"]
