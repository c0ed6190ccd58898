import os

# Tests run on CPU with float64 and a virtual 8-device mesh for sharding
# tests. Real-TPU benching happens in bench.py, not under pytest.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon (the TPU tunnel); override after the fact. Backends are
# lazily initialized, so this still takes effect as long as no computation
# ran yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite re-jits many engine variants;
# caching across runs cuts wall time dramatically.
_cache_dir = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
