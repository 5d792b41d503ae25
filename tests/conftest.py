"""Test bootstrap: force CPU backend with 8 virtual devices (multi-chip
sharding tests run on a virtual mesh — SURVEY.md §4) and enable x64 so the
reference's float64/int64 conformance matrix is coverable."""
import os

# Force CPU: unit tests run on an 8-device virtual CPU mesh; TPU runs happen
# via bench.py / explicit scripts.  NOTE the JAX_PLATFORMS env var is NOT
# honored when an out-of-tree platform plugin (axon TPU tunnel) is installed —
# only the config update below reliably restricts the backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: the eager facade triggers many small compiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
