"""Test config: CPU backend with 8 virtual devices (for sharding tests) and x64.

Note: this image's sitecustomize registers a TPU PJRT plugin at interpreter boot
and pins JAX_PLATFORMS=axon, so we must override via jax.config (env vars set
here would be too late).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the suite is dominated by XLA CPU compiles
# of the trace-unrolled emulator graphs; caching them across runs cuts the
# wall time dramatically on re-runs. GEMMUL8_TEST_NO_COMPCACHE=1 disables it
# (the zstd cache writer has segfaulted under long exhaustive runs).
if os.environ.get("GEMMUL8_TEST_NO_COMPCACHE", "") != "1":
    _cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
