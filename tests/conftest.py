"""Test config: force the CPU backend with 8 virtual devices so the unit
tier and the multi-chip sharding tests run anywhere (no TPU needed)."""

import os

# JAX_PLATFORMS alone is ignored when a PJRT plugin (e.g. the TPU tunnel)
# registers itself; the legacy var + explicit config below both work.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite is compile-dominated (~10 min
# cold); warm reruns drop to a fraction
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache_cpu")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
