"""Test config: force the CPU backend with 8 virtual devices so the unit
tier and the multi-chip sharding tests run anywhere (no TPU needed)."""

import faulthandler
import os

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Fatal-signal tracebacks go to a file, not stderr: when CI pipes output,
# the dying process truncates mid-write and the cause is lost (this is how
# the round-1 "Fatal Python error" was finally captured).  Registered after
# pytest's own faulthandler plugin, so this file wins.
faulthandler.enable(open(os.path.join(_ROOT, ".crash.log"), "a"),
                    all_threads=True)

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


import sys

sys.path.insert(0, _ROOT)

# persistent compilation cache, keyed by host-CPU fingerprint: a cache of
# XLA:CPU AOT executables from a different microarchitecture aborts/SIGILLs
# intermittently mid-run — the round-1 full-suite crash root cause (see
# chinese_asr_tpu/utils/compile_cache.py).  Warm suite ~3 min vs ~10 cold.
from chinese_asr_tpu.utils import compile_cache

compile_cache.configure(_ROOT, cpu=True, min_compile_secs=0.5)
