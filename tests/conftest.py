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
#
# 32 virtual devices, not 8: the CPU client's shared "XLAEigen" worker pool
# is sized by the DEVICE COUNT, and XLA:CPU's thunk executor runs dataflow-
# independent all-reduces of one launch in arbitrary per-device order — on
# an exactly-sized pool every worker can end up parked in some collective's
# in-process rendezvous while the missing participant's thunk sits in the
# queue forever, and rendezvous.cc ABORTS the process after 40 s ("Fatal
# Python error: Aborted"; the round-1/round-2 intermittent full-suite
# crash).  Meshes in tests use the first 8 devices (sharding.make_mesh
# slices), so the pool has 4x slack over the worst-case number of
# simultaneously-blocked collective participants.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=32").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")
# Second prong of the deadlock containment: synchronous dispatch, so two
# LAUNCHES of sharded programs never have their collectives in flight
# simultaneously (the same pool-exhaustion mechanism applies across
# launches).  Unit-tier programs are tiny; cost is negligible.
# (gloo collectives were tried instead and hang outright in single-process
# mode; the in-process communicator + pool slack + serial dispatch is the
# reliable combination.)
jax.config.update("jax_cpu_enable_async_dispatch", False)


import sys

sys.path.insert(0, _ROOT)

# persistent compilation cache, keyed by host-CPU fingerprint: a cache of
# XLA:CPU AOT executables from a different microarchitecture can abort or
# SIGILL mid-run (see chinese_asr_tpu/utils/compile_cache.py).  Warm suite
# ~3 min vs ~10 cold.
from chinese_asr_tpu.utils import compile_cache

compile_cache.configure(_ROOT, cpu=True, min_compile_secs=0.5)


# ---------------------------------------------------------------------------
# Opt-out fixture for programs whose XLA:CPU AOT (de)serialization is
# poisonous.  Round 4 found a reproducible (4/4 full-suite runs, two
# distinct cache states) SIGSEGV inside backend.deserialize_executable /
# executable.serialize() for ONE program — the small-config
# beam_decode_best_jit compiled by the wire transcript-parity tests —
# and only in late-suite process state (the same entry reads/writes fine
# in isolation).  Disabling the persistent cache around those tests'
# compiles avoids both paths; everything else keeps the warm cache.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402


@pytest.fixture
def no_persistent_compile_cache():
    # NOTE: jax 0.9's `jax_enable_compilation_cache` is consulted through
    # a process-lifetime latch (compilation_cache.is_cache_used) and
    # _cache_write never re-checks it, so flipping it mid-process is a
    # no-op (verified: a full-suite run still wrote entries under the
    # flipped flag).  The min-compile-time threshold IS read live on
    # every write, so raise it beyond reach; with no entries ever written
    # for these programs, reads always miss and the crashing
    # deserialize_executable path is never reached either.
    old = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    try:
        yield
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", old)
