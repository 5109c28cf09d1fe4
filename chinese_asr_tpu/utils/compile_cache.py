"""Persistent-compilation-cache helpers.

The JAX persistent cache stores XLA:CPU AOT executables compiled for the
*exact* machine features of the compiling host.  Loading them on a host
with a different feature set can abort or SIGILL mid-run
(xla cpu_aot_loader.cc warns exactly this).  Keying the CPU cache
directory by a host-feature fingerprint makes a foreign cache invisible
instead of fatal.  TPU executables are target-keyed by the compiler, so
the TPU cache dir stays stable.

(Note: the round-1 full-test-suite "Fatal Python error" crash, once
attributed to a foreign cache, was actually the XLA:CPU collective
rendezvous deadlock — see tests/conftest.py.  The fingerprinting stays as
hygiene: foreign-cache loads do happen and do warn.)
"""

from __future__ import annotations

import hashlib
import os


def cpu_fingerprint() -> str:
    """Stable hash of the host CPU identity.

    Flags alone are NOT enough: XLA also derives tuning target features
    (e.g. ``prefer-no-gather`` on some microarchitectures) from the CPU
    *model*, so two hosts with identical flag lines can still produce
    mutually-foreign AOT executables.  Hash model identity + flags."""
    keys = ("vendor_id", "cpu family", "model\t", "model name", "stepping",
            "flags")
    picked = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if any(line.startswith(k) for k in keys):
                    picked.append(line)
                if line.strip() == "" and picked:
                    break               # first core only; all cores match
        if picked:
            return hashlib.sha1("".join(picked).encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return platform.machine()


def configure(repo_root: str, cpu: bool,
              min_compile_secs: float = 1.0) -> str:
    """Point jax's persistent compilation cache at the right directory:
    ``.jax_cache`` for TPU runs, ``.jax_cache_cpu/<fingerprint>`` for CPU
    runs.  Returns the directory."""
    import jax
    if cpu:
        path = os.path.join(repo_root, ".jax_cache_cpu", cpu_fingerprint())
    else:
        path = os.path.join(repo_root, ".jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
