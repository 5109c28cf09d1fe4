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

# NO persistent compilation cache in the suite process — deliberately.
# Round 4 hit a reproducible (7/7 full single-process suite runs)
# SIGSEGV in late-suite process state (~250+ compilations in): with the
# cache configured, inside XLA:CPU AOT executable (de)serialization
# (backend.deserialize_executable on hits, executable.serialize() on
# writes); with the cache fully disabled AND an unlimited stack, inside
# plain backend_compile_and_load.  So the root trigger is XLA:CPU
# compilation itself after many compiles in one process — an
# XLA-internal bug we cannot patch (the same entries compile/read/write
# fine in isolation, the first-party C++ kernels are ASan-clean, a
# torch-then-serialize probe survives).  Containment is two-fold:
# pyproject.toml shards the suite across 2 xdist loadfile workers so no
# process approaches the threshold, and this conftest never initializes
# the persistent cache (per-test opt-outs didn't converge, and jax 0.9
# has no reliable mid-process off-switch: is_cache_used is a
# process-lifetime latch; _cache_write never re-checks the enable flag).
# Tools, bench.py, and the driver entry points still use the persistent
# cache (separate, shorter-lived processes —
# chinese_asr_tpu/utils/compile_cache.py).  Cost: the suite recompiles
# everything, every run; expensive *training* fixtures are disk-cached
# at a higher level instead (tests/fixture_cache.py).
import pytest  # noqa: E402  (kept importable for fixtures below)


@pytest.fixture
def no_persistent_compile_cache():
    """No-op retained for API stability: the suite never configures the
    persistent compilation cache at all (see the comment above)."""
    yield


# Persistent compile cache ON by default — safe again UNDER XDIST
# SHARDING ONLY.  The segfault above is a late-process-compilation bug
# (~250+ compiles in one process); with 2 loadfile workers no process
# approaches the threshold, and 2 consecutive full-tier runs were green
# with the cache on (304 + 314 passed; the warm run took 9:07 vs 29:39
# uncached — the dominant suite cost was recompiling everything, every
# run).  CHINESE_ASR_TEST_COMPILE_CACHE=0 opts out (e.g. to re-probe
# the underlying XLA bug); do NOT remove the xdist addopts while the
# cache is on.
if os.environ.get("CHINESE_ASR_TEST_COMPILE_CACHE", "1") != "0":
    from chinese_asr_tpu.utils import compile_cache
    compile_cache.configure(_ROOT, cpu=True)


# ---------------------------------------------------------------------------
# Quick/full test tiers (VERDICT r3 #3).  The suite's heavy tail — overfit
# trainings, torch differentials, mesh end-to-ends — is marked ``slow``
# from the measured per-test durations of the round-4 full run
# (/tmp/suite_r4b durations; everything >= ~20 s under 2-worker
# contention).  pyproject addopts deselect them by default; run the FULL
# tier with:  python -m pytest tests/ -m "slow or not slow"
# The list lives here (not as per-file decorators) so the tier boundary
# is one auditable table.
# ---------------------------------------------------------------------------
_SLOW = {
    "test_trainer.py": {
        "test_overfit_file_pipeline_end_to_end",
        "test_fit_eval_checkpoint_resume",
        "test_loss_decreases_overfit",
    },
    "test_sharding.py": {
        "test_asr_api_serves_over_mesh",
        "test_sharded_train_step_mixed_precision",
        "test_sharded_train_step_matches_single_device",
        "test_trainer_on_mesh",
        "test_asr_api_mesh_with_second_pass",
        "test_sharded_beam_matches_single_device",
        "test_sharded_lm_fused_matches_single_device",
        "test_asr_api_mesh_lm_first_pass",
    },
    "test_train.py": {
        "test_train_remat_matches_no_remat",
        "test_train_step_mixed_precision_bf16",
        "test_forward_logits_gate_hoist_parity",
        "test_bn_running_stats_update_with_torch_semantics",
        "test_train_step_skips_nonfinite",
        "test_train_step_overfits_tiny_batch",
        "test_scheduled_sampling_changes_logits_not_shapes",
        "test_forward_logits_hoisted_matches_stepwise",
    },
    "test_train_cli.py": {
        "test_train_cli_resume",
        "test_train_cli_end_to_end",
        "test_train_cli_mesh_auto",
    },
    "test_wire.py": {
        "test_flat_wire_transcripts_bit_identical_to_padded",
        "test_flat_pow2_bucketing_transcripts_bit_identical",
        "test_mulaw_wire_transcript_parity_on_overfit_model",
        "test_adpcm_wire_transcript_parity_on_overfit_model",
    },
    "test_serve.py": {
        "test_microbatcher_batch_ladder",
        "test_microbatcher_direct",
        "test_concurrent_requests_are_microbatched",
    },
    "test_reference_differential.py": {
        "test_train_forward_loss_matches_reference",
    },
    "test_beam.py": {
        "test_unrolled_loop_identical_to_single_step",
    },
    "test_data_api.py": {
        "test_asr_three_modes_and_determinism",
        "test_transcribe_batch_chunking",
        "test_asr_bf16_mode",
    },
    "test_pallas_topk.py": {
        "test_grouped_tie_heavy_fuzz",
    },
    "test_device_ngram.py": {
        "test_build_at_production_scale",
    },
    "test_torch_differential.py": {
        "test_encoder_gradients_match_torch",
    },
    "test_rnn.py": {
        "test_local_rnn_matches_torch_gru_stack",
    },
    "test_config_variants.py": {
        "test_fine_tune_freezes_non_attention_params",
    },
    "test_pallas_lstm.py": {
        "test_custom_vjp_grad_matches_scan",
    },
    "test_bf16.py": {
        "test_bf16_beam_transcripts_match_f32",
    },
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        names = _SLOW.get(os.path.basename(str(item.fspath)))
        if names and item.name.split("[")[0] in names:
            item.add_marker(pytest.mark.slow)


# Diagnostic hook: CHINESE_ASR_SEGV_TRACE=/path/to/segv_trace.so loads a
# native crash tracer (sigaltstack + backtrace_symbols_fd) that prints the
# NATIVE frames of a fatal signal — faulthandler above only shows Python
# frames, which for the round-4 XLA:CPU compile SIGSEGV was not enough.
# Note it replaces faulthandler's handler for SIGSEGV/SIGBUS while loaded.
_trace_so = os.environ.get("CHINESE_ASR_SEGV_TRACE")
if _trace_so:
    import ctypes

    ctypes.CDLL(_trace_so)
