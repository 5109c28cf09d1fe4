"""MFU + per-phase breakdown of the bw=16 pipeline on the real TPU.

Produces the numbers for PERF.md (SURVEY section 5 profiling plan):
  * per-phase wall-clock: featurize / encode (incl. key-value precompute) /
    beam loop — each as its own jitted program, timed steady-state;
  * end-to-end pipeline time (single fused program, as bench.py runs it);
  * FLOPs from XLA cost analysis -> model FLOP/s -> MFU vs the v5e peak;
  * optionally (--trace) a jax.profiler trace whose top ops by self-time
    are printed (the round-1 recipe: parse *.trace.json.gz).

Run on the TPU host:  python tools/profile_tpu.py [--trace]
Sync discipline: np.asarray() transfers, never block_until_ready (a no-op
through the axon tunnel).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# v5e chip peaks (jax-ml.github.io/scaling-book): 197 TFLOP/s bf16,
# ~98.5 TFLOP/s fp32-via-MXU-passes, 819 GB/s HBM
PEAK_BF16 = 197e12
PEAK_F32 = PEAK_BF16 / 2
HBM_GBS = 819e9


def timed(fn, sync, min_iters=5, min_secs=3.0):
    fn_out = fn()
    sync(fn_out)
    iters, t0 = 0, time.perf_counter()
    while True:
        sync(fn())
        iters += 1
        dt = time.perf_counter() - t0
        if iters >= min_iters and dt > min_secs:
            return dt / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true",
                    help="also capture a jax.profiler trace + top ops")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--bw", type=int, default=16)
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="weights/activations dtype (scores stay f32)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from chinese_asr_tpu.audio import features
    from chinese_asr_tpu.config import Config
    from chinese_asr_tpu.decode import beam
    from chinese_asr_tpu.models import las
    from chinese_asr_tpu.utils import compile_cache

    compile_cache.configure(ROOT, cpu=jax.default_backend() == "cpu")

    cfg = Config()
    B, bw = args.batch, args.bw
    N = int(args.secs * cfg.audio.sample_rate)
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    dt = jnp.dtype(args.dtype)
    if dt != jnp.float32:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(dt)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    rng = np.random.RandomState(0)
    wavs = jnp.asarray((0.1 * rng.randn(B, N)).astype(np.float32))
    wav_lens = jnp.asarray(np.full(B, N, np.int64))

    # Phases measured as PREFIX programs of the real pipeline, so XLA's
    # dead-code elimination matches what the fused product program runs.
    # (A standalone las.encode jit must materialize every EncodeBundle
    # output — including [B, L, 512] sequences the beam never reads — and
    # measured 30x slower than the same encoder inside the fused program.)
    featurize = jax.jit(lambda w, l: features.featurize_batch(w, l, cfg.audio))

    @jax.jit
    def to_encode(p, w, wl):
        f, fl = features.featurize_batch(w, wl, cfg.audio)
        eb = las.encode(p, cfg, f.astype(dt), fl)
        return eb.keys, eb.values, eb.mask, eb.init_cell_state

    @jax.jit
    def pipeline(p, w, wl):
        f, fl = features.featurize_batch(w, wl, cfg.audio)
        return beam.beam_decode(p, cfg, bw, f.astype(dt), fl)

    sync_last = lambda o: np.asarray(jax.tree_util.tree_leaves(o)[-1])

    # dispatch + sync round-trip overhead (~25-30 ms through the device
    # tunnel): measured with a trivial program and reported separately —
    # every timed call pays it ONCE, so it cancels in the prefix
    # differences but inflates the first (featurize) phase
    null_fn = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8,), jnp.float32)
    sync_last(null_fn(z))
    t_null = timed(lambda: null_fn(z), sync_last)

    sync_last(featurize(wavs, wav_lens))
    t_feat = timed(lambda: featurize(wavs, wav_lens), sync_last) - t_null

    sync_last(to_encode(params, wavs, wav_lens))
    t_enc_pfx = timed(lambda: to_encode(params, wavs, wav_lens),
                      sync_last) - t_null

    sync_last(pipeline(params, wavs, wav_lens).fin_scores)
    t_pipe = timed(lambda: pipeline(params, wavs, wav_lens),
                   lambda o: sync_last(o.fin_scores)) - t_null
    t_enc = t_enc_pfx - t_feat
    t_beam = t_pipe - t_enc_pfx
    print(f"dispatch+sync round trip: {t_null * 1e3:.1f} ms "
          f"(excluded from every phase row)")

    # FLOPs from XLA's own cost model
    def flops_of(jitted, *a):
        c = jitted.lower(*a).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return float(c.get("flops", float("nan"))), \
            float(c.get("bytes accessed", float("nan")))

    fl_pipe, by_pipe = flops_of(pipeline, params, wavs, wav_lens)
    fl_epfx, by_epfx = flops_of(to_encode, params, wavs, wav_lens)
    fl_feat, by_feat = flops_of(featurize, wavs, wav_lens)
    fl_enc, by_enc = fl_epfx - fl_feat, by_epfx - by_feat
    # XLA's cost model counts a dynamic lax.while_loop body ONCE; the beam
    # loop runs l_final+1 times (max_len with random weights, no early
    # exit), so scale the per-iteration cost by the true trip count.
    # Caveat: the post-loop epilogue (n-best buffer reshape/int16 cast,
    # ~20 MB once) is scaled along with the body, inflating the beam row's
    # bytes by ~2% — acceptable for this table.
    steps = int(pipeline(params, wavs, wav_lens).l_final) + 1
    fl_beam = (fl_pipe - fl_epfx) * steps
    by_beam = (by_pipe - by_epfx) * steps
    fl_pipe = fl_epfx + fl_beam
    by_pipe = by_epfx + by_beam
    print(f"beam loop executed {steps} steps "
          f"(while-body cost scaled accordingly)")

    audio_s = B * args.secs
    print(f"device={jax.devices()[0]} B={B} bw={bw} utt={args.secs:.0f}s")
    print(f"{'phase':<12}{'ms/batch':>10}{'GFLOP':>10}{'TFLOP/s':>9}"
          f"{'MFU_f32%':>9}{'MFU_bf16%':>10}{'GB':>8}{'GB/s':>8}{'HBM%':>6}")
    for name, t, fl, by in [("featurize", t_feat, fl_feat, by_feat),
                            ("encode", t_enc, fl_enc, by_enc),
                            ("beam", t_beam, fl_beam, by_beam),
                            ("pipeline", t_pipe, fl_pipe, by_pipe)]:
        tf = fl / t / 1e12
        print(f"{name:<12}{t * 1e3:>10.2f}{fl / 1e9:>10.1f}{tf:>9.2f}"
              f"{100 * fl / t / PEAK_F32:>9.1f}{100 * fl / t / PEAK_BF16:>10.1f}"
              f"{by / 1e9:>8.2f}{by / t / 1e9:>8.0f}"
              f"{100 * by / t / HBM_GBS:>6.1f}")
    print(f"pipeline RTF = {audio_s / t_pipe:.0f}x realtime "
          f"({B / t_pipe:.0f} utts/s/chip); encode/beam are prefix-program "
          f"differences (see comment above)")

    if args.trace:
        tdir = os.path.join(ROOT, ".profile_trace")
        with jax.profiler.trace(tdir):
            for _ in range(3):
                sync_last(pipeline(params, wavs, wav_lens).fin_scores)
        traces = sorted(glob.glob(
            os.path.join(tdir, "**", "*.trace.json.gz"), recursive=True),
            key=os.path.getmtime)
        if traces:
            with gzip.open(traces[-1], "rt") as f:
                ev = json.load(f).get("traceEvents", [])
            tot = {}
            for e in ev:
                if e.get("ph") == "X" and "dur" in e:
                    tot[e["name"]] = tot.get(e["name"], 0) + e["dur"]
            print("\ntop ops by total self-time (us):")
            for name, dur in sorted(tot.items(), key=lambda kv: -kv[1])[:15]:
                print(f"  {dur:>12.0f}  {name[:100]}")


if __name__ == "__main__":
    main()
