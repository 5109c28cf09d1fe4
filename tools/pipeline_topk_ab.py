"""Full-pipeline A/B of the beam stage-1 top-k backend on the real TPU.

`tools/topk_bench.py` (chained microbench, v5e) measured the stage-1
selection primitives standalone at [2048 x 5004] k=17:

    lax.top_k            701.6 us/op
    approx_max_k(exact)  695.6 us/op
    pallas_flat         1247.0 us/op
    pallas_grouped      Mosaic compile SIGABRT (layout.h:320)

i.e. the opposite ranking from what the in-pipeline trace attribution
suggested (PERF.md round-3 table: `_top_k_impl` 0.57 ms/step).  The only
decision-grade number is the full decode pipeline wall clock, both
variants back-to-back in ONE process (CLAUDE.md: the tunnel's 23-130
MB/s variance makes cross-process timings worthless).  This times
featurize + beam(bw) + device-side select_best at the headline config
(B=128, 10 s utts, bw=16) with the pallas stage-1 vs the XLA
approx_max_k stage-1.

    python tools/pipeline_topk_ab.py [--B 128] [--bw 16] [--reps 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SR = 16000


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=128)
    p.add_argument("--bw", type=int, default=16)
    p.add_argument("--secs", type=float, default=10.0)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--rounds", type=int, default=3,
                   help="alternate A/B this many times to expose drift")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from chinese_asr_tpu.utils import compile_cache
    compile_cache.configure(_REPO, cpu=jax.default_backend() == "cpu")
    from chinese_asr_tpu.audio import features
    from chinese_asr_tpu.config import Config
    from chinese_asr_tpu.decode import beam
    from chinese_asr_tpu.models import las

    cfg = Config()
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    N = int(args.secs * SR)
    wavs = jnp.asarray((0.1 * rng.randn(args.B, N)).astype(np.float32))
    lens = jnp.asarray(np.full((args.B,), N, np.int64))

    def build(use_pallas: bool):
        @jax.jit
        def pipe(params, wavs, wav_lens):
            f, fl = features.featurize_batch(wavs, wav_lens, cfg.audio)
            res = beam.beam_decode(params, cfg, args.bw, f, fl,
                                   use_pallas=use_pallas)
            return beam.select_best(res, cfg.decode.length_weight)
        return pipe

    def build_laxtopk():
        # third datapoint: stage-1 via a plain full-sort lax.top_k (what
        # the beam.py comment claims was 91% of the loop in round 2)
        @jax.jit
        def pipe(params, wavs, wav_lens):
            f, fl = features.featurize_batch(wavs, wav_lens, cfg.audio)
            orig = jax.lax.approx_max_k
            jax.lax.approx_max_k = (
                lambda x, k, **kw: jax.lax.top_k(x, k))  # trace-time swap
            try:
                res = beam.beam_decode(params, cfg, args.bw, f, fl,
                                       use_pallas=False)
            finally:
                jax.lax.approx_max_k = orig
            return beam.select_best(res, cfg.decode.length_weight)
        return pipe

    def build_flat():
        # grouped extraction is the kernel default now; pin FLAT here
        from chinese_asr_tpu.ops.pallas import topk as pallas_topk

        @jax.jit
        def pipe(params, wavs, wav_lens):
            f, fl = features.featurize_batch(wavs, wav_lens, cfg.audio)
            orig = pallas_topk.top_k
            pallas_topk.top_k = (                       # trace-time swap
                lambda x, k, interpret=False:
                pallas_topk._top_k_impl(x, k, interpret, False))
            try:
                res = beam.beam_decode(params, cfg, args.bw, f, fl,
                                       use_pallas=True)
            finally:
                pallas_topk.top_k = orig
            return beam.select_best(res, cfg.decode.length_weight)
        return pipe

    def build_multipass():
        # one-pass insertion-network group phase is the kernel default
        # now; pin the MULTI-PASS grouped extraction here
        from chinese_asr_tpu.ops.pallas import topk as pallas_topk

        @jax.jit
        def pipe(params, wavs, wav_lens):
            f, fl = features.featurize_batch(wavs, wav_lens, cfg.audio)
            orig = pallas_topk.top_k
            pallas_topk.top_k = (                       # trace-time swap
                lambda x, k, interpret=False:
                pallas_topk._top_k_impl(x, k, interpret, True, False))
            try:
                res = beam.beam_decode(params, cfg, args.bw, f, fl,
                                       use_pallas=True)
            finally:
                pallas_topk.top_k = orig
            return beam.select_best(res, cfg.decode.length_weight)
        return pipe

    def build_fused():
        # fused logp+top-k stage-1 (CHINESE_ASR_PALLAS_FUSED path); the
        # extraction inside follows the grouped default
        @jax.jit
        def pipe(params, wavs, wav_lens):
            f, fl = features.featurize_batch(wavs, wav_lens, cfg.audio)
            res = beam.beam_decode(params, cfg, args.bw, f, fl,
                                   use_pallas=True, fused_logp=True)
            return beam.select_best(res, cfg.decode.length_weight)
        return pipe

    variants = {"pallas_topk": build(True), "pallas_flat": build_flat(),
                "pallas_multipass": build_multipass(),
                "pallas_fused": build_fused(),
                "approx_max_k": build(False), "lax_top_k": build_laxtopk()}
    outs = {}
    for name, fn in variants.items():           # compile + warm all first
        t0 = time.perf_counter()
        r = fn(params, wavs, lens)
        outs[name] = (np.asarray(r.tokens), np.asarray(r.scores))
        print(f"  {name}: compiled+first-run in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
    ref_t, ref_s = outs["pallas_topk"]
    for name, (t, s) in outs.items():
        if name == "pallas_topk":
            continue
        rows = int((t != ref_t).any(axis=1).sum())
        ds = float(np.abs(s - ref_s).max())
        print(f"  {name} vs pallas: {rows}/{args.B} token rows differ, "
              f"max |score delta| {ds:.3e}", flush=True)

    audio_s = args.B * args.secs
    for r in range(args.rounds):
        for name, fn in variants.items():
            res = fn(params, wavs, lens)
            np.asarray(res.tokens)              # sync before the clock
            t0 = time.perf_counter()
            for _ in range(args.reps):
                res = fn(params, wavs, lens)
            np.asarray(res.tokens)
            dt = (time.perf_counter() - t0) / args.reps
            print(f"  round {r}  {name:14s} {dt * 1e3:7.1f} ms/batch   "
                  f"RTF {audio_s / dt:8.0f}x", flush=True)


if __name__ == "__main__":
    main()
