"""Weight-traffic vs activation-traffic: the bf16 decision rule, closed.

PERF.md's bf16 section stops at "a wash on the 40-step random-weight
headline" without separating the two kinds of HBM traffic bf16 halves:
the WEIGHTS (~15M params = 60 MB f32, read once per batch — the scan
and decode loops keep them VMEM/cache-resident across timesteps) and
the ACTIVATIONS (the [T, B, 4H] gate tensors etc., linear in batch and
time).  At B=128 the weight read is ~60 MB against an ~815 GB/s HBM
stream = ~75 us of a ~45 ms batch (0.2%), so weight-only compression
(bf16 weights, or int8 with a dequant scale) CANNOT move the headline;
any bf16 serving win must come from activation traffic.  This tool
pins that arithmetic with an in-process A/B, alternating variants:

  f32      f32 weights, f32 activations (baseline)
  w16      bf16 weights upcast to f32 at jit entry: weight HBM traffic
           halved, identical f32 compute/activations
  bf16     bf16 weights AND activations (the shipping compute_dtype
           path; decode score arithmetic stays f32)

Run on the TPU host:  python tools/weights_dtype_ab.py [--rounds 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--bw", type=int, default=16)
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from chinese_asr_tpu.audio import features
    from chinese_asr_tpu.config import Config
    from chinese_asr_tpu.decode import beam
    from chinese_asr_tpu.models import las
    from chinese_asr_tpu.utils import compile_cache
    compile_cache.configure(ROOT, cpu=False)

    cfg = Config()
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    p16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    rng = np.random.RandomState(0)
    B = args.batch
    wavs = jnp.asarray((0.1 * rng.randn(B, int(args.secs * 16000))
                        ).astype(np.float32))
    lens = jnp.asarray(np.full(B, int(args.secs * 16000), np.int64))

    def pipe(dtype):
        def fn(p, w, l):
            f, fl = features.featurize_batch(w, l, cfg.audio)
            res = beam.beam_decode(p, cfg, args.bw, f.astype(dtype), fl)
            return beam.select_best(res, cfg.decode.length_weight)
        return jax.jit(fn)

    def upcast_pipe():
        def fn(p, w, l):
            p32 = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32)
                if x.dtype == jnp.bfloat16 else x, p)
            f, fl = features.featurize_batch(w, l, cfg.audio)
            res = beam.beam_decode(p32, cfg, args.bw, f, fl)
            return beam.select_best(res, cfg.decode.length_weight)
        return jax.jit(fn)

    variants = {
        "f32": (pipe(jnp.float32), params),
        "w16": (upcast_pipe(), p16),
        "bf16": (pipe(jnp.bfloat16), p16),
    }

    def run(fn, p):
        out = fn(p, wavs, lens)
        np.asarray(out.tokens)           # sync through the tunnel

    for name, (fn, p) in variants.items():
        run(fn, p)                       # compile
    times = {k: [] for k in variants}
    for r in range(args.rounds):
        for name, (fn, p) in variants.items():
            t0 = time.perf_counter()
            for _ in range(3):
                run(fn, p)
            times[name].append((time.perf_counter() - t0) / 3)
    audio = B * args.secs
    print(f"# weights-dtype A/B  B={B} bw={args.bw} {args.secs}s utts, "
          f"{args.rounds} alternating rounds x3 batches")
    for name, ts in times.items():
        ms = ", ".join(f"{t * 1e3:.1f}" for t in ts)
        best = min(ts)
        print(f"#   {name:5s}  [{ms}] ms/batch   RTF {audio / best:.0f}x")


if __name__ == "__main__":
    main()
