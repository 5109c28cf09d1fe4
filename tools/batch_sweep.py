"""Batch-size sweep behind the headline config (VERDICT r3 #8).

bench.py calls B=128 "the v5e throughput knee" — this tool records the
evidence: sustained utts/s/chip at several batch sizes (fixed bw=16,
10 s utterances, dispatch-ahead order, one session so tunnel weather is
shared), plus the device HBM headroom at each size.

Run on the TPU host:
  python tools/batch_sweep.py [--batches 32,64,128,256,512] [--bw 16]
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
    ap.add_argument("--batches", default="32,64,128,256,512")
    ap.add_argument("--bw", type=int, default=16)
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--min-secs", type=float, default=5.0)
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
    bw = args.bw
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    SR = cfg.audio.sample_rate

    @jax.jit
    def pipe(p, w, wl):
        f, fl = features.featurize_batch(w, wl, cfg.audio)
        res = beam.beam_decode(p, cfg, bw, f, fl)
        return beam.select_best(res, cfg.decode.length_weight)

    def hbm_mb():
        try:
            stats = jax.devices()[0].memory_stats()
            return stats.get("bytes_in_use", 0) / 1e6, \
                stats.get("bytes_limit", 0) / 1e6
        except Exception:
            return 0.0, 0.0

    print(f"# backend={jax.default_backend()} bw={bw} secs={args.secs} "
          f"(sustained: batch i+1 dispatched before batch i's pull)")
    print(f"# {'B':>5} {'ms/batch':>9} {'RTF':>9} {'utts/s':>8} "
          f"{'HBM_MB':>8} {'HBM_cap':>8}")
    for B in [int(b) for b in args.batches.split(",")]:
        wavs = jnp.asarray((0.1 * rng.randn(B, int(args.secs * SR))
                            ).astype(np.float32))
        lens = jnp.asarray(np.full(B, int(args.secs * SR), np.int64))
        try:
            out = pipe(params, wavs, lens)
            np.asarray(out.scores)
        except Exception as e:
            print(f"# {B:>5} FAILED: {type(e).__name__}: {e}")
            continue
        used, cap = hbm_mb()
        # sustained: keep one batch in flight, sync on the previous
        pend = pipe(params, wavs, lens)
        n, t0 = 0, time.perf_counter()
        while True:
            nxt = pipe(params, wavs, lens)
            np.asarray(pend.scores)
            pend = nxt
            n += 1
            dt = time.perf_counter() - t0
            if n >= 3 and dt > args.min_secs:
                break
        np.asarray(pend.scores)
        per = dt / n
        print(f"# {B:>5} {per * 1e3:>9.1f} {B * args.secs / per:>9.0f} "
              f"{B / per:>8.1f} {used:>8.0f} {cap:>8.0f}", flush=True)


if __name__ == "__main__":
    main()
