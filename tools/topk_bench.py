"""Microbench: vocab top-k variants on the real TPU, in one process.

The beam loop's stage-1 selection (per-beam top-(k+1) over the vocab,
reference model.py:819-929's `logp.topk`) is the decode pipeline's
hottest non-matmul op (~29% of device time, PERF.md trace table).  This
A/Bs the implementations back-to-back — the only timing mode the axon
tunnel's 23-130 MB/s variance makes trustworthy (CLAUDE.md):

  * lax.top_k            — XLA full sort
  * lax.approx_max_k     — XLA partial-reduce custom call (exact config)
  * pallas flat          — k threshold-exclusion sweeps (ops/pallas/topk)
  * pallas grouped       — per-group top-S candidates + fallback
                           (CHINESE_ASR_TOPK_GROUPED=1 path)

Each variant runs CHAIN chained calls inside one jit (the output of call
i feeds a cheap mix into call i+1's input so XLA cannot hoist or dedup),
timed over REPS dispatches with one np.asarray sync each; the per-op
time is total / (REPS * CHAIN).  Run:

    python tools/topk_bench.py [--rows 2048] [--v 5004] [--k 17]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _chained(fn, chain: int):
    @jax.jit
    def run(x):
        v = i = None
        for _ in range(chain):
            v, i = fn(x)
            # feed results back so each link depends on the previous
            x = x + (v[:, :1] * 1e-7) + (i[:, :1].astype(x.dtype) * 1e-9)
        return v, i
    return run


def _time(run, x, reps: int) -> float:
    v, i = run(x)                      # compile + warm
    np.asarray(v)
    t0 = time.perf_counter()
    for _ in range(reps):
        v, i = run(x)
    np.asarray(v), np.asarray(i)       # one sync at the end
    return time.perf_counter() - t0


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=2048)   # B=128 x bw=16
    p.add_argument("--v", type=int, default=5004)
    p.add_argument("--k", type=int, default=17)        # bw+1
    p.add_argument("--chain", type=int, default=20)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    from chinese_asr_tpu.ops.pallas import topk as pallas_topk

    rng = np.random.RandomState(0)
    x = jnp.asarray((rng.randn(args.rows, args.v) * 4 - 10)
                    .astype(np.float32))
    k = args.k

    variants = {
        "lax.top_k": lambda x: jax.lax.top_k(x, k),
        "approx_max_k(exact)": functools.partial(
            jax.lax.approx_max_k, k=k, recall_target=1.0,
            reduction_input_size_override=args.v),
        "pallas_flat": lambda x: pallas_topk._top_k_impl(
            x, k, False, False),
        "pallas_grouped": lambda x: pallas_topk._top_k_impl(
            x, k, False, True),
        "pallas_onepass": lambda x: pallas_topk._top_k_impl(
            x, k, False, True, True),
    }

    ref_v, ref_i = jax.lax.top_k(x, k)
    ref_v, ref_i = np.asarray(ref_v), np.asarray(ref_i)
    print(f"[{args.rows}x{args.v}] k={k} chain={args.chain} "
          f"reps={args.reps} backend={jax.default_backend()}")
    for name, fn in variants.items():
        try:
            v, i = fn(x)
            ok = (np.asarray(v) == ref_v).all() \
                and (np.asarray(i) == ref_i).all()
            dt = _time(_chained(fn, args.chain), x, args.reps)
            us = dt / (args.reps * args.chain) * 1e6
            print(f"  {name:22s} {us:9.1f} us/op   "
                  f"{'exact' if ok else 'MISMATCH vs lax.top_k'}")
        except Exception as e:  # noqa: BLE001 — report per-variant
            print(f"  {name:22s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
