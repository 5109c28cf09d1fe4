"""In-pipeline A/B of the Pallas bidir-LSTM time-loop chunk size.

The fresh round-3 trace puts the ENCODER at 40.5 ms/batch, 14.6% MFU and
63% HBM — neither roofline binds, so the sequential time loop is paying
per-grid-step overhead.  The kernel's default chunk heuristic lands on
chunk=2 at the flagship shape ([2, 128, 1024] slab ~1 MB), i.e. ~167 grid
programs per layer x 4 layers.  This sweeps the chunk size on the real
encode PREFIX program (featurize + encode + key/value precompute — the
exact prefix tools/profile_tpu.py times; a standalone las.encode jit
materializes dead outputs and is 30x slower) plus the full decode
pipeline, all variants back-to-back in ONE process (CLAUDE.md: the
tunnel's 23-130 MB/s swing makes cross-process timings worthless).

    python tools/lstm_chunk_ab.py [--B 128] [--bw 16] [--chunks 2,4,6,8]
"""

from __future__ import annotations

import argparse
import functools
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
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--chunks", default="2,4,6,8")
    p.add_argument("--pipeline", action="store_true",
                   help="also time the full beam pipeline per variant")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from chinese_asr_tpu.utils import compile_cache
    compile_cache.configure(_REPO, cpu=jax.default_backend() == "cpu")
    from chinese_asr_tpu.audio import features
    from chinese_asr_tpu.config import Config
    from chinese_asr_tpu.decode import beam
    from chinese_asr_tpu.models import las
    from chinese_asr_tpu.ops import rnn
    from chinese_asr_tpu.ops.pallas import lstm as pallas_lstm

    cfg = Config()
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    N = int(args.secs * SR)
    wavs = jnp.asarray((0.1 * rng.randn(args.B, N)).astype(np.float32))
    lens = jnp.asarray(np.full((args.B,), N, np.int64))

    orig_loop = pallas_lstm.bidir_lstm_time_loop
    orig_core = rnn._bidir_core_pallas

    def encode_prefix(p_, w, wl):
        f, fl = features.featurize_batch(w, wl, cfg.audio)
        eb = las.encode(p_, cfg, f, fl)
        return eb.keys, eb.values, eb.mask, eb.init_cell_state

    def full_pipe(p_, w, wl):
        f, fl = features.featurize_batch(w, wl, cfg.audio)
        res = beam.beam_decode(p_, cfg, args.bw, f, fl)
        return beam.select_best(res, cfg.decode.length_weight)

    def with_chunk(fn, chunk):
        # trace-time swap: the custom_vjp wrapper looks the kernel up on
        # the module, so a partial with the pinned chunk reroutes it
        @jax.jit
        def wrapped(p_, w, wl):
            pallas_lstm.bidir_lstm_time_loop = functools.partial(
                orig_loop, chunk=chunk)
            try:
                return fn(p_, w, wl)
            finally:
                pallas_lstm.bidir_lstm_time_loop = orig_loop
        return wrapped

    def with_scan(fn):
        @jax.jit
        def wrapped(p_, w, wl):
            rnn._bidir_core_pallas = rnn._bidir_core_scan
            try:
                return fn(p_, w, wl)
            finally:
                rnn._bidir_core_pallas = orig_core
        return wrapped

    chunks = [int(c) for c in args.chunks.split(",")]
    variants = {}
    for c in chunks:
        variants[f"pallas_c{c}"] = with_chunk(encode_prefix, c)
    variants["xla_scan"] = with_scan(encode_prefix)
    if args.pipeline:
        for c in chunks:
            variants[f"pipe_c{c}"] = with_chunk(full_pipe, c)

    sync = lambda o: np.asarray(jax.tree_util.tree_leaves(o)[-1])
    ok = {}
    for name, fn in list(variants.items()):
        t0 = time.perf_counter()
        try:
            out = fn(params, wavs, lens)
            sync(out)
            ok[name] = fn
            print(f"  {name}: compiled+first-run {time.perf_counter()-t0:.1f}s",
                  flush=True)
        except Exception as e:  # e.g. VMEM exhaustion at large chunks
            print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    # numerical parity across chunkings (same math, different blocking)
    ref = np.asarray(ok[f"pallas_c{chunks[0]}"](params, wavs, lens)[0])
    for name, fn in ok.items():
        if name.startswith("pipe_"):
            continue
        d = float(np.abs(np.asarray(fn(params, wavs, lens)[0]) - ref).max())
        print(f"  {name}: max |keys delta| vs c{chunks[0]} = {d:.2e}", flush=True)

    audio_s = args.B * args.secs
    for r in range(args.rounds):
        for name, fn in ok.items():
            sync(fn(params, wavs, lens))
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = fn(params, wavs, lens)
            sync(out)
            dt = (time.perf_counter() - t0) / args.reps
            print(f"  round {r}  {name:12s} {dt*1e3:7.1f} ms/batch   "
                  f"RTF {audio_s/dt:8.0f}x", flush=True)


if __name__ == "__main__":
    main()
