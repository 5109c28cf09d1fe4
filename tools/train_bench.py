"""Training-step throughput on the real chip.

The reference's only published training number is a source comment —
``# 16: .2s`` (reference gpd.py:103): ~0.2 s/step at batch 16 on its
(unspecified) GPU.  This tool measures the compiled ``train_step`` (full
fwd + bwd + Adam update + EMA/NaN-guard machinery) on the flagship config
at AISHELL-like shapes, for a PERF.md row against that note.

Usage (TPU):  python tools/train_bench.py [--steps 30] [--secs 6.0]
CPU smoke:    JAX_PLATFORM_NAME=cpu python tools/train_bench.py --smoke
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--secs", type=float, default=6.0,
                    help="utterance length (AISHELL mean ~6 s)")
    ap.add_argument("--target-len", type=int, default=16,
                    help="gold chars per utterance (AISHELL mean ~14)")
    ap.add_argument("--batches", type=int, nargs="*", default=[16, 64, 128])
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="train.compute_dtype (mixed precision: bf16 "
                         "fwd/bwd, f32 master weights + optimizer)")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    if args.smoke:
        os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
        args.steps, args.batches = 3, [4]

    import numpy as np
    import jax
    import jax.numpy as jnp

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from chinese_asr_tpu.audio import features
    from chinese_asr_tpu.config import Config
    from chinese_asr_tpu.train import optim
    from chinese_asr_tpu.train.step import Batch, train_step
    from chinese_asr_tpu.models import las
    from chinese_asr_tpu.utils import compile_cache

    compile_cache.configure(ROOT, cpu=jax.default_backend() == "cpu")

    import dataclasses

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, compute_dtype=args.dtype))
    SR = cfg.audio.sample_rate
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(cfg.train)
    opt0 = tx.init(params)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    print(f"# device={jax.default_backend()} params={n_params/1e6:.1f}M "
          f"compute={args.dtype}")
    print("# B      s/step   utts/s   audio_s/s   steps")

    feat_fn = jax.jit(lambda w, l: features.featurize_batch(w, l, cfg.audio))
    donate = () if jax.default_backend() == "cpu" else (0, 1)
    step = jax.jit(functools.partial(train_step, cfg=cfg, tx=tx),
                   donate_argnums=donate)
    rng = np.random.RandomState(0)

    for B in args.batches:
        S, L = 40, args.target_len
        wavs = jnp.asarray((0.1 * rng.randn(B, int(args.secs * SR))
                            ).astype(np.float32))
        lens = jnp.asarray(np.full(B, int(args.secs * SR), np.int64))
        feats, flens = feat_fn(wavs, lens)
        text = rng.randint(4, cfg.vocab.vocab_size, size=(B, L)).astype(np.int32)
        pad = np.zeros((B, S - 1 - L), np.int32)
        batch = Batch(
            feats, flens,
            jnp.asarray(np.concatenate(
                [np.full((B, 1), cfg.vocab.sos, np.int32), text, pad], 1)),
            jnp.asarray(np.concatenate(
                [text, np.full((B, 1), cfg.vocab.eos, np.int32), pad], 1)),
            jnp.asarray(np.full(B, L + 1, np.int32)))

        # fresh copies per batch size: with donate_argnums the buffers fed
        # to the first step are invalidated, and params/opt0 are reused by
        # the next B iteration
        p = jax.tree_util.tree_map(jnp.array, params)
        o = jax.tree_util.tree_map(
            lambda x: jnp.array(x) if hasattr(x, "dtype") else x, opt0)
        # warmup: compile + one real step; sync via host transfer (CLAUDE.md:
        # block_until_ready is a no-op through the tunnel)
        p, o, m = step(p, o, batch=batch, rng=jax.random.PRNGKey(0))
        np.asarray(m["loss"])
        t0 = time.time()
        for i in range(args.steps):
            p, o, m = step(p, o, batch=batch, rng=jax.random.PRNGKey(i + 1))
        loss = float(np.asarray(m["loss"]))
        dt = (time.time() - t0) / args.steps
        assert np.isfinite(loss), f"non-finite loss {loss}"
        print(f"# {B:<5} {dt:8.3f} {B / dt:8.1f} {B * args.secs / dt:10.1f}"
              f"   {args.steps} (loss {loss:.3f})")


if __name__ == "__main__":
    main()
