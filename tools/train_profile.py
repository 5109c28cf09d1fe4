"""Training-step phase profile on the real chip (PERF.md methodology:
prefix-program differences, dispatch overhead excluded).

Phases of ONE train step at the flagship config, each a prefix program
of the real compiled step so XLA's DCE matches production:

    featurize   device featurization of the wav batch
    forward     loss_fn only (encoder + hoisted decoder scan + CE)
    backward    value_and_grad minus forward
    update      full train_step minus value_and_grad (Adam + guards)

Usage (TPU):  python tools/train_profile.py [--batch 128] [--secs 6]
              [--dtype bfloat16] [--remat]
CPU smoke:    JAX_PLATFORM_NAME=cpu python tools/train_profile.py --smoke
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def timed(fn, sync, min_iters=5, min_secs=3.0):
    sync(fn())
    iters, t0 = 0, time.perf_counter()
    while True:
        sync(fn())
        iters += 1
        dt = time.perf_counter() - t0
        if iters >= min_iters and dt > min_secs:
            return dt / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--secs", type=float, default=6.0)
    ap.add_argument("--target-len", type=int, default=16)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    if args.smoke:
        os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
        args.batch, args.secs = 4, 2.0

    import numpy as np
    import jax
    import jax.numpy as jnp

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from chinese_asr_tpu.audio import features
    from chinese_asr_tpu.config import Config
    from chinese_asr_tpu.models import las
    from chinese_asr_tpu.train import optim
    from chinese_asr_tpu.train.step import Batch, loss_fn, train_step
    from chinese_asr_tpu.utils import compile_cache

    compile_cache.configure(ROOT, cpu=jax.default_backend() == "cpu")

    cfg = Config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, compute_dtype=args.dtype, remat=args.remat))
    B = args.batch
    SR = cfg.audio.sample_rate
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(cfg.train)
    opt0 = tx.init(params)
    rng = np.random.RandomState(0)
    S, L = 40, args.target_len
    wavs = jnp.asarray((0.1 * rng.randn(B, int(args.secs * SR))
                        ).astype(np.float32))
    lens = jnp.asarray(np.full(B, int(args.secs * SR), np.int64))
    text = rng.randint(4, cfg.vocab.vocab_size, size=(B, L)).astype(np.int32)
    pad = np.zeros((B, S - 1 - L), np.int32)
    tokens_in = jnp.asarray(np.concatenate(
        [np.full((B, 1), cfg.vocab.sos, np.int32), text, pad], 1))
    tokens_out = jnp.asarray(np.concatenate(
        [text, np.full((B, 1), cfg.vocab.eos, np.int32), pad], 1))
    tlens = jnp.asarray(np.full(B, L + 1, np.int32))

    featurize = jax.jit(lambda w, l: features.featurize_batch(
        w, l, cfg.audio))

    def mk_batch(f, fl):
        return Batch(f, fl, tokens_in, tokens_out, tlens)

    @jax.jit
    def fwd(p, w, wl):
        f, fl = featurize(w, wl)
        loss, _ = loss_fn(p, cfg, mk_batch(f, fl))
        return loss

    @jax.jit
    def fwd_bwd(p, w, wl):
        f, fl = featurize(w, wl)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, cfg, mk_batch(f, fl))
        # reduce grads so the timed transfer stays tiny (sync via asarray)
        gsum = jax.tree_util.tree_reduce(
            lambda a, g: a + g.astype(jnp.float32).sum(), grads, 0.0)
        return loss, gsum

    @jax.jit
    def full(p, o, w, wl):
        f, fl = featurize(w, wl)
        p2, o2, m = train_step(p, o, cfg, tx, mk_batch(f, fl))
        return m["loss"], m["grad_norm"]

    sync = lambda o: np.asarray(jax.tree_util.tree_leaves(o)[-1])
    null_fn = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8,), jnp.float32)
    sync(null_fn(z))
    t_null = timed(lambda: null_fn(z), sync)

    t_feat = timed(lambda: featurize(wavs, lens), sync) - t_null
    t_fwd = timed(lambda: fwd(params, wavs, lens), sync) - t_null
    t_fb = timed(lambda: fwd_bwd(params, wavs, lens), sync) - t_null
    t_full = timed(lambda: full(params, opt0, wavs, lens), sync) - t_null

    audio_s = B * args.secs
    print(f"# device={jax.default_backend()} B={B} secs={args.secs} "
          f"dtype={args.dtype} remat={args.remat} "
          f"(dispatch+sync {t_null * 1e3:.1f} ms excluded)")
    print("# phase        ms/step")
    print(f"featurize    {t_feat * 1e3:9.2f}")
    print(f"forward      {(t_fwd - t_feat) * 1e3:9.2f}")
    print(f"backward     {(t_fb - t_fwd) * 1e3:9.2f}")
    print(f"update       {(t_full - t_fb) * 1e3:9.2f}")
    print(f"full step    {t_full * 1e3:9.2f}   "
          f"({B / t_full:.0f} utts/s, {audio_s / t_full:.0f} audio s/s)")


if __name__ == "__main__":
    main()
