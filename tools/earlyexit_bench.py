"""Early-exit decode benchmark with non-random weights.

The main bench uses random weights, whose beams never emit eos — so its
RTF numbers are WORST-CASE (all max_len=40 decoder steps always run).
This tool overfits the flagship model on a synthetic task for a few
hundred steps (enough for the output prior to collapse onto short
eos-terminated strings), then measures the batched beam + greedy decode
with the batch-wide early exit actually firing — the regime trained
weights put production decoding in (reference early stop:
model.py:578-579 greedy, 897-901 beam).

Run on the TPU host: python tools/earlyexit_bench.py [--steps 300]
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
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--bw", type=int, default=16)
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--target-len", type=int, default=12)
    ap.add_argument("--bf16", action="store_true",
                    help="also compare bf16 vs f32 transcripts/scores")
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    from chinese_asr_tpu.audio import features
    from chinese_asr_tpu.config import Config
    from chinese_asr_tpu.decode import beam, greedy
    from chinese_asr_tpu.models import las
    from chinese_asr_tpu.train import optim
    from chinese_asr_tpu.train.step import Batch, train_step
    from chinese_asr_tpu.utils import compile_cache

    compile_cache.configure(ROOT, cpu=jax.default_backend() == "cpu")

    cfg = Config()
    SR = cfg.audio.sample_rate
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(cfg.train)
    opt = tx.init(params)

    # training batch: SAME shapes as tools bench runs (warm compile cache)
    TB, S = 64, 40
    rng = np.random.RandomState(0)
    t_wavs = jnp.asarray((0.1 * rng.randn(TB, int(args.secs * SR))
                          ).astype(np.float32))
    t_lens = jnp.asarray(np.full(TB, int(args.secs * SR), np.int64))
    feat_fn = jax.jit(lambda w, l: features.featurize_batch(w, l, cfg.audio))
    t_feats, t_flens = feat_fn(t_wavs, t_lens)
    # short, input-independent targets: the model overfits to "emit these
    # tokens, then eos" — beams then finish early like trained weights do
    L = args.target_len
    text = np.tile(rng.randint(4, cfg.vocab.vocab_size, size=(1, L)),
                   (TB, 1)).astype(np.int32)
    pad = np.zeros((TB, S - 1 - L), np.int32)
    batch = Batch(
        t_feats, t_flens,
        jnp.asarray(np.concatenate(
            [np.full((TB, 1), cfg.vocab.sos, np.int32), text, pad], 1)),
        jnp.asarray(np.concatenate(
            [text, np.full((TB, 1), cfg.vocab.eos, np.int32), pad], 1)),
        jnp.asarray(np.full(TB, L + 1, np.int32)))

    step = jax.jit(functools.partial(train_step, cfg=cfg, tx=tx))
    p, o = params, opt
    t0 = time.time()
    for i in range(args.steps):
        p, o, m = step(p, o, batch=batch, rng=jax.random.PRNGKey(i))
        if i % 100 == 0 or i == args.steps - 1:
            print(f"step {i}: loss={float(m['loss']):.4f} "
                  f"acc={float(m['accuracy']):.3f}", flush=True)
    print(f"trained {args.steps} steps in {time.time() - t0:.0f}s")

    # decode bench on the trained weights
    B, bw = args.batch, args.bw
    wavs = jnp.asarray((0.1 * rng.randn(B, int(args.secs * SR))
                        ).astype(np.float32))
    wlens = jnp.asarray(np.full(B, int(args.secs * SR), np.int64))

    @jax.jit
    def pipe_beam(p, w, wl):
        f, fl = features.featurize_batch(w, wl, cfg.audio)
        res = beam.beam_decode(p, cfg, bw, f, fl)
        return beam.select_best(res, cfg.decode.length_weight), res.l_final

    @jax.jit
    def pipe_greedy(p, w, wl):
        f, fl = features.featurize_batch(w, wl, cfg.audio)
        return greedy.greedy_decode(p, cfg, f, fl)

    def bench(fn, sync, label, steps_of):
        out = fn(p, wavs, wlens)
        sync(out)
        n, t0 = 0, time.perf_counter()
        while True:
            sync(fn(p, wavs, wlens))
            n += 1
            dt = time.perf_counter() - t0
            if n >= 5 and dt > 3.0:
                break
        per = dt / n
        audio = B * args.secs
        print(f"{label}: {per * 1e3:.1f} ms/batch, RTF={audio / per:.0f}x, "
              f"steps={steps_of(out)}", flush=True)

    bench(pipe_beam, lambda o: np.asarray(o[0].scores), f"beam bw={bw}",
          lambda o: int(o[1]) + 1)
    bench(pipe_greedy, lambda o: np.asarray(o.scores), "greedy",
          lambda o: int(np.asarray(o.final_lens).max()) + 1)

    if args.bf16:
        # bf16 ACCURACY evidence on the flagship model (VERDICT r2 item
        # #3): same wavs through the f32 and bf16 pipelines, transcript
        # match rate + score drift (the numbers PERF.md quotes)
        p16 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, p)

        @jax.jit
        def pipe_beam16(p, w, wl):
            f, fl = features.featurize_batch(w, wl, cfg.audio)
            res = beam.beam_decode(p, cfg, bw, f.astype(jnp.bfloat16), fl)
            return (beam.select_best(res, cfg.decode.length_weight),
                    res.l_final)

        b32 = pipe_beam(p, wavs, wlens)[0]
        b16 = pipe_beam16(p16, wavs, wlens)[0]
        t32, l32 = np.asarray(b32.tokens), np.asarray(b32.lens)
        t16, l16 = np.asarray(b16.tokens), np.asarray(b16.lens)
        match = sum(
            l32[i] == l16[i] and (t32[i, :l32[i]] == t16[i, :l16[i]]).all()
            for i in range(B))
        s32, s16 = np.asarray(b32.scores), np.asarray(b16.scores)
        d = np.abs(s32 - s16)
        print(f"bf16 vs f32 @ beam bw={bw}, B={B}: transcripts "
              f"{match}/{B} identical, |score delta| mean={d.mean():.4f} "
              f"max={d.max():.4f}, non-finite bf16 scores: "
              f"{int((~np.isfinite(s16)).sum())}", flush=True)
        bench(lambda _p, w, wl: pipe_beam16(p16, w, wl),
              lambda o: np.asarray(o[0].scores),
              f"beam bw={bw} bf16", lambda o: int(o[1]) + 1)


if __name__ == "__main__":
    main()
