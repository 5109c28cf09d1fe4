"""Full-pipeline A/B of decoder-step matmul formulations on the real TPU.

PERF.md's remaining ranked lever #3 is "fuse the decoder's gate matmuls
into fewer MXU calls".  Before writing a Pallas kernel, measure the two
cheap XLA-level reformulations in the only harness that decides kernel
questions here (CLAUDE.md: in-pipeline A/B, one process, alternating
rounds):

  default     gates = x @ W_ih + h @ W_hh   (two dots, epilogue add)
  cell_concat gates = [x | h] @ [W_ih; W_hh] (ONE dot over K=1280; the
              weight concat is loop-invariant, hoisted by XLA's LICM)
  emb_gather  x = emb[token] (row gather) instead of the one-hot MXU
              product (re-checks the round-1 "gather is slower" claim
              after the round-3 layout rework)

All variants change f32 reduction order only (cell_concat) or nothing
mathematically (emb_gather); transcripts are compared against the default
the same way PERF.md's top-k backend table does.

    python tools/decoder_fuse_ab.py [--B 128] [--bw 16] [--reps 5]
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
    p.add_argument("--rounds", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from chinese_asr_tpu.utils import compile_cache
    compile_cache.configure(_REPO, cpu=jax.default_backend() == "cpu")
    from chinese_asr_tpu.audio import features
    from chinese_asr_tpu.config import Config
    from chinese_asr_tpu.decode import beam
    from chinese_asr_tpu.models import decoder as dec_ops
    from chinese_asr_tpu.models import las
    from chinese_asr_tpu.ops import rnn as rnn_ops

    cfg = Config()
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    N = int(args.secs * SR)
    wavs = jnp.asarray((0.1 * rng.randn(args.B, N)).astype(np.float32))
    lens = jnp.asarray(np.full((args.B,), N, np.int64))

    def pipe_body(params, wavs, wav_lens):
        f, fl = features.featurize_batch(wavs, wav_lens, cfg.audio)
        res = beam.beam_decode(params, cfg, args.bw, f, fl)
        return beam.select_best(res, cfg.decode.length_weight)

    def build_default():
        return jax.jit(pipe_body)

    def lstm_step_concat(p, x, h, c):
        w = jnp.concatenate([p["w_ih"], p["w_hh"]], axis=0)   # loop-invariant
        gates = jnp.concatenate([x, h], axis=-1) @ w + p["b_ih"] + p["b_hh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
        return h2, c2

    def build_concat():
        @jax.jit
        def pipe(params, wavs, wav_lens):
            orig = rnn_ops.lstm_step
            rnn_ops.lstm_step = lstm_step_concat      # trace-time swap
            try:
                return pipe_body(params, wavs, wav_lens)
            finally:
                rnn_ops.lstm_step = orig
        return pipe

    def step_beam_gather(p, attn_p, dcfg, acfg, mask, keys, values, token,
                         cell_state, attn_hidden_state):
        import chinese_asr_tpu.models.attention as attn_ops
        B = mask.shape[0]
        k = token.shape[0] // B
        x = jnp.take(p["embedding"], token, axis=0)   # row gather, not one-hot
        if dcfg.input_feeding:
            x = jnp.concatenate([x, attn_hidden_state], axis=1)
        cell_state = rnn_ops.cell_stack_step(dcfg.decoder_type, p["cells"],
                                             x, cell_state)
        last = cell_state[-1]
        last_h = last[0] if dcfg.decoder_type == "LSTM" else last
        context, alignment = attn_ops.attend_beam(
            attn_p, acfg, mask, last_h.reshape(B, k, -1), keys, values)
        context = context.reshape(B * k, -1)
        ahs = context
        logit = jnp.concatenate([last_h, ahs], axis=-1) @ p["proj_w"] + p["proj_b"]
        return dec_ops.DecoderOut(logit, ahs, alignment.reshape(B * k, -1),
                                  cell_state)

    def build_gather():
        @jax.jit
        def pipe(params, wavs, wav_lens):
            orig = dec_ops.decoder_step_beam
            dec_ops.decoder_step_beam = step_beam_gather
            try:
                return pipe_body(params, wavs, wav_lens)
            finally:
                dec_ops.decoder_step_beam = orig
        return pipe

    variants = {"default": build_default(), "cell_concat": build_concat(),
                "emb_gather": build_gather()}
    outs = {}
    for name, fn in variants.items():
        t0 = time.perf_counter()
        r = fn(params, wavs, lens)
        outs[name] = (np.asarray(r.tokens), np.asarray(r.scores))
        print(f"  {name}: compiled+first-run in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
    ref_t, ref_s = outs["default"]
    for name, (t, s) in outs.items():
        if name == "default":
            continue
        rows = int((t != ref_t).any(axis=1).sum())
        ds = float(np.abs(s - ref_s).max())
        print(f"  {name} vs default: {rows}/{args.B} token rows differ, "
              f"max |score delta| {ds:.3e}", flush=True)

    audio_s = args.B * args.secs
    for r in range(args.rounds):
        for name, fn in variants.items():
            res = fn(params, wavs, lens)
            np.asarray(res.tokens)
            t0 = time.perf_counter()
            for _ in range(args.reps):
                res = fn(params, wavs, lens)
            np.asarray(res.tokens)
            dt = (time.perf_counter() - t0) / args.reps
            print(f"  round {r}  {name:12s} {dt * 1e3:7.1f} ms/batch   "
                  f"RTF {audio_s / dt:8.0f}x", flush=True)


if __name__ == "__main__":
    main()
