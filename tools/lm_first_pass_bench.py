"""First-pass-LM decode: wall time + per-stage host profile.

VERDICT r3 #9: PERF.md recorded WHAT the first-pass-LM bottleneck is not
(software pipelining changed nothing -> not the tunnel alone); this tool
names what it IS, via the stage hooks in decode/lm_first_pass.py:

  pull_top          blocking device->host pull of the step's top tokens
  lm_score          batched C++ base-score over (beam, candidate) pairs
  select            numpy candidate pool selection
  reorder_dispatch  survivor gathers + next-step dispatch (incl. the
                    token/sel uploads, which BLOCK the host on the
                    development tunnel)
  harvest           per-sample finished-hypothesis bookkeeping (python)
  lm_advance        n-gram state reorder + advance

Run on the TPU host:
  python tools/lm_first_pass_bench.py [--batch 32 --bw 8 --topn 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--bw", type=int, default=8)
    ap.add_argument("--topn", type=int, default=20)
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--small", action="store_true",
                    help="tiny model + forced CPU (flow smoke)")
    ap.add_argument("--fused", action="store_true",
                    help="also run the fused on-device-LM decode "
                         "(decode/lm_fused.py) on the same inputs")
    args = ap.parse_args()
    if args.small:
        os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

    import jax
    import jax.numpy as jnp

    from chinese_asr_tpu.api import _identity_vocab
    from chinese_asr_tpu.audio import features
    from chinese_asr_tpu.config import Config
    from chinese_asr_tpu.decode import lm_first_pass
    from chinese_asr_tpu.lm import ngram
    from chinese_asr_tpu.models import las
    from chinese_asr_tpu.utils import compile_cache

    if args.small:
        jax.config.update("jax_platforms", "cpu")
    compile_cache.configure(ROOT, cpu=jax.default_backend() == "cpu")
    cfg = Config()
    if args.small:
        cfg = (cfg.with_("encoder", hidden_size=16, num_layers=2)
                  .with_("decoder", hidden_size=32, embed_dim=12)
                  .with_("attention", attn_size=8)
                  .with_("vocab", max_num_words=60)
                  .with_("decode", max_len=6))
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    vocab = _identity_vocab(cfg.vocab.vocab_size)
    rng = np.random.RandomState(0)

    # synthetic bigram LM over the identity vocab
    words = [vocab.int2word[i] for i in range(4, cfg.vocab.vocab_size)]
    n_bi = min(20000, len(words) * len(words) // 2)
    bi = set()
    while len(bi) < n_bi:
        a, b = rng.randint(0, len(words), 2)
        bi.add((words[a], words[b]))
    lines = ["\\data\\", f"ngram 1={len(words) + 3}", f"ngram 2={len(bi)}",
             "", "\\1-grams:", "-2.5\t<unk>\t-0.5", "-2.0\t<s>\t-0.5",
             "-2.2\t</s>"]
    lines += [f"{-2.0 - 2.0 * rng.rand():.4f}\t{w}\t-0.4" for w in words]
    lines += ["", "\\2-grams:"]
    lines += [f"{-1.0 - 1.5 * rng.rand():.4f}\t{a} {b}"
              for a, b in sorted(bi)]
    lines += ["", "\\end\\", ""]
    with tempfile.TemporaryDirectory() as td:
        arpa = os.path.join(td, "lm.arpa")
        with open(arpa, "w") as f:
            f.write("\n".join(lines))
        lm = ngram.NgramLM(arpa)

        SR = cfg.audio.sample_rate
        B = args.batch
        wavs = jnp.asarray((0.1 * rng.randn(B, int(args.secs * SR))
                            ).astype(np.float32))
        lens = jnp.asarray(np.full(B, int(args.secs * SR), np.int64))
        feats, flens = jax.jit(lambda w, l: features.featurize_batch(
            w, l, cfg.audio))(wavs, lens)
        feats.block_until_ready()

        # warmup (compiles)
        lm_first_pass.lm_first_pass_decode(params, cfg, args.bw, feats,
                                           flens, lm, vocab, args.topn)
        for rep in range(args.reps):
            prof: dict = {}
            t0 = time.perf_counter()
            lm_first_pass.lm_first_pass_decode(
                params, cfg, args.bw, feats, flens, lm, vocab, args.topn,
                profile=prof)
            wall = time.perf_counter() - t0
            steps = prof.pop("steps", 1)
            acc = sum(prof.values())
            print(f"# rep {rep}: {wall * 1e3:.0f} ms/batch "
                  f"({wall / steps * 1e3:.1f} ms/step x {steps} steps, "
                  f"B={B} bw={args.bw} topn={args.topn})")
            for k in sorted(prof, key=lambda k: -prof[k]):
                print(f"#   {k:<18}{prof[k] * 1e3:>8.0f} ms "
                      f"({prof[k] / wall * 100:>4.1f}% of wall, "
                      f"{prof[k] / steps * 1e3:>6.2f} ms/step)")
            print(f"#   {'(untimed gap)':<18}"
                  f"{(wall - acc) * 1e3:>8.0f} ms "
                  f"({(wall - acc) / wall * 100:>4.1f}% of wall)",
                  flush=True)

        if args.fused:
            from chinese_asr_tpu.decode import lm_fused
            from chinese_asr_tpu.lm.device_ngram import DeviceNgramLM
            dlm = DeviceNgramLM.from_arpa(arpa)
            tok2lm = jnp.asarray(dlm.token_id_table(vocab))
            t0 = time.perf_counter()
            res = lm_fused.lm_fused_decode_jit(
                params, cfg, args.bw, feats, flens, dlm, tok2lm, args.topn)
            np.asarray(res.fin_count)
            print(f"# fused: compile+first run {time.perf_counter() - t0:.1f} s",
                  flush=True)
            for rep in range(args.reps):
                t0 = time.perf_counter()
                res = lm_fused.lm_fused_decode_jit(
                    params, cfg, args.bw, feats, flens, dlm, tok2lm,
                    args.topn)
                # pull the compacted n-best (the product consumption path)
                from chinese_asr_tpu.decode import beam as beam_mod
                comp = beam_mod.compact_nbest(res)
                [np.asarray(x) for x in comp]
                wall = time.perf_counter() - t0
                print(f"# fused rep {rep}: {wall * 1e3:.0f} ms/batch "
                      f"(incl. compacted n-best pull)", flush=True)


if __name__ == "__main__":
    main()
