"""In-process A/B: device-LM probe layout (planes vs stacked) measured
on the FULL fused first-pass-LM decode — the only decision-grade harness
for kernel choices in this repo (PERF.md "Is the Pallas kernel actually
faster...": chained microbenches rank backends in the opposite order).

planes  every elementwise op of the probe on [P, N]/[N] arrays with the
        flattened query axis minor (full 128-lane vregs)
stacked the round-5 [..., P, k] formulation (fusion.230: <1% lane
        utilization, 1.19 ms/step of a 3.1 ms/step loop)

Alternating rounds in ONE process; outputs asserted bit-identical.

Run on the TPU host:  python tools/dlm_layout_ab.py [--rounds 3]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import tempfile
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--bw", type=int, default=16)
    ap.add_argument("--topn", type=int, default=20)
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()
    if args.small:
        os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

    import jax
    import jax.numpy as jnp

    from chinese_asr_tpu.api import _identity_vocab
    from chinese_asr_tpu.audio import features
    from chinese_asr_tpu.config import Config
    from chinese_asr_tpu.decode import lm_fused
    from chinese_asr_tpu.lm import device_ngram
    from chinese_asr_tpu.models import las
    from chinese_asr_tpu.ops.pallas import topk as pallas_topk
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
    from bench import _mk_arpa
    with tempfile.TemporaryDirectory() as td:
        arpa = os.path.join(td, "lm.arpa")
        _mk_arpa(arpa, vocab, rng)
        os.environ.pop("CHINESE_ASR_DLM_WIDE", None)
        dlm = device_ngram.DeviceNgramLM.from_path(arpa)      # wide tables
        os.environ["CHINESE_ASR_DLM_WIDE"] = "0"
        dlm_n = device_ngram.DeviceNgramLM.from_path(arpa)    # narrow
        os.environ.pop("CHINESE_ASR_DLM_WIDE", None)
    tok2lm = jnp.asarray(dlm.token_id_table(vocab))

    B, k, topn = args.batch, args.bw, args.topn
    SR = cfg.audio.sample_rate
    wavs = jnp.asarray((0.1 * rng.randn(B, int(args.secs * SR))
                        ).astype(np.float32))
    lens = jnp.asarray(np.full(B, int(args.secs * SR), np.int64))
    feats, flens = jax.jit(lambda w, l: features.featurize_batch(
        w, l, cfg.audio))(wavs, lens)
    np.asarray(flens)

    use_pallas = (not args.small) and pallas_topk.use_pallas_topk()

    VARIANTS = {
        "planes+wide": ("planes", dlm),
        "planes+narrow": ("planes", dlm_n),
        "stacked+narrow": ("stacked", dlm_n),   # the round-5 baseline
    }

    def build(name):
        layout, lm = VARIANTS[name]
        os.environ["CHINESE_ASR_DLM_LAYOUT"] = layout
        fn = jax.jit(functools.partial(
            lm_fused.lm_fused_decode, cfg=cfg, bw=k, topn=topn,
            use_pallas=use_pallas))
        res = fn(params, feats=feats, feat_lens=flens, dlm=lm,
                 tok2lm=tok2lm)
        out = (np.asarray(res.fin_tokens), np.asarray(res.fin_scores),
               np.asarray(res.live_tokens), np.asarray(res.live_scores))
        return fn, out

    fns, outs = {}, {}
    for name in VARIANTS:
        fns[name], outs[name] = build(name)
    ref = outs["planes+wide"]
    for name, out in outs.items():
        for a, b in zip(ref, out):
            np.testing.assert_array_equal(a, b)
    print("# outputs bit-identical across variants", flush=True)

    def run(name, reps=3):
        fn, lm = fns[name], VARIANTS[name][1]
        t0 = time.perf_counter()
        for _ in range(reps):
            res = fn(params, feats=feats, feat_lens=flens, dlm=lm,
                     tok2lm=tok2lm)
            np.asarray(res.fin_count)
        return (time.perf_counter() - t0) / reps * 1e3

    audio_s = B * args.secs
    for r in range(args.rounds):
        for name in VARIANTS:
            ms = run(name)
            rtf = audio_s / (ms / 1e3)
            print(f"round {r} {name:<15} {ms:8.1f} ms/batch  "
                  f"RTF {rtf:8.0f}x", flush=True)


if __name__ == "__main__":
    main()
