"""Dump the optimized HLO of the fused LM decode and print the named
fusions the trace attributes time to (tools/lm_fused_profile.py --trace),
so a fusion.N self-time can be mapped to source ops.

Run on the TPU host:  python tools/lm_fused_hlo.py [--name fusion.230]
"""

from __future__ import annotations

import argparse
import functools
import os
import re
import sys
import tempfile

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--bw", type=int, default=16)
    ap.add_argument("--topn", type=int, default=20)
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--name", default=None,
                    help="print only this computation (e.g. fusion.230)")
    ap.add_argument("--out", default=None, help="write full HLO text here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from chinese_asr_tpu.api import _identity_vocab
    from chinese_asr_tpu.audio import features
    from chinese_asr_tpu.config import Config
    from chinese_asr_tpu.decode import lm_fused
    from chinese_asr_tpu.lm import device_ngram
    from chinese_asr_tpu.models import las
    from chinese_asr_tpu.ops.pallas import topk as pallas_topk

    cfg = Config()
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    vocab = _identity_vocab(cfg.vocab.vocab_size)
    rng = np.random.RandomState(0)
    from bench import _mk_arpa
    with tempfile.TemporaryDirectory() as td:
        arpa = os.path.join(td, "lm.arpa")
        _mk_arpa(arpa, vocab, rng)
        dlm = device_ngram.DeviceNgramLM.from_path(arpa)
    tok2lm = jnp.asarray(dlm.token_id_table(vocab))

    B, k, topn = args.batch, args.bw, args.topn
    SR = cfg.audio.sample_rate
    wavs = jnp.asarray((0.1 * rng.randn(B, int(args.secs * SR))
                        ).astype(np.float32))
    lens = jnp.asarray(np.full(B, int(args.secs * SR), np.int64))
    feats, flens = jax.jit(lambda w, l: features.featurize_batch(
        w, l, cfg.audio))(wavs, lens)

    fn = jax.jit(functools.partial(
        lm_fused.lm_fused_decode, cfg=cfg, bw=k, topn=topn,
        use_pallas=pallas_topk.use_pallas_topk()))
    txt = fn.lower(params, feats=feats, feat_lens=flens, dlm=dlm,
                   tok2lm=tok2lm).compile().as_text()
    if args.out:
        with open(args.out, "w") as f:
            f.write(txt)
        print(f"# wrote {len(txt)} bytes to {args.out}")
    if args.name:
        # print the fused computation called by this instruction
        m = re.search(rf"%?{re.escape(args.name)} = .*", txt)
        if m:
            print("# instruction:")
            print(m.group(0)[:2000])
            cm = re.search(r"calls=([%\w.\-]+)", m.group(0))
            if cm:
                comp = cm.group(1).lstrip("%")
                cm2 = re.search(
                    rf"^%?{re.escape(comp)}[^\n]*\{{(.*?)^\}}", txt,
                    re.S | re.M)
                if cm2:
                    body = cm2.group(1)
                    print(f"# computation {comp} ({body.count(chr(10))} lines):")
                    print(body[:8000])
        else:
            print(f"# {args.name} not found")
    else:
        # summary: largest fusion computations by line count
        sizes = []
        for m in re.finditer(r"^%?([\w.\-]*fused[\w.\-]*)[^\n]*\{", txt,
                             re.M):
            start = m.end()
            end = txt.find("\n}", start)
            sizes.append((txt.count("\n", start, end), m.group(1)))
        for n, name in sorted(sizes, reverse=True)[:20]:
            print(f"# {n:>5} lines  {name}")


if __name__ == "__main__":
    main()
