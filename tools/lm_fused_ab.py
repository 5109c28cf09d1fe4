"""In-process A/B: fused first-pass-LM decode, legacy vs reworked step.

Round 4 reworked `decode/lm_fused.py`'s loop body (token-sorted pool +
plain top_k selection, packed survivor gather, cum gathered from the
pool instead of a per-step [B*k,1] LM rescore).  Both variants live
behind `legacy_select`; this tool times whole decodes (featurize +
encode + loop, the bench row's unit) back-to-back in one process at the
headline config so tunnel weather cancels.  Only this kind of A/B
decides the default (CLAUDE.md: standalone microbenches have ranked
kernels in the OPPOSITE order before).

Run on the TPU host:  python tools/lm_fused_ab.py
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
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--bw", type=int, default=16)
    ap.add_argument("--topn", type=int, default=20)
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--small", action="store_true",
                    help="tiny model + forced CPU (flow smoke)")
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
        dlm = device_ngram.DeviceNgramLM.from_path(arpa)
    tok2lm = jnp.asarray(dlm.token_id_table(vocab))

    SR = cfg.audio.sample_rate
    wavs = jnp.asarray((0.1 * rng.randn(args.batch, int(args.secs * SR))
                        ).astype(np.float32))
    lens = jnp.asarray(np.full(args.batch, int(args.secs * SR), np.int64))
    feats, flens = jax.jit(lambda w, l: features.featurize_batch(
        w, l, cfg.audio))(wavs, lens)
    np.asarray(flens)

    def decode(legacy):
        res = lm_fused.lm_fused_decode_jit(
            params, cfg, args.bw, feats, flens, dlm, tok2lm,
            topn=args.topn, legacy_select=legacy)
        return np.asarray(res.fin_count), np.asarray(res.l_final), res

    # warm both programs, assert identical results on the same inputs
    # (live tokens + scores too: with random weights nothing may finish,
    # and an all-zero fin_count would compare equal trivially)
    fc_new, lf_new, r_new = decode(False)
    fc_leg, lf_leg, r_leg = decode(True)
    assert np.array_equal(fc_new, fc_leg) and lf_new == lf_leg, \
        (fc_new, fc_leg, lf_new, lf_leg)
    assert np.array_equal(np.asarray(r_new.live_tokens),
                          np.asarray(r_leg.live_tokens))
    assert np.allclose(np.asarray(r_new.live_scores),
                       np.asarray(r_leg.live_scores), atol=1e-5)
    print(f"# warm ok: l_final={int(lf_new)} fin_count mean "
          f"{fc_new.mean():.1f} live_scores mean "
          f"{np.asarray(r_new.live_scores).mean():.3f}", flush=True)

    times = {"new": [], "legacy": []}
    for t in range(args.trials):
        for name, legacy in (("new", False), ("legacy", True)):
            t0 = time.perf_counter()
            decode(legacy)
            dt = (time.perf_counter() - t0) * 1e3
            times[name].append(dt)
            print(f"# trial {t} {name:<7}{dt:8.1f} ms/batch", flush=True)
    for name, ts in times.items():
        print(f"# {name:<7} median {np.median(ts):7.1f}  "
              f"min {min(ts):7.1f}  ms/batch", flush=True)


if __name__ == "__main__":
    main()
