"""Fused first-pass-LM decode at the PRODUCTION LM scale: a synthetic
5-gram with per-level entry counts shaped like the reference's shipped
artifact class (zh_giga.no_cna_cmn.prune01244.klm, reference gpd.py:121
— a pruned 5-gram over ~5k characters), hashed key layout (what
`DeviceNgramLM.from_path` builds from any `.klm`).

Timing is key-content-independent (the probe issues the same gathers on
hit or miss), so the tables are built directly from random 64-bit keys
at the target entry counts — no 100 MB ARPA round trip — with real
`_build_table` placement and a dense unigram level over the identity
vocab.  Wide vs narrow window layouts A/B in one process on the FULL
fused decode (B=128, bw=16, topn=20, 10 s utts by default).

Run on the TPU host:  python tools/lm_fused_scale_bench.py
  [--entries 5000,500000,1000000,1000000,500000] [--rounds 3]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def build_synth_dlm(entries, vocab_size, rng, wide: bool,
                    ctx_gated: bool = True):
    """A DeviceNgramLM with hashed random keys at the given per-level
    entry counts (order = len(entries)); level 1 is the dense table
    over 0..vocab_size-1 like from_lm builds.

    ``ctx_gated=True`` marks the tables as context-property-holding the
    way every kenlm-built artifact is.  NOTE the hit-rate caveat: the
    keys are random 64-bit values, so the decode's context probes
    essentially NEVER hit — the gated number is the maximum-win bracket
    (all high-order probes redirect to one hot row).  The ungated
    number is the all-contexts-hit bracket (no probe ever redirects —
    the same random-row gathers either way); a real corpus+LM sits
    between the two, nearer the gated end the harder the LM is pruned."""
    import jax.numpy as jnp
    from chinese_asr_tpu.lm import device_ngram as dn
    order = len(entries)
    tbls, probes = [], []
    uni = None
    for k in range(order):
        n = entries[k]
        if k == 0:
            keys = np.arange(n, dtype=np.int32)[:, None]
            vals = np.stack([
                rng.uniform(-6.0, -1.0, n).astype(np.float32),
                rng.uniform(-1.0, 0.0, n).astype(np.float32)], axis=1)
            uni = jnp.asarray(dn._build_dense_uni(keys[:, 0], vals))
        else:
            keys = np.unique(rng.randint(
                0, 2**31 - 1, size=(n, 2), dtype=np.int32), axis=0)
            vals = np.stack([
                rng.uniform(-6.0, -1.0, len(keys)).astype(np.float32),
                rng.uniform(-1.0, 0.0, len(keys)).astype(np.float32)],
                axis=1)
        t0 = time.perf_counter()
        t, p = dn._build_table(keys.astype(np.int32), vals)
        print(f"#   level {k + 1}: n={len(keys)} cap~{t.shape[0]} "
              f"probes={p} built in {time.perf_counter() - t0:.1f}s",
              flush=True)
        tbls.append(t)
        probes.append(p)
    if wide:
        tbls = dn._widen_tables(tbls, probes, skip=(0,))
    for k, t in enumerate(tbls):
        kcols = 1 if k == 0 else 2
        tag = "WIDE" if t.shape[1] > kcols + 2 else "narrow"
        print(f"#   level {k + 1}: width={t.shape[1]} ({tag}) "
              f"{t.nbytes / 1e6:.0f} MB", flush=True)
    tbls = [jnp.asarray(t) for t in tbls]
    return dn.DeviceNgramLM(order, tbls, probes, unk_id=0, word2id=None,
                            hashed=True, uni=uni, ctx_gated=ctx_gated)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--bw", type=int, default=16)
    ap.add_argument("--topn", type=int, default=20)
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--entries", default="5000,500000,1000000,1000000,500000")
    ap.add_argument("--narrow", action="store_true",
                    help="also measure the narrow layout (slower compile)")
    ap.add_argument("--gate-ab", action="store_true",
                    help="also measure with context-gated probing OFF "
                         "(the all-contexts-hit bracket; same tables)")
    ap.add_argument("--trace", action="store_true",
                    help="trace the wide variant; print top ops by "
                         "self-time")
    args = ap.parse_args()
    entries = [int(x) for x in args.entries.split(",")]

    import jax
    import jax.numpy as jnp

    from chinese_asr_tpu.api import _identity_vocab
    from chinese_asr_tpu.audio import features
    from chinese_asr_tpu.config import Config
    from chinese_asr_tpu.decode import lm_fused
    from chinese_asr_tpu.models import las
    from chinese_asr_tpu.ops.pallas import topk as pallas_topk
    from chinese_asr_tpu.utils import compile_cache

    compile_cache.configure(ROOT, cpu=jax.default_backend() == "cpu")
    cfg = Config()
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    vocab = _identity_vocab(cfg.vocab.vocab_size)
    rng = np.random.RandomState(0)
    V = cfg.vocab.vocab_size
    tok2lm = jnp.asarray(np.arange(V, dtype=np.int32) % entries[0])

    B, k, topn = args.batch, args.bw, args.topn
    SR = cfg.audio.sample_rate
    wavs = jnp.asarray((0.1 * rng.randn(B, int(args.secs * SR))
                        ).astype(np.float32))
    lens = jnp.asarray(np.full(B, int(args.secs * SR), np.int64))
    feats, flens = jax.jit(lambda w, l: features.featurize_batch(
        w, l, cfg.audio))(wavs, lens)
    np.asarray(flens)
    use_pallas = pallas_topk.use_pallas_topk()

    variants = [("wide", True)] + ([("narrow", False)] if args.narrow
                                   else [])
    fns, lms = {}, {}
    for name, wide in variants:
        print(f"# building {name} 5-gram tables:", flush=True)
        lms[name] = build_synth_dlm(entries, V, np.random.RandomState(1),
                                    wide)
    if args.gate_ab:
        # gate ON for the property-marked tables ("wide" becomes the
        # gated variant; random keys = the all-miss best-case bracket)
        # vs the same tables unmarked ("nogate" = the all-contexts-hit
        # bracket).  The gate lost this A/B (+18% — see _use_gate's
        # measured-negative note) and is opt-in, hence the env set here.
        os.environ["CHINESE_ASR_DLM_GATE"] = "1"
        base = lms["wide"]
        from chinese_asr_tpu.lm.device_ngram import DeviceNgramLM
        lms["nogate"] = DeviceNgramLM(
            base.order, base.tbls, base.probes, base.unk_id, None,
            hashed=True, uni=base.uni, ctx_gated=False)
        variants.append(("nogate", True))
    for name, _wide in variants:
        fns[name] = jax.jit(functools.partial(
            lm_fused.lm_fused_decode, cfg=cfg, bw=k, topn=topn,
            use_pallas=use_pallas))
        t0 = time.perf_counter()
        res = fns[name](params, feats=feats, feat_lens=flens,
                        dlm=lms[name], tok2lm=tok2lm)
        np.asarray(res.fin_count)
        print(f"# {name}: compile+first run "
              f"{time.perf_counter() - t0:.1f}s", flush=True)

    if args.trace:
        import glob
        import gzip
        import json
        tdir = os.path.join(ROOT, ".profile_trace_scale")
        with jax.profiler.trace(tdir):
            for _ in range(3):
                res = fns["wide"](params, feats=feats, feat_lens=flens,
                                  dlm=lms["wide"], tok2lm=tok2lm)
                np.asarray(res.fin_count)
        traces = sorted(glob.glob(
            os.path.join(tdir, "**", "*.trace.json.gz"), recursive=True),
            key=os.path.getmtime)
        with gzip.open(traces[-1], "rt") as f:
            ev = json.load(f).get("traceEvents", [])
        tot = {}
        for e in ev:
            if e.get("ph") == "X" and "dur" in e:
                tot[e["name"]] = tot.get(e["name"], 0) + e["dur"]
        print("# top ops by total self-time (us, 3 batches):")
        for nm, dur in sorted(tot.items(), key=lambda kv: -kv[1])[:25]:
            print(f"#  {dur:>12.0f}  {nm[:110]}")
        return

    def run(name, reps=3):
        t0 = time.perf_counter()
        for _ in range(reps):
            res = fns[name](params, feats=feats, feat_lens=flens,
                            dlm=lms[name], tok2lm=tok2lm)
            np.asarray(res.fin_count)
        return (time.perf_counter() - t0) / reps * 1e3

    audio_s = B * args.secs
    for r in range(args.rounds):
        for name, _ in variants:
            ms = run(name)
            print(f"round {r} {name:<7} {ms:8.1f} ms/batch  "
                  f"RTF {audio_s / (ms / 1e3):8.0f}x", flush=True)


if __name__ == "__main__":
    main()
