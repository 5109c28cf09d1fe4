"""Per-component timing of the fused on-device-LM decode step.

PERF.md records the fused first-pass-LM decode at ~11.5 ms/step at the
headline config (B=128, bw=16, topn=20) vs ~1.1 ms/step for the acoustic
beam — this tool names where the extra ~10 ms/step goes.  Each component
of `decode/lm_fused.py`'s while_loop body runs standalone as its own
jitted `lax.fori_loop` of `--steps` iterations with a data-dependent
carry (so XLA cannot elide the repeats), at exactly the shapes the
headline batch produces.  Components:

  step       decoder_step_beam on the B*k tiled rows (shared with beam.py)
  topk       acoustic proposals: top-topn over logit [B*k, V]
  lm_pool    DeviceNgramLM.score_candidates on the [B*k, topn] pool
  select     candidate pool ordering (lexsort desc-score / asc-col + gathers;
             the LEGACY body's stage — the reworked body replaced it with a
             token pre-sort + plain top_k after this profile named it)
  harvest    finished-hypothesis one-hot gather + fin buffer updates
  reorder    survivor one-hot reorders (hist / lm_ctx / cell / attn)
  lm_chosen  the [B*k, 1] chosen-token rescore + context advance (LEGACY
             body's stage — the reworked body gathers the pool score)

plus the full fused decode on the same inputs for the cross-check
(components should roughly sum to it; the stages that carry real loop
state keep it as the fori_loop carry, everything else carries a scalar
— see the topk stage for why a dead-weight matrix carry poisons the
reading).

Run on the TPU host:  python tools/lm_fused_profile.py
Sync discipline: np.asarray() transfers (block_until_ready is a no-op
through the axon tunnel).
"""

from __future__ import annotations

import argparse
import functools
import glob
import gzip
import json
import os
import sys
import tempfile
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def timed(fn, min_iters=5, min_secs=3.0):
    np.asarray(fn())                       # warmup/compile
    iters, t0 = 0, time.perf_counter()
    while True:
        out = fn()
        iters += 1
        np.asarray(out)
        dt = time.perf_counter() - t0
        if iters >= min_iters and dt > min_secs:
            return dt / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--bw", type=int, default=16)
    ap.add_argument("--topn", type=int, default=20)
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--small", action="store_true",
                    help="tiny model + forced CPU (flow smoke)")
    ap.add_argument("--trace", action="store_true",
                    help="skip the stage loops; trace the FULL decode and "
                         "print top ops by self-time (the only attribution "
                         "that sees in-program overlap)")
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
    from chinese_asr_tpu.models import decoder as dec_ops
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

    B, k, topn, steps = args.batch, args.bw, args.topn, args.steps
    V = cfg.vocab.vocab_size
    BK = B * k
    max_len = cfg.decode.max_len
    dcfg, acfg = cfg.decoder, cfg.attention

    # same synthetic bigram LM as bench.py's lm1p row, via the C++ reader
    sys.path.insert(0, ROOT)
    from bench import _mk_arpa
    with tempfile.TemporaryDirectory() as td:
        arpa = os.path.join(td, "lm.arpa")
        _mk_arpa(arpa, vocab, rng)
        dlm = device_ngram.DeviceNgramLM.from_path(arpa)
    tok2lm = jnp.asarray(dlm.token_id_table(vocab))
    print(f"# LM order={dlm.order} hashed={dlm.hashed} probes={dlm.probes} "
          f"caps={[int(t.shape[0]) - (p - 1) for t, p in zip(dlm.tbls, dlm.probes)]}",
          flush=True)

    SR = cfg.audio.sample_rate
    wavs = jnp.asarray((0.1 * rng.randn(B, int(args.secs * SR))
                        ).astype(np.float32))
    lens = jnp.asarray(np.full(B, int(args.secs * SR), np.int64))
    feats, flens = jax.jit(lambda w, l: features.featurize_batch(
        w, l, cfg.audio))(wavs, lens)
    eb = jax.jit(functools.partial(las.encode, cfg=cfg))(
        params, feats=feats, feat_lens=flens)
    np.asarray(eb.mask)
    L = eb.keys.shape[0] if eb.keys.ndim == 3 else eb.keys.shape[1]
    print(f"# shapes: B={B} k={k} BK={BK} topn={topn} V={V} "
          f"keys={tuple(eb.keys.shape)}", flush=True)

    ctx_w = dec_ops.attn_hidden_width(acfg, eb.values.shape[-1])
    dtype = feats.dtype
    M1 = max(dlm.order - 1, 1)
    pool_w = k * topn
    cand = 2 * k

    def tile(t):
        return jnp.repeat(t, k, axis=0)

    cell0 = eb.init_cell_state
    if cell0 is None:
        z = jnp.zeros((BK, dcfg.hidden_size), dtype)
        cell0 = [(z, z) if dcfg.decoder_type == "LSTM" else z] * dcfg.num_layers
    else:
        cell0 = [tuple(tile(e) for e in s) if isinstance(s, tuple) else tile(s)
                 for s in cell0]
    attn0 = jnp.zeros((BK, ctx_w), dtype)
    tokens0 = jnp.full((BK,), cfg.vocab.sos, jnp.int32)

    results = {}

    if args.trace:
        def run_full():
            res = lm_fused.lm_fused_decode_jit(params, cfg, k, feats, flens,
                                               dlm, tok2lm, topn)
            return res.fin_count

        np.asarray(run_full())                               # compile
        t0 = time.perf_counter()
        np.asarray(run_full())
        print(f"# FULL {(time.perf_counter() - t0) * 1e3:.1f} ms/batch")
        tdir = os.path.join(ROOT, ".profile_trace")
        with jax.profiler.trace(tdir):
            for _ in range(3):
                np.asarray(run_full())
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
        for name, dur in sorted(tot.items(), key=lambda kv: -kv[1])[:30]:
            print(f"#  {dur:>12.0f}  {name[:110]}")
        return

    # ---- step: decoder_step_beam --------------------------------------
    @jax.jit
    def run_step(cell, attn, toks):
        def body(i, c):
            cell, attn, toks = c
            out = dec_ops.decoder_step_beam(
                params["decoder"], params["attention"], dcfg, acfg,
                eb.mask, eb.keys, eb.values, toks, cell, attn)
            toks = jnp.argmax(out.logit, axis=-1).astype(jnp.int32)
            return out.cell_state, out.attn_hidden_state, toks
        return jax.lax.fori_loop(0, steps, body, (cell, attn, toks))[2]

    results["step"] = timed(lambda: run_step(cell0, attn0, tokens0))

    # ---- topk: proposals over the logit -------------------------------
    # CARRY DISCIPLINE (the first cut of this stage carried the whole
    # [B*k, V] logit and added 1e-7*mean each iteration — that forces a
    # full 41 MB elementwise rewrite per step and read 85 ms/step where
    # the real kernel costs ~1 ms; verified by the scalar-carry twin).
    # The carry must be a SCALAR the next iteration depends on.
    logit0 = jnp.asarray(rng.randn(BK, V).astype(np.float32))
    use_pallas = (not args.small) and pallas_topk.use_pallas_topk()

    @jax.jit
    def run_topk(logit):
        def body(i, acc):
            if use_pallas:
                vals, _ = pallas_topk.top_k(logit + acc * 1e-30, topn)
            else:
                vals, _ = jax.lax.top_k(logit + acc * 1e-30, topn)
            return acc + vals[0, 0]
        return jax.lax.fori_loop(0, steps, body, jnp.float32(0))

    results["topk"] = timed(lambda: run_topk(logit0))

    # ---- lm_pool: score the [BK, topn] candidate pool -----------------
    ctx0 = jnp.asarray(dlm.null_context(BK))
    cand0 = jnp.asarray(rng.randint(0, V, (BK, topn)).astype(np.int32))
    cand_lm0 = tok2lm[cand0]

    @jax.jit
    def run_lm_pool(ctx, cand_lm):
        def body(i, c):
            ctx, cand_lm = c
            sc = device_ngram.score_candidates(dlm, ctx, cand_lm)
            ctx = device_ngram.advance_context(ctx, cand_lm[:, 0])
            cand_lm = jnp.roll(cand_lm, 1, axis=1)
            return ctx, cand_lm
        return jax.lax.fori_loop(0, steps, body, (ctx, cand_lm))[0]

    results["lm_pool"] = timed(lambda: run_lm_pool(ctx0, cand_lm0))

    # ---- select: pool ordering ----------------------------------------
    pool_beam = (jnp.arange(pool_w, dtype=jnp.int32) // topn)[None, :]
    pool_sc0 = jnp.asarray(rng.randn(B, pool_w).astype(np.float32))
    pool_tok0 = jnp.asarray(rng.randint(0, V, (B, pool_w)).astype(np.int32))

    @jax.jit
    def run_select(pool_sc):
        def body(i, sc):
            pool_col = pool_beam * V + pool_tok0
            order = jnp.lexsort((pool_col, -sc), axis=-1)[:, :cand]
            cand_scores = jnp.take_along_axis(sc, order, axis=1)
            cand_beams = jnp.take_along_axis(
                jnp.broadcast_to(pool_beam, sc.shape), order, axis=1)
            cand_toks = jnp.take_along_axis(pool_tok0, order, axis=1)
            return sc + 1e-7 * (cand_scores.mean()
                                + cand_beams.sum() + cand_toks.sum())
        return jax.lax.fori_loop(0, steps, body, pool_sc)

    results["select"] = timed(lambda: run_select(pool_sc0))

    # ---- harvest: finished bookkeeping ---------------------------------
    hist0 = jnp.full((BK, max_len + 1), cfg.vocab.pad, jnp.int32)
    fin_tokens0 = jnp.zeros((B, max_len, k, max_len), jnp.int32)
    fin_scores0 = jnp.full((B, max_len, k), -jnp.inf, jnp.float32)
    cand_beams0 = jnp.asarray(rng.randint(0, k, (B, cand)).astype(np.int32))
    cand_scores0 = jnp.asarray(rng.randn(B, cand).astype(np.float32))
    eos = cfg.vocab.eos

    @jax.jit
    def run_harvest(fin_tokens, fin_scores):
        def body(l, c):
            fin_tokens, fin_scores = c
            top_beams = cand_beams0[:, :k]
            fmask = (cand_beams0[:, :k] % 7) == 0
            hist3 = hist0.reshape(B, k, max_len + 1).astype(jnp.float32)
            top_oh = jax.nn.one_hot(top_beams, k, dtype=jnp.float32)
            hist_k = jnp.rint(jnp.einsum(
                "bik,bkl->bil", top_oh, hist3,
                precision=jax.lax.Precision.HIGHEST))[:, :, 1:].astype(jnp.int32)
            l_ = l % max_len
            fin_tokens = jax.lax.dynamic_update_index_in_dim(
                fin_tokens, hist_k, l_, axis=1)
            fin_scores = jax.lax.dynamic_update_index_in_dim(
                fin_scores,
                jnp.where(fmask, cand_scores0[:, :k], -jnp.inf), l_, axis=1)
            return fin_tokens, fin_scores
        return jax.lax.fori_loop(0, steps, body,
                                 (fin_tokens, fin_scores))[1]

    results["harvest"] = timed(lambda: run_harvest(fin_tokens0, fin_scores0))

    # ---- reorder: survivor gathers -------------------------------------
    h0 = cell0[0][0] if isinstance(cell0[0], tuple) else cell0[0]

    @jax.jit
    def run_reorder(hist, lm_ctx, h, c, attn):
        def body(i, carry):
            hist, lm_ctx, h, c, attn = carry
            k_beams = jnp.abs(hist.reshape(B, k, -1)[:, :, 1]) % k
            sel_oh = jax.nn.one_hot(k_beams, k, dtype=jnp.float32)

            def reorder(t):
                t3 = t.reshape(B, k, -1)
                return jnp.einsum("bik,bkd->bid", sel_oh.astype(t.dtype), t3,
                                  precision=jax.lax.Precision.HIGHEST
                                  ).reshape(BK, -1)

            def reorder_i32(t):
                t3 = t.reshape(B, k, -1).astype(jnp.float32)
                return jnp.rint(jnp.einsum(
                    "bik,bkl->bil", sel_oh, t3,
                    precision=jax.lax.Precision.HIGHEST)
                ).astype(jnp.int32).reshape(BK, -1)

            hist = reorder_i32(hist)
            hist = jax.lax.dynamic_update_index_in_dim(
                hist, (hist[:, 0] + 1) % V, (i % max_len) + 1, axis=1)
            lm_ctx = reorder_i32(lm_ctx)
            h, c, attn = reorder(h), reorder(c), reorder(attn)
            return hist, lm_ctx, h, c, attn
        return jax.lax.fori_loop(
            0, steps, body, (hist, lm_ctx, h, c, attn))[0]

    lm_ctx0 = jnp.zeros((BK, M1), jnp.int32)
    results["reorder"] = timed(
        lambda: run_reorder(hist0, lm_ctx0, h0, h0, attn0))

    # ---- lm_chosen: [BK, 1] rescore + advance ---------------------------
    @jax.jit
    def run_lm_chosen(ctx, chosen):
        def body(i, c):
            ctx, chosen = c
            sc = device_ngram.score_candidates(dlm, ctx, chosen[:, None])[:, 0]
            ctx = device_ngram.advance_context(ctx, chosen)
            chosen = (chosen + sc.astype(jnp.int32) % 3 + 1) % jnp.int32(
                max(V - 4, 1)) + 4
            return ctx, chosen
        return jax.lax.fori_loop(0, steps, body, (ctx, chosen))[0]

    chosen0 = jnp.asarray(rng.randint(4, V, (BK,)).astype(np.int32))
    results["lm_chosen"] = timed(
        lambda: run_lm_chosen(jnp.asarray(dlm.null_context(BK)),
                              tok2lm[chosen0]))

    # ---- full fused decode (cross-check) --------------------------------
    def run_full():
        res = lm_fused.lm_fused_decode_jit(params, cfg, k, feats, flens,
                                           dlm, tok2lm, topn)
        return res.fin_count

    full = timed(run_full, min_iters=3)
    results["FULL(decode)"] = full

    tot = sum(v for n, v in results.items() if not n.startswith("FULL"))
    print(f"\n# per-component ms/step over {steps} fori_loop iterations "
          f"(B={B} bw={k} topn={topn}):")
    for name, t in sorted(results.items(), key=lambda kv: -kv[1]):
        per = t / steps * 1e3
        note = "  <- whole pipeline (featurize+encode+loop)" \
            if name.startswith("FULL") else ""
        print(f"#   {name:<14}{per:>8.3f} ms/step   "
              f"({t * 1e3:>7.1f} ms loop){note}", flush=True)
    print(f"#   {'SUM(components)':<14}{tot / steps * 1e3:>8.3f} ms/step")


if __name__ == "__main__":
    main()
