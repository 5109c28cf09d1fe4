"""Fused first-pass-LM beam decode: the WHOLE loop on device, zero
per-step host syncs.

The host-driven first-pass decode (`decode/lm_first_pass.py`, reference
``eval_with_lm`` model.py:989-1360) is pinned at the development
tunnel's round trip: one blocking token pull per step because the LM
lives on the host (measured 89% of wall, PERF.md).  With the n-gram
tables on device (`lm/device_ngram.py`), the acoustic proposal, the
Katz-backoff LM rescoring, the fairseq-style candidate selection, the
finished-hypothesis harvest, and the survivor reorder are ONE jitted
``lax.while_loop`` — the same shape as `decode/beam.py`'s compiled beam
search, returning the same packed ``BeamResult`` so `select_best` /
`compact_nbest` / the n-best unpacking work unchanged.

Semantics mirror the host loop exactly (same proposals, same LM-only
pool scores ``cum + base``, same (score desc, beam*V+token asc)
candidate order, same first-k-non-eos survivor rule with
duplicate-last-live padding and unk dead-row pads, same
stop-when-every-sample-has-a-finished-hypothesis rule, same null LM
context — the host path scores with ``bos=False``).  Parity is pinned
by tests/test_lm_fused.py on random ARPAs + random weights.

Corner where the two may differ (documented, asserted away): strict
parity needs ``topn >= bw`` — at step 0 the host pool is beam 0's
``topn`` candidates while the fused pool pads the other beams' slots
with -inf duplicates, which can only surface as survivors when a
sample has fewer than ``bw`` non-eos real candidates."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import Config
from ..lm import device_ngram
from ..models import decoder as dec_ops
from ..models import las
from ..ops.pallas import topk as pallas_topk
from .beam import BeamResult


def lm_fused_decode(params, cfg: Config, bw: int, feats, feat_lens,
                    dlm: device_ngram.DeviceNgramLM, tok2lm,
                    topn: int = 20, use_pallas: bool = False,
                    legacy_select: bool = False) -> BeamResult:
    """tok2lm: [V] int32 device array mapping vocab token id -> LM word
    id (``dlm.token_id_table(vocab)``), the same table the host loop
    uses.

    ``legacy_select`` keeps the round-4 first-cut step body (lexsort
    pool ordering, per-field survivor gathers, and a fresh chosen-token
    LM rescore) for in-process A/Bs — see ``tools/lm_fused_ab.py``.  The
    default body is equivalent output-for-output (see the inline proofs)
    and measured faster on v5e (PERF.md)."""
    B = feats.shape[0]
    k = bw
    V = cfg.vocab.vocab_size
    max_len = cfg.decode.max_len
    cap = k * max_len
    cand = 2 * k
    eos = cfg.vocab.eos
    dcfg, acfg = cfg.decoder, cfg.attention
    assert topn >= k, "strict host parity needs topn >= bw (see docstring)"
    assert topn >= 2, "topn=1 can dead-end every candidate row (all-eos)"

    eb = las.encode(params, cfg, feats, feat_lens)
    ctx_w = dec_ops.attn_hidden_width(acfg, eb.values.shape[-1])
    dtype = feats.dtype

    def tile(t):
        return jnp.repeat(t, k, axis=0)

    cell0 = eb.init_cell_state
    if cell0 is None:
        z = jnp.zeros((B * k, dcfg.hidden_size), dtype)
        cell0 = [(z, z) if dcfg.decoder_type == "LSTM" else z] * dcfg.num_layers
    else:
        cell0 = [tuple(tile(e) for e in s) if isinstance(s, tuple) else tile(s)
                 for s in cell0]

    M1 = max(dlm.order - 1, 1)
    pool_w = k * topn
    pool_beam = (jnp.arange(pool_w, dtype=jnp.int32) // topn)[None, :]
    pool_pos = jnp.arange(pool_w, dtype=jnp.int32)[None, :]

    state0 = dict(
        l=jnp.int32(0),
        done=jnp.array(False),
        l_final=jnp.int32(max_len - 1),
        hist=jnp.full((B * k, max_len + 1), cfg.vocab.pad, jnp.int32)
             .at[:, 0].set(cfg.vocab.sos),
        cum=jnp.zeros((B * k,), jnp.float32),
        lm_ctx=jnp.full((B * k, M1), -1, jnp.int32),   # null context
        cell_state=cell0,
        attn_hidden=jnp.zeros((B * k, ctx_w), dtype),
        has_finished=jnp.zeros((B,), bool),
        fin_tokens=jnp.zeros((B, max_len, k, max_len), jnp.int32),
        fin_scores=jnp.full((B, max_len, k), -jnp.inf, jnp.float32),
    )

    def cond(s):
        return (s["l"] < max_len) & ~s["done"]

    def body(s):
        l = s["l"]
        tokens = jax.lax.dynamic_index_in_dim(s["hist"], l, axis=1,
                                              keepdims=False)
        out = dec_ops.decoder_step_beam(
            params["decoder"], params["attention"], dcfg, acfg,
            eb.mask, eb.keys, eb.values, tokens, s["cell_state"],
            s["attn_hidden"])

        # acoustic PROPOSALS only (the host loop's _make_step): top-topn
        # tokens per beam row; the LM alone scores the pool.  Only the
        # INDICES are consumed, and top-k order is invariant under the
        # positive 1/temperature scale, so the reworked body skips the
        # divide (one fewer full [B*k, V] elementwise pass per step).
        logit = out.logit.astype(jnp.float32)
        if legacy_select:
            logit = logit / dcfg.temperature
        if use_pallas:
            _, top_toks = pallas_topk.top_k(logit, topn)
        else:
            _, top_toks = jax.lax.top_k(logit, topn)
        top_toks = top_toks.astype(jnp.int32)               # [B*k, topn]
        if not legacy_select:
            # ascending token id within each beam row: the pool's flat
            # index order then EQUALS (beam*V + token) asc — beam-major
            # layout, tokens unique and ascending within a beam — so the
            # plain top_k below (ties -> lower index) reproduces the
            # host's (score desc, beam*V+token asc) candidate order with
            # no lexsort.  Sorting before the LM probe also means no
            # realignment gather: base is computed on the sorted tokens.
            top_toks = jnp.sort(top_toks, axis=1)

        base = device_ngram.score_candidates(dlm, s["lm_ctx"],
                                             tok2lm[top_toks])
        lm_scores = s["cum"][:, None] + base                # [B*k, topn]

        # ---- pool selection: score desc, then (beam*V + token) asc ----
        pool_sc = lm_scores.reshape(B, pool_w)
        pool_tok = top_toks.reshape(B, pool_w)
        # step 0: all beams identical -> only beam 0's topn are real
        pool_sc = jnp.where((l == 0) & (pool_pos >= topn), -jnp.inf, pool_sc)
        if legacy_select:
            pool_col = pool_beam * V + pool_tok
            order = jnp.lexsort((pool_col, -pool_sc), axis=-1)[:, :cand]
            cand_scores = jnp.take_along_axis(pool_sc, order, axis=1)
            cand_beams = jnp.take_along_axis(
                jnp.broadcast_to(pool_beam, pool_sc.shape), order, axis=1)
            cand_toks = jnp.take_along_axis(pool_tok, order, axis=1)
        else:
            cand_scores, i2 = jax.lax.top_k(pool_sc, cand)  # [B, 2k]
            cand_beams = (i2 // topn).astype(jnp.int32)
            cand_toks = jnp.take_along_axis(pool_tok, i2, axis=1)

        # ---- harvest finished among the top-k candidates ---------------
        top_beams = cand_beams[:, :k]
        fmask = cand_toks[:, :k] == eos                     # [B, k]
        hist3 = s["hist"].reshape(B, k, max_len + 1).astype(jnp.float32)
        top_oh = jax.nn.one_hot(top_beams, k, dtype=jnp.float32)
        hist_k = jnp.rint(jnp.einsum("bik,bkl->bil", top_oh, hist3,
                                     precision=jax.lax.Precision.HIGHEST)
                          )[:, :, 1:].astype(jnp.int32)
        fin_tokens = jax.lax.dynamic_update_index_in_dim(
            s["fin_tokens"], hist_k, l, axis=1)
        fin_scores = jax.lax.dynamic_update_index_in_dim(
            s["fin_scores"],
            jnp.where(fmask, cand_scores[:, :k], -jnp.inf), l, axis=1)

        # host stop rule: break once EVERY sample has >= 1 finished hyp
        has_finished = s["has_finished"] | jnp.any(fmask, axis=1)
        new_done = jnp.all(has_finished)
        l_final = jnp.where(new_done & ~s["done"], l, s["l_final"])

        # ---- survivors: first k non-eos IN CANDIDATE ORDER ---------------
        # The host loop additionally duplicates the last live candidate
        # when fewer than k are non-eos and pads (beam 0, unk) when none
        # are — both provably unreachable here: at l>0 each beam's topn
        # proposals are distinct tokens, so the 2k candidates hold at
        # most k eos (>= k live); at l==0 the finite slice is beam 0's
        # topn list (<= 1 eos) and the picked -inf pads span at most one
        # extra beam copy of it (2k-topn <= topn), so live >= 2k-2 >= k
        # for k >= 2, and >= 1 for k == 1 given topn >= 2 (asserted).
        # The legacy body kept the host's fallbacks; tests pin equality.
        is_eos = cand_toks == eos
        if legacy_select:
            nlive = jnp.minimum((~is_eos).sum(axis=1), k)   # [B]
            ordr = jnp.argsort(is_eos, axis=1, stable=True)  # non-eos first
            pos = jnp.minimum(jnp.arange(k, dtype=jnp.int32)[None, :],
                              jnp.maximum(nlive - 1, 0)[:, None])
            pick = jnp.take_along_axis(ordr, pos, axis=1)   # [B, k]
            k_beams = jnp.take_along_axis(cand_beams, pick, axis=1)
            k_toks = jnp.take_along_axis(cand_toks, pick, axis=1)
            dead = (nlive == 0)[:, None]
            k_beams = jnp.where(dead, 0, k_beams)
            k_toks = jnp.where(dead, cfg.vocab.unk, k_toks)
            new_cum = None                                  # rescored below
        else:
            # beam.py's rank trick + ONE packed gather: non-eos candidates
            # rank by position, eos candidates are pushed past the end, so
            # the k smallest ranks are the first k non-eos in candidate
            # order; beams/tokens/scores ride a single [B, 3, 2k] gather
            # (f32 bitcast to i32 — gathers preserve bits)
            rank = (jnp.arange(cand, dtype=jnp.int32)[None, :]
                    + is_eos.astype(jnp.int32) * cand)      # [B, 2k]
            _, pick = jax.lax.top_k(-rank, k)               # smallest k
            packed = jnp.stack(
                [cand_beams, cand_toks,
                 jax.lax.bitcast_convert_type(cand_scores, jnp.int32)],
                axis=1)
            sel = jnp.take_along_axis(packed, pick[:, None, :], axis=2)
            k_beams, k_toks = sel[:, 0], sel[:, 1]
            # the chosen candidate's pool score IS the host's update
            # cum[sel] + base(chosen | ctx[sel]) — same two f32 addends,
            # so gathering it replaces the legacy body's per-step [B*k,1]
            # LM rescore bit-for-bit (the rescore was the single largest
            # component of the fused step, tools/lm_fused_profile.py)
            new_cum = jax.lax.bitcast_convert_type(sel[:, 2], jnp.float32)

        sel_oh = jax.nn.one_hot(k_beams, k, dtype=jnp.float32)

        def reorder(t):
            t3 = t.reshape(B, k, -1)
            return jnp.einsum("bik,bkd->bid", sel_oh.astype(t.dtype), t3,
                              precision=jax.lax.Precision.HIGHEST
                              ).reshape(B * k, -1)

        def reorder_i32(t):
            t3 = t.reshape(B, k, -1).astype(jnp.float32)
            return jnp.rint(jnp.einsum(
                "bik,bkl->bil", sel_oh, t3,
                precision=jax.lax.Precision.HIGHEST)
            ).astype(jnp.int32).reshape(B * k, -1)

        hist = reorder_i32(s["hist"])
        hist = jax.lax.dynamic_update_index_in_dim(
            hist, k_toks.reshape(-1), l + 1, axis=1)
        lm_ctx = reorder_i32(s["lm_ctx"])
        chosen_lm = tok2lm[k_toks.reshape(-1)]
        if legacy_select:
            # exactly the host update: cum = cum[sel] + base(chosen |
            # ctx[sel]) (recomputed, so dead-row unk pads score like the
            # host's)
            cum = (reorder(s["cum"][:, None].astype(jnp.float32))[:, 0]
                   + device_ngram.score_candidates(
                       dlm, lm_ctx, chosen_lm[:, None])[:, 0])
        else:
            cum = new_cum.reshape(-1)
        lm_ctx = device_ngram.advance_context(lm_ctx, chosen_lm)
        cell_state = [tuple(reorder(e) for e in st) if isinstance(st, tuple)
                      else reorder(st) for st in out.cell_state]
        attn_hidden = reorder(out.attn_hidden_state)

        return dict(
            l=l + 1,
            done=new_done,
            l_final=l_final,
            hist=hist,
            cum=cum,
            lm_ctx=lm_ctx,
            cell_state=cell_state,
            attn_hidden=attn_hidden,
            has_finished=has_finished,
            fin_tokens=fin_tokens,
            fin_scores=fin_scores,
        )

    s = jax.lax.while_loop(cond, body, state0)
    fin_scores = s["fin_scores"].reshape(B, cap)
    fin_lens = jnp.broadcast_to(
        jnp.repeat(jnp.arange(max_len, dtype=jnp.int32), k)[None, :], (B, cap))
    tok_t = jnp.int16 if V <= 32767 else jnp.int32
    return BeamResult(
        fin_tokens=s["fin_tokens"].reshape(B, cap, max_len).astype(tok_t),
        fin_lens=fin_lens,
        fin_scores=fin_scores,
        fin_count=jnp.isfinite(fin_scores).sum(axis=1).astype(jnp.int32),
        live_tokens=s["hist"][:, 1:].reshape(B, k, max_len).astype(tok_t),
        live_scores=s["cum"].reshape(B, k),
        l_final=s["l_final"])


@functools.lru_cache(maxsize=32)
def _jitted(cfg: Config, bw: int, topn: int, use_pallas: bool, variant=None,
            legacy_select: bool = False):
    return jax.jit(functools.partial(lm_fused_decode, cfg=cfg, bw=bw,
                                     topn=topn, use_pallas=use_pallas,
                                     legacy_select=legacy_select))


def lm_fused_decode_jit(params, cfg: Config, bw: int, feats, feat_lens,
                        dlm, tok2lm, topn: int = 20,
                        legacy_select: bool = False) -> BeamResult:
    # the variant tuple re-keys the cache on every trace-time env knob
    # read inside: the top-k extraction flags AND the device-LM probe
    # flags (device_ngram.trace_variant)
    return _jitted(cfg, bw, topn, pallas_topk.use_pallas_topk(),
                   (pallas_topk.use_grouped_topk(),
                    pallas_topk.use_onepass_topk(),
                    device_ngram.trace_variant()), legacy_select)(
        params, feats=feats, feat_lens=feat_lens, dlm=dlm, tok2lm=tok2lm)


def select_best_first_pass(res: BeamResult):
    """Device-side replica of ``nbest_lists(res)[b][0]`` — the only row
    the transcription product path consumes: best finished hypothesis
    by LM score (first max in harvest order, like the host loop's
    stable sort-desc), else the live beam-0 fallback with score 0.0
    (`lm_first_pass_decode`'s contract).  Selecting on device drops the
    per-batch transfer from the compacted n-best buffers (~the whole
    finalization half of the round-4 bench row) to one [B, max_len]
    row per sample, like `beam.select_best` does for the no-LM path."""
    from .beam import select_merge
    B, k, max_len = res.live_tokens.shape
    fin_sel = jnp.where(jnp.isfinite(res.fin_scores), res.fin_scores,
                        -jnp.inf)
    # this mode's fallback differs from beam.live_fallback on purpose:
    # the host loop returns (live beam 0, score 0.0) with the length
    # clamped to the buffer (lm_first_pass_decode's contract), not the
    # act-score argmax
    live_len = jnp.broadcast_to(
        jnp.minimum(res.l_final + 1, max_len),
        res.fin_lens[:, 0].shape).astype(res.fin_lens.dtype)
    return select_merge(res, fin_sel,
                        res.live_tokens[:, 0].astype(jnp.int32),
                        jnp.zeros(B, res.fin_scores.dtype), live_len)


@functools.lru_cache(maxsize=32)
def _jitted_best(cfg: Config, bw: int, topn: int, use_pallas: bool,
                 variant=None):
    def fn(params, feats, feat_lens, dlm, tok2lm):
        res = lm_fused_decode(params, cfg, bw, feats, feat_lens, dlm,
                              tok2lm, topn=topn, use_pallas=use_pallas)
        return select_best_first_pass(res)
    return jax.jit(fn)


def lm_fused_decode_best_jit(params, cfg: Config, bw: int, feats,
                             feat_lens, dlm, tok2lm, topn: int = 20):
    """Fused LM-driven decode + on-device best selection — the serving
    fast path for ``ASR(lm_mode="first")`` transcription."""
    return _jitted_best(cfg, bw, topn, pallas_topk.use_pallas_topk(),
                        (pallas_topk.use_grouped_topk(),
                         pallas_topk.use_onepass_topk(),
                         device_ngram.trace_variant()))(
        params, feats, feat_lens, dlm, tok2lm)


def nbest_lists(res: BeamResult, B: int = None):
    """Unpack a fused-decode BeamResult into the host loop's return
    format: per sample, finished (token_list, score) sorted score desc
    (ties keep harvest order), or [(live beam 0, 0.0)] when none
    finished — byte-for-byte the `lm_first_pass_decode` contract, for
    differential tests and drop-in callers."""
    import numpy as np
    fin_tokens = np.asarray(res.fin_tokens)
    fin_lens = np.asarray(res.fin_lens)
    fin_scores = np.asarray(res.fin_scores)
    live = np.asarray(res.live_tokens)
    l_final = int(np.asarray(res.l_final))
    out = []
    for b in range(fin_tokens.shape[0]):
        hyps = [(fin_tokens[b, i, :fin_lens[b, i]].astype(int).tolist(),
                 float(fin_scores[b, i]))
                for i in range(fin_tokens.shape[1])
                if np.isfinite(fin_scores[b, i])]
        if hyps:
            hyps.sort(key=lambda h: -h[1])
            out.append(hyps)
        else:
            n = min(l_final + 1, live.shape[2])
            out.append([(live[b, 0, :n].astype(int).tolist(), 0.0)])
    return out
