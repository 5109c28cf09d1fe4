"""Batched beam search (reference model.py:604-987) as one compiled program.

fairseq-style flattened-beam search re-designed for XLA:

* The whole <=max_len loop is a single ``lax.while_loop`` with the
  reference's early stop ("every sample's top candidate was eos",
  model.py:897-901) as part of the loop condition.
* Per step over [B, k*V] accumulated scores: ``lax.top_k`` 2k candidates
  (step 0 restricted to the first V slice, model.py:862-865), beam/token
  split by div/mod (model.py:866-867), eos harvest of top-k candidates
  into a **fixed-capacity per-sample n-best buffer** (replacing the dynamic
  Python list at model.py:701/889 — capacity k*max_len bounds the true
  count, so collection is lossless), survivor selection via the
  offsets+eos-penalty smallest-k trick (model.py:904-909).
* Only true per-beam state is reordered (cell state, attentional hidden,
  history, scores).  enc/keys/values/mask are **never tiled nor reordered**:
  the reference's per-step gathers of [L, B*k, 512] tensors
  (model.py:913-916) move identical rows and are dropped entirely; the beam
  dim lives on the attention query instead (ops in
  ``attention.attend_beam``).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models import decoder as dec_ops
from ..models import las
from ..ops.pallas import topk as pallas_topk


class BeamResult(NamedTuple):
    fin_tokens: jnp.ndarray     # [B, CAP, max_len] int16/int32 (no sos/eos);
                                #   cap index = harvest_step*k + cand_rank
    fin_lens: jnp.ndarray       # [B, CAP] int32 (== harvest step)
    fin_scores: jnp.ndarray     # [B, CAP] f32; -inf marks EMPTY slots
    fin_count: jnp.ndarray      # [B] int32 (number of finite slots)
    live_tokens: jnp.ndarray    # [B, k, max_len] final history (no sos)
    live_scores: jnp.ndarray    # [B, k] accumulated logp of live beams
    l_final: jnp.ndarray        # scalar int32: reference's loop var at exit


def beam_unroll() -> int:
    """Decode steps fused per while_loop iteration (default 1).

    MEASURED NEGATIVE RESULT (v5e, B=128, bw=16, 40 steps, full pipeline
    incl. featurize + on-device select): unroll=1 107.2 ms/batch,
    unroll=2 108.6, unroll=4 109.4 — all bit-identical outputs.  XLA's
    while_loop evaluates cond on device, so there is no per-iteration
    host dispatch to amortize (the lever PERF.md r2 hypothesized), and
    the done-guard selects that keep early-stop semantics exact add ~1%.
    The mechanism stays (CHINESE_ASR_BEAM_UNROLL=n) for future hardware
    where loop overhead is real."""
    return max(1, int(os.environ.get("CHINESE_ASR_BEAM_UNROLL", "1")))


def beam_decode(params, cfg: Config, bw: int, feats, feat_lens,
                use_pallas: bool = None, unroll: int = None,
                fused_logp: bool = None, lm_track=None):
    """``lm_track`` (optional): ``(dlm, tok2lm, bos_id, eos_id)`` — a
    DeviceNgramLM + token map.  When set, the loop PASSIVELY tracks
    each live beam's cumulative LM score (the same bos=True chain of
    f32 per-word terms as ``rescore.score_sequences``; the totals agree
    to reduction-order rounding — the in-loop left-fold vs the post-hoc
    path's free-to-reassociate ``sum``, i.e. ulps, tests pin
    atol=2e-4 — NOT bit-exactly, so a near-exact tie can in principle
    select different winners between the two paths) and harvests
    each finished hypothesis's FULL sentence LM score (cum + </s> term)
    into an extra ``[B, max_len, k]`` buffer, returned as
    ``(BeamResult, fin_lm)``.  Selection stays purely acoustic — the LM
    never influences the search — so the decode is bit-identical to the
    untracked one; the buffer makes the reference's second-pass rescore
    (model.py:749-763) a zero-extra-pass device argmax
    (``select_rescored``): no n-best transfer, no host round trip
    between decode and rescore.  Cost: two [B*k, 1] LM scorings per
    step (chosen-token advance + </s> probe)."""
    if use_pallas is None:
        use_pallas = pallas_topk.use_pallas_topk()
    if unroll is None:
        unroll = beam_unroll()
    if fused_logp is None:
        fused_logp = pallas_topk.use_fused_logp()
    B = feats.shape[0]
    k = bw
    V = cfg.vocab.vocab_size
    max_len = cfg.decode.max_len
    cap = k * max_len
    cand = 2 * k
    eos = cfg.vocab.eos
    dcfg, acfg = cfg.decoder, cfg.attention
    dtype = feats.dtype

    eb = las.encode(params, cfg, feats, feat_lens)
    ctx = dec_ops.attn_hidden_width(acfg, eb.values.shape[-1])

    # tile only true per-beam state (reference model.py:659-669 tiles
    # everything; see module docstring)
    def tile(t):
        return jnp.repeat(t, k, axis=0)

    cell0 = eb.init_cell_state
    if cell0 is None:
        z = jnp.zeros((B * k, dcfg.hidden_size), dtype)
        cell0 = [(z, z) if dcfg.decoder_type == "LSTM" else z] * dcfg.num_layers
    else:
        cell0 = [tuple(tile(e) for e in s) if isinstance(s, tuple) else tile(s)
                 for s in cell0]

    cand_offsets = jnp.arange(cand, dtype=jnp.int32)[None, :]         # [1, 2k]

    state0 = dict(
        l=jnp.int32(0),
        done=jnp.array(False),
        l_final=jnp.int32(max_len - 1),
        hist=jnp.full((B * k, max_len + 1), cfg.vocab.pad, jnp.int32)
             .at[:, 0].set(cfg.vocab.sos),
        logp_scores=jnp.zeros((B * k,), jnp.float32),  # f32 under bf16 compute
        cell_state=cell0,
        attn_hidden=jnp.zeros((B * k, ctx), dtype),
        top_beam_finished=jnp.zeros((B,), bool),
        fin_tokens=jnp.zeros((B, max_len, k, max_len), jnp.int32),
        fin_scores=jnp.full((B, max_len, k), -jnp.inf, jnp.float32),
    )
    if lm_track is not None:
        from ..lm import device_ngram
        dlm, tok2lm, lm_bos, lm_eos = lm_track
        M1 = max(dlm.order - 1, 1)
        lm_ctx0 = jnp.full((B * k, M1), -1, jnp.int32)
        if dlm.order > 1:
            lm_ctx0 = lm_ctx0.at[:, -1].set(lm_bos)   # bos=True chain
        state0["lm_ctx"] = lm_ctx0
        state0["lm_cum"] = jnp.zeros((B * k,), jnp.float32)
        state0["fin_lm"] = jnp.zeros((B, max_len, k), jnp.float32)
        eos_col = jnp.full((B * k, 1), lm_eos, jnp.int32)

    def cond(s):
        return (s["l"] < max_len) & ~s["done"]

    def body(s):
        l = s["l"]
        tokens = jax.lax.dynamic_index_in_dim(s["hist"], l, axis=1,
                                              keepdims=False)         # [B*k]
        out = dec_ops.decoder_step_beam(
            params["decoder"], params["attention"], dcfg, acfg,
            eb.mask, eb.keys, eb.values, tokens, s["cell_state"],
            s["attn_hidden"])

        # two-stage exact top-2k over [B, k*V]: per-beam top-(k+1), then
        # top-2k of the union.  k+1 per beam is sufficient for everything
        # the loop consumes — the top-k harvest and the first k non-eos
        # survivors — because a beam holds at most ONE eos candidate, so
        # the j<=k-th non-eos of the true top-2k sits within its beam's
        # top-(k+1).  Tie order matches the flat top_k (lower beam, then
        # lower token).  Measured >13% faster end-to-end than a flat
        # top_k over k*V lanes on v5e at B=64, k=16.
        # Stage 1 backend on TPU: the FUSED Pallas kernel — the whole
        # logit/T - logsumexp + score transform happens on the
        # VMEM-resident block (the [B*k, V] logp array is never
        # materialized; saves ~150 us/step of HBM traffic at B=128,
        # bw=16) followed by threshold-exclusion extraction.  Elsewhere:
        # the XLA transform + approx_max_k with recall_target=1.0 (the
        # exact-top-k lowering).  Full-pipeline A/B on v5e at B=128,
        # bw=16 (tools/pipeline_topk_ab.py): pallas grouped 75.7-78.8
        # ms/batch (the TPU default) vs pallas flat 82.1-82.4 vs
        # approx_max_k 87.5 vs full-sort lax.top_k 87.4; NOTE the
        # standalone chained microbench (tools/topk_bench.py) ranks
        # pallas LAST, so only the in-pipeline number decides here.
        # Step 0 (all beams identical) disables beams > 0
        # via a -inf row bias / -inf row fill.
        if use_pallas and fused_logp:
            # rows are beam-major: row r = b*k + kk
            kk_iota = jax.lax.broadcasted_iota(jnp.int32, (B * k, 1), 0) % k
            bias = jnp.where((l == 0) & (kk_iota > 0), -jnp.inf,
                             s["logp_scores"][:, None])
            v1, t1 = pallas_topk.top_k_fused(
                out.logit.astype(jnp.float32), bias, k + 1,
                cfg.decoder.temperature)
        elif use_pallas:
            logit = out.logit.astype(jnp.float32) / cfg.decoder.temperature
            logp = logit - jax.scipy.special.logsumexp(logit, axis=1,
                                                       keepdims=True)
            logp = logp + s["logp_scores"][:, None]           # [B*k, V]
            s3 = logp.reshape(B, k, V)
            beam_iota = jax.lax.broadcasted_iota(jnp.int32, (1, k, 1), 1)
            s3 = jnp.where((l == 0) & (beam_iota > 0), -jnp.inf, s3)
            v1, t1 = pallas_topk.top_k(s3.reshape(B * k, V), k + 1)
        else:
            logit = out.logit.astype(jnp.float32) / cfg.decoder.temperature
            logp = logit - jax.scipy.special.logsumexp(logit, axis=1,
                                                       keepdims=True)
            logp = logp + s["logp_scores"][:, None]           # [B*k, V]
            s3 = logp.reshape(B, k, V)
            # step 0: all beams identical -> beam 0's vocab slice only
            beam_iota = jax.lax.broadcasted_iota(jnp.int32, (1, k, 1), 1)
            s3 = jnp.where((l == 0) & (beam_iota > 0), -jnp.inf, s3)
            v1, t1 = jax.lax.approx_max_k(
                s3.reshape(B * k, V), k + 1, recall_target=1.0)
        v1 = v1.reshape(B, k, k + 1)
        t1 = t1.reshape(B, k, k + 1)
        cand_scores, i2 = jax.lax.top_k(v1.reshape(B, k * (k + 1)), cand)
        cand_beams = (i2 // (k + 1)).astype(jnp.int32)                # [B, 2k]
        cand_tokens = jnp.take_along_axis(t1.reshape(B, k * (k + 1)), i2,
                                          axis=1).astype(jnp.int32)

        # ---- harvest finished among top-k (model.py:875-889) -------------
        top_tokens = cand_tokens[:, :k]
        top_beams = cand_beams[:, :k]
        top_scores = cand_scores[:, :k]
        fmask = top_tokens == eos                                     # [B, k]
        # one-hot matmul replaces the per-row gather (TPU gathers of
        # [B*k, D] rows cost more than the einsum)
        hist3 = s["hist"].reshape(B, k, max_len + 1).astype(jnp.float32)
        top_oh = jax.nn.one_hot(top_beams, k, dtype=jnp.float32)      # [B,k,k]
        # precision=HIGHEST: token ids (<= vocab ~5k) do not survive the
        # bf16 operand rounding of TPU DEFAULT matmul precision; the f32
        # loop-fusion lowering XLA picks today is exact only by accident
        hist_k = jnp.rint(jnp.einsum("bik,bkl->bil", top_oh, hist3,
                                     precision=jax.lax.Precision.HIGHEST)
                          )[:, :, 1:].astype(jnp.int32)               # prefixes
        # slot-per-step n-best buffers: step l's top-k candidates land at
        # slot l via a dynamic-slice update (a 2-D scatter here costs more
        # than the whole decoder step on TPU); the slot index doubles as
        # the hypothesis length, and -inf scores mark empty slots
        fin_tokens = jax.lax.dynamic_update_index_in_dim(
            s["fin_tokens"], hist_k, l, axis=1)
        fin_scores = jax.lax.dynamic_update_index_in_dim(
            s["fin_scores"], jnp.where(fmask, top_scores, -jnp.inf), l, axis=1)
        if lm_track is not None:
            # full-sentence LM total of each harvested hypothesis: the
            # parent beam's cum chain + the </s> term in its context
            # (reference model.py:755 scores the joined chars with
            # bos=True, eos=True) — parent gather rides the same exact
            # one-hot product as hist_k
            eos_base = device_ngram.score_candidates(
                dlm, s["lm_ctx"], eos_col)[:, 0]               # [B*k]
            lm_tot = (s["lm_cum"] + eos_base).reshape(B, k)
            lm_k = jnp.einsum("bik,bk->bi", top_oh, lm_tot,
                              precision=jax.lax.Precision.HIGHEST)
            fin_lm = jax.lax.dynamic_update_index_in_dim(
                s["fin_lm"], jnp.where(fmask, lm_k, 0.0), l, axis=1)

        # ---- early stop (model.py:897-901) -------------------------------
        top_beam_finished = s["top_beam_finished"] | (top_tokens[:, 0] == eos)
        new_done = jnp.all(top_beam_finished)
        l_final = jnp.where(new_done & ~s["done"], l, s["l_final"])

        # ---- survivors (model.py:904-909) --------------------------------
        eos2k = (cand_tokens == eos).astype(jnp.int32)
        rank = cand_offsets + eos2k * cand                            # [B, 2k]
        _, active = jax.lax.top_k(-rank, k)                           # smallest k
        # one packed gather instead of three: each [B, 2k] -> [B, k] gather
        # is a separate latency-bound kernel (~17 us each in the trace);
        # packing beams/tokens/scores (f32 bitcast to i32 — a gather
        # preserves bits) folds them into one
        packed = jnp.stack([cand_beams, cand_tokens,
                            jax.lax.bitcast_convert_type(cand_scores,
                                                         jnp.int32)], axis=1)
        sel = jnp.take_along_axis(packed, active[:, None, :], axis=2)
        k_beams, k_toks = sel[:, 0], sel[:, 1]
        new_scores = jax.lax.bitcast_convert_type(sel[:, 2], jnp.float32)

        # per-sample beam permutation as a one-hot matmul (see hist_k above)
        sel_oh = jax.nn.one_hot(k_beams, k, dtype=jnp.float32)        # [B,k,k]

        def reorder(t):
            t3 = t.reshape(B, k, -1)
            return jnp.einsum("bik,bkd->bid", sel_oh.astype(t.dtype), t3,
                              precision=jax.lax.Precision.HIGHEST
                              ).reshape(B * k, -1)

        hist = jnp.rint(jnp.einsum("bik,bkl->bil", sel_oh, hist3,
                                   precision=jax.lax.Precision.HIGHEST)
                        ).astype(jnp.int32).reshape(B * k, max_len + 1)
        hist = jax.lax.dynamic_update_index_in_dim(
            hist, k_toks.reshape(-1), l + 1, axis=1)
        cell_state = [tuple(reorder(e) for e in st) if isinstance(st, tuple)
                      else reorder(st) for st in out.cell_state]
        attn_hidden = reorder(out.attn_hidden_state)

        # if this very step triggered the stop, survivors are not applied
        # (the reference breaks before updating, model.py:898-901)
        def keep(new, old):
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(new_done, b, a), new, old)

        nxt = dict(
            l=l + 1,
            done=new_done,
            l_final=l_final,
            hist=keep(hist, s["hist"]),
            logp_scores=keep(new_scores.reshape(-1), s["logp_scores"]),
            cell_state=keep(cell_state, s["cell_state"]),
            attn_hidden=keep(attn_hidden, s["attn_hidden"]),
            top_beam_finished=top_beam_finished,
            fin_tokens=fin_tokens,
            fin_scores=fin_scores,
        )
        if lm_track is not None:
            # advance the passive chain along the surviving beams:
            # cum = cum[sel] + base(chosen | ctx[sel]); window shifts.
            # survivors are never eos (the rank trick picks non-eos), so
            # the chain stays a plain word chain.
            ctx3 = s["lm_ctx"].reshape(B, k, -1).astype(jnp.float32)
            lm_ctx_sel = jnp.rint(jnp.einsum(
                "bik,bkl->bil", sel_oh, ctx3,
                precision=jax.lax.Precision.HIGHEST)
            ).astype(jnp.int32).reshape(B * k, -1)
            chosen_lm = tok2lm[k_toks.reshape(-1)].astype(jnp.int32)
            base = device_ngram.score_candidates(
                dlm, lm_ctx_sel, chosen_lm[:, None])[:, 0]
            lm_cum_sel = jnp.einsum(
                "bik,bk->bi", sel_oh, s["lm_cum"].reshape(B, k),
                precision=jax.lax.Precision.HIGHEST).reshape(-1)
            nxt["lm_cum"] = keep(lm_cum_sel + base, s["lm_cum"])
            nxt["lm_ctx"] = keep(
                device_ngram.advance_context(lm_ctx_sel, chosen_lm),
                s["lm_ctx"])
            nxt["fin_lm"] = fin_lm
        return nxt

    def body_unrolled(s):
        # each sub-step is guarded: once done (or past max_len) the
        # remaining sub-steps of the pair are identities, reproducing the
        # reference's break-before-update exactly (model.py:897-901) —
        # the fin buffers, l, and survivors all stay frozen
        for _ in range(unroll):
            live = ~s["done"] & (s["l"] < max_len)
            nxt = body(s)
            s = jax.tree_util.tree_map(
                lambda new, old: jnp.where(live, new, old), nxt, s)
        return s

    s = jax.lax.while_loop(cond, body_unrolled if unroll > 1 else body,
                           state0)
    # flatten the slot-per-step buffers to the packed [B, cap] contract:
    # cap index = slot*k + j (harvest order), slot index = hypothesis length
    fin_scores = s["fin_scores"].reshape(B, cap)
    fin_lens = jnp.broadcast_to(
        jnp.repeat(jnp.arange(max_len, dtype=jnp.int32), k)[None, :], (B, cap))
    # token ids fit int16 for any real vocab (V=5004): halves the n-best
    # device->host transfer, which dominates end-to-end batch time through
    # the device tunnel when a second pass needs the full buffers
    tok_t = jnp.int16 if V <= 32767 else jnp.int32
    res = BeamResult(
        fin_tokens=s["fin_tokens"].reshape(B, cap, max_len).astype(tok_t),
        fin_lens=fin_lens,
        fin_scores=fin_scores,
        fin_count=jnp.isfinite(fin_scores).sum(axis=1).astype(jnp.int32),
        live_tokens=s["hist"][:, 1:].reshape(B, k, max_len).astype(tok_t),
        live_scores=s["logp_scores"].reshape(B, k),
        l_final=s["l_final"])
    if lm_track is not None:
        return res, s["fin_lm"].reshape(B, cap)
    return res


def _kernel_variant():
    """Extraction-variant env flags that are read at TRACE time inside
    pallas_topk.top_k: they must join the jit cache keys below so
    flipping CHINESE_ASR_TOPK_GROUPED / CHINESE_ASR_TOPK_ONEPASS after
    the first decode retraces instead of replaying the stale choice."""
    return (pallas_topk.use_grouped_topk(), pallas_topk.use_onepass_topk())


@functools.lru_cache(maxsize=32)
def _jitted(cfg: Config, bw: int, use_pallas: bool, unroll: int,
            fused_logp: bool, variant=None):
    # use_pallas/unroll/fused_logp/variant are part of the cache key so
    # flipping the CHINESE_ASR_PALLAS(_TOPK/_FUSED/_GROUPED/_ONEPASS) /
    # CHINESE_ASR_BEAM_UNROLL env overrides after the first decode takes
    # effect instead of replaying the previously traced choice
    return jax.jit(functools.partial(beam_decode, cfg=cfg, bw=bw,
                                     use_pallas=use_pallas, unroll=unroll,
                                     fused_logp=fused_logp))


def beam_decode_jit(params, cfg: Config, bw: int, feats, feat_lens) -> BeamResult:
    return _jitted(cfg, bw, pallas_topk.use_pallas_topk(), beam_unroll(),
                   pallas_topk.use_fused_logp(), _kernel_variant())(
        params, feats=feats, feat_lens=feat_lens)


class BestResult(NamedTuple):
    tokens: jnp.ndarray   # [B, max_len] int32
    lens: jnp.ndarray     # [B] int32
    scores: jnp.ndarray   # [B] f32
    finished: jnp.ndarray  # [B] bool (False -> live-beam fallback was used)


def select_merge(res: BeamResult, fin_sel, live_tok, live_sc,
                 live_len) -> BestResult:
    """Shared core of every on-device winner selection (`select_best`,
    `rescore.select_rescored`, `lm_fused.select_best_first_pass`):
    first-max argmax over the caller's -inf-masked per-slot selection
    scores (ties resolve in harvest order, like the host paths' Python
    ``max`` / stable sort-desc), the winner's tokens/len/RAW score
    gathered from the n-best buffers, then the caller's mode-specific
    live-beam fallback where-merged in for never-finished rows.  Any
    future change to the masking/tie/fallback semantics lives HERE,
    once."""
    slot = jnp.argmax(fin_sel, axis=1)                               # [B]
    fin_tok = jnp.take_along_axis(
        res.fin_tokens, slot[:, None, None], axis=1)[:, 0]           # [B, L]
    fin_len = jnp.take_along_axis(res.fin_lens, slot[:, None], axis=1)[:, 0]
    fin_sc = jnp.take_along_axis(res.fin_scores, slot[:, None], axis=1)[:, 0]
    has_fin = res.fin_count > 0
    return BestResult(
        tokens=jnp.where(has_fin[:, None], fin_tok.astype(jnp.int32),
                         live_tok),
        lens=jnp.where(has_fin, fin_len, live_len),
        scores=jnp.where(has_fin, fin_sc, live_sc),
        finished=has_fin)


def live_fallback(res: BeamResult, length_weight: float):
    """The reference's never-finished fallback (model.py:961-972): best
    live beam by ``logp + length_weight * (l_final + 1)`` — the
    (tokens, score, len) triple `select_merge` substitutes for rows
    with an empty n-best."""
    act = res.live_scores + length_weight * (
        res.l_final + 1).astype(jnp.float32)                         # [B, k]
    j = jnp.argmax(act, axis=1)
    live_tok = jnp.take_along_axis(
        res.live_tokens, j[:, None, None], axis=1)[:, 0].astype(jnp.int32)
    live_sc = jnp.take_along_axis(act, j[:, None], axis=1)[:, 0]
    live_len = jnp.full_like(res.fin_lens[:, 0], res.l_final + 1)
    return live_tok, live_sc, live_len


def select_best(res: BeamResult, length_weight: float) -> BestResult:
    """Device-side replica of ``finalize_beam``'s no-second-pass argmax.

    Transfers shrink from the [B, cap, max_len] n-best buffers (~13 MB at
    B=128, bw=16 — a third of a second through the device tunnel) to one
    [B, max_len] row per sample.  Semantics match finalize_beam exactly:
    best finished hypothesis by raw logp (first max wins, like Python
    ``max``), else the reference's never-finished fallback — best live beam
    by ``logp + length_weight * (l_final + 1)`` (model.py:961-972).
    """
    # mask non-finite slots like finalize_beam's np.isfinite does: a NaN
    # score (e.g. one bad bf16 step) must not win the argmax
    fin_sel = jnp.where(jnp.isfinite(res.fin_scores), res.fin_scores,
                        -jnp.inf)
    live_tok, live_sc, live_len = live_fallback(res, length_weight)
    return select_merge(res, fin_sel, live_tok, live_sc, live_len)


@functools.lru_cache(maxsize=32)
def _jitted_best(cfg: Config, bw: int, use_pallas: bool, unroll: int,
                 fused_logp: bool, variant=None):
    def fn(params, feats, feat_lens):
        res = beam_decode(params, cfg, bw, feats, feat_lens,
                          use_pallas=use_pallas, unroll=unroll,
                          fused_logp=fused_logp)
        return select_best(res, cfg.decode.length_weight)
    return jax.jit(fn)


def beam_decode_best_jit(params, cfg: Config, bw: int, feats,
                         feat_lens) -> BestResult:
    """Fused decode + on-device best-hypothesis selection (the fast path
    for transcription without second-pass rescoring)."""
    return _jitted_best(cfg, bw, pallas_topk.use_pallas_topk(),
                        beam_unroll(), pallas_topk.use_fused_logp(),
                        _kernel_variant())(
        params, feats, feat_lens)


def finalize_best(best: BestResult, vocab, text=None):
    """Host detokenization of a device-selected ``BestResult`` — produces
    the same ``EvalOutput`` rows as ``finalize_beam`` without transferring
    the n-best buffers."""
    from ..decode.greedy import EvalOutput
    from ..ops.metrics import cer

    _prefetch_host(best)
    tokens = np.asarray(best.tokens)
    lens = np.asarray(best.lens)
    scores = np.asarray(best.scores)
    B = tokens.shape[0]
    pred_text = [vocab.decode(tokens[b, : lens[b]]) for b in range(B)]
    score = [float(s) for s in scores]

    wer = None
    ref_text = None
    if text is not None:
        ref_text = [vocab.decode(t) if not isinstance(t, str) else t
                    for t in text]
        wer = float(np.mean([cer(p, r) for p, r in zip(pred_text, ref_text)]))
    return EvalOutput(pred_text, score, ref_text, wer, B, None, None, None)


# --------------------------------------------------------------------------
# device-side n-best compaction for the second-pass path
# --------------------------------------------------------------------------
@functools.lru_cache(maxsize=64)
def _jitted_compact(max_fin: int):
    @jax.jit
    def fn(fin_tokens, fin_lens, fin_scores):
        finite = jnp.isfinite(fin_scores)                       # [B, cap]
        # stable sort on (not finite): finite slots first, HARVEST ORDER
        # preserved among them — finalize_beam's first-max-wins argmax and
        # the reference's python max see the same slot sequence
        order = jnp.argsort(jnp.where(finite, 0, 1), axis=1,
                            stable=True)[:, :max_fin]
        return (jnp.take_along_axis(fin_tokens, order[:, :, None], axis=1),
                jnp.take_along_axis(fin_lens, order, axis=1),
                jnp.take_along_axis(fin_scores, order, axis=1))
    return fn


def compact_nbest(res: BeamResult, bucket: int = 32) -> BeamResult:
    """Gather the finite n-best slots into a dense [B, max_fin] prefix ON
    DEVICE before the host transfer (VERDICT r2 item #8).

    The slot-per-step buffers are mostly empty (fin_count <= k per
    harvested step, most steps harvest none), yet the second-pass path
    shipped all cap = k*max_len slots (~6.9 MB at B=128, bw=16 — ~140 ms
    through the device tunnel).  Cost: one tiny fin_count transfer (the
    caller should have started it async at dispatch time) + one gather.
    Lossless: every finite slot is kept, in harvest order, so rescoring
    winners are identical; max_fin is rounded up to ``bucket`` to bound
    the number of compiled gather shapes."""
    B, cap = res.fin_scores.shape
    n = int(np.max(np.asarray(res.fin_count), initial=0))
    max_fin = min(cap, -(-max(n, 1) // bucket) * bucket)
    if max_fin >= cap:
        return res
    toks, lens, scores = _jitted_compact(max_fin)(
        res.fin_tokens, res.fin_lens, res.fin_scores)
    return res._replace(fin_tokens=toks, fin_lens=lens, fin_scores=scores)


# --------------------------------------------------------------------------
# host-side finalization (reference parse_finished_tensors model.py:708-765
# + unfinished fallback model.py:961-972)
# --------------------------------------------------------------------------
def _prefetch_host(tree) -> None:
    """Start all device->host copies of a result pytree concurrently:
    through the device tunnel each blocking transfer pays ~25 ms of fixed
    latency, so serial np.asarray calls on 6 arrays waste ~0.15 s/batch."""
    for leaf in jax.tree_util.tree_leaves(tree):
        try:
            leaf.copy_to_host_async()
        except AttributeError:
            pass


def finalize_beam(res: BeamResult, cfg: Config, vocab, text=None,
                  lm_model=None, second_pass: bool = False,
                  lm_weight: float = 0.0, length_weight: float = 0.0):
    from ..decode.greedy import EvalOutput
    from ..ops.metrics import cer

    _prefetch_host(res)
    fin_tokens = np.asarray(res.fin_tokens)
    fin_lens = np.asarray(res.fin_lens)
    fin_scores = np.asarray(res.fin_scores)
    fin_count = np.asarray(res.fin_count)
    live_tokens = np.asarray(res.live_tokens)
    live_scores = np.asarray(res.live_scores)
    l_final = int(res.l_final)
    B, cap = fin_scores.shape
    valid = np.isfinite(fin_scores)                                # [B, cap]

    if second_pass:
        assert lm_model is not None, "second pass needs a language model"

    # selection score per slot: raw logp, or the second-pass rescore
    # logp + w_lm * lm + w_len * len (model.py:749-763)
    if second_pass and valid.any():
        vb, vs = np.nonzero(valid)                    # flat slot coordinates
        lens_v = fin_lens[vb, vs]                     # [N]
        if getattr(lm_model, "has_batch_states", False):
            # zero-string path needs the C++ backend (NgramLM with a
            # compiled kernel); the pure-Python fallback and foreign LM
            # objects go through the string paths below
            # zero-string path: map token ids -> LM word ids through a
            # cached table and score every hypothesis in ONE FFI call
            table = lm_model.token_id_table(vocab)
            toks = fin_tokens[vb, vs]                 # [N, max_len]
            pos = np.arange(toks.shape[1])[None, :] < lens_v[:, None]
            flat = table[toks[pos]]
            offsets = np.zeros(len(vb) + 1, np.int64)
            np.cumsum(lens_v, out=offsets[1:])
            lm_all = lm_model.score_batch_ids(flat, offsets, bos=True)
        else:
            sents = [" ".join(vocab.int2word[i]
                              for i in fin_tokens[b, s, : fin_lens[b, s]])
                     for b, s in zip(vb, vs)]
            if hasattr(lm_model, "score_batch"):
                lm_all = np.asarray(lm_model.score_batch(sents, bos=True))
            else:
                lm_all = np.asarray([lm_model.score(s, bos=True)
                                     for s in sents])
        sel = np.full((B, cap), -np.inf)
        sel[vb, vs] = (fin_scores[vb, vs] + lm_weight * lm_all
                       + length_weight * lens_v)
    else:
        sel = np.where(valid, fin_scores, -np.inf)

    # per-sample winner (first max in harvest order, like the reference's
    # python max/argmax) + never-finished live fallback (model.py:961-972)
    best = np.argmax(sel, axis=1)                                  # [B]
    outputs = []
    for b in range(B):
        if fin_count[b] > 0:
            s = best[b]
            outputs.append((fin_tokens[b, s, : fin_lens[b, s]].tolist(),
                            float(fin_scores[b, s])))
        else:
            act = live_scores[b] + length_weight * (l_final + 1)
            j = int(np.argmax(act))
            outputs.append((live_tokens[b, j, : l_final + 1].tolist(),
                            float(act[j])))

    pred_text = [vocab.decode(ids) for ids, _ in outputs]
    score = [s for _, s in outputs]

    wer = None
    ref_text = None
    if text is not None:
        ref_text = [vocab.decode(t) if not isinstance(t, str) else t for t in text]
        wer = float(np.mean([cer(p, r) for p, r in zip(pred_text, ref_text)]))
    return EvalOutput(pred_text, score, ref_text, wer, B, None, None, None)
