"""On-device second-pass LM rescore: n-best selection without the host.

The reference's second pass pulls every finished hypothesis to the host
and rescores it through kenlm (reference model.py:749-763:
``logp + 1.5 * lm_model.score(' '.join(chars), bos=True) + 1.5 * len``,
argmax, return the winner's tokens and RAW acoustic score).  The host
port (`decode/beam.finalize_beam` second_pass=True) already batches that
into one C++ FFI call, but the n-best buffers still cross the
host<->device boundary — measured 4.7 MB/batch at B=128, bw=16, making
the mode transfer-bound through the device tunnel (BENCH_r04
``batched_bw16_lm2p``).

With the n-gram tables resident in HBM (`lm/device_ngram.py`) the whole
second pass runs on device: every n-best slot's FULL sentence score
(bos + each word + </s>) is computed in ONE ``score_candidates`` call —
no scan, no recurrence — because unlike the first-pass decode the
contexts are known upfront: the context window at position t is just
tokens[t-order+1 : t] with ``<s>`` at the left edge.  Selection
(``logp + w_lm*lm + w_len*len`` argmax, first max in harvest order,
live-beam fallback when nothing finished) happens on device and only
the winning [B, max_len] rows cross the boundary — the same transfer
shape as the no-LM fast path (`beam.select_best`).

The host C++ rescorer stays as the oracle (`finalize_beam`) and for LMs
too large for HBM; parity between the two is pinned in
tests/test_rescore.py on random ARPAs (both key layouts, orders 2-5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..lm import device_ngram
from .beam import BeamResult, BestResult


def score_sequences(dlm: device_ngram.DeviceNgramLM, toks_lm, lens,
                    bos_id: int, eos_id: int) -> jnp.ndarray:
    """Full-sentence LM scores, fully parallel (no scan).

    toks_lm [Q, T] int32 LM word ids (garbage past ``lens`` is fine),
    lens [Q] int32 -> [Q] f32 log10 scores equal (to f32) to
    ``NgramLM.score_batch_ids(..., bos=True, eos=True)`` — kenlm's
    ``score(sentence, bos=True)`` (reference model.py:755).

    Position t's context is the last order-1 tokens before t with
    ``<s>`` at position -1 and absent (-1) further left — exactly the
    window ``begin_context`` + ``advance_context`` would roll to, built
    here as order-1 shifted SLICES of a left-padded copy (pure slices,
    no gather).  Query t scores token t for t < len and ``</s>`` at
    t == len; positions past len are masked out of the sum.
    """
    Q, T = toks_lm.shape
    M1 = max(dlm.order - 1, 1)
    toks_lm = toks_lm.astype(jnp.int32)
    left = jnp.full((Q, M1), -1, jnp.int32).at[:, -1].set(bos_id)
    padded = jnp.concatenate([left, toks_lm], axis=1)      # [Q, M1 + T]
    ctx = jnp.stack([padded[:, j: j + T + 1] for j in range(M1)],
                    axis=-1)                               # [Q, T+1, M1]
    t = jnp.arange(T + 1, dtype=jnp.int32)[None, :]
    cand = jnp.concatenate([toks_lm, toks_lm[:, -1:]], axis=1)
    cand = jnp.where(t == lens[:, None], eos_id, cand)     # [Q, T+1]
    base = device_ngram.score_candidates(
        dlm, ctx.reshape(Q * (T + 1), M1),
        cand.reshape(Q * (T + 1), 1)).reshape(Q, T + 1)
    return jnp.where(t <= lens[:, None], base, 0.0).sum(axis=1)


def rescore_select(res: BeamResult, dlm: device_ngram.DeviceNgramLM,
                   tok2lm, lm_weight: float, length_weight: float,
                   bos_id: int, eos_id: int) -> BestResult:
    """Device-side replica of ``finalize_beam(second_pass=True)``'s
    selection: per finite slot ``fin_scores + lm_weight*lm +
    length_weight*len`` (model.py:749-763), first-max argmax in harvest
    order, the reference's never-finished live fallback, and the
    winner's RAW acoustic score reported (like the host path).  Run it
    on a ``compact_nbest``-ed result so the LM scores only the finite
    prefix."""
    B, cap = res.fin_scores.shape
    T = res.fin_tokens.shape[2]
    toks_lm = tok2lm[res.fin_tokens.astype(jnp.int32)].reshape(B * cap, T)
    lm_sc = score_sequences(dlm, toks_lm,
                            res.fin_lens.reshape(B * cap).astype(jnp.int32),
                            bos_id, eos_id).reshape(B, cap)
    return select_rescored(res, lm_sc, lm_weight, length_weight)


def select_rescored(res: BeamResult, lm_sc, lm_weight: float,
                    length_weight: float) -> BestResult:
    """The selection half, given per-slot LM totals (either computed
    post-hoc by ``rescore_select`` or harvested in-loop by
    ``beam_decode(lm_track=...)``): the rescored sum picks the slot
    (`beam.select_merge` first-max semantics), the winner's RAW
    acoustic score is reported, never-finished rows take the standard
    live fallback (`beam.live_fallback`)."""
    from .beam import live_fallback, select_merge
    sel = jnp.where(jnp.isfinite(res.fin_scores),
                    res.fin_scores + lm_weight * lm_sc
                    + length_weight * res.fin_lens.astype(jnp.float32),
                    -jnp.inf)
    live_tok, live_sc, live_len = live_fallback(res, length_weight)
    return select_merge(res, sel, live_tok, live_sc, live_len)


@functools.lru_cache(maxsize=32)
def _jitted(lm_weight: float, length_weight: float, bos_id: int,
            eos_id: int, variant=None):
    # variant = device_ngram.trace_variant(): the DLM env knobs read at
    # trace time inside score_candidates must re-key this cache
    return jax.jit(functools.partial(rescore_select, lm_weight=lm_weight,
                                     length_weight=length_weight,
                                     bos_id=bos_id, eos_id=eos_id))


def rescore_select_jit(res: BeamResult, dlm, tok2lm, lm_weight: float,
                       length_weight: float, bos_id: int,
                       eos_id: int) -> BestResult:
    return _jitted(lm_weight, length_weight, bos_id, eos_id,
                   device_ngram.trace_variant())(res, dlm, tok2lm)


# --------------------------------------------------------------------------
# the fully-fused product path: decode + passive LM track + selection in
# ONE jitted program — zero host syncs between decode and rescore
# --------------------------------------------------------------------------
@functools.lru_cache(maxsize=32)
def _jitted_tracked(cfg, bw: int, lm_weight: float, length_weight: float,
                    bos_id: int, eos_id: int, use_pallas: bool,
                    unroll: int, fused_logp: bool, variant=None):
    from . import beam as beam_mod

    def fn(params, feats, feat_lens, dlm, tok2lm):
        res, fin_lm = beam_mod.beam_decode(
            params, cfg, bw, feats, feat_lens, use_pallas=use_pallas,
            unroll=unroll, fused_logp=fused_logp,
            lm_track=(dlm, tok2lm, bos_id, eos_id))
        return select_rescored(res, fin_lm, lm_weight, length_weight)

    return jax.jit(fn)


def beam_rescored_best_jit(params, cfg, bw: int, feats, feat_lens, dlm,
                           tok2lm, lm_weight: float, length_weight: float,
                           bos_id: int, eos_id: int) -> BestResult:
    """Second-pass-rescored transcription as ONE compiled program: the
    beam decode tracks LM chains passively, harvests full-sentence LM
    totals, and selects the winner on device — only [B, max_len] rows
    cross the host boundary and there is no decode->rescore round trip
    (the `ASR(lm_mode="second")` serving fast path)."""
    from ..ops.pallas import topk as pallas_topk
    from . import beam as beam_mod
    return _jitted_tracked(cfg, bw, lm_weight, length_weight, bos_id,
                           eos_id, pallas_topk.use_pallas_topk(),
                           beam_mod.beam_unroll(),
                           pallas_topk.use_fused_logp(),
                           (beam_mod._kernel_variant(),
                            device_ngram.trace_variant()))(
        params, feats, feat_lens, dlm, tok2lm)
