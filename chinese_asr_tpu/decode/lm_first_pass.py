"""First-pass-LM beam decode (reference ``eval_with_lm``,
model.py:989-1360 — an experimental mode kept for capability parity).

Per step, the acoustic model only *proposes*: the decoder's top-``topn``
tokens per beam are rescored by the n-gram LM over the full prefix
(reference calc_lm_score, model.py:1182-1194: ``lm.score(' '.join(hist +
[tok]), bos=False, eos=False)``), every other token gets -inf, and the
fairseq-style 2k-candidate selection runs on the LM scores.

Host/device split (the reference interleaves python string loops with CUDA
steps; here the boundary is explicit): the decoder step + top-n proposal is
one jitted program; prefix rescoring is one batched C++ LM call per step
(B*k*topn strings in a single FFI crossing); beam bookkeeping is numpy.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models import decoder as dec_ops
from ..models import las
from ..ops.pallas import topk as pallas_topk


class _StepOut(NamedTuple):
    top_logit: jnp.ndarray    # [B*k, n]
    top_tokens: jnp.ndarray   # [B*k, n]
    attn_hidden: jnp.ndarray
    cell_state: list


@functools.lru_cache(maxsize=32)
def _make_encode(cfg: Config):
    """Jitted decode prologue.  greedy/beam run ``las.encode`` inside
    their single whole-decode jit; this host-driven loop must jit it
    separately — called eagerly it executes the encoder op-by-op, which
    on the development tunnel measured 3.2-3.4 s/batch (65% of wall,
    PERF.md "First-pass-LM decode: the stage split") vs ~one dispatch
    jitted."""
    @jax.jit
    def enc(params, feats, feat_lens):
        return las.encode(params, cfg, feats, feat_lens)
    return enc


@functools.lru_cache(maxsize=32)
def _make_step(cfg: Config, topn: int, use_pallas: bool, variant=None):
    # use_pallas AND the extraction-variant envs join the cache key:
    # env-override flips take effect (same rule as decode/beam._jitted)
    dcfg, acfg = cfg.decoder, cfg.attention

    @jax.jit
    def step(dec_params, attn_params, mask, keys, values, tokens, sel,
             cell_state, attn_hidden):
        # survivor reorder INSIDE the jit: done eagerly on the host loop
        # it was ~7 separate op dispatches + an extra upload per step
        # (~10 ms/step on the development tunnel, PERF.md stage split);
        # here it fuses into the step program and `sel` rides the same
        # PJRT execute as `tokens`
        cell_state = [tuple(e[sel] for e in s) if isinstance(s, tuple)
                      else s[sel] for s in cell_state]
        out = dec_ops.decoder_step_beam(
            dec_params, attn_params, dcfg, acfg, mask, keys, values,
            tokens, cell_state, attn_hidden[sel])
        # f32 BEFORE top-k on both paths so CPU (lax.top_k) and TPU
        # (pallas) return bit-identical f32 top_logit under bf16 compute
        logit = out.logit.astype(jnp.float32) / dcfg.temperature
        if use_pallas:
            # same Pallas kernel as decode/beam.py — identical semantics
            # to lax.top_k (exact, lower-index tie break), 1 HBM stream
            top_logit, top_tokens = pallas_topk.top_k(logit, topn)
        else:
            top_logit, top_tokens = jax.lax.top_k(logit, topn)
        return _StepOut(top_logit, top_tokens.astype(jnp.int32),
                        out.attn_hidden_state, out.cell_state)

    return step


def lm_first_pass_decode(params, cfg: Config, bw: int, feats, feat_lens,
                         lm, vocab, topn: int = 20,
                         incremental: bool = None, profile: dict = None):
    """Returns (n-best token lists per sample, scores per sample).

    ``incremental`` (default: auto when the C++ LM backend is loaded) keeps
    one n-gram context state per beam and scores candidate continuations
    with the batched base-score kernel — O(1) LM work per (beam, candidate)
    instead of rescoring the whole prefix string every step.  Totals are
    identical: score(prefix + w) == cum(prefix) + base(state(prefix), w).

    ``profile`` (optional dict) accumulates wall seconds per loop stage
    (keys like "pull_top", "lm_score", "select", "reorder_dispatch",
    "harvest", "lm_advance", plus "steps") — the stage split behind
    PERF.md's first-pass-LM numbers (tools/lm_first_pass_bench.py).
    """
    import time as _time

    if profile is None:
        def _tic():
            return 0.0

        def _toc(key, t0):
            pass
    else:
        def _tic():
            return _time.perf_counter()

        def _toc(key, t0):
            profile[key] = profile.get(key, 0.0) + _time.perf_counter() - t0
    if incremental is None:
        incremental = bool(getattr(lm, "has_batch_states", False))
    B = feats.shape[0]
    k = bw
    V = cfg.vocab.vocab_size
    max_len = cfg.decode.max_len
    eos, sos = cfg.vocab.eos, cfg.vocab.sos
    cand = 2 * k

    t0 = _tic()
    eb = _make_encode(cfg)(params, feats, feat_lens)
    step = _make_step(cfg, topn, pallas_topk.use_pallas_topk(),
                      (pallas_topk.use_grouped_topk(),
                       pallas_topk.use_onepass_topk()))

    cell = eb.init_cell_state
    if cell is None:
        z = jnp.zeros((B * k, cfg.decoder.hidden_size), feats.dtype)
        cell = [(z, z)] * cfg.decoder.num_layers
    else:
        cell = [tuple(jnp.repeat(e, k, axis=0) for e in s)
                if isinstance(s, tuple) else jnp.repeat(s, k, axis=0)
                for s in cell]
    attn_hidden = jnp.zeros(
        (B * k, dec_ops.attn_hidden_width(cfg.attention, eb.values.shape[-1])),
        feats.dtype)

    hist = [[] for _ in range(B * k)]                    # token prefixes
    tokens = np.full(B * k, sos, np.int32)
    finished: List[List] = [[] for _ in range(B)]

    def words(ids):
        return [vocab.int2word[int(i)] for i in ids]

    if incremental:
        cap = lm.state_capacity()
        # token id -> LM vocab id, computed once
        tok2lm = lm.word_ids([vocab.int2word[t] for t in range(V)])
        states = np.zeros((B * k, cap), np.uint32)
        state_lens = np.zeros(B * k, np.int32)
        cum = np.zeros(B * k, np.float64)

    def dispatch(tok_np, sel_np, cell_, attn_):
        """Launch one decoder step (with the survivor reorder fused in)
        and start the top-tokens host copy: the ~25 ms device-tunnel
        transfer latency overlaps device work instead of adding to every
        step (CLAUDE.md host-boundary rules)."""
        o = step(params["decoder"], params["attention"], eb.mask, eb.keys,
                 eb.values, jnp.asarray(tok_np), jnp.asarray(sel_np),
                 cell_, attn_)
        try:
            o.top_tokens.copy_to_host_async()
        except AttributeError:
            pass
        return o

    # software-pipelined loop (VERDICT r2 item #7): step l+1's device work
    # is dispatched as soon as step l's survivors are known, BEFORE the
    # host does step l's finished-harvest bookkeeping and n-gram state
    # advance — the device computes the next step while the host loops
    sel_id = np.arange(B * k, dtype=np.int32)            # identity reorder
    out = dispatch(tokens, sel_id, cell, attn_hidden)
    _toc("encode_prologue", t0)
    for l in range(max_len):
        if profile is not None:
            profile["steps"] = profile.get("steps", 0) + 1
        t0 = _tic()
        top_tokens = np.asarray(out.top_tokens)          # [B*k, n]
        _toc("pull_top", t0)

        t0 = _tic()
        if incremental:
            # one batched base-score call over all (beam, candidate) pairs
            rep_states = np.repeat(states, topn, axis=0)
            rep_lens = np.repeat(state_lens, topn)
            cand_words = tok2lm[top_tokens.ravel()].astype(np.uint32)
            base = lm.base_score_batch_np(rep_states, rep_lens, cand_words)
            lm_scores = cum[:, None] + base.reshape(B * k, topn)
        else:
            # full-prefix rescoring, one batched string call per step
            sents = []
            for i in range(B * k):
                base_w = words(hist[i])
                for j in range(topn):
                    sents.append(" ".join(base_w + words([top_tokens[i, j]])))
            lm_scores = np.asarray(
                lm.score_batch(sents, bos=False, eos=False)
            ).reshape(B * k, topn)
        _toc("lm_score", t0)

        t0 = _tic()
        # candidate selection over the POOL of real proposals (k*topn per
        # sample), not a dense [B, k*V] matrix — the dense fill (~80 MB)
        # plus a full 1.3M-element argsort per step was the actual
        # first-pass-LM bottleneck on TPU (measured ~120 ms/step of pure
        # host work).  Order: score desc, then (beam, token) asc — the
        # only well-defined part of the reference's torch.topk order
        # (every non-proposal is -inf there and never becomes a real
        # candidate here)
        pool_sc = lm_scores.reshape(B, k * topn)
        pool_tok = top_tokens.reshape(B, k * topn)
        pool_beam = np.repeat(np.arange(k, dtype=np.int64), topn)[None, :]
        if l == 0:                                   # beams identical
            pool_sc = pool_sc[:, :topn]
            pool_tok = pool_tok[:, :topn]
            pool_beam = pool_beam[:, :topn]
        pw = pool_sc.shape[1]
        ncand = min(cand, pw)
        pool_col = pool_beam * V + pool_tok          # dense-col identity
        if pw > ncand:
            part = np.argpartition(-pool_sc, ncand - 1, axis=1)[:, :ncand]
        else:
            part = np.broadcast_to(np.arange(pw), (B, pw))
        ps = np.take_along_axis(pool_sc, part, axis=1)
        pc = np.take_along_axis(pool_col, part, axis=1)
        order = np.lexsort((pc, -ps), axis=-1)
        sel_p = np.take_along_axis(part, order, axis=1)
        cand_scores = np.take_along_axis(pool_sc, sel_p, axis=1)
        cand_beams = np.take_along_axis(
            np.broadcast_to(pool_beam, pool_sc.shape), sel_p, axis=1)
        cand_toks = np.take_along_axis(pool_tok, sel_p, axis=1)

        # ---- survivors first (vectorized), so the next step dispatches
        # before any per-sample python work -----------------------------
        is_eos = cand_toks == eos                        # [B, ncand]
        nlive = np.minimum((~is_eos).sum(axis=1), k)     # [B]
        order = np.argsort(is_eos, axis=1, kind="stable")  # non-eos first,
        #                                             candidate order kept
        pos = np.minimum(np.arange(k)[None, :],
                         np.maximum(nlive - 1, 0)[:, None])
        pick = np.take_along_axis(order, pos, axis=1)    # [B, k]
        sel2 = (np.take_along_axis(cand_beams, pick, axis=1)
                + np.arange(B)[:, None] * k)             # [B, k] flat rows
        tok2 = np.take_along_axis(cand_toks, pick, axis=1)
        dead = nlive == 0                                # all-eos rows pad
        sel2[dead] = (np.arange(B)[dead] * k)[:, None]   # with (b*k, unk),
        tok2[dead] = cfg.vocab.unk                       # like the old loop
        sel = sel2.reshape(-1).astype(np.int32)
        new_tokens = tok2.reshape(-1).astype(np.int32)
        _toc("select", t0)

        last = l + 1 >= max_len
        t0 = _tic()
        hist_prev = hist                                 # harvest reads l's
        hist = [hist[s] + [int(new_tokens[i])] for i, s in enumerate(sel)]
        if not last:
            # device busy: the reorder is fused into the step program
            out = dispatch(new_tokens, sel, out.cell_state, out.attn_hidden)
        _toc("reorder_dispatch", t0)

        t0 = _tic()
        # ---- ...while the host harvests finished top-k candidates ------
        for b in range(B):
            for j in range(min(k, ncand)):
                if is_eos[b, j]:
                    src = b * k + int(cand_beams[b, j])
                    finished[b].append((list(hist_prev[src]),
                                        float(cand_scores[b, j])))
        _toc("harvest", t0)
        if all(len(f) > 0 for f in finished):
            break                    # the in-flight extra step is discarded

        if incremental:
            t0 = _tic()
            # reorder contexts to the surviving beams, fold in the chosen
            # word's score, and advance the n-gram states in place
            states = np.ascontiguousarray(states[sel])
            state_lens = np.ascontiguousarray(state_lens[sel])
            chosen = tok2lm[new_tokens].astype(np.uint32)
            cum = cum[sel] + lm.base_score_batch_np(states, state_lens,
                                                    chosen)
            lm.advance_batch_np(states, state_lens, chosen)
            _toc("lm_advance", t0)

    results = []
    for b in range(B):
        if finished[b]:
            results.append(sorted(finished[b], key=lambda h: -h[1]))
        else:
            results.append([(hist[b * k], 0.0)])         # best live fallback
    return results


def transcribe_lm_first_pass(params, cfg: Config, bw: int, feats, feat_lens,
                             lm, vocab, topn: int = 20) -> List[str]:
    nbest = lm_first_pass_decode(params, cfg, bw, feats, feat_lens, lm,
                                 vocab, topn)
    return [vocab.decode(hyps[0][0]) for hyps in nbest]
