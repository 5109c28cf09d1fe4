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
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models import decoder as dec_ops
from ..models import las


class BeamResult(NamedTuple):
    fin_tokens: jnp.ndarray     # [B, CAP, max_len] int32 (no sos/eos)
    fin_lens: jnp.ndarray       # [B, CAP] int32
    fin_scores: jnp.ndarray     # [B, CAP] f32 (-inf where unused)
    fin_count: jnp.ndarray      # [B] int32
    live_tokens: jnp.ndarray    # [B, k, max_len] final history (no sos)
    live_scores: jnp.ndarray    # [B, k] accumulated logp of live beams
    l_final: jnp.ndarray        # scalar int32: reference's loop var at exit


def beam_decode(params, cfg: Config, bw: int, feats, feat_lens) -> BeamResult:
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

    bb_offsets = k * jnp.arange(B, dtype=jnp.int32)                   # [B]
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
        fin_tokens=jnp.zeros((B, cap, max_len), jnp.int32),
        fin_lens=jnp.zeros((B, cap), jnp.int32),
        fin_scores=jnp.full((B, cap), -jnp.inf, jnp.float32),
        fin_count=jnp.zeros((B,), jnp.int32),
    )

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

        logit = out.logit.astype(jnp.float32) / cfg.decoder.temperature
        logp = logit - jax.scipy.special.logsumexp(logit, axis=1, keepdims=True)
        logp = logp + s["logp_scores"][:, None]                       # [B*k, V]
        scores = logp.reshape(B, k * V)

        # step 0: all beams identical -> restrict to beam 0's vocab slice
        col = jax.lax.broadcasted_iota(jnp.int32, (1, k * V), 1)
        scores = jnp.where((l == 0) & (col >= V), -jnp.inf, scores)

        cand_scores, cand_idx = jax.lax.top_k(scores, cand)           # [B, 2k]
        cand_beams = (cand_idx // V).astype(jnp.int32)
        cand_tokens = (cand_idx % V).astype(jnp.int32)

        # ---- harvest finished among top-k (model.py:875-889) -------------
        top_tokens = cand_tokens[:, :k]
        top_beams = cand_beams[:, :k]
        top_scores = cand_scores[:, :k]
        fmask = top_tokens == eos                                     # [B, k]
        k_bb = (top_beams + bb_offsets[:, None]).reshape(-1)          # [B*k]
        hist_k = s["hist"][k_bb][:, 1:].reshape(B, k, max_len)        # prefixes
        # position of each finished candidate in the sample's buffer
        pos = s["fin_count"][:, None] + jnp.cumsum(fmask, axis=1) - 1  # [B, k]
        pos = jnp.where(fmask, pos, cap)                              # drop others
        b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, k))
        fin_tokens = s["fin_tokens"].at[b_idx, pos].set(hist_k, mode="drop")
        fin_lens = s["fin_lens"].at[b_idx, pos].set(l, mode="drop")
        fin_scores = s["fin_scores"].at[b_idx, pos].set(top_scores, mode="drop")
        fin_count = s["fin_count"] + fmask.sum(axis=1).astype(jnp.int32)

        # ---- early stop (model.py:897-901) -------------------------------
        top_beam_finished = s["top_beam_finished"] | (top_tokens[:, 0] == eos)
        new_done = jnp.all(top_beam_finished)
        l_final = jnp.where(new_done & ~s["done"], l, s["l_final"])

        # ---- survivors (model.py:904-909) --------------------------------
        eos2k = (cand_tokens == eos).astype(jnp.int32)
        rank = cand_offsets + eos2k * cand                            # [B, 2k]
        _, active = jax.lax.top_k(-rank, k)                           # smallest k
        k_beams = jnp.take_along_axis(cand_beams, active, axis=1)
        k_toks = jnp.take_along_axis(cand_tokens, active, axis=1)
        new_scores = jnp.take_along_axis(cand_scores, active, axis=1)
        sel = (k_beams + bb_offsets[:, None]).reshape(-1)             # [B*k]

        def reorder(t):
            return t[sel]

        hist = s["hist"][sel]
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

        return dict(
            l=l + 1,
            done=new_done,
            l_final=l_final,
            hist=keep(hist, s["hist"]),
            logp_scores=keep(new_scores.reshape(-1), s["logp_scores"]),
            cell_state=keep(cell_state, s["cell_state"]),
            attn_hidden=keep(attn_hidden, s["attn_hidden"]),
            top_beam_finished=top_beam_finished,
            fin_tokens=fin_tokens,
            fin_lens=fin_lens,
            fin_scores=fin_scores,
            fin_count=fin_count,
        )

    s = jax.lax.while_loop(cond, body, state0)
    return BeamResult(
        fin_tokens=s["fin_tokens"], fin_lens=s["fin_lens"],
        fin_scores=s["fin_scores"], fin_count=s["fin_count"],
        live_tokens=s["hist"][:, 1:].reshape(B, k, max_len),
        live_scores=s["logp_scores"].reshape(B, k),
        l_final=s["l_final"])


@functools.lru_cache(maxsize=32)
def _jitted(cfg: Config, bw: int):
    return jax.jit(functools.partial(beam_decode, cfg=cfg, bw=bw))


def beam_decode_jit(params, cfg: Config, bw: int, feats, feat_lens) -> BeamResult:
    return _jitted(cfg, bw)(params, feats=feats, feat_lens=feat_lens)


# --------------------------------------------------------------------------
# host-side finalization (reference parse_finished_tensors model.py:708-765
# + unfinished fallback model.py:961-972)
# --------------------------------------------------------------------------
def finalize_beam(res: BeamResult, cfg: Config, vocab, text=None,
                  lm_model=None, second_pass: bool = False,
                  lm_weight: float = 0.0, length_weight: float = 0.0):
    from ..decode.greedy import EvalOutput
    from ..ops.metrics import cer

    fin_tokens = np.asarray(res.fin_tokens)
    fin_lens = np.asarray(res.fin_lens)
    fin_scores = np.asarray(res.fin_scores)
    fin_count = np.asarray(res.fin_count)
    live_tokens = np.asarray(res.live_tokens)
    live_scores = np.asarray(res.live_scores)
    l_final = int(res.l_final)
    B = fin_tokens.shape[0]

    outputs = []
    for b in range(B):
        n = int(fin_count[b])
        if n == 0:
            # fallback: best live beam (model.py:961-972)
            act = live_scores[b] + length_weight * (l_final + 1)
            j = int(np.argmax(act))
            ids = live_tokens[b, j, : l_final + 1].tolist()
            outputs.append((ids, float(act[j])))
            continue
        hyps = [(fin_tokens[b, i, : fin_lens[b, i]].tolist(), float(fin_scores[b, i]))
                for i in range(n)]
        if second_pass and len(hyps) > 1:
            assert lm_model is not None, "second pass needs a language model"
            # score = logp + w_lm * lm + w_len * len  (model.py:749-763)
            rescored = []
            for ids, logp in hyps:
                lm_s = lm_model.score(" ".join(vocab.int2word[i] for i in ids),
                                      bos=True)
                rescored.append(logp + lm_weight * lm_s + length_weight * len(ids))
            outputs.append(hyps[int(np.argmax(rescored))])
        else:
            outputs.append(max(hyps, key=lambda h: h[1]))

    pred_text = [vocab.decode(ids) for ids, _ in outputs]
    score = [s for _, s in outputs]

    wer = None
    ref_text = None
    if text is not None:
        ref_text = [vocab.decode(t) if not isinstance(t, str) else t for t in text]
        wer = float(np.mean([cer(p, r) for p, r in zip(pred_text, ref_text)]))
    return EvalOutput(pred_text, score, ref_text, wer, B, None, None, None)
