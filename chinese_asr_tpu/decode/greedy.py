"""Greedy decoding (reference model.py:503-602) as one compiled program.

The whole pipeline — encoder, key/value precompute, and the <=max_len-step
token loop — runs under a single jit; the loop is a ``lax.while_loop`` with
batch-wide early exit (the reference's ``if finished.all(): break``,
model.py:578-579), so typical utterances stop after ~15 steps instead of 40.
The only host boundary is (features in, token matrix out), matching the
SURVEY section 2.c host/device split.

Scoring bookkeeping replicates model.py:567-576 exactly: the eos step's logp
enters via the first conditional add; subsequent steps of a finished sample
contribute nothing; ``final_lens`` counts tokens before eos.
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


class GreedyResult(NamedTuple):
    tokens: jnp.ndarray        # [B, max_len] int32
    final_lens: jnp.ndarray    # [B] int32 (length before eos)
    scores: jnp.ndarray        # [B] accumulated logp
    finished: jnp.ndarray      # [B] bool
    alignments: jnp.ndarray    # [B, max_len, L]


def greedy_decode(params, cfg: Config, feats, feat_lens) -> GreedyResult:
    B = feats.shape[0]
    max_len = cfg.decode.max_len
    eb = las.encode(params, cfg, feats, feat_lens)
    L = eb.enc_out.shape[1]
    dcfg, acfg = cfg.decoder, cfg.attention
    ctx = dec_ops.attn_hidden_width(acfg, eb.values.shape[-1])

    cell0 = eb.init_cell_state
    if cell0 is None:
        H = dcfg.hidden_size
        z = jnp.zeros((B, H), feats.dtype)
        cell0 = [(z, z) if dcfg.decoder_type == "LSTM" else z] * dcfg.num_layers

    state0 = dict(
        l=jnp.int32(0),
        tokens=jnp.full((B,), cfg.vocab.sos, jnp.int32),
        cell_state=cell0,
        attn_hidden=jnp.zeros((B, ctx), feats.dtype),
        finished=jnp.zeros((B,), bool),
        final_lens=jnp.zeros((B,), jnp.int32),
        accum=jnp.zeros((B,), jnp.float32),   # scores stay f32 under bf16
        out=jnp.full((B, max_len), cfg.vocab.pad, jnp.int32),
        align=jnp.zeros((B, max_len, L), feats.dtype),
    )

    def cond(s):
        return (s["l"] < max_len) & ~jnp.all(s["finished"])

    def body(s):
        out = dec_ops.decoder_step(
            params["decoder"], params["attention"], dcfg, acfg,
            eb.mask, eb.keys, eb.values, s["tokens"], s["cell_state"],
            s["attn_hidden"])
        logit = out.logit.astype(jnp.float32)
        logp = logit - jax.scipy.special.logsumexp(logit, axis=1, keepdims=True)
        tok = jnp.argmax(logp, axis=1).astype(jnp.int32)
        lp = jnp.take_along_axis(logp, tok[:, None], axis=1)[:, 0]

        cur_fin = tok == cfg.vocab.eos
        accum = s["accum"] + jnp.where(~s["finished"] & cur_fin, lp, 0.0)
        finished = s["finished"] | cur_fin
        final_lens = s["final_lens"] + (~finished).astype(jnp.int32)
        accum = accum + jnp.where(~finished, lp, 0.0)

        align = out.alignment if acfg.heads == 1 else out.alignment[..., 0]
        return dict(
            l=s["l"] + 1,
            tokens=tok,
            cell_state=out.cell_state,
            attn_hidden=out.attn_hidden_state,
            finished=finished,
            final_lens=final_lens,
            accum=accum,
            out=s["out"].at[:, s["l"]].set(tok),
            align=s["align"].at[:, s["l"], :].set(align),
        )

    s = jax.lax.while_loop(cond, body, state0)
    return GreedyResult(s["out"], s["final_lens"], s["accum"], s["finished"],
                        s["align"])


@functools.lru_cache(maxsize=32)
def _jitted(cfg: Config):
    return jax.jit(functools.partial(greedy_decode, cfg=cfg),
                   static_argnames=())


def greedy_decode_jit(params, cfg: Config, feats, feat_lens) -> GreedyResult:
    fn = _jitted(cfg)
    return fn(params, feats=feats, feat_lens=feat_lens)


# --------------------------------------------------------------------------
# host-side finalization (reference model.py:582-601)
# --------------------------------------------------------------------------
class EvalOutput(NamedTuple):
    pred_text: list
    score: list
    text: Optional[list]
    wer: Optional[float]
    n: int
    alignment: Optional[np.ndarray]
    audio_feat_len: Optional[np.ndarray]
    text_len: Optional[np.ndarray]


def finalize_greedy(res: GreedyResult, vocab, text=None,
                    feat_lens=None, want_alignment: bool = False
                    ) -> EvalOutput:
    """``want_alignment`` gates the [B, max_len, L] attention-alignment
    transfer (~7 MB/batch at B=128 — a material cost through the device
    tunnel); only the trainer's heatmap logging needs it."""
    from ..ops.metrics import cer

    # overlap the device->host copies (~25 ms fixed latency per transfer
    # through the device tunnel); alignments only when asked for
    from .beam import _prefetch_host
    _prefetch_host((res.tokens, res.final_lens, res.finished, res.scores)
                   + ((res.alignments,) if want_alignment else ()))
    tokens = np.asarray(res.tokens)
    final_lens = np.asarray(res.final_lens)
    finished = np.asarray(res.finished)
    accum = np.asarray(res.scores)

    pred_text, score = [], []
    for i in range(tokens.shape[0]):
        ids = tokens[i, : final_lens[i]]
        if len(ids) == 0:
            pred_text.append("")
            score.append(0.0)
        else:
            pred_text.append(vocab.decode(ids))
            score.append(float(accum[i]) / (int(final_lens[i]) + int(finished[i])))

    wer = None
    ref_text = None
    if text is not None:
        ref_text = [vocab.decode(t) if not isinstance(t, str) else t for t in text]
        wer = float(np.mean([cer(p, r) for p, r in zip(pred_text, ref_text)]))
    return EvalOutput(pred_text, score, ref_text, wer, tokens.shape[0],
                      np.asarray(res.alignments) if want_alignment else None,
                      None if feat_lens is None else np.asarray(feat_lens),
                      final_lens)
