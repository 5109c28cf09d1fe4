"""Compiled training step: teacher-forced decode as one ``lax.scan``.

The reference trains by looping Python-side over ``PackedSequence`` time
steps with a shrinking batch (reference model.py:414-453) and computing the
label-smoothed CE over all steps at once (model.py:456-469).  On TPU the
whole step — encoder, S decoder steps, loss, grads — is a single jitted
program: fixed [B, S] token matrices + masks replace the packed shrinking
batch, and scheduled sampling (model.py:434-443) is a per-step Bernoulli
draw inside the scan.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..models import decoder as dec_ops
from ..models import las
from ..ops import conv as conv_ops
from .loss import label_smoothed_ce


class Batch(NamedTuple):
    """Teacher-forcing batch (collated by data.loader).

    feats      [B, T, D]  zero-padded features
    feat_lens  [B]        true feature lengths
    tokens_in  [B, S]     <s> + text            (reference data.py:485-487)
    tokens_out [B, S]     text + </s>
    text_lens  [B]        true lengths of tokens_out (incl. eos)
    """

    feats: jnp.ndarray
    feat_lens: jnp.ndarray
    tokens_in: jnp.ndarray
    tokens_out: jnp.ndarray
    text_lens: jnp.ndarray


def forward_logits(params, cfg: Config, batch: Batch,
                   rng: Optional[jax.Array] = None,
                   ss: float = 0.0, bn_updates=None,
                   gate_hoist: Optional[bool] = None) -> jnp.ndarray:
    """Teacher-forced logits [B, S, V] for the whole target matrix.

    ss > 0 enables scheduled sampling: with probability ss the input token
    at step t>0 is the model's own argmax from step t-1 instead of gold
    (reference model.py:434-443).

    gate_hoist: additionally hoist the EMBEDDING PART of the layer-0 LSTM
    gate matmul out of the scan (``emb_seq @ W_ih[:E] + biases`` as one
    [B*S, E] x [E, 4H] product; the scan then carries [S, B, 4H] gate
    partials instead of [S, B, E] embeddings) — PERF.md lever #5.  Only
    takes effect in the ss=0 LSTM + input-feeding regime.  Default (None)
    auto-enables at B >= 64: measured on v5e fwd+bwd at the flagship
    config, 6 s utts — B=128: 63.3 vs 65.0 ms/step (3/3 rounds); B=16:
    15.2 vs 14.7 (the latency-bound small-batch scan pays for the 8x
    wider carried input).  B is static under jit, so the choice is made
    at trace time; parity is f32-rounding-level (pinned in test_train).
    """
    B, S = batch.tokens_in.shape
    dcfg, acfg = cfg.decoder, cfg.attention
    eb = las.encode(params, cfg, batch.feats, batch.feat_lens,
                    train=True, bn_updates=bn_updates)
    ctx = dec_ops.attn_hidden_width(acfg, eb.values.shape[-1])

    cell0 = eb.init_cell_state
    if cell0 is None:
        z = jnp.zeros((B, dcfg.hidden_size), batch.feats.dtype)
        cell0 = [(z, z) if dcfg.decoder_type == "LSTM" else z] * dcfg.num_layers
    attn0 = jnp.zeros((B, ctx), batch.feats.dtype)

    use_ss = ss > 0.0 and rng is not None
    if use_ss:
        # scheduled sampling needs each step's logits INSIDE the scan
        # (the model's own argmax feeds step t+1), so nothing can hoist
        step_keys = jax.random.split(rng, S)

        def body(carry, inp):
            cell_state, attn_hidden, prev_pred = carry
            gold_tok, key, t = inp
            coin = jax.random.bernoulli(key, ss, (B,))
            tok = jnp.where(coin & (t > 0), prev_pred, gold_tok)
            # embed via the one-hot MXU product HERE (not decoder_step's
            # row gather): this path is differentiated, and the one-hot
            # matmul's embedding gradient is a dense outer product while
            # a gather's is a scatter-add (slow on TPU); forward values
            # are bit-identical either way
            emb = params["decoder"]["embedding"]
            tok_emb = jax.nn.one_hot(tok, emb.shape[0], dtype=emb.dtype) @ emb
            out = dec_ops.decoder_step(
                params["decoder"], params["attention"], dcfg, acfg,
                eb.mask, eb.keys, eb.values, None, cell_state, attn_hidden,
                token_emb=tok_emb)
            pred = jnp.argmax(out.logit, axis=-1).astype(jnp.int32)
            return (out.cell_state, out.attn_hidden_state, pred), out.logit

        if cfg.train.remat:
            body = jax.checkpoint(body)
        xs = (jnp.swapaxes(batch.tokens_in, 0, 1), step_keys,
              jnp.arange(S, dtype=jnp.int32))
        _, logits = jax.lax.scan(body, (cell0, attn0, batch.tokens_in[:, 0]),
                                 xs)
        return jnp.swapaxes(logits, 0, 1)                  # [B, S, V]

    # teacher forcing (the flagship regime, ss=0): inputs are gold tokens
    # known upfront, so the per-step embedding and logit matmuls hoist OUT
    # of the scan into two big MXU products — the scan emits only the
    # [S, B, H(+ctx)] hidden trajectory instead of [S, B, V] logits (40
    # launch-bound [B, .] matmuls each way become one [S*B, .] product,
    # and the saved residual shrinks ~5x).  The reference's own train
    # loop does the same hoist in its no-ss branch (it stacks cell_states
    # / attn_hidden_states and projects once — model.py:456-470); the
    # embedding-side hoist is ours.
    dp = params["decoder"]
    emb = dp["embedding"]
    emb_seq = jax.nn.one_hot(batch.tokens_in, emb.shape[0],
                             dtype=emb.dtype) @ emb        # [B, S, E]

    if gate_hoist is None:
        gate_hoist = B >= 64
    gate_hoist = (gate_hoist and dcfg.decoder_type == "LSTM"
                  and dcfg.input_feeding)
    if gate_hoist:
        p0 = dp["cells"][0]
        E = emb.shape[1]
        xs_seq = (emb_seq.reshape(B * S, E) @ p0["w_ih"][:E]
                  + p0["b_ih"] + p0["b_hh"]).reshape(B, S, -1)  # [B, S, 4H]
    else:
        xs_seq = emb_seq

    def body(carry, x_t):
        cell_state, attn_hidden = carry
        out = dec_ops.decoder_step(
            dp, params["attention"], dcfg, acfg,
            eb.mask, eb.keys, eb.values, None, cell_state, attn_hidden,
            compute_logit=False,
            token_emb=None if gate_hoist else x_t,
            gate_partial=x_t if gate_hoist else None)
        last = out.cell_state[-1]
        last_h = last[0] if dcfg.decoder_type == "LSTM" else last
        return ((out.cell_state, out.attn_hidden_state),
                (last_h, out.attn_hidden_state))

    if cfg.train.remat:
        # drop the per-step attention/gate residuals; the backward pass
        # recomputes each decoder step from its (tiny) carry instead
        body = jax.checkpoint(body)
    _, (h_seq, ahs_seq) = jax.lax.scan(body, (cell0, attn0),
                                       jnp.swapaxes(xs_seq, 0, 1))
    if acfg.attn_type == "B":
        proj_in = jnp.concatenate([h_seq, ahs_seq], axis=-1)  # [S, B, H+ctx]
    else:
        proj_in = ahs_seq
    logits = proj_in @ dp["proj_w"] + dp["proj_b"]         # [S, B, V]
    return jnp.swapaxes(logits, 0, 1)                      # [B, S, V]


def loss_fn(params, cfg: Config, batch: Batch,
            rng: Optional[jax.Array] = None) -> Tuple[jnp.ndarray, Dict]:
    # BN batch-stat recordings ride the aux dict out of value_and_grad so
    # the step can fold them into the params (grads don't flow into them:
    # running stats are a moving average, not a learned quantity)
    bn_updates = []
    # mixed precision (train.compute_dtype="bfloat16"): the cast sits
    # INSIDE the differentiated function, so autodiff emits f32 gradients
    # at the cast boundary while the whole forward/backward runs in bf16;
    # master params / optimizer state / BN running stats stay f32
    # (merge_bn_stats casts to the running buffer's dtype), and the
    # softmax + CE below are computed from f32-cast logits
    cd = jnp.dtype(cfg.train.compute_dtype)
    fwd_params = params
    if cd != jnp.float32:
        fwd_params = jax.tree_util.tree_map(
            lambda x: x.astype(cd)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
        batch = batch._replace(feats=batch.feats.astype(cd))
    logits = forward_logits(fwd_params, cfg, batch, rng, cfg.train.ss,
                            bn_updates)
    logits = logits.astype(jnp.float32)
    S = batch.tokens_out.shape[1]
    mask = (jnp.arange(S)[None, :] < batch.text_lens[:, None])
    loss = label_smoothed_ce(logits, batch.tokens_out, mask,
                             cfg.train.label_smooth)
    acc = ((jnp.argmax(logits, -1) == batch.tokens_out) * mask).sum() / \
        jnp.maximum(mask.sum(), 1)
    # convert identity-keyed recordings to a structure-aligned tree HERE,
    # inside the trace where the forward tree's dict identities are valid
    # (recordings key on fwd_params' sub-dicts under mixed precision)
    bn_tree = conv_ops.bn_stats_tree(fwd_params, bn_updates)
    bn_tree = jax.tree_util.tree_map(jax.lax.stop_gradient, bn_tree)
    return loss, {"accuracy": acc, "num_tokens": mask.sum(),
                  "bn_stats": bn_tree}


def train_step(params, opt_state, cfg: Config, tx, batch: Batch,
               rng: Optional[jax.Array] = None):
    """One update.  Returns (params, opt_state, metrics).

    Non-finite losses skip the update entirely, replicating the reference's
    NaN/Inf guard (model.py:473-475).
    """
    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, cfg, batch, rng)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, g: a + (g.astype(jnp.float32) ** 2).sum(), grads, 0.0) ** 0.5
    finite = jnp.isfinite(loss)
    grads = jax.tree_util.tree_map(
        lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
    updates, new_opt_state = tx.update(grads, opt_state, params)
    new_params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    # BatchNorm running stats are buffers, not gradient-updated parameters:
    # fold the batch statistics recorded in the forward into them (torch
    # momentum-0.1 moving average)
    new_params = conv_ops.merge_bn_stats(new_params, aux.pop("bn_stats"))
    # skip: keep old state when loss was non-finite
    new_params = jax.tree_util.tree_map(
        lambda n, o: jnp.where(finite, n, o), new_params, params)
    new_opt_state = jax.tree_util.tree_map(
        lambda n, o: jnp.where(finite, n, o), new_opt_state, opt_state)
    metrics = {"loss": loss, "grad_norm": gnorm, "skipped": ~finite, **aux}
    return new_params, new_opt_state, metrics
