"""Attention decoder step (reference decoder.py:10-137) as a pure function.

One step: embed -> input-feed concat -> LSTM cell stack -> attention ->
attentional hidden state -> logits.  The whole decode loop lives in
``decode/greedy.py`` / ``decode/beam.py`` as a single compiled scan.
"""

from __future__ import annotations

import math
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import AttentionConfig, DecoderConfig, VocabConfig
from ..ops import rnn as rnn_ops
from . import attention as attn_ops

Params = Dict


class DecoderOut(NamedTuple):
    logit: Optional[jnp.ndarray]       # [B, V]
    attn_hidden_state: jnp.ndarray     # [B, ctx]
    alignment: jnp.ndarray             # [B, L]
    cell_state: List                   # per-layer (h, c)


def init_decoder(key, dcfg: DecoderConfig, acfg: AttentionConfig,
                 vcfg: VocabConfig, enc_size: int, dtype=jnp.float32) -> Params:
    """Init mirrors reference decoder.py:75-92: embedding N(0, .1) with the
    pad row zeroed (padding_idx), init_rnn'd cells, xavier proj weight,
    torch-default uniform proj bias."""
    k_emb, k_cell, k_projw, k_projb, k_ahw = jax.random.split(key, 5)
    V = vcfg.vocab_size
    ctx = attn_ops.context_size(acfg, enc_size)

    if acfg.attn_type == "L":
        input_size = dcfg.embed_dim + (acfg.attn_hidden_size if dcfg.input_feeding
                                       else 0)
        proj_in = acfg.attn_hidden_size
    else:
        input_size = dcfg.embed_dim + ctx
        proj_in = dcfg.hidden_size + ctx

    emb = 0.1 * jax.random.normal(k_emb, (V, dcfg.embed_dim), dtype)
    emb = emb.at[vcfg.pad].set(0.0)

    def xavier(k, shape):
        std = math.sqrt(2.0 / (shape[0] + shape[1]))
        return std * jax.random.normal(k, shape, dtype)

    p: Params = {
        "embedding": emb,
        "cells": rnn_ops.init_cell_stack(k_cell, dcfg.decoder_type, input_size,
                                         dcfg.hidden_size, dcfg.num_layers, dtype),
        "proj_w": xavier(k_projw, (proj_in, V)),
        "proj_b": jax.random.uniform(k_projb, (V,), dtype,
                                     -1.0 / math.sqrt(proj_in),
                                     1.0 / math.sqrt(proj_in)),
    }
    if acfg.attn_type == "L":
        p["attn_hidden_w"] = xavier(k_ahw, (dcfg.hidden_size + ctx,
                                            acfg.attn_hidden_size))
    if dcfg.init_cell_state_as_param:
        num_state = 2 if dcfg.decoder_type == "LSTM" else 1
        p["init_state"] = [jnp.zeros((dcfg.hidden_size,), dtype)
                           for _ in range(dcfg.num_layers * num_state)]
    return p


def attn_hidden_width(acfg: AttentionConfig, values_dim: int) -> int:
    """Width of the attentional hidden state fed back at the next step:
    the raw context for 'B', the tanh-projected size for 'L'
    (reference decoder.py:39-51, 126-127)."""
    return acfg.attn_hidden_size if acfg.attn_type == "L" else values_dim


def get_initial_state(p: Params, dcfg: DecoderConfig, bsz: int, enc_state,
                      dtype=jnp.float32) -> Optional[List]:
    """Reference decoder.py:56-73: encoder last state replicated per layer,
    else the learned init, else None (-> zeros in the cell stack).

    Encoder states that don't fit the decoder cell (e.g. a GRU encoder's
    plain h next to an LSTM decoder needing (h, c), or a size mismatch)
    fall through to the learned/zero init."""
    if enc_state is not None:
        if dcfg.decoder_type == "LSTM":
            compatible = (isinstance(enc_state, tuple) and len(enc_state) == 2
                          and enc_state[0].shape[-1] == dcfg.hidden_size)
        else:
            compatible = (not isinstance(enc_state, tuple)
                          and enc_state.shape[-1] == dcfg.hidden_size)
        if compatible:
            return [enc_state] * dcfg.num_layers
    if "init_state" in p:
        if dcfg.decoder_type != "LSTM":
            return [jnp.broadcast_to(e, (bsz, e.shape[0])) for e in p["init_state"]]
        return [(jnp.broadcast_to(p["init_state"][2 * i],
                                  (bsz, p["init_state"][2 * i].shape[0])),
                 jnp.broadcast_to(p["init_state"][2 * i + 1],
                                  (bsz, p["init_state"][2 * i + 1].shape[0])))
                for i in range(dcfg.num_layers)]
    return None


def decoder_step(p: Params, attn_p, dcfg: DecoderConfig, acfg: AttentionConfig,
                 mask, keys, values, token, cell_state, attn_hidden_state,
                 compute_logit: bool = True, token_emb=None,
                 gate_partial=None) -> DecoderOut:
    """Reference decoder.py:94-137. token [B] int32.

    ``token_emb`` [B, E]: pre-embedded input (the teacher-forced trainer
    hoists the whole [B, S] embedding out of its scan as one MXU matmul);
    when given, ``token`` is ignored.

    ``gate_partial`` [B, 4H]: the layer-0 LSTM gate contribution of the
    token embedding INCLUDING both biases, precomputed outside the scan
    (``emb_seq @ W_ih[:E] + b_ih + b_hh``); when given, ``token`` and
    ``token_emb`` are ignored and layer 0 only multiplies the fed-back
    attentional state and the recurrent weights.  LSTM + input_feeding
    only (the flagship training regime).
    """
    ctx_size = values.shape[-1] if acfg.attn_type != "L" else acfg.attn_hidden_size
    if gate_partial is not None:
        assert dcfg.decoder_type == "LSTM" and dcfg.input_feeding
        B = gate_partial.shape[0]
        if attn_hidden_state is None:
            attn_hidden_state = jnp.zeros((B, ctx_size), gate_partial.dtype)
        if cell_state is None:
            cell_state = [(jnp.zeros((B, l["w_hh"].shape[0]), gate_partial.dtype),
                           jnp.zeros((B, l["w_hh"].shape[0]), gate_partial.dtype))
                          for l in p["cells"]]
        p0 = p["cells"][0]
        E = p0["w_ih"].shape[0] - attn_hidden_state.shape[1]
        h0, c0 = cell_state[0]
        gates = (gate_partial + attn_hidden_state @ p0["w_ih"][E:]
                 + h0 @ p0["w_hh"])
        h, c = rnn_ops.lstm_from_gates(gates, c0)
        new_state = [(h, c)]
        if len(p["cells"]) > 1:
            new_state += rnn_ops.cell_stack_step(
                dcfg.decoder_type, p["cells"][1:], h, cell_state[1:])
        cell_state = new_state
    else:
        # row gather: measured FASTER than the one-hot MXU product since
        # the round-3 time-major layout rework (in-pipeline A/B, v5e,
        # B=128/bw=16: 46.5 vs 47.9 ms/batch, 5/5 rounds, outputs
        # bit-identical — tools/decoder_fuse_ab.py); the earlier claim
        # the other way predates that rework
        emb = p["embedding"]
        if token_emb is not None:
            x = token_emb
        else:
            x = jnp.take(emb, token, axis=0)
        if dcfg.input_feeding:
            if attn_hidden_state is None:
                attn_hidden_state = jnp.zeros((x.shape[0], ctx_size), x.dtype)
            x = jnp.concatenate([x, attn_hidden_state], axis=1)

        cell_state = rnn_ops.cell_stack_step(dcfg.decoder_type, p["cells"],
                                             x, cell_state)
    last = cell_state[-1]
    last_h = last[0] if dcfg.decoder_type == "LSTM" else last

    context, alignment = attn_ops.attend(attn_p, acfg, mask, last_h, keys, values)

    if acfg.attn_type == "L":
        ahs = jnp.tanh(jnp.concatenate([last_h, context], axis=1) @ p["attn_hidden_w"])
    else:
        ahs = context

    logit = None
    if compute_logit:
        if acfg.attn_type == "B":
            logit = jnp.concatenate([last_h, ahs], axis=-1) @ p["proj_w"] + p["proj_b"]
        else:
            logit = ahs @ p["proj_w"] + p["proj_b"]
    return DecoderOut(logit, ahs, alignment, cell_state)


def decoder_step_beam(p: Params, attn_p, dcfg: DecoderConfig, acfg: AttentionConfig,
                      mask, keys, values, token, cell_state, attn_hidden_state
                      ) -> DecoderOut:
    """Beam variant: cells run on flat [B*k] rows, attention on untiled
    per-sample keys/values via ``attend_beam`` (no tiled enc tensors at all).

    mask [B, L]; keys [B, L, a]; values [B, L, d]; token [B*k];
    attn_hidden_state [B*k, ctx]; cell_state per-layer over [B*k] rows.
    """
    B = mask.shape[0]
    k = token.shape[0] // B
    # row-gather embedding (see decoder_step: beats the one-hot MXU
    # product by ~3% of the whole pipeline post-layout-rework, outputs
    # bit-identical)
    emb = p["embedding"]
    x = jnp.take(emb, token, axis=0)
    if dcfg.input_feeding:
        x = jnp.concatenate([x, attn_hidden_state], axis=1)

    cell_state = rnn_ops.cell_stack_step(dcfg.decoder_type, p["cells"], x, cell_state)
    last = cell_state[-1]
    last_h = last[0] if dcfg.decoder_type == "LSTM" else last

    context, alignment = attn_ops.attend_beam(
        attn_p, acfg, mask, last_h.reshape(B, k, -1), keys, values)
    context = context.reshape(B * k, -1)

    if acfg.attn_type == "L":
        ahs = jnp.tanh(jnp.concatenate([last_h, context], axis=1) @ p["attn_hidden_w"])
    else:
        ahs = context

    if acfg.attn_type == "B":
        logit = jnp.concatenate([last_h, ahs], axis=-1) @ p["proj_w"] + p["proj_b"]
    else:
        logit = ahs @ p["proj_w"] + p["proj_b"]
    return DecoderOut(logit, ahs, alignment.reshape(B * k, -1), cell_state)
