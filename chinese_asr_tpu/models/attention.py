"""Bahdanau additive attention (reference attention.py:20-111), as pure
functions over a parameter pytree.

Layout is batch-major ([B, L, D]) rather than the reference's time-major
([L, B, D]): under jit there is no cuDNN constraint, and batch-major keeps
the per-step decoder matmuls contiguous for the MXU.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import AttentionConfig

Params = Dict[str, jnp.ndarray]


def init_attention(key, cfg: AttentionConfig, enc_size: int, dec_hidden: int,
                   dtype=jnp.float32) -> Params:
    """Init mirrors reference attention.py:53-65: xavier-normal W_enc/W_hidden,
    N(0, .1) v, zero bias."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    a = cfg.attn_size

    def xavier(k, shape):
        std = math.sqrt(2.0 / (shape[0] + shape[1]))
        return std * jax.random.normal(k, shape, dtype)

    p = {
        "w_enc": xavier(k1, (enc_size, a)),
        "b_attn": jnp.zeros((a,), dtype),
        "w_hidden": xavier(k2, (dec_hidden, a)),
        "v": 0.1 * jax.random.normal(k3, (a,), dtype),
    }
    if cfg.map_enc:
        p["map_enc"] = xavier(k4, (enc_size, a))          # Linear no-bias
    if cfg.heads > 1 and cfg.linear_map:
        ctx = context_size(cfg, enc_size)
        p["linear_map"] = xavier(k5, (ctx, ctx))
    return p


def context_size(cfg: AttentionConfig, enc_size: int) -> int:
    return cfg.attn_size if cfg.map_enc else enc_size


def compute_key_value(p: Params, cfg: AttentionConfig, enc_outputs):
    """Precompute per-utterance keys/values (reference attention.py:67-78).

    enc_outputs [B, L, enc] -> keys [B, L, a], values [B, L, ctx].
    """
    values = enc_outputs @ p["map_enc"] if "map_enc" in p else enc_outputs
    keys = enc_outputs @ p["w_enc"] + p["b_attn"]
    return keys, values


def attend(p: Params, cfg: AttentionConfig, mask, hidden_state, keys, values
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One attention read (reference attention.py:80-111).

    mask [B, L] additive (-inf at padding), hidden_state [B, H].
    Returns (context [B, ctx], alignment [B, L] or [B, L, heads]).
    """
    q = hidden_state @ p["w_hidden"]                      # [B, a]
    e = jnp.tanh(keys + q[:, None, :]) * p["v"]           # [B, L, a]
    if cfg.heads == 1:
        scores = e.sum(axis=-1)                           # [B, L]
        align = jax.nn.softmax(mask + scores, axis=1)
        context = (align[..., None] * values).sum(axis=1)  # [B, ctx]
        return context, align
    B, L, a = e.shape
    n = cfg.heads
    scores = e.reshape(B, L, n, a // n).sum(axis=-1)      # [B, L, n]
    align = jax.nn.softmax(mask[..., None] + scores, axis=1)
    v_h = values.reshape(B, L, n, -1)                     # [B, L, n, d/n]
    context = (align[..., None] * v_h).sum(axis=1)        # [B, n, d/n]
    context = context.reshape(B, -1)
    if "linear_map" in p:
        context = context @ p["linear_map"]
    return context, align


def attend_beam(p: Params, cfg: AttentionConfig, mask, hidden_state, keys, values
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Beam-shaped attention read: k beams per sample share one copy of
    keys/values.

    The reference tiles enc/keys/values to B*k rows and then *reorders all
    of them every step* (reference model.py:913-916) — but beams of a sample
    are tiled copies, so that reorder moves identical rows; here the beam
    dim lives only on the query and the shared tensors are never tiled or
    shuffled (SURVEY section 3.4's idiomatic fix).

    mask [B, L]; hidden_state [B, k, H]; keys [B, L, a]; values [B, L, d].
    Returns (context [B, k, ctx], alignment [B, k, L]).
    """
    q = hidden_state @ p["w_hidden"]                      # [B, k, a]
    e = jnp.tanh(keys[:, None, :, :] + q[:, :, None, :]) * p["v"]  # [B,k,L,a]
    if cfg.heads == 1:
        scores = e.sum(axis=-1)                           # [B, k, L]
        align = jax.nn.softmax(mask[:, None, :] + scores, axis=-1)
        context = jnp.einsum("bkl,bld->bkd", align, values)
        return context, align
    B, k, L, a = e.shape
    n = cfg.heads
    scores = e.reshape(B, k, L, n, a // n).sum(axis=-1)   # [B, k, L, n]
    align = jax.nn.softmax(mask[:, None, :, None] + scores, axis=2)
    v_h = values.reshape(B, L, n, -1)
    context = jnp.einsum("bkln,blnd->bknd", align, v_h).reshape(B, k, -1)
    if "linear_map" in p:
        context = context @ p["linear_map"]
    return context, align[..., 0]
