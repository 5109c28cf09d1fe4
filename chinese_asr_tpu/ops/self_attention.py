"""Self-attention ops + transformer-style blocks (reference
util.py:459-635 attention math, util.py:1664-1864 FFN/QKV modules/blocks,
util.py:749-765 sinusoidal positions).

Faithful semantic notes (quirks kept on purpose — parity over polish):
* The reference scales the block INPUT by head_dim**-0.5 *before* the joint
  QKV projection (util.py:1725-1729), not just the queries.
* Residual connections apply only when input and output dims match
  (util.py:1810-1812).
* Local attention uses ws-wide windows whose start is clamped to
  [0, len-ws] per sample — edge positions get a full window shifted inward
  (util.py:542-560); if a sample is shorter than ws the key mask trims it.

Layouts are batch-major [B, L, D]; the windowed gather is fixed-shape
[B, L, ws, d] — the O(L*ws) long-context mechanism of this framework
(SURVEY.md section 5).
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .masks import length_mask, softmax_mask

Params = Dict[str, jnp.ndarray]


def _xavier(key, shape, dtype):
    std = math.sqrt(2.0 / (shape[0] + shape[1]))
    return std * jax.random.normal(key, shape, dtype)


def sin_pos_embedding(length: int, dim: int, dtype=jnp.float32):
    """Sinusoidal positions (reference get_sin_pos_embedding,
    util.py:749-765)."""
    pos = np.arange(length)[:, None].astype(np.float64)
    i = np.arange(dim)[None, :]
    angle = pos / np.power(10000.0, (2 * (i // 2)) / dim)
    emb = np.where(i % 2 == 0, np.sin(angle), np.cos(angle))
    return jnp.asarray(emb, dtype)


# --------------------------------------------------------------------------
# attention math
# --------------------------------------------------------------------------
def self_attention(q, k, v, lens, heads: int, proj_w=None):
    """Full masked QK attention (reference compute_self_attention,
    util.py:459-508).  q/k/v [B, L, D] -> (attn [B, L, D], alignment)."""
    B, L, D = q.shape
    if heads > 1:
        qh = q.reshape(B, L, heads, -1).transpose(0, 2, 1, 3)
        kh = k.reshape(B, L, heads, -1).transpose(0, 2, 1, 3)
        align = qh @ kh.transpose(0, 1, 3, 2)             # [B, n, L, L]
    else:
        align = q @ k.transpose(0, 2, 1)                  # [B, L, L]
    if lens is not None:
        km = softmax_mask(lens, L, q.dtype)               # [B, L]
        align = align + (km[:, None, None, :] if heads > 1 else km[:, None, :])
    align = jax.nn.softmax(align, axis=-1)
    if heads > 1:
        vh = v.reshape(B, L, heads, -1).transpose(0, 2, 1, 3)
        attn = (align @ vh).transpose(0, 2, 1, 3).reshape(B, L, -1)
        if proj_w is not None:
            attn = attn @ proj_w
    else:
        attn = align @ v
    if lens is not None:
        attn = attn * length_mask(lens, L, attn.dtype)[..., None]
    return attn, align


def self_local_attention(q, k, v, lens, ws: int, heads: int, proj_w=None):
    """Windowed local attention (reference compute_self_local_attention,
    util.py:511-635): per-position ws-wide key/value windows, start index
    clamped into the valid region."""
    B, L, D = q.shape
    n = ws // 2
    if lens is None:
        lens_arr = jnp.full((B,), L, jnp.int32)
    else:
        lens_arr = lens.astype(jnp.int32)
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]         # [1, L]
    upper = jnp.maximum(lens_arr[:, None] - ws, 0)        # [B, 1]
    start = jnp.clip(pos - n, 0, upper)                   # [B, L]
    idx = start[:, :, None] + jnp.arange(ws, dtype=jnp.int32)  # [B, L, ws]

    def gather(t):
        # t [B, L, D] -> [B, L, ws, D]
        return jnp.take_along_axis(
            t[:, :, None, :], jnp.minimum(idx, L - 1)[..., None], axis=1)

    kw = gather(k)
    vw = gather(v)
    # key mask: window slots past the sample's true length
    invalid = idx >= lens_arr[:, None, None]              # [B, L, ws]
    neg = jnp.asarray(-jnp.inf, q.dtype)

    if heads > 1:
        qh = q.reshape(B, L, heads, -1)                   # [B, L, n, d]
        kh = kw.reshape(B, L, ws, heads, -1)
        align = jnp.einsum("blhd,blwhd->bhlw", qh, kh)    # [B, n, L, ws]
        align = jnp.where(invalid[:, None], neg, align)
        align = jax.nn.softmax(align, axis=-1)
        vh = vw.reshape(B, L, ws, heads, -1)
        attn = jnp.einsum("bhlw,blwhd->blhd", align, vh).reshape(B, L, -1)
        if proj_w is not None:
            attn = attn @ proj_w
    else:
        align = jnp.einsum("bld,blwd->blw", q, kw)        # [B, L, ws]
        align = jnp.where(invalid, neg, align)
        align = jax.nn.softmax(align, axis=-1)
        attn = jnp.einsum("blw,blwd->bld", align, vw)
    if lens is not None:
        attn = attn * length_mask(lens, L, attn.dtype)[..., None]
    return attn, align


# --------------------------------------------------------------------------
# modules
# --------------------------------------------------------------------------
def init_qkv(key, input_size: int, hidden_size: int, proj: bool,
             dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    p = {"w_qkv": _xavier(k1, (input_size, 3 * hidden_size), dtype),
         "b_qkv": jnp.zeros((3 * hidden_size,), dtype)}
    if proj:
        p["w_proj"] = _xavier(k2, (hidden_size, hidden_size), dtype)
    return p


def qkv_attention(p: Params, x, lens, heads: int, ws: Optional[int] = None):
    """SelfAttention / SelfLocalAttention module (util.py:1694-1774),
    including the input-scaling quirk."""
    hidden = p["w_qkv"].shape[1] // 3
    x = x * (hidden // heads) ** -0.5
    qkv = x @ p["w_qkv"] + p["b_qkv"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    proj_w = p.get("w_proj")
    if ws is None:
        attn, _ = self_attention(q, k, v, lens, heads, proj_w)
    else:
        attn, _ = self_local_attention(q, k, v, lens, ws, heads, proj_w)
    return attn


def init_ffn(key, input_size: int, hidden_size: int, output_size: int,
             dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {"w1": _xavier(k1, (input_size, hidden_size), dtype),
            "w2": _xavier(k2, (hidden_size, output_size), dtype),
            "b1": jnp.zeros((hidden_size,), dtype),
            "b2": jnp.zeros((output_size,), dtype)}


def ffn(p: Params, x):
    return jax.nn.relu(x @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]


def layer_norm(scale, bias, x, eps: float = 1e-5):
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


# --------------------------------------------------------------------------
# multi-head attention with an incremental KV cache (the capability of the
# reference's vendored fairseq MultiheadAttention_fair, util.py:1868-2120 —
# unused by its default path; here a fixed-shape ring-free cache suitable
# for jit: the cache is a preallocated [B, max_len, D] buffer + a length)
# --------------------------------------------------------------------------
def init_mha(key, embed_dim: int, heads: int, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {"w_qkv": _xavier(k1, (embed_dim, 3 * embed_dim), dtype),
            "b_qkv": jnp.zeros((3 * embed_dim,), dtype),
            "w_out": _xavier(k2, (embed_dim, embed_dim), dtype),
            "b_out": jnp.zeros((embed_dim,), dtype),
            "heads": heads}


def mha_init_cache(batch: int, max_len: int, embed_dim: int,
                   dtype=jnp.float32):
    z = jnp.zeros((batch, max_len, embed_dim), dtype)
    return {"k": z, "v": z, "len": jnp.zeros((), jnp.int32)}


def mha_step(p: Params, x, cache):
    """One incremental decode step: x [B, D] -> (y [B, D], new cache).

    Appends this step's key/value at cache['len'] and attends over the
    valid prefix — fairseq's incremental_state contract under fixed shapes.
    """
    heads = p["heads"]
    B, D = x.shape
    hd = D // heads
    qkv = (x * hd ** -0.5) @ p["w_qkv"] + p["b_qkv"]
    q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
    L = cache["k"].shape[1]
    pos = cache["len"]
    k = jax.lax.dynamic_update_index_in_dim(cache["k"], k_new, pos, axis=1)
    v = jax.lax.dynamic_update_index_in_dim(cache["v"], v_new, pos, axis=1)
    valid = jnp.arange(L) <= pos                           # [L]
    qh = q.reshape(B, heads, hd)
    kh = k.reshape(B, L, heads, hd)
    scores = jnp.einsum("bhd,blhd->bhl", qh, kh)
    scores = jnp.where(valid[None, None, :], scores,
                       jnp.asarray(-jnp.inf, scores.dtype))
    align = jax.nn.softmax(scores, axis=-1)
    vh = v.reshape(B, L, heads, hd)
    y = jnp.einsum("bhl,blhd->bhd", align, vh).reshape(B, D)
    y = y @ p["w_out"] + p["b_out"]
    return y, {"k": k, "v": v, "len": pos + 1}


def mha_full(p: Params, x, lens=None):
    """Whole-sequence MHA with the same weights (for cache-vs-full
    equivalence checks). x [B, L, D] -> [B, L, D], causal."""
    heads = p["heads"]
    B, L, D = x.shape
    hd = D // heads
    qkv = (x * hd ** -0.5) @ p["w_qkv"] + p["b_qkv"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    qh = q.reshape(B, L, heads, hd)
    kh = k.reshape(B, L, heads, hd)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh)
    causal = jnp.tril(jnp.ones((L, L), bool))
    scores = jnp.where(causal[None, None], scores,
                       jnp.asarray(-jnp.inf, scores.dtype))
    align = jax.nn.softmax(scores, axis=-1)
    vh = v.reshape(B, L, heads, hd)
    y = jnp.einsum("bhqk,bkhd->bqhd", align, vh).reshape(B, L, D)
    return y @ p["w_out"] + p["b_out"]


def init_block(key, input_size: int, hidden_size: int, proj: bool,
               ffn_size: int, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "attn": init_qkv(k1, input_size, hidden_size, proj, dtype),
        "ffn": init_ffn(k2, hidden_size, ffn_size, hidden_size, dtype),
        "ln1_scale": jnp.ones((hidden_size,), dtype),
        "ln1_bias": jnp.zeros((hidden_size,), dtype),
        "ln2_scale": jnp.ones((hidden_size,), dtype),
        "ln2_bias": jnp.zeros((hidden_size,), dtype),
    }


def attention_block(p: Params, x, lens, heads: int, ws: Optional[int] = None):
    """attn -> (res if dims match) -> LN -> FFN -> res -> LN
    (SelfAttentionBlock / SelfLocalAttentionBlock, util.py:1777-1864)."""
    y = qkv_attention(p["attn"], x, lens, heads, ws)
    if x.shape[-1] == y.shape[-1]:
        y = x + y
    x = layer_norm(p["ln1_scale"], p["ln1_bias"], y)
    y = ffn(p["ffn"], x)
    y = layer_norm(p["ln2_scale"], p["ln2_bias"], x + y)
    return y
