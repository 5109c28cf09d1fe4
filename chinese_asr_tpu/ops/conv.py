"""Masked convolution blocks (reference util.py:145-183 pad/pad2d,
util.py:1327-1573 Conv1D/Conv2D/MaskWidthCNN2D).

TPU-native layout decisions:
* channel-LAST tensors ([B, T, C] / [B, T, F, C]) so the channel dim rides
  the 128-wide lane dimension and convs lower onto the MXU — the reference
  uses torch's channel-first [B, C, L] / [B, C, H, W];
* "auto-pad so no frame is dropped" (reference pad(), util.py:145-158)
  becomes a static right/bottom pad derived from the array length;
* output lengths follow the reference's formula
  ``(l - ks + stride - 1) // stride + 1`` and padding positions are zeroed.

Norm semantics mirror the reference deliberately, including its quirk of
computing BatchNorm statistics **over padded positions too** ("BN under
padding", reference encoder.py:465): parity beats prettiness here.
BN uses batch statistics when ``train=True`` and the stored running stats
otherwise.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .masks import length_mask

Params = Dict[str, jnp.ndarray]

ACTS = ("GLU", "RELU", "SIGMOID", "TANH", "NONE")
NORMS = ("BN", "LN", "IN", "NONE")


def _xavier(key, shape, fan_in, fan_out, dtype):
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def conv_out_len(lens, ks: int, stride: int):
    """Reference length recompute (util.py:1430): floor((l-ks+s-1)/s)+1."""
    return jnp.maximum((lens - ks + stride - 1) // stride + 1, 0)


def norm_params(out_c: int, norm: str, dtype) -> Params:
    p = {}
    if norm != "NONE":
        p["norm_scale"] = jnp.ones((out_c,), dtype)
        p["norm_bias"] = jnp.zeros((out_c,), dtype)
    if norm == "BN":
        p["bn_mean"] = jnp.zeros((out_c,), dtype)
        p["bn_var"] = jnp.ones((out_c,), dtype)
    return p


def apply_norm(p: Params, y, norm: str, train: bool, eps: float = 1e-5,
                spatial_axes: Tuple[int, ...] = (1,), updates=None):
    """y [..., C]; BN normalizes per channel over batch+spatial (padding
    included, matching the reference), LN over channels, IN per-sample over
    spatial.

    BN follows torch semantics: train=True normalizes with the biased batch
    statistics AND (when ``updates`` — a list — is passed) records
    ``(param_dict, batch_mean, batch_var, n)`` so the train step can fold
    the running-stat moving average into the params (torch updates
    running_var with the UNBIASED batch variance); train=False uses the
    stored running stats."""
    if norm == "NONE":
        return y
    if norm == "BN":
        if train:
            axes = (0,) + spatial_axes
            mean = y.mean(axes)
            var = y.var(axes)
            if updates is not None:
                n = 1
                for a in axes:
                    n *= y.shape[a]
                updates.append((p, mean, var, n))
        else:
            mean, var = p["bn_mean"], p["bn_var"]
        yn = (y - mean) * jax.lax.rsqrt(var + eps)
    elif norm == "LN":
        mean = y.mean(-1, keepdims=True)
        var = y.var(-1, keepdims=True)
        yn = (y - mean) * jax.lax.rsqrt(var + eps)
    elif norm == "IN":
        mean = y.mean(spatial_axes, keepdims=True)
        var = y.var(spatial_axes, keepdims=True)
        yn = (y - mean) * jax.lax.rsqrt(var + eps)
    else:
        raise ValueError(norm)
    return yn * p["norm_scale"] + p["norm_bias"]


def _apply_act(y, act: str):
    if act == "GLU":
        a, b = jnp.split(y, 2, axis=-1)
        return a * jax.nn.sigmoid(b)
    if act == "RELU":
        return jax.nn.relu(y)
    if act == "SIGMOID":
        return jax.nn.sigmoid(y)
    if act == "TANH":
        return jnp.tanh(y)
    return y


# --------------------------------------------------------------------------
# Conv1D block: conv -> norm -> act -> skip -> length mask
# --------------------------------------------------------------------------
def init_conv1d(key, in_c: int, out_c: int, ks: int, norm: str = "NONE",
                dtype=jnp.float32) -> Params:
    kw, _ = jax.random.split(key)
    # torch Conv1d weight [out, in, ks]: xavier fans are (in*ks, out*ks)
    w = _xavier(kw, (ks, in_c, out_c), in_c * ks, out_c * ks, dtype)
    p = {"w": w, "b": jnp.zeros((out_c,), dtype)}
    p.update(norm_params(out_c, norm, dtype))
    return p


def conv1d_block(p: Params, x, lens, ks: int, stride: int, act: str = "NONE",
                 norm: str = "NONE", skip_connect: bool = False,
                 train: bool = False, updates=None):
    """x [B, T, C] (padding zeroed), lens [B] -> (y [B, T', C'], out_lens).

    Order matches the reference (util.py:1389-1434): pad -> conv -> norm ->
    act -> strided-identity skip -> recompute lens -> zero mask.
    """
    B, T, _ = x.shape
    right = (stride - (T - ks) % stride) % stride
    if right:
        x = jnp.pad(x, ((0, 0), (0, right), (0, 0)))
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC")) + p["b"]
    y = apply_norm(p, y, norm, train, updates=updates)
    y = _apply_act(y, act)
    if skip_connect:
        ident = x[:, ks - 1::stride, :]
        y = y + ident[:, : y.shape[1], :]
    out_lens = conv_out_len(lens, ks, stride)
    y = y * length_mask(out_lens, y.shape[1], y.dtype)[..., None]
    return y, out_lens


# --------------------------------------------------------------------------
# Conv2D block over [B, T, F, C] (T = variable-length time)
# --------------------------------------------------------------------------
def init_conv2d(key, in_c: int, out_c: int, ks, norm: str = "NONE",
                dtype=jnp.float32) -> Params:
    kh, kw_ = (ks, ks) if isinstance(ks, int) else ks
    w = _xavier(key, (kh, kw_, in_c, out_c), in_c * kh * kw_,
                out_c * kh * kw_, dtype)
    p = {"w": w, "b": jnp.zeros((out_c,), dtype)}
    p.update(norm_params(out_c, norm, dtype))
    return p


def conv2d_block(p: Params, x, lens, ks, stride, act: str = "NONE",
                 norm: str = "NONE", skip_connect: bool = False,
                 train: bool = False, freq_pad: Optional[int] = None,
                 updates=None):
    """x [B, T, F, C], lens over T -> (y [B, T', F', C'], out_lens).

    ``freq_pad`` adds symmetric-ish freq padding first (the reference's
    explicit h_pad argument at encoder.py:325)."""
    kt, kf = (ks, ks) if isinstance(ks, int) else ks
    st, sf = (stride, stride) if isinstance(stride, int) else stride
    B, T, F, _ = x.shape
    if freq_pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (freq_pad, freq_pad), (0, 0)))
        F = x.shape[2]
    right = (st - (T - kt) % st) % st
    bottom = (sf - (F - kf) % sf) % sf
    if right or bottom:
        x = jnp.pad(x, ((0, 0), (0, right), (0, bottom), (0, 0)))
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(st, sf), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]
    y = apply_norm(p, y, norm, train, spatial_axes=(1, 2), updates=updates)
    y = _apply_act(y, act)
    if skip_connect:
        ident = x[:, kt - 1::st, kf - 1::sf, :]
        y = y + ident[:, : y.shape[1], : y.shape[2], :]
    out_lens = conv_out_len(lens, kt, st)
    y = y * length_mask(out_lens, y.shape[1], y.dtype)[:, :, None, None]
    return y, out_lens


def bn_stats_tree(params, updates):
    """Convert ``apply_norm`` recordings into a pytree mirroring ``params``'
    structure (so it survives jit/grad boundaries, where dict identities
    don't).  MUST be called inside the same trace that produced ``updates``
    — entries reference ``params``' sub-dicts by object identity.  Matched
    nodes carry ``{"__bn__": (batch_mean, unbiased_batch_var)}``; everything
    else is None.  Returns None when nothing was recorded."""
    if not updates:
        return None
    table = {id(p): (m, v * (n / max(n - 1, 1))) for p, m, v, n in updates}

    def rec(node):
        if isinstance(node, dict):
            out = {k: rec(v) for k, v in node.items()}
            if id(node) in table:
                out["__bn__"] = table[id(node)]
            if all(v is None for v in out.values()):
                return None
            return out
        if isinstance(node, (list, tuple)):
            seq = [rec(v) for v in node]
            if all(v is None for v in seq):
                return None
            return seq
        return None

    return rec(params)


def merge_bn_stats(new_params, stats_tree, momentum: float = 0.1):
    """Fold a ``bn_stats_tree`` into running stats: torch moving-average
    semantics ``running = (1 - momentum) * running + momentum * batch_stat``
    (running_var uses the unbiased batch variance, already applied by
    ``bn_stats_tree``)."""
    if stats_tree is None:
        return new_params

    def rec(node, st):
        if st is None:
            return node
        if isinstance(node, dict):
            out = {k: rec(v, st.get(k)) for k, v in node.items()}
            if "__bn__" in st:
                m, v = st["__bn__"]
                out["bn_mean"] = ((1 - momentum) * node["bn_mean"]
                                  + momentum * m.astype(node["bn_mean"].dtype))
                out["bn_var"] = ((1 - momentum) * node["bn_var"]
                                 + momentum * v.astype(node["bn_var"].dtype))
            return out
        if isinstance(node, (list, tuple)):
            seq = [rec(n, s) for n, s in zip(node, st)]
            return type(node)(seq) if isinstance(node, tuple) else seq
        return node

    return rec(new_params, stats_tree)


# --------------------------------------------------------------------------
# same-shape residual conv2d (reference ResCNN, encoder.py:411-478)
# --------------------------------------------------------------------------
def init_same_conv2d(key, in_c: int, out_c: int, ks: int = 3,
                     dtype=jnp.float32) -> Params:
    w = _xavier(key, (ks, ks, in_c, out_c), in_c * ks * ks, out_c * ks * ks,
                dtype)
    return {"w": w, "b": jnp.zeros((out_c,), dtype)}


def same_conv2d(p: Params, x):
    """3x3 stride-1 SAME conv, [B, T, F, C] -> [B, T, F, C']."""
    return jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]
