"""Convolutional LSTM over time (reference util.py:886-1022 ConvLSTM /
BConvLSTM).

The reference loops Python-side over the width (time) axis applying 1-D
convs along the frequency axis for the gates; here the recurrence is one
``lax.scan`` whose body does the two gate convs as MXU ops, with length
masks freezing (h, c) past each sample's true end — the same masked-scan
scheme as ops/rnn.py.

Layout: x [B, T, F, C] (channel-last), states h/c [B, F, C'].
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .masks import length_mask
from .rnn import reverse_sequence

Params = Dict[str, jnp.ndarray]


def _xavier(key, shape, fan_in, fan_out, dtype):
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def init_conv_lstm(key, in_c: int, out_c: int, ks: int,
                   dtype=jnp.float32) -> Params:
    kx, kh = jax.random.split(key)
    return {
        # freq-axis gate convs (i, f, g, o stacked on the channel dim)
        "w_x": _xavier(kx, (ks, in_c, 4 * out_c), in_c * ks, 4 * out_c * ks,
                       dtype),
        "w_h": _xavier(kh, (ks, out_c, 4 * out_c), out_c * ks, 4 * out_c * ks,
                       dtype),
        "b": jnp.zeros((4 * out_c,), dtype),
    }


def _freq_conv(x, w):
    """x [B, F, C], w [ks, C, C'] -> SAME-padded conv along F.

    SAME here means the reference's explicit (top, bottom) =
    ((ks-1)//2, ks-1-top) padding (util.py:912-914)."""
    ks = w.shape[0]
    top = (ks - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=((top, ks - 1 - top),),
        dimension_numbers=("NWC", "WIO", "NWC"))


def conv_lstm(p: Params, x, lens, state: Optional[Tuple] = None
              ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """x [B, T, F, C], lens [B] -> (y [B, T, F, C'], (hT, cT) at true ends).

    Gate order (i, f, g, o); c = i*g + f*c_prev (reference util.py:930-936,
    note its f gate multiplies the *previous cell*)."""
    B, T, F, _ = x.shape
    C2 = p["w_h"].shape[1]
    if state is None:
        h0 = jnp.zeros((B, F, C2), x.dtype)
        c0 = jnp.zeros((B, F, C2), x.dtype)
    else:
        h0, c0 = state
    mask = length_mask(lens, T, x.dtype)                  # [B, T]

    # hoist the input conv out of the scan: one big [B*T, F, C] conv
    xg = _freq_conv(x.reshape(B * T, F, -1), p["w_x"]) + p["b"]
    xg = xg.reshape(B, T, F, -1)

    def body(carry, inp):
        h, c = carry
        xg_t, m_t = inp                                    # [B, F, 4C'], [B]
        gates = xg_t + _freq_conv(h, p["w_h"])
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c2 = jax.nn.sigmoid(i) * jnp.tanh(g) + jax.nn.sigmoid(f) * c
        h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
        m = m_t[:, None, None]
        h = m * h2 + (1.0 - m) * h
        c = m * c2 + (1.0 - m) * c
        return (h, c), h2 * m

    (hT, cT), ys = jax.lax.scan(
        body, (h0, c0), (jnp.swapaxes(xg, 0, 1), jnp.swapaxes(mask, 0, 1)))
    return jnp.swapaxes(ys, 0, 1), (hT, cT)


def init_bconv_lstm(key, in_c: int, out_c: int, ks: int,
                    dtype=jnp.float32) -> Params:
    kf, kb = jax.random.split(key)
    return {"fwd": init_conv_lstm(kf, in_c, out_c, ks, dtype),
            "bwd": init_conv_lstm(kb, in_c, out_c, ks, dtype)}


def bconv_lstm(p: Params, x, lens):
    """Bidirectional variant (reference BConvLSTM util.py:977-1022).

    Returns (y [B, T, F, 2*C'], ((h_f, c_f), (h_b, c_b)))."""
    y_f, s_f = conv_lstm(p["fwd"], x, lens)
    x_r = reverse_sequence(x, lens)
    y_b, s_b = conv_lstm(p["bwd"], x_r, lens)
    y_b = reverse_sequence(y_b, lens)
    return jnp.concatenate([y_f, y_b], axis=-1), (s_f, s_b)
