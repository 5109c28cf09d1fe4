"""Encoder family (reference encoder.py).

Round-1 default path: 4-layer residual bidirectional LSTM (reference
``RNNEncoder``, encoder.py:9-83) built from the masked-scan stack in
``ops/rnn.py`` — PackedSequence's sort/pack/unsort dance (encoder.py:47-66)
is unnecessary under jit and disappears entirely.

The conv / self-attention encoder families are registered here as they are
built; all share the ``EncoderOut`` contract.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax.numpy as jnp

from ..config import Config, EncoderConfig
from ..ops import rnn as rnn_ops
from ..ops.masks import length_mask

Params = Dict


class EncoderOut(NamedTuple):
    out: jnp.ndarray                # [B, L, enc_size]
    out_lens: jnp.ndarray           # [B]
    state: Optional[Tuple]          # (h, c) each [B, enc_size] for LSTM; h for GRU


# --------------------------------------------------------------------------
# RNN encoder (default; reference encoder.py:9-83)
# --------------------------------------------------------------------------
def init_rnn_encoder(key, ecfg: EncoderConfig, input_size: int,
                     dtype=jnp.float32) -> Params:
    return {"layers": rnn_ops.init_rnn_stack(
        key, ecfg.encoder_type, input_size, ecfg.hidden_size,
        ecfg.num_layers, ecfg.bidirectional, dtype)}


def rnn_encoder(p: Params, ecfg: EncoderConfig, x, lens) -> EncoderOut:
    """x [B, T, D] zero-padded, lens [B] -> EncoderOut.

    Final state: last layer only, directions concatenated to [B, dirs*d]
    (reference encoder.py:67-77).  Like the reference, the returned lens are
    the input lens (encoder.py:81).
    """
    mask = length_mask(lens, x.shape[1], x.dtype)
    y, states, out_lens, _ = rnn_ops.rnn_stack(
        ecfg.encoder_type, p["layers"], x, lens, mask,
        residual=ecfg.residual, skip_step=ecfg.skip_step)
    mode_lstm = ecfg.encoder_type == "LSTM"
    if ecfg.bidirectional:
        if mode_lstm:
            (h_f, c_f), (h_b, c_b) = states
            state = (jnp.concatenate([h_f, h_b], axis=-1),
                     jnp.concatenate([c_f, c_b], axis=-1))
        else:
            state = jnp.concatenate([states[0], states[1]], axis=-1)
    else:
        state = states[0]
    return EncoderOut(y, out_lens, state)


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------
def init_encoder(key, cfg: Config, dtype=jnp.float32) -> Params:
    et = cfg.encoder.encoder_type
    input_size = cfg.audio.feat_dim
    if et in ("LSTM", "GRU", "RNN_TANH", "RNN_RELU"):
        return init_rnn_encoder(key, cfg.encoder, input_size, dtype)
    from . import encoders_extra
    return encoders_extra.init_encoder(key, cfg, dtype)


def apply_encoder(p: Params, cfg: Config, x, lens, train: bool = False,
                  bn_updates=None) -> EncoderOut:
    """``train``/``bn_updates`` only matter for the BatchNorm-based conv
    families: train=True normalizes with batch statistics and records
    running-stat updates into the ``bn_updates`` list (see
    ops/conv.apply_norm); the RNN families have no normalization."""
    et = cfg.encoder.encoder_type
    if et in ("LSTM", "GRU", "RNN_TANH", "RNN_RELU"):
        return rnn_encoder(p, cfg.encoder, x, lens)
    from . import encoders_extra
    return encoders_extra.apply_encoder(p, cfg, x, lens, train=train,
                                        updates=bn_updates)


def encoder_output_size(cfg: Config) -> int:
    et = cfg.encoder.encoder_type
    if et in ("LSTM", "GRU", "RNN_TANH", "RNN_RELU"):
        return cfg.encoder.enc_size
    from . import encoders_extra
    return encoders_extra.encoder_output_size(cfg)
