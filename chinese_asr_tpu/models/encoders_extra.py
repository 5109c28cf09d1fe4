"""Secondary encoder families (reference encoder.py:85-586).

Every encoder here honors the same ``EncoderOut`` contract as the default
RNN path.  The reference multiplexes several of these behind commented-out
constructor lines (reference model.py:28-42); here each is a first-class
``encoder_type``:

  CNN1D                  stride-conv stack (encoder.py:102-144)
  CNN1D_RNN              2-layer conv front + GRU stack (encoder.py:85-99)
  CNN1D_SELF_ATTENTION   conv front + transformer blocks (encoder.py:237-251)
  CNN2D                  2-D conv stack over (time, mel) (encoder.py:147-190)
  SELF_ATTENTION         transformer blocks (encoder.py:193-234 — whose
                         forward is broken upstream: it reads a never-set
                         ``self.layers``; fixed here, not replicated)
  SELF_LOCAL_ATTENTION   ws-windowed attention blocks (encoder.py:254-287)
  CRNN                   conv head + ConvLSTM body (encoder.py:290-371)
  DCNN                   conv head + ResConvLSTM middle + NIN tail
                         (encoder.py:374-408 — upstream forward returns
                         None; fixed to return the flattened features)

2-D encoders consume the featurizer's channel-major layout re-expressed as
[B, T, mel, channels]; 1-D encoders consume [B, T, D] directly.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, EncoderConfig
from ..ops import conv as conv_ops
from ..ops import conv_lstm as cl_ops
from ..ops import rnn as rnn_ops
from ..ops import self_attention as sa_ops
from ..ops.masks import length_mask
from .encoder import EncoderOut

Params = Dict


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------
def _conv_plan(ecfg: EncoderConfig) -> List[Tuple[int, int, int]]:
    """(out_c, ks, stride) per conv layer — the reference's zip of
    [oc]*layers with the stride list truncates to the shorter
    (encoder.py:117-121)."""
    strides = ecfg.stride if isinstance(ecfg.stride, (tuple, list)) \
        else (ecfg.stride,) * ecfg.num_layers
    n = min(ecfg.num_layers, len(strides))
    return [(ecfg.hidden_size, ecfg.ks, int(strides[i])) for i in range(n)]


def _feat_channels(cfg: Config) -> int:
    a = cfg.audio
    return (3 if a.delta_delta else 1) * (3 if a.downsample else 1)


def _to_2d(cfg: Config, x):
    """[B, T, D] -> [B, T, mel, C] (featurizer layout is channel-major,
    audio/features.stack3)."""
    B, T, D = x.shape
    C = _feat_channels(cfg)
    M = D // C
    return x.reshape(B, T, C, M).transpose(0, 1, 3, 2)


def _flatten_2d(x):
    """[B, T, F, C] -> [B, T, C*F], channel-major.

    Matches the reference's ``x.view(b, c*h, w)`` flatten (encoder.py:188,
    332): feature index = c*F + f, so attention/projection weights convert
    1:1 between the frameworks for the 2-D encoder families."""
    B, T, F, C = x.shape
    return x.transpose(0, 1, 3, 2).reshape(B, T, C * F)


# --------------------------------------------------------------------------
# CNN1D (encoder.py:102-144)
# --------------------------------------------------------------------------
def init_cnn1d(key, cfg: Config, input_size: int, plan=None, norm=None,
               act=None, skip=None, dtype=jnp.float32) -> Params:
    ecfg = cfg.encoder
    plan = plan or _conv_plan(ecfg)
    norm = norm if norm is not None else ecfg.norm
    act = act if act is not None else ecfg.act
    keys = jax.random.split(key, len(plan))
    layers = []
    in_c = input_size
    for i, (oc, ks, st) in enumerate(plan):
        layers.append(conv_ops.init_conv1d(keys[i], in_c, oc, ks, norm, dtype))
        in_c = oc // 2 if act == "GLU" else oc
    return {"convs": layers}


def apply_cnn1d(p: Params, cfg: Config, x, lens, plan=None, norm=None,
                act=None, skip=None, train=False, updates=None):
    ecfg = cfg.encoder
    plan = plan or _conv_plan(ecfg)
    norm = norm if norm is not None else ecfg.norm
    act = act if act is not None else ecfg.act
    skip = skip if skip is not None else ecfg.residual
    for i, (oc, ks, st) in enumerate(plan):
        x, lens = conv_ops.conv1d_block(
            p["convs"][i], x, lens, ks, st, act, norm,
            skip_connect=(skip and i > 0), train=train, updates=updates)
    return x, lens


def cnn1d_out_size(ecfg: EncoderConfig) -> int:
    oc = _conv_plan(ecfg)[-1][0]
    return oc // 2 if ecfg.act == "GLU" else oc


# front used by CNN1D_RNN / CNN1D_SELF_ATTENTION (encoder.py:89, 243:
# oc=256, ks=3, stride=2, BN, RELU, no skip, 2 layers)
_FRONT_PLAN = [(256, 3, 2), (256, 3, 2)]


# --------------------------------------------------------------------------
# CNN2D (encoder.py:147-190)
# --------------------------------------------------------------------------
def init_cnn2d(key, cfg: Config, dtype=jnp.float32) -> Params:
    ecfg = cfg.encoder
    plan = _conv_plan(ecfg)
    keys = jax.random.split(key, len(plan))
    layers = []
    in_c = _feat_channels(cfg)
    for i, (oc, ks, st) in enumerate(plan):
        layers.append(conv_ops.init_conv2d(keys[i], in_c, oc, ks, ecfg.norm,
                                           dtype))
        in_c = oc // 2 if ecfg.act == "GLU" else oc
    return {"convs": layers}


def apply_cnn2d(p: Params, cfg: Config, x, lens, train=False, updates=None):
    ecfg = cfg.encoder
    x = _to_2d(cfg, x)
    for i, (oc, ks, st) in enumerate(_conv_plan(ecfg)):
        x, lens = conv_ops.conv2d_block(
            p["convs"][i], x, lens, ks, st, ecfg.act, ecfg.norm,
            skip_connect=(ecfg.residual and i > 0), train=train,
            updates=updates)
    return _flatten_2d(x), lens


def cnn2d_out_size(cfg: Config) -> int:
    ecfg = cfg.encoder
    oc = cnn1d_out_size(ecfg)
    f = cfg.audio.n_mels
    for (_, ks, st) in _conv_plan(ecfg):
        # freq axis is auto-padded like time (ops/conv.conv2d_block)
        pad = (st - (f - ks) % st) % st
        f = (f + pad - ks) // st + 1
    return oc * f


# --------------------------------------------------------------------------
# SELF_ATTENTION / SELF_LOCAL_ATTENTION (encoder.py:193-234, 254-287)
# --------------------------------------------------------------------------
def init_sa(key, cfg: Config, input_size: int, hidden: int = None,
            layers: int = None, proj: bool = None, ffn: int = None,
            dtype=jnp.float32) -> Params:
    ecfg = cfg.encoder
    hidden = hidden or ecfg.hidden_size
    layers = layers or ecfg.num_layers
    proj = ecfg.mha_proj if proj is None else proj
    ffn = ffn or ecfg.ffn_size
    keys = jax.random.split(key, layers)
    return {"blocks": [
        sa_ops.init_block(keys[i], input_size if i == 0 else hidden,
                          hidden, proj, ffn, dtype)
        for i in range(layers)]}


def apply_sa(p: Params, cfg: Config, x, lens, heads: int = None,
             ws=None, pos: bool = False):
    heads = heads or cfg.encoder.self_attn_heads
    if pos:
        x = x + sa_ops.sin_pos_embedding(x.shape[1], x.shape[2], x.dtype)
    for blk in p["blocks"]:
        x = sa_ops.attention_block(blk, x, lens, heads, ws)
    # uniform EncoderOut contract: padding rows exactly zero (pos embedding
    # and LN biases would otherwise leak into them)
    x = x * length_mask(lens, x.shape[1], x.dtype)[..., None]
    return x, lens


# --------------------------------------------------------------------------
# CNN1D_RNN (encoder.py:85-99): conv front + GRU stack
# --------------------------------------------------------------------------
def init_cnn1d_rnn(key, cfg: Config, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    ecfg = cfg.encoder
    return {
        "front": init_cnn1d(k1, cfg, cfg.audio.feat_dim, plan=_FRONT_PLAN,
                            norm="BN", act="RELU", dtype=dtype),
        "rnn": rnn_ops.init_rnn_stack(k2, "GRU", 256, ecfg.hidden_size,
                                      ecfg.num_layers, ecfg.bidirectional,
                                      dtype),
    }


def apply_cnn1d_rnn(p: Params, cfg: Config, x, lens, train=False,
                    updates=None):
    ecfg = cfg.encoder
    x, lens = apply_cnn1d(p["front"], cfg, x, lens, plan=_FRONT_PLAN,
                          norm="BN", act="RELU", skip=False, train=train,
                          updates=updates)
    mask = length_mask(lens, x.shape[1], x.dtype)
    y, states, lens, _ = rnn_ops.rnn_stack("GRU", p["rnn"], x, lens, mask,
                                           residual=ecfg.residual)
    if ecfg.bidirectional:
        state = jnp.concatenate([states[0], states[1]], axis=-1)
    else:
        state = states[0]
    return y, lens, state


# --------------------------------------------------------------------------
# CNN1D_SELF_ATTENTION (encoder.py:237-251)
# --------------------------------------------------------------------------
def init_cnn1d_sa(key, cfg: Config, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "front": init_cnn1d(k1, cfg, cfg.audio.feat_dim, plan=_FRONT_PLAN,
                            norm="BN", act="RELU", dtype=dtype),
        "sa": init_sa(k2, cfg, 256, hidden=256, layers=4, proj=True,
                      ffn=512, dtype=dtype),
    }


def apply_cnn1d_sa(p: Params, cfg: Config, x, lens, train=False,
                   updates=None):
    x, lens = apply_cnn1d(p["front"], cfg, x, lens, plan=_FRONT_PLAN,
                          norm="BN", act="RELU", skip=False, train=train,
                          updates=updates)
    return apply_sa(p["sa"], cfg, x, lens, heads=4, pos=True)


# --------------------------------------------------------------------------
# CRNN (encoder.py:290-371): 2 conv2d heads (time stride 2) + 3x ConvLSTM
# --------------------------------------------------------------------------
def init_crnn(key, cfg: Config, dtype=jnp.float32) -> Params:
    oc = cfg.encoder.conv_channels
    keys = jax.random.split(key, 5)
    return {
        "heads": [conv_ops.init_conv2d(keys[0], _feat_channels(cfg), oc, 3,
                                       "BN", dtype),
                  conv_ops.init_conv2d(keys[1], oc, oc, 3, "BN", dtype)],
        "conv_lstm": [cl_ops.init_conv_lstm(keys[2 + i], oc, oc, 3, dtype)
                      for i in range(3)],
    }


def apply_crnn(p: Params, cfg: Config, x, lens, train=False, updates=None):
    x = _to_2d(cfg, x)
    for hp in p["heads"]:
        # time stride 2, freq stride 1, freq pad 1 (encoder.py:300-301, 325)
        x, lens = conv_ops.conv2d_block(hp, x, lens, 3, (2, 1), "NONE", "BN",
                                        train=train, freq_pad=1,
                                        updates=updates)
    for cp in p["conv_lstm"]:
        x, _ = cl_ops.conv_lstm(cp, x, lens)
    return _flatten_2d(x), lens


def crnn_out_size(cfg: Config) -> int:
    f = cfg.audio.n_mels
    for _ in range(2):
        f = f + 2                       # freq_pad 1 each side
        pad = (1 - (f - 3) % 1) % 1
        f = (f + pad - 3) // 1 + 1
    return cfg.encoder.conv_channels * f


# --------------------------------------------------------------------------
# blocks: ResCNN / ResConvLSTM / NIN (encoder.py:411-586) + DCNN
# --------------------------------------------------------------------------
def init_res_cnn(key, in_c: int, out_c: int, dtype=jnp.float32) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": conv_ops.init_same_conv2d(k1, in_c, out_c, 3, dtype),
        "conv2": conv_ops.init_same_conv2d(k2, out_c, out_c, 3, dtype),
    }
    for i in (1, 2):
        p[f"bn{i}"] = conv_ops.norm_params(out_c, "BN", dtype)
    if in_c != out_c:
        p["down"] = conv_ops.init_same_conv2d(k3, in_c, out_c, 1, dtype)
    return p


def res_cnn(p: Params, x, lens, train=False, updates=None):
    """conv -> BN -> relu -> conv -> BN -> +skip -> relu, width-masked
    (reference ResCNN, encoder.py:411-478)."""
    m = length_mask(lens, x.shape[1], x.dtype)[:, :, None, None]
    y = conv_ops.same_conv2d(p["conv1"], x) * m
    y = conv_ops.apply_norm(p["bn1"], y, "BN", train, spatial_axes=(1, 2),
                            updates=updates)
    y = jax.nn.relu(y) * m
    y = conv_ops.same_conv2d(p["conv2"], y) * m
    y = conv_ops.apply_norm(p["bn2"], y, "BN", train, spatial_axes=(1, 2),
                            updates=updates)
    if "down" in p:
        x = conv_ops.same_conv2d(p["down"], x)
    return jax.nn.relu(x + y) * m, lens


def init_res_conv_lstm(key, in_c: int, out_c: int, ks: int = 3,
                       dtype=jnp.float32) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "cl1": cl_ops.init_bconv_lstm(k1, in_c, out_c, ks, dtype),
        "cl2": cl_ops.init_bconv_lstm(k2, 2 * out_c, out_c, ks, dtype),
        "bn1": conv_ops.norm_params(2 * out_c, "BN", dtype),
        "bn2": conv_ops.norm_params(2 * out_c, "BN", dtype),
    }
    if in_c != 2 * out_c:
        p["down"] = conv_ops.init_same_conv2d(k3, in_c, 2 * out_c, 1, dtype)
    return p


def res_conv_lstm(p: Params, x, lens, train=False, updates=None):
    """BConvLSTM -> BN -> relu -> BConvLSTM -> BN -> +skip -> relu
    (reference ResConvLSTM, encoder.py:481-541; its BConvLSTM output
    [b, 2, c', h, w] is our channel-concat [B, T, F, 2c'])."""
    m = length_mask(lens, x.shape[1], x.dtype)[:, :, None, None]
    y, _ = cl_ops.bconv_lstm(p["cl1"], x, lens)
    y = conv_ops.apply_norm(p["bn1"], y, "BN", train, spatial_axes=(1, 2),
                            updates=updates)
    y = jax.nn.relu(y) * m
    y, _ = cl_ops.bconv_lstm(p["cl2"], y, lens)
    y = conv_ops.apply_norm(p["bn2"], y, "BN", train, spatial_axes=(1, 2),
                            updates=updates)
    if "down" in p:
        x = conv_ops.same_conv2d(p["down"], x)
    return jax.nn.relu(x + y) * m, lens


def init_nin(key, in_c: int, out_c: int, ks: int = 3,
             dtype=jnp.float32) -> Params:
    """NIN tail (encoder.py:544-586 — upstream has a typo'd forward and a
    self.conv1 assigned twice; fixed here: two distinct 1x1 convs)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "cl1": cl_ops.init_bconv_lstm(k1, in_c, out_c, ks, dtype),
        "conv1": conv_ops.init_conv2d(k2, 2 * out_c, out_c, 1, "BN", dtype),
        "cl2": cl_ops.init_bconv_lstm(k3, out_c, out_c, ks, dtype),
        "conv2": conv_ops.init_conv2d(k4, 2 * out_c, out_c, 1, "BN", dtype),
        "cl3": cl_ops.init_bconv_lstm(k5, out_c, out_c, ks, dtype),
    }


def nin(p: Params, x, lens, train=False, updates=None):
    """L -> C(1x1) -> BN -> relu -> L -> C(1x1) -> BN -> relu -> L."""
    x, _ = cl_ops.bconv_lstm(p["cl1"], x, lens)
    x, lens = conv_ops.conv2d_block(p["conv1"], x, lens, 1, 1, "RELU", "BN",
                                    train=train, updates=updates)
    x, _ = cl_ops.bconv_lstm(p["cl2"], x, lens)
    x, lens = conv_ops.conv2d_block(p["conv2"], x, lens, 1, 1, "RELU", "BN",
                                    train=train, updates=updates)
    x, _ = cl_ops.bconv_lstm(p["cl3"], x, lens)
    return x, lens


def init_dcnn(key, cfg: Config, dtype=jnp.float32) -> Params:
    oc = cfg.encoder.conv_channels
    keys = jax.random.split(key, 3 + cfg.encoder.dcnn_middle)
    return {
        "heads": [conv_ops.init_conv2d(keys[0], _feat_channels(cfg), oc, 3,
                                       "BN", dtype),
                  conv_ops.init_conv2d(keys[1], oc, oc, 3, "BN", dtype)],
        "middle": [init_res_conv_lstm(keys[2 + i],
                                      oc if i == 0 else 2 * oc, oc, 3, dtype)
                   for i in range(cfg.encoder.dcnn_middle)],
        "nin": init_nin(keys[-1], 2 * oc, oc, 3, dtype),
    }


def apply_dcnn(p: Params, cfg: Config, x, lens, train=False, updates=None):
    """Very-deep CNN encoder (encoder.py:374-408; the upstream forward
    returns None — fixed to flatten + return)."""
    x = _to_2d(cfg, x)
    for hp in p["heads"]:
        x, lens = conv_ops.conv2d_block(hp, x, lens, 3, (2, 1), "NONE", "BN",
                                        train=train, freq_pad=1,
                                        updates=updates)
    for mp in p["middle"]:
        x, lens = res_conv_lstm(mp, x, lens, train, updates)
    x, lens = nin(p["nin"], x, lens, train, updates)
    return _flatten_2d(x), lens


def dcnn_out_size(cfg: Config) -> int:
    # heads: freq_pad 1 each side + ks3/stride1 conv => freq dim preserved
    return 2 * cfg.encoder.conv_channels * cfg.audio.n_mels


# --------------------------------------------------------------------------
# registry (dispatched from models/encoder.py)
# --------------------------------------------------------------------------
def init_encoder(key, cfg: Config, dtype=jnp.float32) -> Params:
    et = cfg.encoder.encoder_type
    D = cfg.audio.feat_dim
    if et == "CNN1D":
        return init_cnn1d(key, cfg, D, dtype=dtype)
    if et == "CNN2D":
        return init_cnn2d(key, cfg, dtype)
    if et == "CNN1D_RNN":
        return init_cnn1d_rnn(key, cfg, dtype)
    if et == "CNN1D_SELF_ATTENTION":
        return init_cnn1d_sa(key, cfg, dtype)
    if et == "SELF_ATTENTION":
        return init_sa(key, cfg, D, dtype=dtype)
    if et == "SELF_LOCAL_ATTENTION":
        return init_sa(key, cfg, D, dtype=dtype)
    if et == "CRNN":
        return init_crnn(key, cfg, dtype)
    if et == "DCNN":
        return init_dcnn(key, cfg, dtype)
    raise ValueError(f"unknown encoder_type {et}")


def apply_encoder(p: Params, cfg: Config, x, lens, train=False,
                  updates=None) -> EncoderOut:
    et = cfg.encoder.encoder_type
    if et == "CNN1D":
        y, lens = apply_cnn1d(p, cfg, x, lens, train=train, updates=updates)
        return EncoderOut(y, lens, None)
    if et == "CNN2D":
        y, lens = apply_cnn2d(p, cfg, x, lens, train, updates)
        return EncoderOut(y, lens, None)
    if et == "CNN1D_RNN":
        y, lens, state = apply_cnn1d_rnn(p, cfg, x, lens, train, updates)
        return EncoderOut(y, lens, state)
    if et == "CNN1D_SELF_ATTENTION":
        y, lens = apply_cnn1d_sa(p, cfg, x, lens, train, updates)
        return EncoderOut(y, lens, None)
    if et == "SELF_ATTENTION":
        y, lens = apply_sa(p, cfg, x, lens)
        return EncoderOut(y, lens, None)
    if et == "SELF_LOCAL_ATTENTION":
        y, lens = apply_sa(p, cfg, x, lens, ws=cfg.encoder.ws)
        return EncoderOut(y, lens, None)
    if et == "CRNN":
        y, lens = apply_crnn(p, cfg, x, lens, train, updates)
        return EncoderOut(y, lens, None)
    if et == "DCNN":
        y, lens = apply_dcnn(p, cfg, x, lens, train, updates)
        return EncoderOut(y, lens, None)
    raise ValueError(f"unknown encoder_type {et}")


# --------------------------------------------------------------------------
# torch state-dict conversion: reference encoder classes -> our pytrees
# (reference save format model.py:347-355; tensor names per each class'
# submodule tree).  ``las.params_from_torch_state`` dispatches here for
# every non-RNN ``encoder_type`` so reference checkpoints of the secondary
# families import directly.
# --------------------------------------------------------------------------
def _j(sd, key, dtype):
    return jnp.asarray(np.asarray(sd[key]), dtype)


def _norm_from_sd(p: Params, sd, pre: str, dtype) -> None:
    if pre + "norm.weight" in sd:
        p["norm_scale"] = _j(sd, pre + "norm.weight", dtype)
        p["norm_bias"] = _j(sd, pre + "norm.bias", dtype)
    if pre + "norm.running_mean" in sd:
        p["bn_mean"] = _j(sd, pre + "norm.running_mean", dtype)
        p["bn_var"] = _j(sd, pre + "norm.running_var", dtype)


def _conv1d_from_sd(sd, pre: str, dtype) -> Params:
    """Reference ``Conv1D`` (util.py:1327-1427): nn.Conv1d [out, in, ks]
    -> our [ks, in, out]."""
    w = np.asarray(sd[pre + "conv.weight"])
    p = {"w": jnp.asarray(w.transpose(2, 1, 0), dtype),
         "b": (_j(sd, pre + "conv.bias", dtype)
               if pre + "conv.bias" in sd else jnp.zeros((w.shape[0],), dtype))}
    _norm_from_sd(p, sd, pre, dtype)
    return p


def _conv2d_from_sd(sd, pre: str, dtype) -> Params:
    """Reference ``Conv2D`` (util.py:1467-1573): nn.Conv2d
    [out, in, kf, kt] (its h = freq, w = time) -> our [kt, kf, in, out];
    the conv bias only exists when norm == 'NONE' (util.py:1477-1480)."""
    w = np.asarray(sd[pre + "conv.weight"])
    p = {"w": jnp.asarray(w.transpose(3, 2, 1, 0), dtype),
         "b": (_j(sd, pre + "conv.bias", dtype)
               if pre + "conv.bias" in sd else jnp.zeros((w.shape[0],), dtype))}
    _norm_from_sd(p, sd, pre, dtype)
    return p


def _rnn_stack_from_sd(sd, pre: str, num_layers: int, bidirectional: bool,
                       dtype) -> List[Params]:
    """Reference ``RNN_RES`` ModuleList of 1-layer nn.LSTM/GRU
    (util.py:1155-1161): weight_ih_l0 [4H/3H, in] -> our [in, 4H/3H]."""
    layers = []
    for i in range(num_layers):
        base = f"{pre}{i}."

        def direction(sfx):
            return {
                "w_ih": jnp.asarray(
                    np.asarray(sd[base + "weight_ih_l0" + sfx]).T, dtype),
                "w_hh": jnp.asarray(
                    np.asarray(sd[base + "weight_hh_l0" + sfx]).T, dtype),
                "b_ih": _j(sd, base + "bias_ih_l0" + sfx, dtype),
                "b_hh": _j(sd, base + "bias_hh_l0" + sfx, dtype),
            }

        layer = {"fwd": direction("")}
        if bidirectional:
            layer["bwd"] = direction("_reverse")
        layers.append(layer)
    return layers


def _sa_blocks_from_sd(sd, pre: str, layers: int, dtype) -> Params:
    """Reference ``SelfAttentionBlock`` / ``SelfLocalAttentionBlock``
    (util.py:1777-1864) — the attention submodule is named ``mha`` in the
    full-attention block and ``sla`` in the windowed one."""
    blocks = []
    for i in range(layers):
        b = f"{pre}{i}."
        attn = b + ("mha." if b + "mha.weight" in sd else "sla.")
        ffn_bias = np.asarray(sd[b + "ffn.bias"])
        F_ = np.asarray(sd[b + "ffn.weight_1"]).shape[0]
        blk = {
            "attn": {
                "w_qkv": jnp.asarray(np.asarray(sd[attn + "weight"]).T, dtype),
                "b_qkv": _j(sd, attn + "bias", dtype),
            },
            "ffn": {
                "w1": jnp.asarray(np.asarray(sd[b + "ffn.weight_1"]).T, dtype),
                "b1": jnp.asarray(ffn_bias[:F_], dtype),
                "w2": jnp.asarray(np.asarray(sd[b + "ffn.weight_2"]).T, dtype),
                "b2": jnp.asarray(ffn_bias[F_:], dtype),
            },
            "ln1_scale": _j(sd, b + "ln_1.weight", dtype),
            "ln1_bias": _j(sd, b + "ln_1.bias", dtype),
            "ln2_scale": _j(sd, b + "ln_2.weight", dtype),
            "ln2_bias": _j(sd, b + "ln_2.bias", dtype),
        }
        if attn + "proj_weight" in sd:
            blk["attn"]["w_proj"] = jnp.asarray(
                np.asarray(sd[attn + "proj_weight"]).T, dtype)
        blocks.append(blk)
    return {"blocks": blocks}


def _conv_lstm_from_sd(sd, pre: str, dtype) -> Params:
    """Reference ``ConvLSTM`` (util.py:886-983): two biased gate convs
    whose sum is our single fused bias; gate order (i, f, g, o) matches."""
    wx = np.asarray(sd[pre + "conv_x.weight"])
    wh = np.asarray(sd[pre + "conv_h.weight"])
    return {
        "w_x": jnp.asarray(wx.transpose(2, 1, 0), dtype),
        "w_h": jnp.asarray(wh.transpose(2, 1, 0), dtype),
        "b": jnp.asarray(np.asarray(sd[pre + "conv_x.bias"])
                         + np.asarray(sd[pre + "conv_h.bias"]), dtype),
    }


def _bconv_lstm_from_sd(sd, pre: str, dtype) -> Params:
    """Reference ``BConvLSTM`` (util.py:986-1022): fw/bw ConvLSTM pair."""
    return {"fwd": _conv_lstm_from_sd(sd, pre + "fw.", dtype),
            "bwd": _conv_lstm_from_sd(sd, pre + "bw.", dtype)}


def encoder_from_torch_state(enc_sd: Dict[str, "np.ndarray"], cfg: Config,
                             dtype=jnp.float32) -> Params:
    """Build the encoder params pytree from a reference encoder state dict
    for the secondary families (the RNN family lives in
    ``las.params_from_torch_state``)."""
    et = cfg.encoder.encoder_type
    ecfg = cfg.encoder
    if et == "CNN1D":
        n = len(_conv_plan(ecfg))
        return {"convs": [_conv1d_from_sd(enc_sd, f"convs.{i}.", dtype)
                          for i in range(n)]}
    if et == "CNN2D":
        n = len(_conv_plan(ecfg))
        return {"convs": [_conv2d_from_sd(enc_sd, f"convs.{i}.", dtype)
                          for i in range(n)]}
    if et == "CNN1D_RNN":
        return {
            "front": {"convs": [
                _conv1d_from_sd(enc_sd, f"cnn1d.convs.{i}.", dtype)
                for i in range(len(_FRONT_PLAN))]},
            # CNN1DRNNEncoder.rnn is a full RNNEncoder wrapping RNN_RES
            # (encoder.py:91), hence the triple-nested prefix
            "rnn": _rnn_stack_from_sd(enc_sd, "rnn.rnn.rnn.", ecfg.num_layers,
                                      ecfg.bidirectional, dtype),
        }
    if et == "CNN1D_SELF_ATTENTION":
        return {
            "front": {"convs": [
                _conv1d_from_sd(enc_sd, f"cnn1d.convs.{i}.", dtype)
                for i in range(len(_FRONT_PLAN))]},
            # fixed geometry per encoder.py:239-243 (hidden 256, 4 layers)
            "sa": _sa_blocks_from_sd(enc_sd, "sa.blocks.", 4, dtype),
        }
    if et in ("SELF_ATTENTION", "SELF_LOCAL_ATTENTION"):
        return _sa_blocks_from_sd(enc_sd, "blocks.", ecfg.num_layers, dtype)
    if et == "CRNN":
        # the reference CRNNEncoder also carries an RNN_RES that its
        # forward never uses (encoder.py:305-307 vs 321-333) — skipped
        return {
            "heads": [_conv2d_from_sd(enc_sd, f"heads.{i}.", dtype)
                      for i in range(2)],
            "conv_lstm": [_conv_lstm_from_sd(enc_sd, f"conv_lstm.{i}.", dtype)
                          for i in range(3)],
        }
    raise ValueError(f"no torch converter for encoder_type {et}")


def encoder_output_size(cfg: Config) -> int:
    et = cfg.encoder.encoder_type
    if et == "CNN1D":
        return cnn1d_out_size(cfg.encoder)
    if et == "CNN2D":
        return cnn2d_out_size(cfg)
    if et == "CNN1D_RNN":
        return cfg.encoder.hidden_size * cfg.encoder.num_directions
    if et == "CNN1D_SELF_ATTENTION":
        return 256
    if et in ("SELF_ATTENTION", "SELF_LOCAL_ATTENTION"):
        return cfg.encoder.hidden_size
    if et == "CRNN":
        return crnn_out_size(cfg)
    if et == "DCNN":
        return dcnn_out_size(cfg)
    raise ValueError(f"unknown encoder_type {et}")
