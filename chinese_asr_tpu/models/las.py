"""LAS model assembly: parameters, encode prologue, torch-ckpt conversion.

Mirrors the orchestration of the reference ``Model`` class (reference
model.py:18-82) minus the device bookkeeping — params are one pytree, and
the decode loops live in ``decode/``.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops.masks import softmax_mask
from . import attention as attn_ops
from . import decoder as dec_ops
from . import encoder as enc_ops

Params = Dict


def init_params(key, cfg: Config, dtype=jnp.float32) -> Params:
    k_enc, k_attn, k_dec = jax.random.split(key, 3)
    enc_size = enc_ops.encoder_output_size(cfg)
    return {
        "encoder": enc_ops.init_encoder(k_enc, cfg, dtype),
        "attention": attn_ops.init_attention(k_attn, cfg.attention, enc_size,
                                             cfg.decoder.hidden_size, dtype),
        "decoder": dec_ops.init_decoder(k_dec, cfg.decoder, cfg.attention,
                                        cfg.vocab, enc_size, dtype),
    }


class EncodedBatch(NamedTuple):
    enc_out: jnp.ndarray     # [B, L, enc]
    mask: jnp.ndarray        # [B, L] additive softmax mask
    keys: jnp.ndarray        # [B, L, a]
    values: jnp.ndarray      # [B, L, ctx]
    init_cell_state: Optional[list]


def encode(params: Params, cfg: Config, feats, feat_lens,
           train: bool = False, bn_updates=None) -> EncodedBatch:
    """Shared decode prologue (reference model.py:523-534): encoder forward,
    softmax mask, decoder initial state, attention key/value precompute.

    ``train=True`` switches BatchNorm encoders to batch statistics and
    (with a ``bn_updates`` list) records running-stat updates for the
    train step to fold back into the params (torch BN semantics)."""
    enc = enc_ops.apply_encoder(params["encoder"], cfg, feats, feat_lens,
                                train=train, bn_updates=bn_updates)
    mask = softmax_mask(enc.out_lens, enc.out.shape[1], enc.out.dtype)
    cell_state = dec_ops.get_initial_state(params["decoder"], cfg.decoder,
                                           feats.shape[0], enc.state)
    keys, values = attn_ops.compute_key_value(params["attention"], cfg.attention,
                                              enc.out)
    return EncodedBatch(enc.out, mask, keys, values, cell_state)


def count_params(params: Params) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)))


# --------------------------------------------------------------------------
# torch checkpoint conversion (reference save format model.py:347-355:
# {'encoder_state_dict', 'decoder_state_dict', 'optimizer_state_dict', 'args'};
# tensor names per test.py:16-21)
# --------------------------------------------------------------------------
def params_from_torch_state(enc_sd: Dict[str, np.ndarray],
                            dec_sd: Dict[str, np.ndarray],
                            cfg: Config, dtype=jnp.float32) -> Params:
    """Build the params pytree from reference state_dict arrays (numpy).

    Expected names (default LSTM config):
      encoder: rnn.rnn.{i}.weight_ih_l0[(_reverse)], weight_hh_l0, bias_ih_l0,
               bias_hh_l0
      decoder: embedding.weight, cell.cell.{i}.weight_ih/hh, bias_ih/hh,
               proj_linear.weight/bias,
               attn_mechanism.W_enc/b_attn/W_hidden/v[/map_enc.weight/linear_map]
    """
    ecfg, dcfg, acfg = cfg.encoder, cfg.decoder, cfg.attention

    def J(a):
        return jnp.asarray(np.asarray(a), dtype)

    if ecfg.encoder_type in ("LSTM", "GRU", "RNN_TANH", "RNN_RELU"):
        layers = []
        for i in range(ecfg.num_layers):
            base = f"rnn.rnn.{i}."
            layer = {"fwd": {
                "w_ih": J(enc_sd[base + "weight_ih_l0"]).T,
                "w_hh": J(enc_sd[base + "weight_hh_l0"]).T,
                "b_ih": J(enc_sd[base + "bias_ih_l0"]),
                "b_hh": J(enc_sd[base + "bias_hh_l0"]),
            }}
            if ecfg.bidirectional:
                layer["bwd"] = {
                    "w_ih": J(enc_sd[base + "weight_ih_l0_reverse"]).T,
                    "w_hh": J(enc_sd[base + "weight_hh_l0_reverse"]).T,
                    "b_ih": J(enc_sd[base + "bias_ih_l0_reverse"]),
                    "b_hh": J(enc_sd[base + "bias_hh_l0_reverse"]),
                }
            layers.append(layer)
        encoder = {"layers": layers}
    else:
        # secondary families (CNN1D/CNN2D/CNN1D_RNN/self-attention/CRNN)
        from . import encoders_extra
        encoder = encoders_extra.encoder_from_torch_state(enc_sd, cfg, dtype)

    # attention params live inside the decoder state dict (the reference's
    # decoder holds attn_mechanism; BauAttn tensors use math orientation)
    def dget(*names):
        for n in names:
            if n in dec_sd:
                return dec_sd[n]
        raise KeyError(names)

    attention = {
        "w_enc": J(dget("attn_mechanism.W_enc")),
        "b_attn": J(dget("attn_mechanism.b_attn")),
        "w_hidden": J(dget("attn_mechanism.W_hidden")),
        "v": J(dget("attn_mechanism.v")),
    }
    if "attn_mechanism.map_enc.weight" in dec_sd:
        attention["map_enc"] = J(dec_sd["attn_mechanism.map_enc.weight"]).T
    if "attn_mechanism.linear_map" in dec_sd:
        attention["linear_map"] = J(dec_sd["attn_mechanism.linear_map"])

    cells = []
    for i in range(dcfg.num_layers):
        base = f"cell.cell.{i}."
        cells.append({
            "w_ih": J(dec_sd[base + "weight_ih"]).T,
            "w_hh": J(dec_sd[base + "weight_hh"]).T,
            "b_ih": J(dec_sd[base + "bias_ih"]),
            "b_hh": J(dec_sd[base + "bias_hh"]),
        })
    decoder = {
        "embedding": J(dec_sd["embedding.weight"]),
        "cells": cells,
        "proj_w": J(dec_sd["proj_linear.weight"]).T,
        "proj_b": J(dec_sd["proj_linear.bias"]),
    }
    if "attn_hidden_weight" in dec_sd:
        decoder["attn_hidden_w"] = J(dec_sd["attn_hidden_weight"])
    # learned decoder init: the reference names its ParameterList
    # "dec_init_cell_state.{i}" (decoder.py:36-40); "init_state.{i}" is
    # accepted for pre-round-3 exports from this framework
    for name in ("dec_init_cell_state", "init_state"):
        if f"{name}.0" in dec_sd:
            init = []
            while f"{name}.{len(init)}" in dec_sd:
                init.append(J(dec_sd[f"{name}.{len(init)}"]))
            decoder["init_state"] = init
            break

    return {"encoder": encoder, "attention": attention, "decoder": decoder}


def load_torch_checkpoint(path: str, cfg: Config, dtype=jnp.float32) -> Params:
    """Load a reference .ckpt (torch.save dict, model.py:347-355) without
    requiring a GPU torch build."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    enc_sd = {k: v.numpy() for k, v in ckpt["encoder_state_dict"].items()}
    dec_sd = {k: v.numpy() for k, v in ckpt["decoder_state_dict"].items()}
    return params_from_torch_state(enc_sd, dec_sd, cfg, dtype)


def params_to_torch_state(params: Params, cfg: Config):
    """Inverse of ``params_from_torch_state``: (enc_sd, dec_sd) numpy dicts
    in the reference's tensor naming/orientation, so a model trained here
    can be loaded by the reference code (or re-imported).  Supports the
    same surface the importer does: the RNN encoder family + the learned
    decoder init state."""
    ecfg, dcfg = cfg.encoder, cfg.decoder

    def N(a):
        return np.asarray(a, np.float32)

    enc_sd: Dict[str, np.ndarray] = {}
    for i, layer in enumerate(params["encoder"]["layers"]):
        base = f"rnn.rnn.{i}."
        for dname, suffix in (("fwd", ""), ("bwd", "_reverse")):
            if dname not in layer:
                continue
            d = layer[dname]
            enc_sd[base + "weight_ih_l0" + suffix] = N(d["w_ih"]).T
            enc_sd[base + "weight_hh_l0" + suffix] = N(d["w_hh"]).T
            enc_sd[base + "bias_ih_l0" + suffix] = N(d["b_ih"])
            enc_sd[base + "bias_hh_l0" + suffix] = N(d["b_hh"])

    ap, dp = params["attention"], params["decoder"]
    dec_sd: Dict[str, np.ndarray] = {
        "embedding.weight": N(dp["embedding"]),
        "proj_linear.weight": N(dp["proj_w"]).T,
        "proj_linear.bias": N(dp["proj_b"]),
        "attn_mechanism.W_enc": N(ap["w_enc"]),
        "attn_mechanism.b_attn": N(ap["b_attn"]),
        "attn_mechanism.W_hidden": N(ap["w_hidden"]),
        "attn_mechanism.v": N(ap["v"]),
    }
    if "map_enc" in ap:
        dec_sd["attn_mechanism.map_enc.weight"] = N(ap["map_enc"]).T
    if "linear_map" in ap:
        dec_sd["attn_mechanism.linear_map"] = N(ap["linear_map"])
    for i, cell in enumerate(dp["cells"]):
        base = f"cell.cell.{i}."
        dec_sd[base + "weight_ih"] = N(cell["w_ih"]).T
        dec_sd[base + "weight_hh"] = N(cell["w_hh"]).T
        dec_sd[base + "bias_ih"] = N(cell["b_ih"])
        dec_sd[base + "bias_hh"] = N(cell["b_hh"])
    if "attn_hidden_w" in dp:
        dec_sd["attn_hidden_weight"] = N(dp["attn_hidden_w"])
    if "init_state" in dp:
        # reference naming (decoder.py:36-40) so its load_state_dict accepts
        # a learned-init checkpoint exported from here
        for i, e in enumerate(dp["init_state"]):
            dec_sd[f"dec_init_cell_state.{i}"] = N(e)
    unexported = set(params["encoder"]) - {"layers"}
    if unexported:
        raise ValueError(
            f"torch export supports the RNN encoder family only; params "
            f"contain unsupported encoder entries {sorted(unexported)}")
    return enc_sd, dec_sd


def save_torch_checkpoint(path: str, params: Params, cfg: Config,
                          args=None) -> str:
    """Write a reference-schema .ckpt (model.py:347-355:
    {'encoder_state_dict', 'decoder_state_dict', 'optimizer_state_dict',
    'args'}) loadable by the reference code and by
    ``load_torch_checkpoint``."""
    import torch
    enc_sd, dec_sd = params_to_torch_state(params, cfg)
    torch.save({
        "encoder_state_dict": {k: torch.from_numpy(v.copy())
                               for k, v in enc_sd.items()},
        "decoder_state_dict": {k: torch.from_numpy(v.copy())
                               for k, v in dec_sd.items()},
        "optimizer_state_dict": {},
        "args": args,
    }, path)
    return path
