"""Differential tests: scan-based RNN ops vs torch reference primitives.

This is the formalization of the reference's scratchpad style (reference
util.py:2834-2876 tests its hand LSTM against nn.LSTM) as the unit tier.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from chinese_asr_tpu.ops import rnn as jrnn
from chinese_asr_tpu.ops.masks import length_mask


def torch_params_to_jax(cell, mode):
    """Map torch RNN/cell parameter tensors to our layer pytree."""
    sd = {k: v.detach().numpy() for k, v in cell.state_dict().items()}
    def pick(name):
        for k in sd:
            if name in k:
                return sd[k]
        raise KeyError(name)
    return {
        "w_ih": jnp.asarray(pick("weight_ih").T),
        "w_hh": jnp.asarray(pick("weight_hh").T),
        "b_ih": jnp.asarray(pick("bias_ih")),
        "b_hh": jnp.asarray(pick("bias_hh")),
    }


@pytest.mark.parametrize("mode", ["LSTM", "GRU", "RNN_TANH"])
def test_cell_step_matches_torch(mode):
    torch.manual_seed(0)
    B, D, H = 3, 7, 5
    if mode == "LSTM":
        cell = nn.LSTMCell(D, H)
    elif mode == "GRU":
        cell = nn.GRUCell(D, H)
    else:
        cell = nn.RNNCell(D, H, nonlinearity="tanh")
    p = torch_params_to_jax(cell, mode)
    x = torch.randn(B, D)
    h = torch.randn(B, H)
    if mode == "LSTM":
        c = torch.randn(B, H)
        th, tc = cell(x, (h, c))
        jh, jc = jrnn.lstm_step(p, jnp.asarray(x.numpy()), jnp.asarray(h.numpy()),
                                jnp.asarray(c.numpy()))
        np.testing.assert_allclose(np.asarray(jh), th.detach().numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(jc), tc.detach().numpy(), atol=1e-5)
    elif mode == "GRU":
        th = cell(x, h)
        jh = jrnn.gru_step(p, jnp.asarray(x.numpy()), jnp.asarray(h.numpy()))
        np.testing.assert_allclose(np.asarray(jh), th.detach().numpy(), atol=1e-5)
    else:
        th = cell(x, h)
        jh = jrnn.rnn_step(p, jnp.asarray(x.numpy()), jnp.asarray(h.numpy()), jnp.tanh)
        np.testing.assert_allclose(np.asarray(jh), th.detach().numpy(), atol=1e-5)


def _packed_lstm_reference(lstm, xs, lens):
    """Run torch packed LSTM over variable-length inputs; return padded
    output [B, T, H*dirs] and final (h, c)."""
    order = np.argsort(-lens)
    seq = [torch.tensor(xs[i]) for i in order]
    pack = nn.utils.rnn.pack_sequence(seq)
    out, (h, c) = lstm(pack)
    pad, out_lens = nn.utils.rnn.pad_packed_sequence(out, batch_first=True)
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    return pad[inv].detach().numpy(), h[:, inv].detach().numpy(), c[:, inv].detach().numpy()


@pytest.mark.parametrize("bidirectional", [False, True])
def test_masked_scan_lstm_matches_packed_torch(bidirectional):
    """The masked lax.scan must reproduce PackedSequence semantics: padded
    outputs zero, final state taken at each sequence's true end
    (reference encoder.py:36-81)."""
    torch.manual_seed(1)
    np.random.seed(1)
    B, T, D, H = 4, 11, 6, 5
    lens = np.array([11, 7, 3, 9], dtype=np.int32)
    xs = [np.random.randn(l, D).astype(np.float32) for l in lens]

    lstm = nn.LSTM(D, H, num_layers=1, bidirectional=bidirectional)
    pad_ref, h_ref, c_ref = _packed_lstm_reference(lstm, xs, lens)

    x = np.zeros((B, T, D), np.float32)
    for i, xi in enumerate(xs):
        x[i, :len(xi)] = xi
    mask = length_mask(jnp.asarray(lens), T)

    sd = lstm.state_dict()
    def layer(sfx):
        return {"w_ih": jnp.asarray(sd[f"weight_ih_l0{sfx}"].numpy().T),
                "w_hh": jnp.asarray(sd[f"weight_hh_l0{sfx}"].numpy().T),
                "b_ih": jnp.asarray(sd[f"bias_ih_l0{sfx}"].numpy()),
                "b_hh": jnp.asarray(sd[f"bias_hh_l0{sfx}"].numpy())}

    if bidirectional:
        y, s_f, s_b = jrnn.bidir_rnn_layer(
            "LSTM", layer(""), layer("_reverse"),
            jnp.asarray(x), jnp.asarray(lens), mask)
        np.testing.assert_allclose(np.asarray(y), pad_ref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s_f[0]), h_ref[0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(s_b[0]), h_ref[1], atol=1e-5)
        np.testing.assert_allclose(np.asarray(s_f[1]), c_ref[0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(s_b[1]), c_ref[1], atol=1e-5)
    else:
        y, (h, c) = jrnn.rnn_layer("LSTM", layer(""), jnp.asarray(x), mask)
        np.testing.assert_allclose(np.asarray(y), pad_ref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(h), h_ref[0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(c), c_ref[0], atol=1e-5)


def test_residual_stack_matches_torch_stack():
    """4-layer bidirectional residual stack vs a torch loop of nn.LSTM layers
    with residual adds (reference RNN_RES semantics util.py:1249-1291)."""
    torch.manual_seed(2)
    np.random.seed(2)
    B, T, D, H, L = 3, 10, 8, 4, 4
    lens = np.array([10, 6, 8], dtype=np.int32)
    xs = [np.random.randn(l, D).astype(np.float32) for l in lens]
    x = np.zeros((B, T, D), np.float32)
    for i, xi in enumerate(xs):
        x[i, :len(xi)] = xi

    torch_layers = [nn.LSTM(D if i == 0 else 2 * H, H, bidirectional=True)
                    for i in range(L)]

    # torch reference: packed per layer, residual adds on padded outputs
    cur = [torch.tensor(xi) for xi in xs]
    for i, tl in enumerate(torch_layers):
        pad_ref, h_ref, c_ref = _packed_lstm_reference(
            tl, [c.numpy() for c in cur], lens)
        ys = [torch.tensor(pad_ref[b, :lens[b]]) for b in range(B)]
        if i > 0:
            cur = [c + y for c, y in zip(cur, ys)]
        else:
            cur = ys
    ref_out = np.zeros((B, T, 2 * H), np.float32)
    for b in range(B):
        ref_out[b, :lens[b]] = cur[b].numpy()

    # our stack with the same weights
    layers = []
    for tl in torch_layers:
        sd = tl.state_dict()
        def g(name):
            return jnp.asarray(sd[name].numpy())
        layers.append({
            "fwd": {"w_ih": g("weight_ih_l0").T, "w_hh": g("weight_hh_l0").T,
                    "b_ih": g("bias_ih_l0"), "b_hh": g("bias_hh_l0")},
            "bwd": {"w_ih": g("weight_ih_l0_reverse").T, "w_hh": g("weight_hh_l0_reverse").T,
                    "b_ih": g("bias_ih_l0_reverse"), "b_hh": g("bias_hh_l0_reverse")},
        })
    mask = length_mask(jnp.asarray(lens), T)
    y, states, _, _ = jrnn.rnn_stack("LSTM", layers, jnp.asarray(x),
                                     jnp.asarray(lens), mask, residual=True)
    np.testing.assert_allclose(np.asarray(y), ref_out, atol=2e-5)
    # last-layer final states match the packed torch run of the last layer
    np.testing.assert_allclose(np.asarray(states[0][0]), h_ref[0], atol=2e-5)
    np.testing.assert_allclose(np.asarray(states[1][0]), h_ref[1], atol=2e-5)


def _gru_layers_from_torch(torch_layers):
    layers = []
    for tl in torch_layers:
        sd = tl.state_dict()

        def g(name):
            return jnp.asarray(sd[name].numpy())
        layer = {"fwd": {"w_ih": g("weight_ih_l0").T, "w_hh": g("weight_hh_l0").T,
                         "b_ih": g("bias_ih_l0"), "b_hh": g("bias_hh_l0")}}
        if "weight_ih_l0_reverse" in sd:
            layer["bwd"] = {"w_ih": g("weight_ih_l0_reverse").T,
                            "w_hh": g("weight_hh_l0_reverse").T,
                            "b_ih": g("bias_ih_l0_reverse"),
                            "b_hh": g("bias_hh_l0_reverse")}
        layers.append(layer)
    return layers


def test_local_rnn_matches_torch_gru_stack():
    """Mirror of the reference's own LocalRNN check (util.py:2504-2520):
    5-layer bidirectional GRU with skip_step=[1,1,1,1,2] must equal
    nn.GRU(7, 11, 5, bidirectional=True) output subsampled y[::2], and the
    per-layer final states must match nn.GRU's state stack."""
    torch.manual_seed(7)
    L_SEQ, B, D, H = 13, 4, 7, 11
    x = torch.randn(L_SEQ, B, D)

    m2 = nn.GRU(input_size=D, hidden_size=H, num_layers=5, bidirectional=True)
    y2, state2 = m2(x)                       # [l, b, 2H], [10, b, H]
    y_ref = y2[::2].detach().numpy()

    # split nn.GRU's stacked weights into 5 single-layer param dicts
    sd = m2.state_dict()
    layers = []
    for i in range(5):
        def g(name):
            return jnp.asarray(sd[name].numpy())
        layers.append({
            "fwd": {"w_ih": g(f"weight_ih_l{i}").T, "w_hh": g(f"weight_hh_l{i}").T,
                    "b_ih": g(f"bias_ih_l{i}"), "b_hh": g(f"bias_hh_l{i}")},
            "bwd": {"w_ih": g(f"weight_ih_l{i}_reverse").T,
                    "w_hh": g(f"weight_hh_l{i}_reverse").T,
                    "b_ih": g(f"bias_ih_l{i}_reverse"),
                    "b_hh": g(f"bias_hh_l{i}_reverse")},
        })

    xb = jnp.asarray(x.numpy().transpose(1, 0, 2))      # [B, T, D]
    lens = jnp.full((B,), L_SEQ, jnp.int32)
    mask = length_mask(lens, L_SEQ)
    y, states, out_lens, _ = jrnn.local_rnn(
        "GRU", layers, xb, lens, mask, residual=False,
        skip_steps=[1, 1, 1, 1, 2])

    np.testing.assert_allclose(np.asarray(y).transpose(1, 0, 2), y_ref,
                               atol=2e-5)
    assert np.all(np.asarray(out_lens) == (L_SEQ + 1) // 2)
    # states: layer i fwd/bwd vs nn.GRU state rows 2i / 2i+1
    s2 = state2.detach().numpy()
    for i in range(5):
        np.testing.assert_allclose(np.asarray(states[i][0]), s2[2 * i],
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(states[i][1]), s2[2 * i + 1],
                                   atol=2e-5)


def test_local_rnn_masked_variable_lengths():
    """Variable-length batch vs per-sample torch GRU runs (packed-sequence
    semantics): outputs equal up to each length, skip applied per layer
    with ceil-div lengths, residual add from layer 2 on (res=True)."""
    torch.manual_seed(8)
    np.random.seed(8)
    B, T, D, H = 3, 9, 5, 6
    lens = np.array([9, 7, 4], np.int32)
    skip = [1, 2, 1]
    torch_layers = [nn.GRU(D if i == 0 else H, H) for i in range(3)]

    x = np.zeros((B, T, D), np.float32)
    xs = [np.random.randn(l, D).astype(np.float32) for l in lens]
    for b, xi in enumerate(xs):
        x[b, :len(xi)] = xi

    # torch reference: per-sample, layer by layer with skip + residual
    ref, ref_lens = [], []
    for b in range(B):
        cur = torch.tensor(xs[b]).unsqueeze(1)          # [l, 1, d]
        for i, tl in enumerate(torch_layers):
            y, _ = tl(cur)
            cur = cur + y if i > 0 else y
            if skip[i] > 1:
                cur = cur[::skip[i]]
        ref.append(cur[:, 0].detach().numpy())
        ref_lens.append(cur.shape[0])

    layers = _gru_layers_from_torch(torch_layers)
    mask = length_mask(jnp.asarray(lens), T)
    y, _, out_lens, _ = jrnn.local_rnn("GRU", layers, jnp.asarray(x),
                                       jnp.asarray(lens), mask,
                                       residual=True, skip_steps=skip)
    out_lens = np.asarray(out_lens)
    assert out_lens.tolist() == ref_lens
    y = np.asarray(y)
    for b in range(B):
        np.testing.assert_allclose(y[b, :out_lens[b]], ref[b], atol=2e-5)
