"""Differential tests of the masked conv / ConvLSTM ops vs torch modules
carrying the same weights (reference Conv1D util.py:1327-1434, ConvLSTM
util.py:886-974 semantics)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from chinese_asr_tpu.ops import conv as conv_ops
from chinese_asr_tpu.ops import conv_lstm as cl_ops


def to_torch_w1d(w):
    # ours [ks, in, out] -> torch [out, in, ks]
    return torch.from_numpy(np.asarray(w).transpose(2, 1, 0).copy())


@pytest.mark.parametrize("stride,act", [(1, "NONE"), (2, "NONE"), (2, "GLU"),
                                        (3, "RELU")])
def test_conv1d_block_matches_torch(stride, act):
    rng = np.random.RandomState(0)
    B, T, C, O, ks = 3, 17, 6, 8, 3
    x = rng.randn(B, T, C).astype(np.float32)
    lens = np.array([17, 11, 5], np.int32)
    for i, l in enumerate(lens):
        x[i, l:] = 0.0
    key = jax.random.PRNGKey(0)
    p = conv_ops.init_conv1d(key, C, O, ks)
    y, ol = conv_ops.conv1d_block(p, jnp.asarray(x), jnp.asarray(lens),
                                  ks, stride, act=act)

    with torch.no_grad():
        xt = torch.from_numpy(x).transpose(1, 2)           # [B, C, T]
        # auto right pad (reference pad(), util.py:145-158)
        right = (stride - (T - ks) % stride) % stride
        xt = F.pad(xt, (0, right))
        w = to_torch_w1d(p["w"])
        b = torch.from_numpy(np.asarray(p["b"]))
        yt = F.conv1d(xt, w, b, stride=stride)
        if act == "GLU":
            yt = F.glu(yt, dim=1)
        elif act == "RELU":
            yt = F.relu(yt)
        ref_lens = (lens - ks + stride - 1) // stride + 1
        ref = yt.transpose(1, 2).numpy()
        for i, l in enumerate(ref_lens):
            ref[i, l:] = 0.0

    np.testing.assert_array_equal(np.asarray(ol), ref_lens)
    np.testing.assert_allclose(np.asarray(y)[:, : ref.shape[1]], ref,
                               rtol=1e-4, atol=1e-5)


def test_conv_lstm_matches_torch_loop():
    """Our scanned ConvLSTM vs a direct torch loop implementing the
    reference recurrence (gates = conv_x(x_t) + conv_h(h), order i,f,g,o,
    c' = sig(i)*tanh(g) + sig(f)*c)."""
    rng = np.random.RandomState(1)
    B, T, Freq, C, O, ks = 2, 6, 5, 3, 4, 3
    x = rng.randn(B, T, Freq, C).astype(np.float32)
    lens = np.array([6, 4], np.int32)
    for i, l in enumerate(lens):
        x[i, l:] = 0.0
    p = cl_ops.init_conv_lstm(jax.random.PRNGKey(0), C, O, ks)
    y, (hT, cT) = cl_ops.conv_lstm(p, jnp.asarray(x), jnp.asarray(lens))

    with torch.no_grad():
        w_x = to_torch_w1d(p["w_x"])                      # [4O, C, ks]
        w_h = to_torch_w1d(p["w_h"])
        b = torch.from_numpy(np.asarray(p["b"]))
        top = (ks - 1) // 2
        h = torch.zeros(B, O, Freq)
        c = torch.zeros(B, O, Freq)
        outs = []
        finals_h = [None] * B
        finals_c = [None] * B
        for t in range(T):
            inp = torch.from_numpy(x[:, t]).transpose(1, 2)  # [B, C, F]
            # explicit same padding like the reference (top, ks-1-top)
            inp_p = F.pad(inp, (top, ks - 1 - top))
            h_p = F.pad(h, (top, ks - 1 - top))
            gates = F.conv1d(inp_p, w_x, b) + F.conv1d(h_p, w_h)
            i_g, f_g, g_g, o_g = gates.chunk(4, dim=1)
            c2 = torch.sigmoid(i_g) * torch.tanh(g_g) + torch.sigmoid(f_g) * c
            h2 = torch.sigmoid(o_g) * torch.tanh(c2)
            for bi in range(B):
                if t < lens[bi]:
                    h[bi], c[bi] = h2[bi], c2[bi]
                    if t == lens[bi] - 1:
                        finals_h[bi] = h[bi].clone()
                        finals_c[bi] = c[bi].clone()
            out_t = h2.clone()
            for bi in range(B):
                if t >= lens[bi]:
                    out_t[bi] = 0.0
            outs.append(out_t)
        ref_y = torch.stack(outs, 1).transpose(2, 3).numpy()  # [B,T,F,O]
        ref_h = torch.stack(finals_h).transpose(1, 2).numpy()
        ref_c = torch.stack(finals_c).transpose(1, 2).numpy()

    np.testing.assert_allclose(np.asarray(y), ref_y, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), ref_h, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cT), ref_c, rtol=1e-4, atol=1e-5)
