"""Fused Pallas LSTM time loop: interpret-mode parity with the lax.scan
path and with torch, including masked final states."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chinese_asr_tpu.ops import rnn as rnn_ops
from chinese_asr_tpu.ops.pallas import lstm as pallas_lstm


def test_kernel_matches_scan_path():
    rng = np.random.RandomState(0)
    B, T, D, H = 3, 11, 6, 8
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    p_f = rnn_ops.init_rnn_layer(k1, "LSTM", D, H)
    p_b = rnn_ops.init_rnn_layer(k2, "LSTM", D, H)
    x = rng.randn(B, T, D).astype(np.float32)
    lens = np.array([11, 7, 4], np.int32)
    for i, l in enumerate(lens):
        x[i, l:] = 0.0
    from chinese_asr_tpu.ops.masks import length_mask
    mask = length_mask(jnp.asarray(lens), T)

    # scan path (CPU dispatch: pallas off by default on CPU)
    y_f, y_b, s_f, s_b = rnn_ops._scan_lstm_bidir(p_f, p_b, jnp.asarray(x),
                                                  mask)

    # kernel (interpret mode)
    def hoist(p, xi):
        return (xi.reshape(B * T, -1) @ p["w_ih"] + p["b_ih"] + p["b_hh"]
                ).reshape(B, T, -1)

    xj = jnp.asarray(x)
    xg = jnp.stack([hoist(p_f, xj), hoist(p_b, jnp.flip(xj, axis=1))])
    m2 = jnp.stack([mask, jnp.flip(mask, axis=1)])
    w_hh = jnp.stack([p_f["w_hh"], p_b["w_hh"]])
    ys, hT, cT = pallas_lstm.bidir_lstm_time_loop(
        jnp.moveaxis(xg, 2, 0), jnp.moveaxis(m2, 2, 0), w_hh, interpret=True)
    ys = jnp.moveaxis(ys, 0, 2)

    np.testing.assert_allclose(np.asarray(ys[0]), np.asarray(y_f),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jnp.flip(ys[1], axis=1)),
                               np.asarray(y_b), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hT[0]), np.asarray(s_f[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cT[1]), np.asarray(s_b[1]),
                               rtol=1e-5, atol=1e-6)


def test_custom_vjp_grad_matches_scan(monkeypatch):
    """Training differentiates through the encoder: the pallas core's
    custom_vjp (scan-recompute backward) must produce the scan path's
    gradients exactly."""
    import functools
    from chinese_asr_tpu.ops.pallas import lstm as pl_lstm
    monkeypatch.setattr(pl_lstm, "bidir_lstm_time_loop",
                        functools.partial(pl_lstm.bidir_lstm_time_loop.__wrapped__
                                          if hasattr(pl_lstm.bidir_lstm_time_loop, "__wrapped__")
                                          else pl_lstm.bidir_lstm_time_loop,
                                          interpret=True))
    rng = np.random.RandomState(2)
    T, G, B, H = 7, 2, 3, 8
    xg = jnp.asarray(rng.randn(T, G, B, 4 * H).astype(np.float32))
    m2 = jnp.asarray((rng.rand(T, G, B) > 0.2).astype(np.float32))
    w = jnp.asarray(0.3 * rng.randn(G, H, 4 * H).astype(np.float32))

    def loss_pallas(xg, w):
        ys, hT, cT = rnn_ops._bidir_core_pallas(xg, m2, w)
        return (ys ** 2).sum() + hT.sum() + (cT ** 2).sum()

    def loss_scan(xg, w):
        ys, hT, cT = rnn_ops._bidir_core_scan(xg, m2, w)
        return (ys ** 2).sum() + hT.sum() + (cT ** 2).sum()

    gp = jax.grad(loss_pallas, argnums=(0, 1))(xg, w)
    gs = jax.grad(loss_scan, argnums=(0, 1))(xg, w)
    for a, b in zip(gp, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
