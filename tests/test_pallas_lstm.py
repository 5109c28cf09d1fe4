"""Fused Pallas LSTM time loop: interpret-mode parity with the lax.scan
path and with torch, including masked final states."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chinese_asr_tpu.ops import rnn as rnn_ops
from chinese_asr_tpu.ops.pallas import lstm as pallas_lstm


def _prep(p_f, p_b, x, mask):
    """Time-major gate prep exactly as rnn._bidir_lstm_layer_tm does it."""
    x_tm = jnp.swapaxes(jnp.asarray(x), 0, 1)
    m_tm = jnp.swapaxes(mask, 0, 1)
    T, B, _ = x_tm.shape

    def hoist(p, xi):
        return (xi.reshape(T * B, -1) @ p["w_ih"] + p["b_ih"] + p["b_hh"]
                ).reshape(T, B, -1)

    xg_f = hoist(p_f, x_tm)
    xg_b = hoist(p_b, jnp.flip(x_tm, axis=0))
    w_hh = jnp.stack([p_f["w_hh"], p_b["w_hh"]])
    return xg_f, xg_b, m_tm, jnp.flip(m_tm, axis=0), w_hh


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

    # scan path through the public layer API (CPU dispatch: pallas off)
    y, s_f, s_b = rnn_ops.bidir_rnn_layer("LSTM", p_f, p_b,
                                          jnp.asarray(x), jnp.asarray(lens),
                                          mask)
    y_f, y_b = jnp.split(y, 2, axis=-1)

    # kernel (interpret mode) on the identical time-major prep
    xg_f, xg_b, m_f, m_b, w_hh = _prep(p_f, p_b, x, mask)
    ys_f, ys_b, hT, cT = pallas_lstm.bidir_lstm_time_loop(
        xg_f, xg_b, m_f, m_b, w_hh, interpret=True)
    ys_f = jnp.swapaxes(ys_f, 0, 1)                       # [B, T, H]
    ys_b = jnp.swapaxes(jnp.flip(ys_b, axis=0), 0, 1)

    np.testing.assert_allclose(np.asarray(ys_f), np.asarray(y_f),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ys_b), np.asarray(y_b),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hT[0]), np.asarray(s_f[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cT[1]), np.asarray(s_b[1]),
                               rtol=1e-5, atol=1e-6)


def test_kernel_chunk_padding_matches():
    """chunk that does not divide T exercises the zero-pad + masked-step
    path; results must be identical to chunk=1."""
    rng = np.random.RandomState(1)
    B, T, D, H = 2, 7, 5, 8
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    p_f = rnn_ops.init_rnn_layer(k1, "LSTM", D, H)
    p_b = rnn_ops.init_rnn_layer(k2, "LSTM", D, H)
    x = rng.randn(B, T, D).astype(np.float32)
    from chinese_asr_tpu.ops.masks import length_mask
    mask = length_mask(jnp.asarray(np.array([7, 5], np.int32)), T)
    xg_f, xg_b, m_f, m_b, w_hh = _prep(p_f, p_b, x, mask)
    ref = pallas_lstm.bidir_lstm_time_loop(xg_f, xg_b, m_f, m_b, w_hh,
                                           chunk=1, interpret=True)
    got = pallas_lstm.bidir_lstm_time_loop(xg_f, xg_b, m_f, m_b, w_hh,
                                           chunk=4, interpret=True)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_kernel_batch_tiling_matches():
    """Batch tiles ride the outer grid axis (large serving batches used to
    overflow the 16 MB scoped-VMEM stack at compile time); per-row math is
    independent, so nb>1 must be bit-identical to the single-tile kernel,
    including a tile count that exercises carry reset/flush per tile."""
    rng = np.random.RandomState(3)
    B, T, D, H = 6, 9, 5, 8
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    p_f = rnn_ops.init_rnn_layer(k1, "LSTM", D, H)
    p_b = rnn_ops.init_rnn_layer(k2, "LSTM", D, H)
    x = rng.randn(B, T, D).astype(np.float32)
    from chinese_asr_tpu.ops.masks import length_mask
    lens = np.array([9, 7, 5, 9, 2, 6], np.int32)
    mask = length_mask(jnp.asarray(lens), T)
    xg_f, xg_b, m_f, m_b, w_hh = _prep(p_f, p_b, x, mask)
    ref = pallas_lstm.bidir_lstm_time_loop(xg_f, xg_b, m_f, m_b, w_hh,
                                           chunk=2, interpret=True, btile=B)
    for bt in (1, 2, 3):
        got = pallas_lstm.bidir_lstm_time_loop(
            xg_f, xg_b, m_f, m_b, w_hh, chunk=2, interpret=True, btile=bt)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


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
    T, B, H = 7, 3, 8
    xg_f = jnp.asarray(rng.randn(T, B, 4 * H).astype(np.float32))
    xg_b = jnp.asarray(rng.randn(T, B, 4 * H).astype(np.float32))
    m_f = jnp.asarray((rng.rand(T, B) > 0.2).astype(np.float32))
    m_b = jnp.flip(m_f, axis=0)
    w = jnp.asarray(0.3 * rng.randn(2, H, 4 * H).astype(np.float32))

    def loss_pallas(xg_f, xg_b, w):
        ys_f, ys_b, hT, cT = rnn_ops._bidir_core_pallas(xg_f, xg_b, m_f, m_b, w)
        return (ys_f ** 2).sum() + (ys_b ** 2).sum() + hT.sum() + (cT ** 2).sum()

    def loss_scan(xg_f, xg_b, w):
        ys_f, ys_b, hT, cT = rnn_ops._bidir_core_scan(xg_f, xg_b, m_f, m_b, w)
        return (ys_f ** 2).sum() + (ys_b ** 2).sum() + hT.sum() + (cT ** 2).sum()

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(xg_f, xg_b, w)
    gs = jax.grad(loss_scan, argnums=(0, 1, 2))(xg_f, xg_b, w)
    for a, b in zip(gp, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
