"""Secondary encoder families: shape/length contracts, padding invariance,
local-vs-full attention equivalence, and end-to-end greedy decode smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chinese_asr_tpu.config import Config
from chinese_asr_tpu.decode import greedy
from chinese_asr_tpu.models import encoder as enc_ops
from chinese_asr_tpu.models import las
from chinese_asr_tpu.ops import conv as conv_ops
from chinese_asr_tpu.ops import conv_lstm as cl_ops
from chinese_asr_tpu.ops import self_attention as sa_ops


def small(et, **enc_kw):
    return (Config()
            .with_("audio", n_mels=8, delta_delta=True, downsample=False)
            .with_("encoder", encoder_type=et, hidden_size=16, num_layers=2,
                   ks=3, stride=(2, 2), self_attn_heads=2, ffn_size=24,
                   conv_channels=4, dcnn_middle=1, ws=5, **enc_kw)
            .with_("decoder", hidden_size=16, embed_dim=8)
            .with_("attention", attn_size=8)
            .with_("vocab", max_num_words=16)
            .with_("decode", max_len=6))


ALL_TYPES = ["CNN1D", "CNN2D", "CNN1D_RNN", "CNN1D_SELF_ATTENTION",
             "SELF_ATTENTION", "SELF_LOCAL_ATTENTION", "CRNN", "DCNN"]


def make_feats(cfg, B=2, T=11, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(B, T, cfg.audio.feat_dim).astype(np.float32)
    lens = np.array([T, T - 4][:B], np.int32)
    for i, l in enumerate(lens):
        x[i, l:] = 0.0
    return jnp.asarray(x), jnp.asarray(lens)


@pytest.mark.parametrize("et", ALL_TYPES)
def test_encoder_contract(et):
    cfg = small(et)
    params = enc_ops.init_encoder(jax.random.PRNGKey(0), cfg)
    x, lens = make_feats(cfg)
    out = enc_ops.apply_encoder(params, cfg, x, lens)
    assert out.out.ndim == 3 and out.out.shape[0] == 2
    assert out.out.shape[2] == enc_ops.encoder_output_size(cfg)
    ol = np.asarray(out.out_lens)
    assert np.all(ol >= 1) and ol[0] >= ol[1]
    # padding region beyond each sample's out_len must be exactly zero
    y = np.asarray(out.out)
    for i in range(2):
        if ol[i] < y.shape[1]:
            assert np.abs(y[i, ol[i]:]).max() == 0.0, et


@pytest.mark.parametrize("et", ["CNN1D", "SELF_ATTENTION", "CRNN"])
def test_padding_invariance(et):
    """Growing the pad region must not change valid outputs."""
    cfg = small(et)
    params = enc_ops.init_encoder(jax.random.PRNGKey(1), cfg)
    x, lens = make_feats(cfg, B=2, T=11)
    x_pad = jnp.pad(x, ((0, 0), (0, 6), (0, 0)))
    o1 = enc_ops.apply_encoder(params, cfg, x, lens)
    o2 = enc_ops.apply_encoder(params, cfg, x_pad, lens)
    n = int(np.asarray(o1.out_lens)[1])
    np.testing.assert_allclose(np.asarray(o1.out)[1, :n],
                               np.asarray(o2.out)[1, :n],
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("et", ["CNN1D", "SELF_LOCAL_ATTENTION", "CRNN",
                                "CNN1D_RNN", "DCNN"])
def test_greedy_decode_e2e(et):
    cfg = small(et)
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    x, lens = make_feats(cfg)
    res = greedy.greedy_decode_jit(params, cfg, x, lens)
    toks = np.asarray(res.tokens)
    assert toks.shape == (2, cfg.decode.max_len)
    assert np.all(toks >= 0) and np.all(toks < cfg.vocab.vocab_size)


def test_local_attention_equals_full_when_window_covers():
    rng = np.random.RandomState(0)
    B, L, D = 2, 6, 8
    q = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    lens = jnp.asarray(np.array([6, 4], np.int32))
    full, _ = sa_ops.self_attention(q, k, v, lens, heads=2)
    local, _ = sa_ops.self_local_attention(q, k, v, lens, ws=9, heads=2)
    np.testing.assert_allclose(np.asarray(full), np.asarray(local),
                               rtol=1e-5, atol=1e-6)


def test_local_attention_window_clamping():
    """Interior positions must attend to exactly [i-ws//2, i+ws//2]."""
    rng = np.random.RandomState(1)
    B, L, D, ws = 1, 10, 4, 3
    q = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    lens = jnp.asarray(np.array([10], np.int32))
    local, _ = sa_ops.self_local_attention(q, k, v, lens, ws=ws, heads=1)
    # manual window for position 5: keys 4..6
    qn, kn, vn = map(np.asarray, (q, k, v))
    w = kn[0, 4:7]
    a = np.exp(qn[0, 5] @ w.T)
    a /= a.sum()
    expect = a @ vn[0, 4:7]
    np.testing.assert_allclose(np.asarray(local)[0, 5], expect,
                               rtol=1e-5, atol=1e-6)


def test_conv1d_length_formula():
    cfg = small("CNN1D")
    key = jax.random.PRNGKey(0)
    p = conv_ops.init_conv1d(key, 4, 8, ks=3)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 17, 4).astype(np.float32))
    lens = jnp.asarray(np.array([17, 10, 3], np.int32))
    y, ol = conv_ops.conv1d_block(p, x, lens, ks=3, stride=2)
    np.testing.assert_array_equal(np.asarray(ol), [(17 - 3 + 1) // 2 + 1,
                                                   (10 - 3 + 1) // 2 + 1,
                                                   (3 - 3 + 1) // 2 + 1])
    assert y.shape[1] >= int(ol[0])


def test_conv_lstm_final_state_at_true_length():
    key = jax.random.PRNGKey(0)
    p = cl_ops.init_conv_lstm(key, 2, 3, ks=3)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 7, 5, 2).astype(np.float32)
    x[1, 4:] = 0.0
    lens = jnp.asarray(np.array([7, 4], np.int32))
    y, (h, c) = cl_ops.conv_lstm(p, jnp.asarray(x), lens)
    # sample 1's final state must equal running it on the 4-step prefix
    y2, (h2, c2) = cl_ops.conv_lstm(p, jnp.asarray(x[1:2, :4]),
                                    jnp.asarray(np.array([4], np.int32)))
    np.testing.assert_allclose(np.asarray(h)[1], np.asarray(h2)[0],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y)[1, :4], np.asarray(y2)[0],
                               rtol=1e-5, atol=1e-6)
    assert np.abs(np.asarray(y)[1, 4:]).max() == 0.0


def test_glu_halves_channels():
    cfg = small("CNN1D", act="GLU")
    params = enc_ops.init_encoder(jax.random.PRNGKey(0), cfg)
    x, lens = make_feats(cfg)
    out = enc_ops.apply_encoder(params, cfg, x, lens)
    assert out.out.shape[2] == cfg.encoder.hidden_size // 2
    assert out.out.shape[2] == enc_ops.encoder_output_size(cfg)
