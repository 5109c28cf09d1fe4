"""Config-variant coverage: Luong-style attentional wiring (attn_type 'L',
reference decoder.py:39-51 + attention heads), multi-head attention,
skip_step time subsampling (util.py:1294-1316), GRU decoder, and config
JSON roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chinese_asr_tpu.config import Config
from chinese_asr_tpu.decode import beam, greedy
from chinese_asr_tpu.models import las


def small(**over):
    cfg = (Config()
           .with_("audio", n_mels=8, delta_delta=False, downsample=False)
           .with_("encoder", hidden_size=16, num_layers=2)
           .with_("decoder", hidden_size=32, embed_dim=12)
           .with_("attention", attn_size=8)
           .with_("vocab", max_num_words=16)
           .with_("decode", max_len=6))
    for sec, kw in over.items():
        cfg = cfg.with_(sec, **kw)
    return cfg


def run_greedy(cfg, seed=0):
    params = las.init_params(jax.random.PRNGKey(seed), cfg)
    rng = np.random.RandomState(seed)
    feats = jnp.asarray(rng.randn(2, 9, cfg.audio.feat_dim).astype(np.float32))
    lens = jnp.asarray(np.array([9, 6], np.int32))
    return greedy.greedy_decode_jit(params, cfg, feats, lens), params, feats, lens


def test_luong_attn_type():
    cfg = small(attention=dict(attn_type="L", attn_hidden_size=20))
    res, params, feats, lens = run_greedy(cfg)
    assert np.asarray(res.tokens).shape == (2, 6)
    # beam also runs under 'L' wiring
    b = beam.beam_decode_jit(params, cfg, 2, feats, lens)
    assert np.asarray(b.live_tokens).shape == (2, 2, 6)


def test_multihead_attention_with_linear_map():
    cfg = small(attention=dict(heads=2, linear_map=True, map_enc=True))
    res, *_ = run_greedy(cfg)
    assert np.all(np.asarray(res.final_lens) >= 0)


def test_skip_step_subsampling():
    cfg = small(encoder=dict(skip_step=2))
    res, params, feats, lens = run_greedy(cfg)
    from chinese_asr_tpu.models import encoder as enc_ops
    out = enc_ops.apply_encoder(params["encoder"], cfg,
                                jnp.asarray(np.zeros((2, 9, 8), np.float32)),
                                lens)
    # one subsample between the 2 layers: T 9 -> ceil(9/2) = 5
    assert out.out.shape[1] == 5
    np.testing.assert_array_equal(np.asarray(out.out_lens), [4, 3])


def test_gru_decoder():
    cfg = small(decoder=dict(decoder_type="GRU"),
                encoder=dict(encoder_type="GRU", hidden_size=16))
    res, *_ = run_greedy(cfg)
    assert np.asarray(res.tokens).shape == (2, 6)


def test_unidirectional_encoder():
    cfg = small(encoder=dict(bidirectional=False, hidden_size=32))
    # enc_size 32 == dec hidden 32 -> encoder state seeds the decoder
    res, *_ = run_greedy(cfg)
    assert np.asarray(res.tokens).shape == (2, 6)


def test_config_json_roundtrip():
    cfg = small(encoder=dict(stride=(2, 1)), decode=dict(beam_width=8))
    s = cfg.to_json()
    cfg2 = Config.from_json(s)
    assert cfg2 == cfg


def test_temperature_changes_beam_scores():
    cfg = small()
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(1, 9, cfg.audio.feat_dim).astype(np.float32))
    lens = jnp.asarray(np.array([9], np.int32))
    r1 = beam.beam_decode_jit(params, cfg, 2, feats, lens)
    cfg_t = small(decoder=dict(temperature=2.0))
    r2 = beam.beam_decode_jit(params, cfg_t, 2, feats, lens)
    assert not np.allclose(np.asarray(r1.live_scores),
                           np.asarray(r2.live_scores))


def test_learned_init_cell_state():
    """init_cell_state_as_param (reference decoder.py:56-73): with no
    encoder state, the decoder starts from the learned parameters."""
    cfg = small(decoder=dict(init_cell_state_as_param=True),
                encoder=dict(encoder_type="CNN1D"))  # CNN1D has no state
    res, params, *_ = run_greedy(cfg)
    assert "init_state" in params["decoder"]
    assert np.asarray(res.tokens).shape == (2, 6)


def test_fine_tune_freezes_non_attention_params():
    from chinese_asr_tpu.train import optim
    from chinese_asr_tpu.train.step import train_step
    from test_train import make_batch

    cfg = small(train=dict(fine_tune=True, base_lr=1e-2, l2_decay=0.0))
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(cfg.train, params)
    state = tx.init(params)
    batch = make_batch(cfg)
    p2, _, _ = jax.jit(lambda p, o, b: train_step(p, o, cfg, tx, b))(
        params, state, batch)
    # encoder + embedding frozen; attention + projection updated
    np.testing.assert_array_equal(
        np.asarray(params["encoder"]["layers"][0]["fwd"]["w_ih"]),
        np.asarray(p2["encoder"]["layers"][0]["fwd"]["w_ih"]))
    np.testing.assert_array_equal(np.asarray(params["decoder"]["embedding"]),
                                  np.asarray(p2["decoder"]["embedding"]))
    assert not np.allclose(np.asarray(params["decoder"]["proj_w"]),
                           np.asarray(p2["decoder"]["proj_w"]))
    assert not np.allclose(np.asarray(params["attention"]["w_enc"]),
                           np.asarray(p2["attention"]["w_enc"]))


def test_mha_incremental_cache_matches_full():
    from chinese_asr_tpu.ops import self_attention as sa
    key = jax.random.PRNGKey(0)
    B, L, D, H = 2, 7, 16, 4
    p = sa.init_mha(key, D, H)
    x = jnp.asarray(np.random.RandomState(0).randn(B, L, D).astype(np.float32))
    full = np.asarray(sa.mha_full(p, x))
    cache = sa.mha_init_cache(B, L, D)
    steps = []
    for t in range(L):
        y, cache = sa.mha_step(p, x[:, t], cache)
        steps.append(np.asarray(y))
    inc = np.stack(steps, axis=1)
    np.testing.assert_allclose(inc, full, rtol=1e-5, atol=1e-5)
