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
