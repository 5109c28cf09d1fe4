"""Greedy decode: the compiled while_loop must reproduce an independent
step-by-step numpy implementation of the reference semantics
(model.py:503-602), including the eos score bookkeeping and early stop."""

import numpy as np
import pytest

import ref_numpy

import jax
import jax.numpy as jnp

from chinese_asr_tpu.config import Config
from chinese_asr_tpu.decode import greedy
from chinese_asr_tpu.models import las
from chinese_asr_tpu.vocab import Vocab


SMALL = (Config()
         .with_("audio", n_mels=8, delta_delta=False, downsample=False)
         .with_("encoder", hidden_size=16, num_layers=2)
         .with_("decoder", hidden_size=32, embed_dim=12)
         .with_("attention", attn_size=8)
         .with_("vocab", max_num_words=20)
         .with_("decode", max_len=12))


@pytest.mark.parametrize("seed", [0, 1])
def test_greedy_matches_numpy_reference(seed):
    cfg = SMALL
    key = jax.random.PRNGKey(seed)
    params = las.init_params(key, cfg)
    B, T, D = 3, 9, cfg.audio.feat_dim
    rng = np.random.RandomState(seed)
    feats = rng.randn(B, T, D).astype(np.float32)
    lens = np.array([9, 5, 7], np.int32)
    for i, l in enumerate(lens):
        feats[i, l:] = 0.0

    res = greedy.greedy_decode_jit(params, cfg, jnp.asarray(feats), jnp.asarray(lens))
    ref_out, ref_lens, ref_accum, ref_fin = ref_numpy.numpy_greedy(params, cfg, feats, lens)

    got_lens = np.asarray(res.final_lens)
    np.testing.assert_array_equal(got_lens, ref_lens)
    np.testing.assert_array_equal(np.asarray(res.finished), ref_fin)
    got = np.asarray(res.tokens)
    for i in range(B):
        n = ref_lens[i] + (1 if ref_fin[i] else 0)
        np.testing.assert_array_equal(got[i, :n], ref_out[i, :n])
    np.testing.assert_allclose(np.asarray(res.scores), ref_accum, atol=1e-4)


def test_finalize_and_cer():
    cfg = SMALL
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    feats = rng.randn(2, 9, cfg.audio.feat_dim).astype(np.float32)
    lens = np.array([9, 9], np.int32)
    res = greedy.greedy_decode_jit(params, cfg, jnp.asarray(feats), jnp.asarray(lens))
    vocab = Vocab.build(["abcdefghijklmnopqrst"], max_num_words=cfg.vocab.max_num_words)
    out = greedy.finalize_greedy(res, vocab, text=[[4, 5], [6]])
    assert out.n == 2 and out.wer is not None
    assert isinstance(out.pred_text[0], str)
    # determinism across two identical calls
    res2 = greedy.greedy_decode_jit(params, cfg, jnp.asarray(feats), jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(res.tokens), np.asarray(res2.tokens))
