"""Golden-value determinism tier (SURVEY section 4: the reference embeds
hand-verified expected tensors in comments; here they are assertions).
Fixed seeds -> exact expected decodes on the CPU backend.  These guard
against silent semantic drift in any layer of the stack."""

import numpy as np

import jax
import jax.numpy as jnp

from chinese_asr_tpu.audio import features
from chinese_asr_tpu.config import Config
from chinese_asr_tpu.decode import beam, greedy
from chinese_asr_tpu.models import las

CFG = (Config()
       .with_("audio", n_mels=8, delta_delta=False, downsample=False)
       .with_("encoder", hidden_size=16, num_layers=2)
       .with_("decoder", hidden_size=32, embed_dim=12)
       .with_("attention", attn_size=8)
       .with_("vocab", max_num_words=20)
       .with_("decode", max_len=10))

GOLD_TOKENS = [[19] * 10, [12] * 10]
GOLD_SCORES = [-30.06828, -29.08267]


def _inputs():
    rng = np.random.RandomState(42)
    feats = jnp.asarray(rng.randn(2, 9, CFG.audio.feat_dim).astype(np.float32))
    lens = jnp.asarray(np.array([9, 6], np.int32))
    return feats, lens


def test_greedy_golden():
    params = las.init_params(jax.random.PRNGKey(42), CFG)
    g = greedy.greedy_decode_jit(params, CFG, *_inputs())
    assert np.asarray(g.tokens).tolist() == GOLD_TOKENS
    np.testing.assert_allclose(np.asarray(g.scores), GOLD_SCORES, atol=2e-4)


def test_beam_top_matches_greedy_golden():
    params = las.init_params(jax.random.PRNGKey(42), CFG)
    b = beam.beam_decode_jit(params, CFG, 4, *_inputs())
    assert np.asarray(b.live_tokens)[:, 0].tolist() == GOLD_TOKENS
    np.testing.assert_allclose(np.asarray(b.live_scores)[:, 0], GOLD_SCORES,
                               atol=2e-4)


def test_featurizer_golden():
    cfg = Config().audio
    wav = jnp.asarray((0.1 * np.random.RandomState(7).randn(4000)
                       ).astype(np.float32))
    lm = features.log_mel(wav, features.num_frames(4000, cfg), cfg)
    assert lm.shape == (22, 80)
    np.testing.assert_allclose(float(lm.sum()), -317.151, atol=0.05)
