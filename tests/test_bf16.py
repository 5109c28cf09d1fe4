"""bf16 serving accuracy evidence (VERDICT r2 item #3).

``ASR(compute_dtype="bfloat16")`` is the recommended throughput mode on
TPU (PERF.md); these tests quantify what bf16 does to DECODED OUTPUT, not
just speed, on a model whose logits look like production's (overfit ->
peaked, early-eos):

* transcripts must match f32 exactly on the overfit task (greedy + beam);
* beam scores stay f32 (decode casts logits up) and the f32-vs-bf16 score
  delta is bounded;
* the bf16 pipeline never emits NaN scores on this task.

The full-size flagship measurement (128-utt batch on TPU) lives in
tools/earlyexit_bench.py --bf16; PERF.md records the numbers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chinese_asr_tpu.decode import beam, greedy
from chinese_asr_tpu.models import las
from chinese_asr_tpu.train import optim
from chinese_asr_tpu.train.step import train_step

from test_train import SMALL, make_batch


@pytest.fixture(scope="module")
def overfit():
    """Train the tiny model until it emits short eos-terminated strings
    (the regime trained weights put decoding in); params are disk-cached
    across runs (fixture_cache)."""
    import functools

    from fixture_cache import cached_overfit

    cfg = SMALL
    batch = make_batch(cfg, B=4)

    def train():
        params = las.init_params(jax.random.PRNGKey(0), cfg)
        tx = optim.make_optimizer(cfg.train)
        opt = tx.init(params)
        step = jax.jit(functools.partial(train_step, cfg=cfg, tx=tx))
        m = {}
        for i in range(250):
            params, opt, m = step(params, opt, batch=batch,
                                  rng=jax.random.PRNGKey(i))
        assert float(m["accuracy"]) > 0.95, "overfit fixture did not converge"
        return params

    params = cached_overfit("bf16_overfit_v1", cfg, train)
    return cfg, params, batch.feats, batch.feat_lens


def _cast(params, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)


def test_bf16_greedy_transcripts_match_f32(overfit):
    cfg, params, feats, lens = overfit
    r32 = greedy.greedy_decode_jit(params, cfg, feats, lens)
    p16 = _cast(params, jnp.bfloat16)
    r16 = greedy.greedy_decode_jit(p16, cfg, feats.astype(jnp.bfloat16),
                                   lens)
    np.testing.assert_array_equal(np.asarray(r32.tokens),
                                  np.asarray(r16.tokens))
    np.testing.assert_array_equal(np.asarray(r32.final_lens),
                                  np.asarray(r16.final_lens))
    assert r16.scores.dtype == jnp.float32          # score math stays f32
    d = np.abs(np.asarray(r32.scores) - np.asarray(r16.scores))
    assert float(d.max()) < 0.1, f"score drift {d.max()}"


@pytest.mark.parametrize("bw", [4, 8])
def test_bf16_beam_transcripts_match_f32(overfit, bw):
    cfg, params, feats, lens = overfit
    b32 = beam.beam_decode_best_jit(params, cfg, bw, feats, lens)
    p16 = _cast(params, jnp.bfloat16)
    b16 = beam.beam_decode_best_jit(p16, cfg, bw,
                                    feats.astype(jnp.bfloat16), lens)
    np.testing.assert_array_equal(np.asarray(b32.tokens),
                                  np.asarray(b16.tokens))
    np.testing.assert_array_equal(np.asarray(b32.lens),
                                  np.asarray(b16.lens))
    assert b16.scores.dtype == jnp.float32
    s32, s16 = np.asarray(b32.scores), np.asarray(b16.scores)
    assert np.isfinite(s16).all(), "bf16 produced non-finite beam scores"
    assert float(np.abs(s32 - s16).max()) < 0.1


def test_bf16_nbest_sets_match_f32(overfit):
    """Beyond the winner: the harvested n-best SETS (what a second-pass
    LM rescores) must coincide, so bf16 cannot flip an LM-rescored
    winner either on this task."""
    cfg, params, feats, lens = overfit
    bw = 4
    r32 = beam.beam_decode_jit(params, cfg, bw, feats, lens)
    r16 = beam.beam_decode_jit(_cast(params, jnp.bfloat16), cfg, bw,
                               feats.astype(jnp.bfloat16), lens)
    np.testing.assert_array_equal(np.asarray(r32.fin_count),
                                  np.asarray(r16.fin_count))
    m32 = np.isfinite(np.asarray(r32.fin_scores))
    m16 = np.isfinite(np.asarray(r16.fin_scores))
    np.testing.assert_array_equal(m32, m16)
    np.testing.assert_array_equal(np.asarray(r32.fin_tokens)[m32],
                                  np.asarray(r16.fin_tokens)[m16])
