"""Greedy decode: the compiled while_loop must reproduce an independent
step-by-step numpy implementation of the reference semantics
(model.py:503-602), including the eos score bookkeeping and early stop."""

import numpy as np
import pytest

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


def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def numpy_decoder_step(params, cfg, mask, keys, values, token, cell_state, ahs):
    """Independent numpy re-derivation of one decoder step."""
    dec = jax.tree_util.tree_map(np.asarray, params["decoder"])
    att = jax.tree_util.tree_map(np.asarray, params["attention"])
    x = dec["embedding"][token]
    if ahs is None:
        ahs = np.zeros((x.shape[0], values.shape[-1]), np.float32)
    x = np.concatenate([x, ahs], axis=1)
    new_states = []
    for i, p in enumerate(dec["cells"]):
        h, c = cell_state[i]
        gates = x @ p["w_ih"] + h @ p["w_hh"] + p["b_ih"] + p["b_hh"]
        H = p["w_hh"].shape[0]
        ii, f, g, o = [gates[:, k * H:(k + 1) * H] for k in range(4)]
        c2 = np_sigmoid(f) * c + np_sigmoid(ii) * np.tanh(g)
        h2 = np_sigmoid(o) * np.tanh(c2)
        new_states.append((h2, c2))
        x = h2
    last_h = new_states[-1][0]
    e = (np.tanh(keys + (last_h @ att["w_hidden"])[:, None, :]) * att["v"]).sum(-1)
    s = mask + e
    s = s - s.max(axis=1, keepdims=True)
    al = np.exp(s)
    al = al / al.sum(axis=1, keepdims=True)
    context = (al[..., None] * values).sum(axis=1)
    logit = np.concatenate([last_h, context], axis=-1) @ dec["proj_w"] + dec["proj_b"]
    return logit, context, new_states


def numpy_greedy(params, cfg, feats, feat_lens):
    """Reference greedy loop re-derived in numpy on top of the (already
    differentially-tested) jax encoder prologue."""
    eb = las.encode(params, cfg, jnp.asarray(feats), jnp.asarray(feat_lens))
    mask = np.asarray(eb.mask)
    keys, values = np.asarray(eb.keys), np.asarray(eb.values)
    cell_state = [(np.asarray(s[0]), np.asarray(s[1])) for s in eb.init_cell_state]
    B = feats.shape[0]
    tokens = np.full((B,), cfg.vocab.sos, np.int64)
    ahs = None
    finished = np.zeros(B, bool)
    final_lens = np.zeros(B, np.int32)
    accum = np.zeros(B, np.float32)
    outs = []
    for l in range(cfg.decode.max_len):
        logit, ahs, cell_state = numpy_decoder_step(
            params, cfg, mask, keys, values, tokens, cell_state, ahs)
        logp = logit - np.log(np.exp(logit - logit.max(1, keepdims=True)).sum(1, keepdims=True)) - logit.max(1, keepdims=True)
        tokens = logp.argmax(axis=1)
        lp = logp[np.arange(B), tokens]
        outs.append(tokens.copy())
        cur = tokens == cfg.vocab.eos
        accum += np.where(~finished & cur, lp, 0.0)
        finished |= cur
        final_lens += (~finished).astype(np.int32)
        accum += np.where(~finished, lp, 0.0)
        if finished.all():
            break
    return np.stack(outs, 1), final_lens, accum, finished


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
    ref_out, ref_lens, ref_accum, ref_fin = numpy_greedy(params, cfg, feats, lens)

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
