"""On-device second-pass LM rescore vs the host rescorers.

`decode/rescore.py` must reproduce `beam.finalize_beam(second_pass=True)`
— the reference's ``logp + w_lm*lm.score(' '.join(chars), bos=True) +
w_len*len`` argmax (model.py:749-763) — with the LM resident on device:
same winners, raw scores equal to f32, same live fallback, on random
pruned ARPAs of orders 2-5 in both key layouts (tuple-keyed from_arpa
and hashed from_lm)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chinese_asr_tpu.decode import beam, rescore
from chinese_asr_tpu.lm import ngram
from chinese_asr_tpu.lm.device_ngram import DeviceNgramLM
from chinese_asr_tpu.models import las
from test_lm import _random_arpa
from test_lm_fused import SMALL, inputs, make_vocab, random_trigram_arpa


def _build(path, layout):
    if layout == "tuple":
        return DeviceNgramLM.from_arpa(path)
    lm = ngram.NgramLM(path)
    if lm._py is not None:
        pytest.skip("hashed layout needs the C++ LM kernel")
    return DeviceNgramLM.from_lm(lm)


@pytest.mark.parametrize("layout", ["tuple", "hashed"])
def test_score_sequences_matches_host_scorer(tmp_path, layout):
    """Full-sentence device scores == PyNgramLM.score(bos=True, eos=True)
    on random sentences (incl. empty), orders 2-5 — the 5-gram is the
    reference's shipped artifact class (gpd.py:121)."""
    rng = np.random.RandomState(5)
    for idx, order in enumerate([None, None, 4, 5]):
        path, vocab_w = _random_arpa(
            tmp_path, rng, idx, order=order,
            nvocab=None if order is None else 30,
            n_per_order=None if order is None else 150)
        py = ngram.PyNgramLM(path)
        dlm = _build(path, layout)
        bos, eos = (int(x) for x in dlm.word_ids(["<s>", "</s>"]))
        words = vocab_w + ["oovword", "<unk>"]
        Q, T = 7, 6
        lens = rng.randint(0, T + 1, Q).astype(np.int32)
        lens[0] = 0                                     # empty hypothesis
        sents = [[str(rng.choice(words)) for _ in range(T)]
                 for _ in range(Q)]
        mapped = [[py._vocab_map(w) for w in s] for s in sents]
        toks = np.stack([dlm.word_ids(m) for m in mapped]).astype(np.int32)
        got = np.asarray(rescore.score_sequences(
            dlm, jnp.asarray(toks), jnp.asarray(lens), bos, eos))
        for q in range(Q):
            want = py.score(" ".join(sents[q][: lens[q]]), bos=True,
                            eos=True)
            assert got[q] == pytest.approx(want, abs=2e-4), \
                (idx, order, q, sents[q][: lens[q]])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rescore_select_matches_host_finalize(tmp_path, seed):
    """End-to-end: beam decode -> compact -> device rescore+select ==
    finalize_beam(second_pass=True) on the same result (winner tokens,
    raw scores, live fallback)."""
    rng = np.random.RandomState(40 + seed)
    cfg = SMALL
    vocab = make_vocab()
    path = random_trigram_arpa(tmp_path, rng, seed)
    lm = ngram.NgramLM(path)
    dlm = _build(path, "tuple" if lm._py is not None else "hashed")
    tok2lm = jnp.asarray(dlm.token_id_table(vocab))
    bos, eos = (int(x) for x in dlm.word_ids(["<s>", "</s>"]))
    params = las.init_params(jax.random.PRNGKey(seed), cfg)
    feats, lens = inputs(cfg, seed=seed, B=4)
    res = beam.beam_decode(params, cfg, 3, feats, lens)
    compact = beam.compact_nbest(res, bucket=4)
    host = beam.finalize_beam(
        compact, cfg, vocab, lm_model=lm, second_pass=True,
        lm_weight=cfg.decode.lm_weight,
        length_weight=cfg.decode.length_weight)
    best = rescore.rescore_select_jit(
        compact, dlm, tok2lm, cfg.decode.lm_weight,
        cfg.decode.length_weight, bos, eos)
    dev = beam.finalize_best(best, vocab)
    assert dev.pred_text == host.pred_text
    np.testing.assert_allclose(dev.score, host.score, atol=2e-4)


@pytest.mark.parametrize("seed", [0, 1])
def test_tracked_rescore_matches_host_and_posthoc(tmp_path, seed):
    """The fully-fused path (beam_decode(lm_track=...) + select in one
    program) == the host oracle == the post-hoc compact+rescore path,
    and the passive LM track leaves the acoustic decode bit-identical."""
    rng = np.random.RandomState(60 + seed)
    cfg = SMALL
    vocab = make_vocab()
    path = random_trigram_arpa(tmp_path, rng, 60 + seed)
    lm = ngram.NgramLM(path)
    dlm = _build(path, "tuple" if lm._py is not None else "hashed")
    tok2lm = jnp.asarray(dlm.token_id_table(vocab))
    bos, eos = (int(x) for x in dlm.word_ids(["<s>", "</s>"]))
    params = las.init_params(jax.random.PRNGKey(seed), cfg)
    feats, lens = inputs(cfg, seed=seed, B=4)
    w_lm, w_len = cfg.decode.lm_weight, cfg.decode.length_weight

    res = beam.beam_decode(params, cfg, 3, feats, lens)
    res_t, fin_lm = beam.beam_decode(params, cfg, 3, feats, lens,
                                     lm_track=(dlm, tok2lm, bos, eos))
    np.testing.assert_array_equal(np.asarray(res.fin_tokens),
                                  np.asarray(res_t.fin_tokens))
    np.testing.assert_array_equal(np.asarray(res.fin_scores),
                                  np.asarray(res_t.fin_scores))
    np.testing.assert_array_equal(np.asarray(res.live_tokens),
                                  np.asarray(res_t.live_tokens))

    best = rescore.beam_rescored_best_jit(params, cfg, 3, feats, lens,
                                          dlm, tok2lm, w_lm, w_len, bos,
                                          eos)
    dev = beam.finalize_best(best, vocab)
    host = beam.finalize_beam(
        beam.compact_nbest(res, bucket=4), cfg, vocab, lm_model=lm,
        second_pass=True, lm_weight=w_lm, length_weight=w_len)
    assert dev.pred_text == host.pred_text
    np.testing.assert_allclose(dev.score, host.score, atol=2e-4)

    posthoc = beam.finalize_best(rescore.rescore_select_jit(
        beam.compact_nbest(res, bucket=4), dlm, tok2lm, w_lm, w_len,
        bos, eos), vocab)
    assert dev.pred_text == posthoc.pred_text
    np.testing.assert_allclose(dev.score, posthoc.score, atol=2e-4)


def test_rescore_crafted_buffers_incl_len0_and_fallback(tmp_path):
    """Synthetic BeamResult exercising what random decodes may miss: a
    length-0 finished hypothesis (scored as just </s> after <s>), LM
    deciding against the raw-logp leader, and a sample with NO finished
    hypothesis (live fallback with the length bonus)."""
    rng = np.random.RandomState(9)
    cfg = SMALL
    vocab = make_vocab()
    path = random_trigram_arpa(tmp_path, rng, 77)
    lm = ngram.NgramLM(path)
    dlm = _build(path, "tuple" if lm._py is not None else "hashed")
    tok2lm = jnp.asarray(dlm.token_id_table(vocab))
    bos, eos = (int(x) for x in dlm.word_ids(["<s>", "</s>"]))
    B, cap, T, k = 2, 4, cfg.decode.max_len, 2
    fin_tokens = np.zeros((B, cap, T), np.int16)
    fin_tokens[0, 1, :2] = [4, 5]
    fin_tokens[0, 2, :3] = [6, 4, 7]
    fin_lens = np.zeros((B, cap), np.int32)
    fin_lens[0] = [0, 2, 3, 0]
    fin_scores = np.full((B, cap), -np.inf, np.float32)
    fin_scores[0, :3] = [-1.0, -0.5, -0.55]     # raw leader is slot 1
    live_tokens = rng.randint(4, 8, (B, k, T)).astype(np.int16)
    live_scores = np.array([[-2.0, -1.0], [-3.0, -0.25]], np.float32)
    res = beam.BeamResult(
        fin_tokens=jnp.asarray(fin_tokens),
        fin_lens=jnp.asarray(fin_lens),
        fin_scores=jnp.asarray(fin_scores),
        fin_count=jnp.asarray(np.array([3, 0], np.int32)),
        live_tokens=jnp.asarray(live_tokens),
        live_scores=jnp.asarray(live_scores),
        l_final=jnp.int32(T - 2))
    host = beam.finalize_beam(
        res, cfg, vocab, lm_model=lm, second_pass=True,
        lm_weight=cfg.decode.lm_weight,
        length_weight=cfg.decode.length_weight)
    best = rescore.rescore_select_jit(
        res, dlm, tok2lm, cfg.decode.lm_weight,
        cfg.decode.length_weight, bos, eos)
    dev = beam.finalize_best(best, vocab)
    assert not bool(best.finished[1])           # sample 1: live fallback
    assert dev.pred_text == host.pred_text
    np.testing.assert_allclose(dev.score, host.score, atol=2e-4)


def test_api_device_second_pass_matches_host_mode(tmp_path):
    """ASR(lm_mode="second") (device rescore, the default) produces the
    same transcripts as ASR(lm_mode="second_host") (C++ oracle) through
    the full wav->text product path."""
    from chinese_asr_tpu.api import ASR, _identity_vocab
    rng = np.random.RandomState(3)
    vocab = _identity_vocab(SMALL.vocab.vocab_size)
    words = [vocab.int2word[i] for i in range(4, SMALL.vocab.vocab_size)]
    lines = (["\\data\\", f"ngram 1={len(words) + 3}", "", "\\1-grams:",
              "-2.5\t<unk>", "-2.0\t<s>", "-0.9\t</s>"]
             + [f"{-0.5 - 0.07 * i}\t{w}" for i, w in enumerate(words)]
             + ["", "\\end\\", ""])
    arpa = tmp_path / "uni.arpa"
    arpa.write_text("\n".join(lines))
    wavs = [(rng.randn(4800) * 4000).clip(-32768, 32767).astype(np.int16)
            for _ in range(3)]
    dev = ASR(cfg=SMALL, bw=3, lm_path=str(arpa), lm_mode="second",
              wav_bucket=4800)
    host = ASR(cfg=SMALL, bw=3, lm_path=str(arpa), lm_mode="second_host",
               wav_bucket=4800)
    assert dev.dlm is not None and dev.lm is None
    assert host.lm is not None and host.dlm is None
    assert dev.transcribe_wavs(wavs) == host.transcribe_wavs(wavs)
