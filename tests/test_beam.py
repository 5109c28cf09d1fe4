"""Beam search: the compiled while_loop must reproduce the independent
tiled numpy implementation of the reference semantics (model.py:604-987) —
same n-best sets, same survivors, same early stop — at several beam widths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chinese_asr_tpu.config import Config
from chinese_asr_tpu.decode import beam, greedy
from chinese_asr_tpu.vocab import Vocab
from chinese_asr_tpu.models import las

import ref_numpy


SMALL = (Config()
         .with_("audio", n_mels=8, delta_delta=False, downsample=False)
         .with_("encoder", hidden_size=16, num_layers=2)
         .with_("decoder", hidden_size=32, embed_dim=12)
         .with_("attention", attn_size=8)
         .with_("vocab", max_num_words=20)
         .with_("decode", max_len=10))


def make_inputs(cfg, seed, B=3, T=9):
    rng = np.random.RandomState(seed)
    feats = rng.randn(B, T, cfg.audio.feat_dim).astype(np.float32)
    lens = np.array([T, T - 3, T - 1][:B], np.int32)
    for i, l in enumerate(lens):
        feats[i, l:] = 0.0
    return feats, lens


def collect_jax_nbest(res):
    out = {}
    fin_count = np.asarray(res.fin_count)
    fin_tokens = np.asarray(res.fin_tokens)
    fin_lens = np.asarray(res.fin_lens)
    fin_scores = np.asarray(res.fin_scores)
    for b in range(fin_count.shape[0]):
        valid = np.nonzero(np.isfinite(fin_scores[b]))[0]
        assert len(valid) == int(fin_count[b])
        out[b] = [(fin_tokens[b, i, : fin_lens[b, i]].tolist(),
                   float(fin_scores[b, i]))
                  for i in valid]
    return out


@pytest.mark.parametrize("bw,seed", [(2, 0), (4, 1), (4, 2), (8, 3)])
def test_beam_matches_numpy_reference(bw, seed):
    cfg = SMALL
    params = las.init_params(jax.random.PRNGKey(seed), cfg)
    feats, lens = make_inputs(cfg, seed)

    res = beam.beam_decode_jit(params, cfg, bw, jnp.asarray(feats), jnp.asarray(lens))
    ref_fin, ref_hist, ref_scores, ref_l = ref_numpy.numpy_beam(
        params, cfg, bw, feats, lens)

    got_fin = collect_jax_nbest(res)
    B = feats.shape[0]
    assert int(res.l_final) == ref_l
    for b in range(B):
        ref_h = ref_fin.get(b, [])
        got_h = got_fin[b]
        assert len(got_h) == len(ref_h), (b, got_h, ref_h)
        for (gt, gs), (rt, rs) in zip(got_h, ref_h):
            assert gt == rt
            assert abs(gs - rs) < 1e-3

    # live beams match (only checked when the loop ran to exhaustion;
    # on early stop the reference keeps pre-update state, as do we)
    live = np.asarray(res.live_tokens).reshape(B * bw, -1)
    np.testing.assert_array_equal(live[:, :ref_l + 1],
                                  ref_hist[:, 1:ref_l + 2])
    np.testing.assert_allclose(np.asarray(res.live_scores).reshape(-1),
                               ref_scores, atol=1e-3)


def test_beam_width1_matches_greedy_text():
    cfg = SMALL
    params = las.init_params(jax.random.PRNGKey(5), cfg)
    feats, lens = make_inputs(cfg, 5)
    vocab = Vocab.build(["abcdefghijklmnopqrst"], max_num_words=cfg.vocab.max_num_words)

    g = greedy.greedy_decode_jit(params, cfg, jnp.asarray(feats), jnp.asarray(lens))
    g_out = greedy.finalize_greedy(g, vocab)
    b = beam.beam_decode_jit(params, cfg, 1, jnp.asarray(feats), jnp.asarray(lens))
    b_out = beam.finalize_beam(b, cfg, vocab)
    assert b_out.pred_text == g_out.pred_text


def test_second_pass_rescoring_selects_lm_favorite():
    """Second-pass selection: logp + w*lm + w*len argmax (model.py:749-763)."""
    cfg = SMALL
    params = las.init_params(jax.random.PRNGKey(7), cfg)
    feats, lens = make_inputs(cfg, 7)
    vocab = Vocab.build(["abcdefghijklmnopqrst"], max_num_words=cfg.vocab.max_num_words)
    res = beam.beam_decode_jit(params, cfg, 4, jnp.asarray(feats), jnp.asarray(lens))

    class FavorLong:
        def score(self, s, bos=True):
            return float(len(s.split()))  # longer hypothesis -> higher lm

    base = beam.finalize_beam(res, cfg, vocab)
    resc = beam.finalize_beam(res, cfg, vocab, lm_model=FavorLong(),
                              second_pass=True, lm_weight=100.0, length_weight=0.0)
    fin = collect_jax_nbest(res)
    for b_i in range(len(resc.pred_text)):
        hyps = fin[b_i]
        if len(hyps) > 1:
            best_len = max(len(h[0]) for h in hyps)
            # among longest hyps the rescorer must pick by logp + lm
            assert len(resc.pred_text[b_i]) == best_len
    assert base.n == resc.n


@pytest.mark.parametrize("seed", range(10))
def test_beam_fuzz_random_configs(seed):
    """Property fuzz: random (B, bw, T, vocab) against the independent
    numpy implementation."""
    rng = np.random.RandomState(100 + seed)
    bw = int(rng.choice([1, 2, 3, 5, 8]))
    B = int(rng.randint(1, 4))
    T = int(rng.randint(4, 12))
    V = int(rng.choice([12, 20, 33]))
    cfg = (Config()
           .with_("audio", n_mels=8, delta_delta=False, downsample=False)
           .with_("encoder", hidden_size=8, num_layers=1,
                  bidirectional=bool(rng.randint(2)))
           .with_("decoder", hidden_size=16, embed_dim=8)
           .with_("attention", attn_size=8)
           .with_("vocab", max_num_words=V - 4)
           .with_("decode", max_len=int(rng.randint(3, 9))))
    params = las.init_params(jax.random.PRNGKey(seed), cfg)
    feats = rng.randn(B, T, cfg.audio.feat_dim).astype(np.float32)
    lens = rng.randint(1, T + 1, size=B).astype(np.int32)
    lens[0] = T
    for i, l in enumerate(lens):
        feats[i, l:] = 0.0

    res = beam.beam_decode_jit(params, cfg, bw, jnp.asarray(feats),
                               jnp.asarray(lens))
    ref_fin, ref_hist, ref_scores, ref_l = ref_numpy.numpy_beam(
        params, cfg, bw, feats, lens)
    got_fin = collect_jax_nbest(res)
    assert int(res.l_final) == ref_l, (seed, bw, B, T)
    for b in range(B):
        ref_h = ref_fin.get(b, [])
        got_h = got_fin[b]
        assert len(got_h) == len(ref_h), (seed, b)
        for (gt, gs), (rt, rs) in zip(got_h, ref_h):
            assert gt == rt, (seed, b)
            assert abs(gs - rs) < 1e-3


@pytest.mark.parametrize("bw,seed", [(2, 11), (4, 12), (8, 13)])
def test_select_best_matches_finalize(bw, seed):
    """Device-side select_best must reproduce finalize_beam's no-second-pass
    choice exactly (tokens, scores, ties, and the never-finished live-beam
    fallback)."""
    cfg = SMALL
    params = las.init_params(jax.random.PRNGKey(seed), cfg)
    feats, lens = make_inputs(cfg, seed)
    vocab = Vocab.build(["abcdefghijklmnopqrst"],
                        max_num_words=cfg.vocab.max_num_words)

    res = beam.beam_decode_jit(params, cfg, bw, jnp.asarray(feats),
                               jnp.asarray(lens))
    full = beam.finalize_beam(res, cfg, vocab,
                              length_weight=cfg.decode.length_weight)
    best = beam.beam_decode_best_jit(params, cfg, bw, jnp.asarray(feats),
                                     jnp.asarray(lens))
    fast = beam.finalize_best(best, vocab)
    assert fast.pred_text == full.pred_text
    np.testing.assert_allclose(fast.score, full.score, atol=1e-5)


def test_select_best_live_fallback():
    """A sample whose beam never emits eos must fall back to the best live
    beam with the length-weighted activation score (model.py:961-972)."""
    cfg = SMALL
    params = las.init_params(jax.random.PRNGKey(21), cfg)
    feats, lens = make_inputs(cfg, 21)
    vocab = Vocab.build(["abcdefghijklmnopqrst"],
                        max_num_words=cfg.vocab.max_num_words)
    res = beam.beam_decode_jit(params, cfg, 4, jnp.asarray(feats),
                               jnp.asarray(lens))
    # force the "never finished" path for every sample by erasing the
    # harvested n-best buffers
    res = res._replace(
        fin_scores=jnp.full_like(res.fin_scores, -jnp.inf),
        fin_count=jnp.zeros_like(res.fin_count))
    full = beam.finalize_beam(res, cfg, vocab,
                              length_weight=cfg.decode.length_weight)
    fast = beam.finalize_best(
        beam.select_best(res, cfg.decode.length_weight), vocab)
    assert fast.pred_text == full.pred_text
    np.testing.assert_allclose(fast.score, full.score, atol=1e-5)


def test_second_pass_ids_path_matches_string_path(tmp_path):
    """The zero-string ids rescoring path (token_id_table +
    score_batch_ids) must pick the same hypotheses with the same scores as
    string-based scoring through the pure-Python oracle."""
    from chinese_asr_tpu.lm import ngram

    cfg = SMALL
    params = las.init_params(jax.random.PRNGKey(31), cfg)
    feats, lens = make_inputs(cfg, 31)
    vocab = Vocab.build(["abcdefghijklmnopqrst"],
                        max_num_words=cfg.vocab.max_num_words)
    res = beam.beam_decode_jit(params, cfg, 8, jnp.asarray(feats),
                               jnp.asarray(lens))

    # an ARPA over the actual decode vocabulary so scores differ by word
    rng = np.random.RandomState(0)
    words = [vocab.int2word[i] for i in sorted(vocab.int2word)
             if i >= 4]
    lines = ["\\data\\", f"ngram 1={len(words) + 3}", "", "\\1-grams:",
             "-2.0\t<unk>", "-1.5\t<s>\t-0.3", "-1.1\t</s>"]
    lines += [f"{-0.5 - 2.0 * rng.rand():.4f}\t{w}" for w in words]
    lines += ["", "\\end\\", ""]
    p = tmp_path / "vocab.arpa"
    p.write_text("\n".join(lines))

    lm_cpp = ngram.NgramLM(str(p))
    if lm_cpp._py is not None:
        pytest.skip("C++ toolchain unavailable")
    lm_py = ngram.PyNgramLM(str(p))

    kw = dict(second_pass=True, lm_weight=7.0, length_weight=1.5)
    fast = beam.finalize_beam(res, cfg, vocab, lm_model=lm_cpp, **kw)
    slow = beam.finalize_beam(res, cfg, vocab, lm_model=lm_py, **kw)
    assert fast.pred_text == slow.pred_text
    np.testing.assert_allclose(fast.score, slow.score, atol=1e-9)


def test_second_pass_with_fallback_ngram_lm(tmp_path):
    """NgramLM running on its pure-Python fallback (no C++ toolchain) must
    take the string rescoring path, not crash in the ids path."""
    from chinese_asr_tpu.lm import ngram

    cfg = SMALL
    params = las.init_params(jax.random.PRNGKey(41), cfg)
    feats, lens = make_inputs(cfg, 41)
    vocab = Vocab.build(["abcdefghijklmnopqrst"],
                        max_num_words=cfg.vocab.max_num_words)
    res = beam.beam_decode_jit(params, cfg, 4, jnp.asarray(feats),
                               jnp.asarray(lens))

    p = tmp_path / "t.arpa"
    p.write_text("\\data\\\nngram 1=4\n\n\\1-grams:\n-1.0\t<unk>\n"
                 "-0.5\t<s>\n-0.5\t</s>\n-0.7\ta\n\n\\end\\\n")
    lm = ngram.NgramLM(str(p))
    # force the pure-Python fallback regardless of toolchain availability
    lm._py = ngram.PyNgramLM(str(p))
    lm._h = None
    assert not lm.has_batch_states
    out = beam.finalize_beam(res, cfg, vocab, lm_model=lm, second_pass=True,
                             lm_weight=1.5, length_weight=1.5)
    assert len(out.pred_text) == feats.shape[0]


def test_pallas_env_toggle_retraces(monkeypatch):
    """ADVICE r2: flipping CHINESE_ASR_PALLAS_TOPK after the first decode
    used to silently replay the previously traced kernel choice (the
    lru_cache keyed only on (cfg, bw)).  The backend choice is now part of
    the jit-cache key, so a toggle takes effect on the next call."""
    from chinese_asr_tpu.ops.pallas import topk as pallas_topk

    calls = {"pallas": 0}

    def fake_top_k(x, k, interpret=False):
        calls["pallas"] += 1
        return jax.lax.top_k(x, k)          # same semantics by contract

    monkeypatch.setattr(pallas_topk, "top_k", fake_top_k)
    monkeypatch.setenv("CHINESE_ASR_PALLAS_FUSED", "0")
    cfg = SMALL
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    feats, lens = make_inputs(cfg, 0)
    beam._jitted.cache_clear()

    monkeypatch.setenv("CHINESE_ASR_PALLAS_TOPK", "0")
    r0 = beam.beam_decode_jit(params, cfg, 2, jnp.asarray(feats),
                              jnp.asarray(lens))
    assert calls["pallas"] == 0

    monkeypatch.setenv("CHINESE_ASR_PALLAS_TOPK", "1")
    r1 = beam.beam_decode_jit(params, cfg, 2, jnp.asarray(feats),
                              jnp.asarray(lens))
    assert calls["pallas"] > 0              # toggle took effect
    np.testing.assert_array_equal(np.asarray(r0.fin_scores),
                                  np.asarray(r1.fin_scores))


def test_compact_nbest_preserves_rescoring_winners(tmp_path):
    """Device-side n-best compaction must be lossless: identical winners
    and scores through finalize_beam, with and without a second-pass LM
    (VERDICT r2 item #8)."""
    import sys
    sys.path.insert(0, "tests")
    from test_lm_binary import ARPA_TRI
    from chinese_asr_tpu.lm import ngram

    arpa = tmp_path / "t.arpa"
    arpa.write_text(ARPA_TRI, encoding="utf-8")
    lm = ngram.NgramLM(str(arpa))
    word2int = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3}
    int2word = dict(enumerate(["<pad>", "<s>", "</s>", "<unk>"]))
    for i in range(4, SMALL.vocab.vocab_size):
        # alternate between in-LM words and OOV so rescoring mixes real
        # n-gram hits with <unk> fallbacks
        w = ("a", "b", f"w{i}")[i % 3]
        word2int.setdefault(w, i)
        int2word[i] = w
    vocab = Vocab(word2int, int2word)

    # seed chosen so several samples harvest finished hypotheses
    params = las.init_params(jax.random.PRNGKey(9), SMALL)
    feats, lens = make_inputs(SMALL, 3, B=3)
    res = beam.beam_decode_jit(params, SMALL, 4, jnp.asarray(feats),
                               jnp.asarray(lens))
    assert int(np.asarray(res.fin_count).sum()) > 0, "need finished hyps"
    compact = beam.compact_nbest(res, bucket=4)
    assert compact.fin_scores.shape[1] < res.fin_scores.shape[1]
    np.testing.assert_array_equal(np.asarray(compact.fin_count),
                                  np.asarray(res.fin_count))

    for kw in (dict(), dict(lm_model=lm, second_pass=True, lm_weight=1.5,
                            length_weight=1.5)):
        full = beam.finalize_beam(res, SMALL, vocab, **kw)
        comp = beam.finalize_beam(compact, SMALL, vocab, **kw)
        assert comp.pred_text == full.pred_text
        np.testing.assert_allclose(comp.score, full.score, rtol=1e-6)


@pytest.mark.parametrize("unroll", [2, 3])
def test_unrolled_loop_identical_to_single_step(unroll):
    """Fusing N decode steps per while iteration (the TPU loop-overhead
    lever, PERF.md) must be bit-identical to the single-step loop,
    including the n-best buffers, early-stop point, and live fallbacks —
    on weights that DO trigger the early stop mid-pair."""
    cfg = SMALL
    feats, lens = make_inputs(cfg, 3, B=3)
    for seed in (8, 9):        # seeds with non-empty harvests (incl. odd
        params = las.init_params(jax.random.PRNGKey(seed), cfg)  # l_final)
        r1 = beam.beam_decode(params, cfg, 4, jnp.asarray(feats),
                              jnp.asarray(lens), unroll=1)
        rn = beam.beam_decode(params, cfg, 4, jnp.asarray(feats),
                              jnp.asarray(lens), unroll=unroll)
        for a, b in zip(r1, rn):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("onepass", ["0", "1"])
def test_pallas_topk_in_full_beam_matches_xla(onepass, monkeypatch):
    """The TPU-default stage-1 path (Pallas top-k, grouped extraction,
    both group-phase variants) wired through the FULL beam decode must
    reproduce the XLA approx_max_k path exactly — interpret mode makes
    the kernel runnable on the CPU suite, closing the gap where the
    product default was only ever exercised kernel-level here."""
    import functools
    from chinese_asr_tpu.ops.pallas import topk as pallas_topk
    monkeypatch.setenv("CHINESE_ASR_TOPK_GROUPED", "1")
    monkeypatch.setenv("CHINESE_ASR_TOPK_ONEPASS", onepass)
    monkeypatch.setattr(pallas_topk, "top_k",
                        functools.partial(pallas_topk.top_k,
                                          interpret=True))
    cfg = SMALL
    params = las.init_params(jax.random.PRNGKey(9), cfg)
    feats, lens = make_inputs(cfg, 3, B=3)
    r0 = beam.beam_decode(params, cfg, 4, jnp.asarray(feats),
                          jnp.asarray(lens), use_pallas=False)
    r1 = beam.beam_decode(params, cfg, 4, jnp.asarray(feats),
                          jnp.asarray(lens), use_pallas=True)
    for a, b in zip(r0, r1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_fused_logp_option_matches_default(monkeypatch):
    """The opt-in fused logp+top-k stage (CHINESE_ASR_PALLAS_FUSED) must
    reproduce the default path exactly when both run the same backend
    (interpret mode here; on real TPU only the logsumexp reduction order
    differs — documented in ops/pallas/topk.py)."""
    import functools
    from chinese_asr_tpu.ops.pallas import topk as pallas_topk
    monkeypatch.setattr(pallas_topk, "top_k_fused",
                        functools.partial(pallas_topk.top_k_fused,
                                          interpret=True))
    cfg = SMALL
    params = las.init_params(jax.random.PRNGKey(9), cfg)
    feats, lens = make_inputs(cfg, 3, B=3)
    r0 = beam.beam_decode(params, cfg, 4, jnp.asarray(feats),
                          jnp.asarray(lens), use_pallas=False)
    r1 = beam.beam_decode(params, cfg, 4, jnp.asarray(feats),
                          jnp.asarray(lens), use_pallas=True,
                          fused_logp=True)
    for a, b in zip(r0, r1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
