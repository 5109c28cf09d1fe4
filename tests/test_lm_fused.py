"""Fused (on-device LM) first-pass decode vs the host-driven loop.

The fused path (`decode/lm_fused.py` + `lm/device_ngram.py`) must
reproduce `decode/lm_first_pass.py`'s n-best lists — same token
sequences, same harvest multiplicity, scores equal to f32 — on LMs that
exercise backoff (trigram with pruned holes), eos harvest timing, and
the early-stop rule."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chinese_asr_tpu.config import Config
from chinese_asr_tpu.decode import beam, lm_first_pass, lm_fused
from chinese_asr_tpu.lm import ngram
from chinese_asr_tpu.lm.device_ngram import DeviceNgramLM
from chinese_asr_tpu.models import las
from chinese_asr_tpu.vocab import Vocab

SMALL = (Config()
         .with_("audio", n_mels=8, delta_delta=False, downsample=False)
         .with_("encoder", hidden_size=16, num_layers=2)
         .with_("decoder", hidden_size=32, embed_dim=12)
         .with_("attention", attn_size=8)
         .with_("vocab", max_num_words=8)
         .with_("decode", max_len=5))


def make_vocab():
    return Vocab.build(["abcdefgh" * 3], max_num_words=8)


def inputs(cfg, seed=0, B=2, T=7):
    rng = np.random.RandomState(seed)
    x = rng.randn(B, T, cfg.audio.feat_dim).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(np.full(B, T, np.int32))


def random_trigram_arpa(tmp_path, rng, idx):
    """Random trigram LM over the letter vocab, with pruned holes and
    eos mass so harvesting happens at staggered steps."""
    letters = list("abcdefgh")

    def lp(lo=-4.0, hi=-0.05):
        return round(float(rng.uniform(lo, hi)), 4)

    uni = [f"{lp()}\t<unk>", f"{lp()}\t<s>\t{lp(-1, -0.1)}",
           f"{lp(-2.0, -0.3)}\t</s>"]
    for ch in letters:
        bo = f"\t{lp(-1, -0.1)}" if rng.rand() < 0.8 else ""
        uni.append(f"{lp()}\t{ch}{bo}")
    bi, seen2 = [], set()
    toks = letters + ["<s>"]
    for _ in range(20):
        a = str(rng.choice(toks))
        b = str(rng.choice(letters + ["</s>"]))
        if (a, b) in seen2:
            continue
        seen2.add((a, b))
        bo = f"\t{lp(-1, -0.1)}" if rng.rand() < 0.7 else ""
        bi.append(f"{lp()}\t{a} {b}{bo}")
    tri, seen3 = [], set()
    for _ in range(15):
        a = str(rng.choice(toks))
        b = str(rng.choice(letters))
        c = str(rng.choice(letters + ["</s>"]))
        if (a, b, c) in seen3:
            continue
        seen3.add((a, b, c))
        tri.append(f"{lp()}\t{a} {b} {c}")
    lines = (["\\data\\", f"ngram 1={len(uni)}", f"ngram 2={len(bi)}",
              f"ngram 3={len(tri)}", "", "\\1-grams:"] + uni
             + ["", "\\2-grams:"] + bi + ["", "\\3-grams:"] + tri
             + ["", "\\end\\", ""])
    p = tmp_path / f"tri{idx}.arpa"
    p.write_text("\n".join(lines))
    return str(p)


def assert_nbest_equal(host, fused, abs_tol=2e-4):
    assert len(host) == len(fused)
    for hh, hf in zip(host, fused):
        assert [ids for ids, _ in hh] == [ids for ids, _ in hf]
        for (_, sh), (_, sf) in zip(hh, hf):
            assert sh == pytest.approx(sf, abs=abs_tol)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fused_matches_host_on_random_trigrams(tmp_path, seed):
    rng = np.random.RandomState(100 + seed)
    cfg = SMALL
    vocab = make_vocab()
    path = random_trigram_arpa(tmp_path, rng, seed)
    lm = ngram.NgramLM(path)
    dlm = DeviceNgramLM.from_arpa(path)
    tok2lm = jnp.asarray(dlm.token_id_table(vocab))
    params = las.init_params(jax.random.PRNGKey(seed), cfg)
    feats, lens = inputs(cfg, seed=seed, B=3)
    host = lm_first_pass.lm_first_pass_decode(
        params, cfg, 2, feats, lens, lm, vocab, topn=6)
    res = lm_fused.lm_fused_decode(params, cfg, 2, feats, lens, dlm,
                                   tok2lm, topn=6)
    assert_nbest_equal(host, lm_fused.nbest_lists(res))
    if seed == 0:
        # the A/B twin (tools/lm_fused_ab.py) must stay host-equal too
        leg = lm_fused.lm_fused_decode(params, cfg, 2, feats, lens, dlm,
                                       tok2lm, topn=6, legacy_select=True)
        assert_nbest_equal(host, lm_fused.nbest_lists(leg))


def test_fused_matches_host_wider_beam(tmp_path):
    """bw=4, topn=8: more pool ties, deeper survivor bookkeeping."""
    rng = np.random.RandomState(7)
    cfg = SMALL
    vocab = make_vocab()
    path = random_trigram_arpa(tmp_path, rng, 9)
    lm = ngram.NgramLM(path)
    dlm = DeviceNgramLM.from_arpa(path)
    tok2lm = jnp.asarray(dlm.token_id_table(vocab))
    params = las.init_params(jax.random.PRNGKey(9), cfg)
    feats, lens = inputs(cfg, seed=9, B=2)
    host = lm_first_pass.lm_first_pass_decode(
        params, cfg, 4, feats, lens, lm, vocab, topn=8)
    res = lm_fused.lm_fused_decode_jit(params, cfg, 4, feats, lens, dlm,
                                       tok2lm, topn=8)
    assert_nbest_equal(host, lm_fused.nbest_lists(res))


def test_fused_result_is_beamresult_contract(tmp_path):
    """The fused decode returns the packed BeamResult contract, so
    select_best / compact_nbest work unchanged."""
    rng = np.random.RandomState(3)
    cfg = SMALL
    vocab = make_vocab()
    path = random_trigram_arpa(tmp_path, rng, 30)
    dlm = DeviceNgramLM.from_arpa(path)
    tok2lm = jnp.asarray(dlm.token_id_table(vocab))
    params = las.init_params(jax.random.PRNGKey(3), cfg)
    feats, lens = inputs(cfg, seed=3, B=2)
    res = lm_fused.lm_fused_decode(params, cfg, 2, feats, lens, dlm,
                                   tok2lm, topn=6)
    best = beam.select_best(res, cfg.decode.length_weight)
    assert best.tokens.shape == (2, cfg.decode.max_len)
    compact = beam.compact_nbest(res, bucket=4)
    assert compact.fin_tokens.shape[1] <= res.fin_tokens.shape[1]


def test_select_best_first_pass_matches_nbest_top(tmp_path):
    """Device-side winner selection == nbest_lists(...)[b][0] (the row
    the product path consumes), including the live-beam-0 fallback when
    nothing finished."""
    rng = np.random.RandomState(8)
    cfg = SMALL
    vocab = make_vocab()
    path = random_trigram_arpa(tmp_path, rng, 90)
    dlm = DeviceNgramLM.from_arpa(path)
    tok2lm = jnp.asarray(dlm.token_id_table(vocab))
    params = las.init_params(jax.random.PRNGKey(8), cfg)
    feats, lens = inputs(cfg, seed=8, B=4)
    res = lm_fused.lm_fused_decode(params, cfg, 3, feats, lens, dlm,
                                   tok2lm, topn=6)
    for r in (res,
              # forced never-finished: the live beam-0 fallback path
              res._replace(fin_scores=jnp.full_like(res.fin_scores,
                                                    -jnp.inf),
                           fin_count=jnp.zeros_like(res.fin_count))):
        nb = lm_fused.nbest_lists(r)
        best = lm_fused.select_best_first_pass(r)
        toks = np.asarray(best.tokens)
        blens = np.asarray(best.lens)
        scores = np.asarray(best.scores)
        for b in range(4):
            want_ids, want_sc = nb[b][0]
            assert toks[b, : blens[b]].tolist() == want_ids, b
            assert float(scores[b]) == pytest.approx(want_sc, abs=1e-4)


def test_fused_jit_cached_across_calls(tmp_path):
    """The whole decode is ONE jitted program, cached per
    (cfg, bw, topn): a second call with fresh inputs triggers zero new
    traces (the host loop's per-step dispatch cost is what this path
    exists to remove)."""
    rng = np.random.RandomState(5)
    cfg = SMALL
    vocab = make_vocab()
    path = random_trigram_arpa(tmp_path, rng, 50)
    dlm = DeviceNgramLM.from_arpa(path)
    tok2lm = jnp.asarray(dlm.token_id_table(vocab))
    params = las.init_params(jax.random.PRNGKey(5), cfg)
    feats, lens = inputs(cfg, seed=5)
    r1 = lm_fused.lm_fused_decode_jit(params, cfg, 2, feats, lens, dlm,
                                      tok2lm, topn=6)
    fn = lm_fused._jitted(cfg, 2, 6, False, None)
    misses0 = fn._cache_size()
    feats2, lens2 = inputs(cfg, seed=6)
    r2 = lm_fused.lm_fused_decode_jit(params, cfg, 2, feats2, lens2, dlm,
                                      tok2lm, topn=6)
    assert fn._cache_size() == misses0
    assert r1.fin_tokens.shape == r2.fin_tokens.shape


def test_fused_matches_host_on_5gram(tmp_path):
    """The fused decode at the reference artifact's ORDER (a pruned
    5-gram, gpd.py:121): the order-5 context window, its validity
    masks, and the 4-deep hash/backoff chains must still reproduce the
    host loop's n-best exactly."""
    from test_lm import _random_arpa
    rng = np.random.RandomState(61)
    cfg = SMALL
    vocab = make_vocab()
    # 5-gram over the letter vocab so acoustic tokens hit real grams
    letters = list("abcdefgh")

    def lp():
        return round(float(rng.uniform(-4.0, -0.05)), 4)

    grams = {1: [f"{lp()}\t<unk>", f"{lp()}\t<s>\t{lp()}",
                 f"{lp()}\t</s>"]
             + [f"{lp()}\t{ch}\t{lp()}" for ch in letters]}
    for o in range(2, 6):
        seen, rows = set(), []
        for _ in range(60):
            key = tuple([str(rng.choice(["<s>"] + letters))]
                        + [str(rng.choice(letters)) for _ in range(o - 2)]
                        + [str(rng.choice(letters + ["</s>"]))])
            if key in seen:
                continue
            seen.add(key)
            bo = f"\t{lp()}" if o < 5 and rng.rand() < 0.7 else ""
            rows.append(f"{lp()}\t{' '.join(key)}{bo}")
        grams[o] = rows
    lines = ["\\data\\"] + [f"ngram {o}={len(grams[o])}"
                            for o in range(1, 6)] + [""]
    for o in range(1, 6):
        lines += [f"\\{o}-grams:"] + grams[o] + [""]
    lines += ["\\end\\", ""]
    path = tmp_path / "five.arpa"
    path.write_text("\n".join(lines))
    lm = ngram.NgramLM(str(path))
    dlm = DeviceNgramLM.from_arpa(str(path))
    assert dlm.order == 5
    tok2lm = jnp.asarray(dlm.token_id_table(vocab))
    params = las.init_params(jax.random.PRNGKey(61), cfg)
    feats, lens = inputs(cfg, seed=61, B=3)
    host = lm_first_pass.lm_first_pass_decode(
        params, cfg, 2, feats, lens, lm, vocab, topn=6)
    res = lm_fused.lm_fused_decode(params, cfg, 2, feats, lens, dlm,
                                   tok2lm, topn=6)
    assert_nbest_equal(host, lm_fused.nbest_lists(res))


def test_fused_from_klm_binary_matches_arpa_build(tmp_path):
    """A probing .klm-built device LM drives the fused decode to the
    same n-best as the ARPA-built one (the reference ships its LM as a
    PROBING binary, main.py:126)."""
    rng = np.random.RandomState(21)
    cfg = SMALL
    vocab = make_vocab()
    path = random_trigram_arpa(tmp_path, rng, 70)
    host = ngram.NgramLM(path)
    blob = str(tmp_path / "m.klm")
    host.write_binary(blob)
    dlm_a = DeviceNgramLM.from_arpa(path)
    dlm_k = DeviceNgramLM.from_path(blob)
    assert dlm_k.hashed and not dlm_a.hashed
    params = las.init_params(jax.random.PRNGKey(21), cfg)
    feats, lens = inputs(cfg, seed=21, B=2)
    res_a = lm_fused.lm_fused_decode(
        params, cfg, 2, feats, lens, dlm_a,
        jnp.asarray(dlm_a.token_id_table(vocab)), topn=6)
    res_k = lm_fused.lm_fused_decode(
        params, cfg, 2, feats, lens, dlm_k,
        jnp.asarray(dlm_k.token_id_table(vocab)), topn=6)
    assert_nbest_equal(lm_fused.nbest_lists(res_a),
                       lm_fused.nbest_lists(res_k))
