"""Evaluation harness: manifest-level CER aggregation + mode comparison."""

import numpy as np
import pytest

import jax

from chinese_asr_tpu.config import Config
from chinese_asr_tpu.data import audio_io, dataset
from chinese_asr_tpu.evaluate import compare_modes, evaluate_manifest
from chinese_asr_tpu.models import las
from chinese_asr_tpu.vocab import Vocab

SMALL = (Config()
         .with_("encoder", hidden_size=16, num_layers=2)
         .with_("decoder", hidden_size=32, embed_dim=12)
         .with_("attention", attn_size=8)
         .with_("vocab", max_num_words=8)
         .with_("decode", max_len=6)
         .with_("train", eval_batch_size=2))


@pytest.fixture()
def corpus(tmp_path):
    rng = np.random.RandomState(0)
    texts = ["abcd", "efgh", "abef"]
    utts = []
    for i, t in enumerate(texts):
        p = str(tmp_path / f"u{i}.wav")
        audio_io.write_wav(p, (0.1 * rng.randn(4000)).astype(np.float32))
        utts.append(dataset.Utterance(p, t))
    mpath = str(tmp_path / "m.tsv")
    dataset.write_manifest(mpath, utts)
    return mpath, Vocab.build(texts, max_num_words=8)


def test_evaluate_manifest(corpus):
    mpath, vocab = corpus
    params = las.init_params(jax.random.PRNGKey(0), SMALL)
    res = evaluate_manifest(params, SMALL, vocab, mpath, verbose=False)
    assert res["n"] == 3
    assert np.isfinite(res["cer"]) and res["cer"] > 0  # random weights
    assert len(res["pred"]) == len(res["ref"]) == 3
    assert res["ref"][0] == "abcd"


def test_compare_modes(corpus):
    mpath, vocab = corpus
    params = las.init_params(jax.random.PRNGKey(0), SMALL)
    out = compare_modes(params, SMALL, vocab, mpath, beam_widths=(2,))
    assert set(out) == {"greedy", "beam2"}
    for v in out.values():
        assert v["n"] == 3 and np.isfinite(v["cer"])


def test_evaluate_manifest_second_pass_device_matches_host(corpus, tmp_path):
    """lm_mode="second" (device rescore, the default) == "second_host"
    (C++ oracle) through the manifest harness."""
    import sys
    sys.path.insert(0, "tests")
    from test_lm_fused import random_trigram_arpa

    from chinese_asr_tpu.lm import ngram
    mpath, vocab = corpus
    rng = np.random.RandomState(4)
    arpa = random_trigram_arpa(tmp_path, rng, 4)
    params = las.init_params(jax.random.PRNGKey(2), SMALL)
    dev = evaluate_manifest(params, SMALL, vocab, mpath, bw=2, lm=arpa,
                            lm_mode="second", verbose=False)
    host = evaluate_manifest(params, SMALL, vocab, mpath, bw=2,
                             lm=ngram.load_lm(arpa),
                             lm_mode="second_host", verbose=False)
    assert dev["pred"] == host["pred"]
    assert dev["cer"] == pytest.approx(host["cer"], abs=1e-9)


def test_evaluate_manifest_lm_first_pass(corpus, tmp_path):
    """lm_mode="first" drives the fused on-device-LM decode end to end
    (manifest -> loader -> lm_fused -> CER), accepting an ARPA path."""
    mpath, vocab = corpus
    lines = ["\\data\\", "ngram 1=11", "", "\\1-grams:",
             "-9.0\t<unk>", "-9.0\t<s>", "-0.4\t</s>", "-0.2\ta"]
    for ch in "bcdefgh":
        lines.append(f"-3.0\t{ch}")
    lines += ["", "\\end\\", ""]
    arpa = str(tmp_path / "uni.arpa")
    with open(arpa, "w") as f:
        f.write("\n".join(lines))
    params = las.init_params(jax.random.PRNGKey(0), SMALL)
    res = evaluate_manifest(params, SMALL, vocab, mpath, bw=2, lm=arpa,
                            lm_mode="first", topn=12, verbose=False)
    assert res["n"] == 3
    assert np.isfinite(res["cer"])
    # the LM dominates with random acoustic weights: eos is the runner-up
    # everywhere, so every sample harvests a finished hypothesis of "a"s
    assert all(set(p) <= {"a"} for p in res["pred"])
