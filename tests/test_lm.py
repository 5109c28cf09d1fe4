"""N-gram LM: C++ scorer vs pure-Python oracle vs hand-computed backoff
values on a tiny trigram ARPA; batch + incremental APIs."""

import numpy as np
import pytest

from chinese_asr_tpu.lm import ngram

TINY_ARPA = """\\data\\
ngram 1=5
ngram 2=4
ngram 3=2

\\1-grams:
-1.0\t<unk>
-0.8\t<s>\t-0.5
-0.7\t</s>
-0.5\ta\t-0.3
-0.6\tb\t-0.2

\\2-grams:
-0.4\t<s> a\t-0.1
-0.3\ta b\t-0.2
-0.5\tb </s>
-0.9\ta a

\\3-grams:
-0.2\t<s> a b
-0.4\ta b </s>

\\end\\
"""


@pytest.fixture(scope="module")
def arpa_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("lm") / "tiny.arpa"
    p.write_text(TINY_ARPA)
    return str(p)


@pytest.fixture(scope="module")
def lm_cpp(arpa_path):
    lm = ngram.NgramLM(arpa_path)
    assert lm._py is None, "C++ kernel failed to build; fallback in use"
    return lm


@pytest.fixture(scope="module")
def lm_py(arpa_path):
    return ngram.PyNgramLM(arpa_path)


# hand-computed with Katz backoff over the ARPA above
HAND = {
    ("a b", True, True): -1.0,     # all trigram hits
    ("a a", True, True): -2.4,     # backoffs: <s> a -> a a; a a -> a </s> -> </s>
    ("b", True, False): -0.5 - 0.6,  # p(b|<s>) = bo(<s>) + p(b) = -0.5 + -0.6
    ("x", False, False): -1.0,     # OOV -> <unk>
}


@pytest.mark.parametrize("key", list(HAND))
def test_cpp_matches_hand_values(lm_cpp, key):
    s, bos, eos = key
    assert lm_cpp.score(s, bos=bos, eos=eos) == pytest.approx(HAND[key], abs=1e-6)


@pytest.mark.parametrize("key", list(HAND))
def test_python_oracle_matches_hand_values(lm_py, key):
    s, bos, eos = key
    assert lm_py.score(s, bos=bos, eos=eos) == pytest.approx(HAND[key], abs=1e-6)


def test_cpp_matches_python_on_random_sentences(lm_cpp, lm_py):
    rng = np.random.RandomState(0)
    words = ["a", "b", "x", "<unk>"]
    for _ in range(50):
        n = rng.randint(1, 8)
        s = " ".join(rng.choice(words) for _ in range(n))
        bos = bool(rng.randint(2))
        eos = bool(rng.randint(2))
        assert lm_cpp.score(s, bos=bos, eos=eos) == pytest.approx(
            lm_py.score(s, bos=bos, eos=eos), abs=1e-5), s


def test_batch_equals_loop(lm_cpp):
    sents = ["a b", "a a", "b", "a b a b a"]
    batch = lm_cpp.score_batch(sents)
    loop = [lm_cpp.score(s) for s in sents]
    np.testing.assert_allclose(batch, loop, atol=1e-9)


def test_base_score_sums_to_score(lm_cpp):
    for sent in ["a b", "a a b", "b a x"]:
        st = lm_cpp.begin_state()
        total = 0.0
        for w in sent.split():
            s, st = lm_cpp.base_score(st, w)
            total += s
        s_eos, _ = lm_cpp.base_score(st, "</s>")
        total += s_eos
        assert total == pytest.approx(lm_cpp.score(sent, bos=True, eos=True),
                                      abs=1e-6)


def test_metadata(lm_cpp):
    assert lm_cpp.order == 3
    assert lm_cpp.num_ngrams() == 11
    assert ngram.load_lm(None) is None
