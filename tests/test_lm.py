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


def _random_arpa(tmp_path, rng, idx, order=None, nvocab=None,
                 n_per_order=None):
    """Structurally randomized ARPA: random vocab, random logprobs and
    backoffs, and PRUNED HOLES (higher-order grams whose lower-order
    context may be absent are never written — but random subsets force
    backoff-through-missing-context paths constantly).  Supports any
    order (the reference ships a 5-gram, gpd.py:121 — order/nvocab/
    n_per_order default to the small fuzz regime, pass explicit values
    for the scale-hardening tests)."""
    order = int(rng.randint(2, 4)) if order is None else order
    nv = int(rng.randint(3, 7)) if nvocab is None else nvocab
    vocab = [f"w{i}" for i in range(nv)]
    uni = ["<unk>", "<s>", "</s>"] + vocab

    def lp():
        return round(float(-rng.rand() * 4 - 0.05), 4)

    grams = {o: [] for o in range(1, order + 1)}
    for w in uni:
        bo = f"\t{lp()}" if order > 1 and rng.rand() < 0.8 else ""
        grams[1].append(f"{lp()}\t{w}{bo}")
    for o in range(2, order + 1):
        n = int(rng.randint(3, 12)) if n_per_order is None else n_per_order
        seen = set()
        for _ in range(n):
            key = ([str(rng.choice(["<s>"] + vocab))]
                   + [str(rng.choice(vocab)) for _ in range(o - 2)]
                   + [str(rng.choice(vocab + ["</s>"]))])
            key = tuple(key)
            if key in seen:
                continue
            seen.add(key)
            bo = f"\t{lp()}" if o < order and rng.rand() < 0.7 else ""
            grams[o].append(f"{lp()}\t{' '.join(key)}{bo}")
    lines = ["\\data\\"]
    for o in range(1, order + 1):
        lines.append(f"ngram {o}={len(grams[o])}")
    lines.append("")
    for o in range(1, order + 1):
        lines += [f"\\{o}-grams:"] + grams[o] + [""]
    lines += ["\\end\\", ""]
    p = tmp_path / f"rand{idx}.arpa"
    p.write_text("\n".join(lines))
    return str(p), vocab


def test_cpp_matches_python_on_random_arpas(tmp_path):
    """Structural fuzz: random ARPAs (orders, pruned holes, missing
    backoffs) — the C++ kernel, the Python oracle, and the binary-
    roundtripped C++ model must agree on random sentences."""
    rng = np.random.RandomState(42)
    for idx in range(6):
        path, vocab = _random_arpa(tmp_path, rng, idx)
        cpp = ngram.NgramLM(path)
        py = ngram.PyNgramLM(path)
        blob = tmp_path / f"rand{idx}.klm"
        cpp.write_binary(str(blob))
        cpp2 = ngram.NgramLM(str(blob))
        words = vocab + ["oovword", "<unk>"]
        for _ in range(25):
            n = int(rng.randint(1, 7))
            s = " ".join(rng.choice(words) for _ in range(n))
            bos = bool(rng.rand() < 0.5)
            eos = bool(rng.rand() < 0.5)
            ref = py.score(s, bos=bos, eos=eos)
            got = cpp.score(s, bos=bos, eos=eos)
            got2 = cpp2.score(s, bos=bos, eos=eos)
            assert got == pytest.approx(ref, abs=1e-5), (idx, s, bos, eos)
            assert got2 == pytest.approx(ref, abs=1e-5), (idx, s, bos, eos)
