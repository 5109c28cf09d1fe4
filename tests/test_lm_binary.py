"""KenLM binary (.klm, PROBING) format: writer/reader roundtrip score
equality with the ARPA-loaded model, header-layout pins, trie rejection.

The reference's mode 3 loads a binary artifact directly
(zh_giga.no_cna_cmn.prune01244.klm, reference gpd.py:121, main.py:126);
VERDICT r2 item #4 requires NgramLM to read it without external kenlm
tooling.  A separate differential against the real kenlm library lives in
test_lm_kenlm_differential.py (skipped when kenlm is not installed).
"""

import struct

import numpy as np
import pytest

from chinese_asr_tpu.lm import ngram

ARPA_TRI = """\\data\\
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

# a pruned 4-gram with backoff "holes" (a trigram whose bigram suffix is
# absent), multi-byte UTF-8 words, and no explicit backoff on some rows
ARPA_QUAD = """\\data\\
ngram 1=7
ngram 2=5
ngram 3=3
ngram 4=2

\\1-grams:
-1.2\t<unk>
-99\t<s>\t-0.4
-0.9\t</s>
-0.6\t你\t-0.25
-0.7\t好\t-0.35
-0.8\t吗\t-0.15
-1.1\t吗吗\t-0.05

\\2-grams:
-0.3\t<s> 你\t-0.12
-0.25\t你 好\t-0.22
-0.45\t好 吗\t-0.1
-0.5\t吗 </s>
-0.6\t好 好

\\3-grams:
-0.2\t<s> 你 好\t-0.07
-0.35\t你 好 吗
-0.55\t好 吗 </s>

\\4-grams:
-0.15\t<s> 你 好 吗
-0.3\t你 好 吗 </s>

\\end\\
"""

# model WITHOUT <unk>: kenlm synthesizes a -100 floor unigram
ARPA_NO_UNK = """\\data\\
ngram 1=4
ngram 2=2

\\1-grams:
-0.8\t<s>\t-0.5
-0.7\t</s>
-0.5\ta\t-0.3
-0.6\tb

\\2-grams:
-0.4\t<s> a\t-0.1
-0.5\ta b

\\end\\
"""

SENTS = ["a b", "a a", "b", "a b a b a", "x", "a x b", "", "x x x"]
SENTS_ZH = ["你 好", "你 好 吗",
            "好 好 吗", "吗吗 你", "oov 好",
            "你 好 吗 你 好 吗", ""]


def _roundtrip(tmp_path, text, name):
    arpa = tmp_path / f"{name}.arpa"
    arpa.write_text(text, encoding="utf-8")
    lm_a = ngram.NgramLM(str(arpa))
    assert lm_a._py is None, "C++ kernel required for this test"
    klm = tmp_path / f"{name}.klm"
    lm_a.write_binary(str(klm))
    lm_b = ngram.NgramLM(str(klm))
    assert lm_b._py is None
    return lm_a, lm_b, str(klm)


@pytest.mark.parametrize("text,name,sents", [
    (ARPA_TRI, "tri", SENTS),
    (ARPA_QUAD, "quad", SENTS_ZH),
    (ARPA_NO_UNK, "nounk", ["a b", "a", "b a", ""]),
])
def test_binary_roundtrip_scores_equal(tmp_path, text, name, sents):
    lm_a, lm_b, _ = _roundtrip(tmp_path, text, name)
    assert lm_b.order == lm_a.order
    assert lm_b.num_ngrams() == lm_a.num_ngrams()
    for s in sents:
        for bos in (True, False):
            for eos in (True, False):
                assert lm_b.score(s, bos=bos, eos=eos) == pytest.approx(
                    lm_a.score(s, bos=bos, eos=eos), abs=1e-6), (s, bos, eos)


def test_binary_roundtrip_incremental_state(tmp_path):
    lm_a, lm_b, _ = _roundtrip(tmp_path, ARPA_TRI, "tri")
    for sent in ["a b", "a a b", "b a x", "x b a a"]:
        sa, sb = lm_a.begin_state(), lm_b.begin_state()
        for w in sent.split() + ["</s>"]:
            va, sa = lm_a.base_score(sa, w)
            vb, sb = lm_b.base_score(sb, w)
            assert vb == pytest.approx(va, abs=1e-6), (sent, w)


def test_binary_batch_and_id_paths(tmp_path):
    lm_a, lm_b, _ = _roundtrip(tmp_path, ARPA_TRI, "tri")
    sents = ["a b", "a a", "b", "x a"]
    np.testing.assert_allclose(lm_b.score_batch(sents),
                               lm_a.score_batch(sents), atol=1e-6)
    # zero-string id path used by second-pass rescoring
    ids = [lm_b.word_ids(s.split()) for s in sents]
    offsets = np.zeros(len(sents) + 1, np.int64)
    np.cumsum([len(x) for x in ids], out=offsets[1:])
    flat = np.concatenate(ids).astype(np.uint32)
    np.testing.assert_allclose(
        lm_b.score_batch_ids(flat, offsets, bos=True),
        lm_a.score_batch(sents, bos=True), atol=1e-6)


def test_binary_header_layout(tmp_path):
    """Pin the byte layout against kenlm lm/binary_format.hh: magic,
    sanity reference values, fixed params, counts."""
    _, _, klm = _roundtrip(tmp_path, ARPA_TRI, "tri")
    raw = open(klm, "rb").read()
    magic = b"mmap lm http://kheafield.com/code format version 5\n\x00"
    assert raw[: len(magic)] == magic
    assert raw[len(magic): 56] == b"\x00" * (56 - len(magic))  # ALIGN8 pad
    zero_f, one_f, minus_half = struct.unpack_from("<fff", raw, 56)
    assert (zero_f, one_f, minus_half) == (0.0, 1.0, -0.5)
    one_w, max_w = struct.unpack_from("<II", raw, 68)
    assert (one_w, max_w) == (1, 0xFFFFFFFF)
    assert struct.unpack_from("<Q", raw, 80)[0] == 1
    order = raw[88]
    assert order == 3
    probing_mult = struct.unpack_from("<f", raw, 92)[0]
    assert probing_mult == pytest.approx(1.5)
    model_type = struct.unpack_from("<i", raw, 96)[0]
    assert model_type == 0                                      # PROBING
    counts = struct.unpack_from("<3Q", raw, 108)
    assert counts == (5, 4, 2)


def test_trie_model_rejected_with_hint(tmp_path):
    """A TRIE-typed binary must fail with an actionable message, not a
    crash or a silent misparse."""
    _, _, klm = _roundtrip(tmp_path, ARPA_TRI, "tri")
    raw = bytearray(open(klm, "rb").read())
    struct.pack_into("<i", raw, 96, 2)                          # TRIE
    bad = tmp_path / "trie.klm"
    bad.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="TRIE"):
        ngram.NgramLM(str(bad))


def test_unknown_version_rejected(tmp_path):
    _, _, klm = _roundtrip(tmp_path, ARPA_TRI, "tri")
    raw = bytearray(open(klm, "rb").read())
    raw[49] = ord("4")                    # "format version 4"
    bad = tmp_path / "old.klm"
    bad.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="version"):
        ngram.NgramLM(str(bad))


def test_binary_vocab_ids_are_kenlm_style(tmp_path):
    """<unk> resolves to 0 (never stored); other words to stable ids;
    OOV falls back to 0."""
    _, lm_b, _ = _roundtrip(tmp_path, ARPA_TRI, "tri")
    ids = lm_b.word_ids(["<unk>", "oov-word", "a", "b", "<s>", "</s>"])
    assert ids[0] == 0 and ids[1] == 0
    assert len({int(i) for i in ids[2:]}) == 4      # distinct, non-unk
    assert all(i > 0 for i in ids[2:])


def test_second_pass_rescoring_with_binary_lm(tmp_path):
    """The full finalize_beam second-pass path runs off a .klm exactly as
    off the ARPA (reference mode 3 contract, main.py:126)."""
    lm_a, lm_b, _ = _roundtrip(tmp_path, ARPA_TRI, "tri")
    sents = ["a b", "b", "a a", "x"]
    np.testing.assert_allclose(
        lm_b.score_batch(sents, bos=True),
        lm_a.score_batch(sents, bos=True), atol=1e-6)
    tab_a = lm_a.token_id_table(_FakeVocab())
    tab_b = lm_b.token_id_table(_FakeVocab())
    # tables map the same words; id spaces may differ, scores must not
    flat_a = tab_a[[4, 5]].astype(np.uint32)
    flat_b = tab_b[[4, 5]].astype(np.uint32)
    off = np.array([0, 2], np.int64)
    assert lm_b.score_batch_ids(flat_b, off)[0] == pytest.approx(
        lm_a.score_batch_ids(flat_a, off)[0], abs=1e-6)


class _FakeVocab:
    int2word = {0: "<pad>", 1: "<s>", 2: "</s>", 3: "<unk>", 4: "a", 5: "b"}


def test_corrupt_binaries_fail_cleanly(tmp_path):
    """Truncations and corrupt counts must raise ValueError through the
    C ABI — never crash or read out of bounds."""
    _, _, klm = _roundtrip(tmp_path, ARPA_TRI, "tri")
    raw = open(klm, "rb").read()
    rng = np.random.RandomState(0)
    cases = []
    for cut in (60, 100, 120, 140, 200, len(raw) - 9):
        cases.append(raw[:cut])                       # truncations
    big = bytearray(raw)
    struct.pack_into("<Q", big, 108, 2**48)           # absurd 1-gram count
    cases.append(bytes(big))
    neg = bytearray(raw)
    struct.pack_into("<Q", neg, 116, 2**63)           # absurd 2-gram count
    cases.append(bytes(neg))
    for n, payload in enumerate(cases):
        bad = tmp_path / f"bad{n}.klm"
        bad.write_bytes(payload)
        with pytest.raises(ValueError):
            ngram.NgramLM(str(bad))
