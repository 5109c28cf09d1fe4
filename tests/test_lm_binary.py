"""KenLM binary (.klm, PROBING) format: writer/reader roundtrip score
equality with the ARPA-loaded model, header-layout pins, trie rejection.

The reference's mode 3 loads a binary artifact directly
(zh_giga.no_cna_cmn.prune01244.klm, reference gpd.py:121, main.py:126);
VERDICT r2 item #4 requires NgramLM to read it without external kenlm
tooling.  A separate differential against the real kenlm library lives in
test_lm_kenlm_differential.py (skipped when kenlm is not installed).
"""

import os
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


def test_rest_probing_rejected_with_hint(tmp_path):
    """REST_PROBING stores rest costs (different score semantics) and must
    fail with an actionable message, not a crash or a silent misparse."""
    _, _, klm = _roundtrip(tmp_path, ARPA_TRI, "tri")
    raw = bytearray(open(klm, "rb").read())
    struct.pack_into("<i", raw, 96, 1)                          # REST_PROBING
    bad = tmp_path / "rest.klm"
    bad.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="REST_PROBING"):
        ngram.NgramLM(str(bad))


# ---------------------------------------------------------------------------
# TRIE family (kenlm build_binary `trie [-q N -b M] [-a K]`)
# ---------------------------------------------------------------------------

TRIE_LAYOUTS = ["trie", "quant_trie", "array_trie", "quant_array_trie"]

# pruned: trigram "a b c" exists but its bigram suffix "b c" does NOT —
# the trie must materialize a blank placeholder on the (c -> b) path
ARPA_PRUNED = """\\data\\
ngram 1=6
ngram 2=3
ngram 3=2

\\1-grams:
-1.0\t<unk>
-0.8\t<s>\t-0.5
-0.7\t</s>
-0.5\ta\t-0.3
-0.6\tb\t-0.2
-0.65\tc\t-0.1

\\2-grams:
-0.4\t<s> a\t-0.1
-0.3\ta b\t-0.25
-0.5\tb a

\\3-grams:
-0.2\ta b c
-0.45\t<s> a b

\\end\\
"""


def _trie_roundtrip(tmp_path, text, name, layout, **kw):
    arpa = tmp_path / f"{name}.arpa"
    arpa.write_text(text, encoding="utf-8")
    lm_a = ngram.NgramLM(str(arpa))
    assert lm_a._py is None, "C++ kernel required for this test"
    klm = tmp_path / f"{name}_{layout}.klm"
    lm_a.write_binary(str(klm), layout=layout, **kw)
    lm_b = ngram.NgramLM(str(klm))
    assert lm_b.model_type == ngram.NgramLM.LAYOUTS[layout]
    return lm_a, lm_b, str(klm)


@pytest.mark.parametrize("layout", TRIE_LAYOUTS)
@pytest.mark.parametrize("text,name,sents", [
    (ARPA_TRI, "tri", SENTS),
    (ARPA_QUAD, "quad", SENTS_ZH),
    (ARPA_NO_UNK, "nounk", ["a b", "a", "b a", ""]),
])
def test_trie_roundtrip_scores_equal(tmp_path, layout, text, name, sents):
    """Each trie layout scores exactly like its source ARPA.  These
    models have far fewer distinct values per order than 2^8 quantization
    bins, so even the QUANT layouts are exact (each value gets its own
    bin center)."""
    lm_a, lm_b, _ = _trie_roundtrip(tmp_path, text, name, layout)
    assert lm_b.order == lm_a.order
    for s in sents:
        for bos in (True, False):
            for eos in (True, False):
                assert lm_b.score(s, bos=bos, eos=eos) == pytest.approx(
                    lm_a.score(s, bos=bos, eos=eos), abs=1e-6), (s, bos, eos)


@pytest.mark.parametrize("layout", TRIE_LAYOUTS)
def test_trie_pruned_suffix_blank(tmp_path, layout):
    """A pruned model (n-gram whose suffix is absent) gets exactly one
    blank entry, and every score — including the query that lands ON the
    blank, p(c | b) — still equals the ARPA walk."""
    lm_a, lm_b, _ = _trie_roundtrip(tmp_path, ARPA_PRUNED, "pruned", layout)
    assert lm_b.num_ngrams() == lm_a.num_ngrams() + 1       # the (b c) blank
    for s in ["a b c", "b c", "c", "a b c a b", "x c b a", "", "c c c"]:
        for bos in (True, False):
            assert lm_b.score(s, bos=bos) == pytest.approx(
                lm_a.score(s, bos=bos), abs=1e-6), (s, bos)


def test_trie_incremental_state(tmp_path):
    lm_a, lm_b, _ = _trie_roundtrip(tmp_path, ARPA_TRI, "tri", "trie")
    for sent in ["a b", "a a b", "b a x", "x b a a"]:
        sa, sb = lm_a.begin_state(), lm_b.begin_state()
        for w in sent.split() + ["</s>"]:
            va, sa = lm_a.base_score(sa, w)
            vb, sb = lm_b.base_score(sb, w)
            assert vb == pytest.approx(va, abs=1e-6), (sent, w)


def test_trie_fuzz_differential(tmp_path):
    """Random 4-gram ARPA with pruning holes and skewed level sizes (many
    bigrams, few 4-grams) so Bhiksha pointer chopping actually fires;
    every layout at several bit budgets must match the ARPA (non-quant
    exact to f32; quant within the 8-bit binning error)."""
    rng = np.random.RandomState(7)
    words = [f"w{i}" for i in range(40)]
    bi = sorted({(words[rng.randint(40)], words[rng.randint(40)])
                 for _ in range(600)})
    tri = sorted({bi[rng.randint(len(bi))] + (words[rng.randint(40)],)
                  for _ in range(300)})
    quad = sorted({tri[rng.randint(len(tri))] + (words[rng.randint(40)],)
                   for _ in range(12)})
    lines = ["\\data\\", f"ngram 1={len(words) + 3}", f"ngram 2={len(bi)}",
             f"ngram 3={len(tri)}", f"ngram 4={len(quad)}", "", "\\1-grams:",
             "-2.5\t<unk>\t-0.4", "-2.0\t<s>\t-0.5", "-2.2\t</s>"]
    lines += [f"{-1 - rng.rand():.4f}\t{w}\t{-0.5 * rng.rand():.4f}"
              for w in words]
    lines += ["", "\\2-grams:"]
    lines += [f"{-1 - 1.5 * rng.rand():.4f}\t{a} {b}\t{-0.4 * rng.rand():.4f}"
              for a, b in bi]
    lines += ["", "\\3-grams:"]
    lines += [f"{-0.5 - 1.5 * rng.rand():.4f}\t{a} {b} {c}\t"
              f"{-0.3 * rng.rand():.4f}" for a, b, c in tri]
    lines += ["", "\\4-grams:"]
    lines += [f"{-0.5 - 1.5 * rng.rand():.4f}\t{' '.join(g)}" for g in quad]
    lines += ["", "\\end\\", ""]
    arpa = tmp_path / "fuzz.arpa"
    arpa.write_text("\n".join(lines), encoding="utf-8")
    lm_a = ngram.NgramLM(str(arpa))
    sents = [" ".join(words[rng.randint(40)]
                      for _ in range(rng.randint(1, 9)))
             for _ in range(40)] + ["", "oov1 oov2 w3"]
    ref = {(s, bos): lm_a.score(s, bos=bos)
           for s in sents for bos in (True, False)}
    for layout, atol in [("trie", 1e-6), ("quant_trie", 5e-2),
                         ("array_trie", 1e-6), ("quant_array_trie", 5e-2)]:
        for bh in (0, 2, 22) if "array" in layout else (22,):
            klm = tmp_path / f"f_{layout}_{bh}.klm"
            lm_a.write_binary(str(klm), layout=layout, bhiksha_bits=bh)
            lm_b = ngram.NgramLM(str(klm))
            for (s, bos), want in ref.items():
                assert lm_b.score(s, bos=bos) == pytest.approx(
                    want, abs=atol), (layout, bh, s, bos)


def test_trie_header_layout(tmp_path):
    """Pin the trie header bytes: model_type, TrieSearch version, counts
    INCLUDING the blank entry, and the sorted-vocab section."""
    _, _, klm = _trie_roundtrip(tmp_path, ARPA_PRUNED, "pruned", "trie")
    raw = open(klm, "rb").read()
    assert raw[88] == 3                                         # order
    assert struct.unpack_from("<i", raw, 96)[0] == 2            # TRIE
    assert struct.unpack_from("<I", raw, 104)[0] == 1           # kVersion
    counts = struct.unpack_from("<3Q", raw, 108)
    assert counts == (6, 4, 2)               # 3 real bigrams + 1 blank
    # sorted vocab: u64 stored count (excludes <unk>), then sorted hashes
    off = (108 + 3 * 8 + 7) & ~7
    stored = struct.unpack_from("<Q", raw, off)[0]
    assert stored == 5
    hashes = struct.unpack_from(f"<{stored}Q", raw, off + 8)
    assert list(hashes) == sorted(hashes)


# ---------------------------------------------------------------------------
# Frozen goldens (VERDICT r3 #5): since kenlm cannot run in this image, the
# parity claim is pinned three ways that cannot drift together — committed
# .klm fixture BYTES the reader must score correctly, hand-verified frozen
# score constants, and writer-output hashes against those same fixtures.
# Any CI with kenlm installed additionally runs the live differential in
# test_lm_kenlm_differential.py.
# ---------------------------------------------------------------------------

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "data")

# sha256 of write_binary output for ARPA_TRI.  The trie layouts are fully
# deterministic (levels are sorted).  The probing layout's collision
# placement follows std::unordered_map iteration order — deterministic for
# a given libstdc++; if a toolchain change ever breaks that pin, check the
# fixture still LOADS with equal scores, then regenerate the hash.
GOLDEN_HASHES = {
    "probing": "2617811b6f4b7a08d32a980e0eef2f121155769cb815b23bf1abcde6"
               "593ac9bd",
    "trie": "d13dd94d8e416f9b4b733e445c274d63813ff3a5f8c8deebb90f99741"
            "73d44a1",
    "quant_trie": "37554de66bf9a7e292026f3c418769ab6d8216457822839a90ef"
                  "f3dd637bc8a1",
    "quant_array_trie": "d8a0d2db8e0a2b15b9f5979069dfe5a4c071fe649d4d49"
                        "5d847fd09e64d84cde",
}

# hand-verified against ARPA_TRI (eos=True throughout), e.g.
# ("a b", bos): p(a|<s>)=-0.4 + p(b|<s> a)=-0.2 [trigram] +
# p(</s>|a b)=-0.4 [trigram] = -1.0;
# ("", bos): p(</s>|<s>) = backoff(<s>)=-0.5 + p(</s>)=-0.7 = -1.2
GOLDEN_SCORES = {
    ("a b", True): -1.0,
    ("a b", False): -1.2,
    ("a a", True): -2.4,
    ("a a", False): -2.4,
    ("b", True): -1.6,
    ("b", False): -1.1,
    ("a b a b a", True): -3.7,
    ("a b a b a", False): -3.9,
    ("x", True): -2.2,
    ("x", False): -1.7,
    ("a x b", True): -2.9,
    ("a x b", False): -2.9,
    ("", True): -1.2,
    ("", False): -0.7,
    ("x x x", True): -4.2,
    ("x x x", False): -3.7,
}


@pytest.mark.parametrize("layout", sorted(GOLDEN_HASHES))
def test_golden_fixture_bytes_score_frozen_values(layout):
    """The committed .klm fixtures (frozen bytes, never rewritten) must
    load and reproduce the hand-verified scores — pins the READER against
    a regression that also changes the writer."""
    lm = ngram.NgramLM(os.path.join(GOLDEN_DIR, f"golden_tri_{layout}.klm"))
    assert lm._py is None
    for (s, bos), want in GOLDEN_SCORES.items():
        assert lm.score(s, bos=bos, eos=True) == pytest.approx(
            want, abs=1e-6), (layout, s, bos)


def test_golden_scores_pin_both_oracles(tmp_path):
    """The C++ ARPA scorer AND the pure-Python oracle both match the
    frozen constants — a regression can no longer move both oracles at
    once (VERDICT r3 #5)."""
    arpa = tmp_path / "tri.arpa"
    arpa.write_text(ARPA_TRI, encoding="utf-8")
    cpp = ngram.NgramLM(str(arpa))
    assert cpp._py is None
    py = ngram.PyNgramLM(str(arpa))
    for (s, bos), want in GOLDEN_SCORES.items():
        assert cpp.score(s, bos=bos, eos=True) == pytest.approx(
            want, abs=1e-6), ("cpp", s, bos)
        assert py.score(s, bos=bos, eos=True) == pytest.approx(
            want, abs=1e-6), ("py", s, bos)


@pytest.mark.parametrize("layout", sorted(GOLDEN_HASHES))
def test_golden_writer_bytes_unchanged(tmp_path, layout):
    """write_binary reproduces the committed fixture byte-for-byte."""
    import hashlib
    arpa = tmp_path / "tri.arpa"
    arpa.write_text(ARPA_TRI, encoding="utf-8")
    lm = ngram.NgramLM(str(arpa))
    out = tmp_path / f"tri_{layout}.klm"
    lm.write_binary(str(out), layout=layout)
    got = hashlib.sha256(out.read_bytes()).hexdigest()
    assert got == GOLDEN_HASHES[layout], layout
    want_bytes = open(
        os.path.join(GOLDEN_DIR, f"golden_tri_{layout}.klm"), "rb").read()
    assert out.read_bytes() == want_bytes


def test_trie_corrupt_binaries_fail_cleanly(tmp_path):
    _, _, klm = _trie_roundtrip(tmp_path, ARPA_TRI, "tri", "quant_trie")
    raw = open(klm, "rb").read()
    cases = [raw[:cut] for cut in (120, 140, 180, 260, len(raw) - 9)]
    big = bytearray(raw)
    struct.pack_into("<Q", big, 108, 2 ** 50)         # absurd 1-gram count
    cases.append(bytes(big))
    for n, payload in enumerate(cases):
        bad = tmp_path / f"badtrie{n}.klm"
        bad.write_bytes(payload)
        with pytest.raises(ValueError):
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
