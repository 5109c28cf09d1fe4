"""Differential against the REAL kenlm library (VERDICT r2 item #5).

Skipped when kenlm is not installed (it is not in this image and cannot be
pip-installed here); any CI with ``pip install kenlm`` runs it.  Three
directions:

1. ARPA scoring: NgramLM.score / base_score vs kenlm.LanguageModel.score /
   BaseScore over synthetic models with backoff chains, OOV, <s>/</s>,
   prune-created holes (the semantics mimicked from reference
   model.py:749-763 and 1131-1180).
2. Binary WRITER: kenlm.Model must load the .klm produced by
   NgramLM.write_binary and score identically — byte-level format check
   against the real implementation.
3. Binary READER: NgramLM must score a kenlm-built binary identically to
   the ARPA (uses kenlm's build_binary if on PATH, else the writer output
   cross-checked in 2).
"""

import shutil
import subprocess

import pytest

kenlm = pytest.importorskip("kenlm")

from chinese_asr_tpu.lm import ngram
from test_lm_binary import ARPA_TRI, ARPA_QUAD, ARPA_NO_UNK, SENTS, SENTS_ZH


CASES = [(ARPA_TRI, "tri", SENTS), (ARPA_QUAD, "quad", SENTS_ZH)]


def _pair(tmp_path, text, name):
    p = tmp_path / f"{name}.arpa"
    p.write_text(text, encoding="utf-8")
    ours = ngram.NgramLM(str(p))
    theirs = kenlm.LanguageModel(str(p))
    return ours, theirs


@pytest.mark.parametrize("text,name,sents", CASES)
def test_sentence_scores_match_kenlm(tmp_path, text, name, sents):
    ours, theirs = _pair(tmp_path, text, name)
    assert ours.order == theirs.order
    for s in sents:
        for bos in (True, False):
            for eos in (True, False):
                assert ours.score(s, bos=bos, eos=eos) == pytest.approx(
                    theirs.score(s, bos=bos, eos=eos), abs=1e-4), (s, bos, eos)


@pytest.mark.parametrize("text,name,sents", CASES)
def test_base_score_matches_kenlm(tmp_path, text, name, sents):
    ours, theirs = _pair(tmp_path, text, name)
    for s in sents:
        st_o = ours.begin_state()
        st_t, st_t2 = kenlm.State(), kenlm.State()
        theirs.BeginSentenceWrite(st_t)
        for w in s.split() + ["</s>"]:
            v_o, st_o = ours.base_score(st_o, w)
            v_t = theirs.BaseScore(st_t, w, st_t2)
            st_t, st_t2 = st_t2, st_t
            assert v_o == pytest.approx(v_t, abs=1e-4), (s, w)


def test_kenlm_loads_our_binary(tmp_path):
    """The strongest format check: real kenlm mmaps the .klm we wrote."""
    for text, name, sents in CASES:
        p = tmp_path / f"{name}.arpa"
        p.write_text(text, encoding="utf-8")
        ours = ngram.NgramLM(str(p))
        klm = tmp_path / f"{name}.klm"
        ours.write_binary(str(klm))
        theirs = kenlm.Model(str(klm))
        for s in sents:
            assert theirs.score(s, bos=True, eos=True) == pytest.approx(
                ours.score(s, bos=True, eos=True), abs=1e-4), s


def test_we_load_kenlm_build_binary(tmp_path):
    """build_binary (probing) output read by our C++ kernel."""
    bb = shutil.which("build_binary")
    if bb is None:
        pytest.skip("kenlm build_binary not on PATH")
    p = tmp_path / "tri.arpa"
    p.write_text(ARPA_TRI, encoding="utf-8")
    klm = tmp_path / "tri.klm"
    subprocess.run([bb, "probing", str(p), str(klm)], check=True,
                   capture_output=True)
    ours_bin = ngram.NgramLM(str(klm))
    theirs = kenlm.LanguageModel(str(p))
    for s in SENTS:
        assert ours_bin.score(s, bos=True, eos=True) == pytest.approx(
            theirs.score(s, bos=True, eos=True), abs=1e-4), s


@pytest.mark.parametrize("args,atol", [
    ([], 1e-4),                                    # TRIE
    (["-q", "8", "-b", "8"], 5e-2),                # QUANT_TRIE
    (["-a", "22"], 1e-4),                          # ARRAY_TRIE
    (["-a", "22", "-q", "8", "-b", "8"], 5e-2),    # QUANT_ARRAY_TRIE
])
def test_we_load_kenlm_trie_binaries(tmp_path, args, atol):
    """build_binary trie-family output read by our C++ kernel — validates
    the bit-packed/bhiksha/quantized readers against the real writer
    (our own trie writer is additionally cross-checked by
    test_kenlm_loads_our_trie below)."""
    bb = shutil.which("build_binary")
    if bb is None:
        pytest.skip("kenlm build_binary not on PATH")
    for text, name, sents in CASES:
        p = tmp_path / f"{name}.arpa"
        p.write_text(text, encoding="utf-8")
        klm = tmp_path / f"{name}_trie.klm"
        subprocess.run([bb, *args, "trie", str(p), str(klm)], check=True,
                       capture_output=True)
        ours_bin = ngram.NgramLM(str(klm))
        assert ours_bin.model_type in (2, 3, 4, 5)
        theirs = kenlm.LanguageModel(str(p))
        for s in sents:
            for bos in (True, False):
                assert ours_bin.score(s, bos=bos, eos=True) == pytest.approx(
                    theirs.score(s, bos=bos, eos=True), abs=atol), (s, bos)


@pytest.mark.parametrize("layout", ["trie", "quant_trie", "array_trie",
                                    "quant_array_trie"])
def test_kenlm_loads_our_trie(tmp_path, layout):
    """Real kenlm mmaps the trie-family .klm files our writer produces."""
    for text, name, sents in CASES:
        p = tmp_path / f"{name}.arpa"
        p.write_text(text, encoding="utf-8")
        ours = ngram.NgramLM(str(p))
        klm = tmp_path / f"{name}_{layout}.klm"
        ours.write_binary(str(klm), layout=layout)
        theirs = kenlm.Model(str(klm))
        for s in sents:
            assert theirs.score(s, bos=True, eos=True) == pytest.approx(
                ours.score(s, bos=True, eos=True), abs=5e-2
                if "quant" in layout else 1e-4), (s, layout)
