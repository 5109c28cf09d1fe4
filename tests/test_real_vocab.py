"""Parity against the reference's shipped dict.pkl (reference
data.py:371-383): 5004 entries, specials at 0-3, Hanzi round-trip, and the
full-size ASR wiring with the real vocabulary."""

import os

import numpy as np
import pytest

DICT_PKL = "/root/reference/dict.pkl"

pytestmark = pytest.mark.skipif(not os.path.exists(DICT_PKL),
                                reason="reference dict.pkl not mounted")

from chinese_asr_tpu.config import Config
from chinese_asr_tpu.vocab import Vocab


def test_real_dict_contract():
    v = Vocab.load(DICT_PKL)
    cfg = Config()
    assert len(v) == cfg.vocab.vocab_size == 5004
    assert v.word2int["<pad>"] == 0
    assert v.word2int["<s>"] == 1
    assert v.word2int["</s>"] == 2
    assert v.word2int["<unk>"] == 3
    # decode/encode round-trip over in-vocab Hanzi
    ids = list(range(4, 50))
    text = v.decode(ids)
    assert len(text) == len(ids)
    assert v.encode(text) == ids
    # OOV maps to <unk>=3 (reference data.py:456)
    assert v.encode("")[0] == 3


def test_asr_with_real_vocab(tmp_path):
    from chinese_asr_tpu.api import ASR
    from chinese_asr_tpu.data import audio_io

    cfg = (Config()
           .with_("encoder", hidden_size=16, num_layers=2)
           .with_("decoder", hidden_size=32, embed_dim=12)
           .with_("attention", attn_size=8)
           .with_("decode", max_len=8))
    p = str(tmp_path / "w.wav")
    audio_io.write_wav(
        p, (0.1 * np.random.RandomState(0).randn(16000)).astype(np.float32))
    asr = ASR(cfg=cfg, vocab=DICT_PKL, bw=4, wav_bucket=4800)
    out = asr(p)
    assert isinstance(out, str)
    # every emitted char decodes through the real vocabulary
    assert all(ch in asr.vocab.word2int for ch in out)
