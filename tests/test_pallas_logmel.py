"""Fused Pallas log-mel kernel: numerical parity with the XLA path
(interpret mode on CPU), masking, and the featurize dispatch flag."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chinese_asr_tpu.audio import features
from chinese_asr_tpu.config import AudioConfig
from chinese_asr_tpu.ops.pallas import logmel


@pytest.mark.parametrize("n", [16000, 48000])
def test_pallas_matches_xla_path(n):
    cfg = AudioConfig()
    rng = np.random.RandomState(0)
    wav = (0.1 * rng.randn(2, n)).astype(np.float32)
    T = int(features.num_frames(n, cfg))

    ref = np.asarray(features.log_mel(jnp.asarray(wav), T, cfg))
    got = np.asarray(logmel.log_mel(jnp.asarray(wav), T, cfg, interpret=True))
    assert got.shape == ref.shape == (2, T, cfg.n_mels)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_pallas_frame_mask():
    cfg = AudioConfig()
    rng = np.random.RandomState(1)
    wav = (0.1 * rng.randn(1, 16000)).astype(np.float32)
    T = int(features.num_frames(16000, cfg))
    mask = (np.arange(T) < T - 5).astype(np.float32)[None]
    got = np.asarray(logmel.log_mel(jnp.asarray(wav), T, cfg,
                                    frame_mask=jnp.asarray(mask),
                                    interpret=True))
    assert np.abs(got[0, T - 5:]).max() == 0.0
    ref = np.asarray(features.log_mel(jnp.asarray(wav), T, cfg,
                                      frame_mask=jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_featurize_dispatch_flag(monkeypatch):
    monkeypatch.setenv("CHINESE_ASR_PALLAS", "0")
    assert not features._use_pallas()
    monkeypatch.setenv("CHINESE_ASR_PALLAS", "1")
    assert features._use_pallas()
    monkeypatch.delenv("CHINESE_ASR_PALLAS")
    # CPU backend in tests -> pallas off by default
    assert not features._use_pallas()
