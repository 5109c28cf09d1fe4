"""Differential tests: TPU featurizer vs torch.stft-based reference math
(reference data.py:129-280)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from chinese_asr_tpu.audio import features as feat
from chinese_asr_tpu.config import AudioConfig

CFG = AudioConfig()


def torch_log_mel(audio: np.ndarray) -> np.ndarray:
    """The reference front end re-expressed with torch primitives
    (data.py:199-224), for golden comparison."""
    a = audio.astype(np.float32)
    a = a[1:] - CFG.preemphasis * a[:-1]
    x = torch.tensor(a).view(1, -1)
    window = torch.hann_window(CFG.win_length)
    spec = torch.stft(x, n_fft=CFG.n_fft, hop_length=CFG.hop_length,
                      win_length=CFG.win_length, window=window,
                      center=False, normalized=False, onesided=True,
                      return_complex=True)
    spec = torch.view_as_real(spec)            # [1, 257, T, 2]
    spec = spec.transpose(1, 2)                # [1, T, 257, 2]
    power = spec.pow(2).sum(-1)                # [1, T, 257]
    fb = torch.tensor(feat.mel_filterbank(CFG.n_fft // 2 + 1, CFG.f_min,
                                          CFG.f_max, CFG.n_mels))
    mel = power @ fb
    mel = mel.masked_fill(mel == 0.0, torch.finfo(torch.float32).eps)
    return torch.log(mel[0]).numpy()           # [T, 80]


def torch_delta_deltas(lm: np.ndarray) -> np.ndarray:
    """Reference add_delta_deltas (data.py:129-164) via torch conv2d."""
    delta = np.array([2, 1, 0, -1, -2], dtype=np.float64)
    dd = np.convolve(delta, delta, "full")
    stack = np.array([[0] * 4 + [1] + [0] * 4,
                      [0] * 2 + list(delta) + [0] * 2,
                      list(dd)], dtype=np.float32).T[:, None, None, :]
    stack /= np.sqrt((stack ** 2).sum(axis=0, keepdims=True))
    stack = np.transpose(stack, (3, 2, 0, 1))  # [3, 1, 9, 1]
    x = torch.tensor(lm)[None, None]           # [1, 1, T, 80]
    x = F.pad(x, (0, 0, 4, 4))
    y = F.conv2d(x, torch.tensor(stack))
    return y[0].numpy()                        # [3, T, 80]


def test_log_mel_matches_torch_stft():
    rng = np.random.RandomState(0)
    n = 16000  # 1 s
    audio = rng.randn(n).astype(np.float32) * 0.1
    ref = torch_log_mel(audio)
    T = feat.num_frames(n, CFG)
    got = np.asarray(feat.log_mel(jnp.asarray(audio), T, CFG))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-4)


def test_full_featurizer_matches_reference_pipeline():
    rng = np.random.RandomState(1)
    n = 12800
    audio = rng.randn(n).astype(np.float32) * 0.1
    lm = torch_log_mel(audio)
    f3 = torch_delta_deltas(lm)                # [3, T, 80]
    T = f3.shape[1]
    T3 = (T // 3) * 3
    f3 = f3[:, :T3]
    # reference stacking: view(3, T//3, 240) -> transpose(0,1) -> [T//3, 720]
    ref = f3.reshape(3, T3 // 3, 240).transpose(1, 0, 2).reshape(T3 // 3, 720)

    got = np.asarray(feat.featurize(jnp.asarray(audio), feat.num_frames(n, CFG), CFG))
    assert got.shape == ref.shape == (feat.feat_len_from_samples(n, CFG), 720)
    np.testing.assert_allclose(got, ref, atol=5e-3, rtol=2e-4)


def test_batched_featurizer_matches_single():
    """Padded batch featurization must equal per-utterance featurization on
    the valid prefix (the PackedSequence-free contract)."""
    rng = np.random.RandomState(2)
    lens = np.array([12800, 9600], dtype=np.int32)
    N = int(lens.max())
    wavs = np.zeros((2, N), np.float32)
    singles = []
    for i, l in enumerate(lens):
        a = rng.randn(l).astype(np.float32) * 0.1
        wavs[i, :l] = a
        s = np.asarray(feat.featurize(jnp.asarray(a), feat.num_frames(int(l), CFG), CFG))
        s = np.asarray(feat.instance_norm(jnp.asarray(s), eps=1e-7))
        singles.append(s)

    feats, feat_lens = feat.featurize_batch(jnp.asarray(wavs), jnp.asarray(lens), CFG)
    feats = np.asarray(feats)
    for i, s in enumerate(singles):
        assert int(feat_lens[i]) == s.shape[0]
        np.testing.assert_allclose(feats[i, :s.shape[0]], s, atol=1e-4, rtol=1e-4)
        # padding must be exactly zero
        assert np.all(feats[i, s.shape[0]:] == 0.0)


def test_deltas_stack3_fused_parity():
    """The fused delta+stack path (deltas_stack3) must match the two-step
    stack3(add_delta_deltas(.)) it replaced, batched and unbatched."""
    rng = np.random.RandomState(7)
    for shape in [(62, 80), (3, 62, 80), (2, 61, 80),
                  (2, 80), (1, 80)]:       # T < 3: zero output frames
        lm = rng.randn(*shape).astype(np.float32)
        ref = np.asarray(feat.stack3(feat.add_delta_deltas(jnp.asarray(lm))))
        got = np.asarray(feat.deltas_stack3(jnp.asarray(lm)))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_instance_norm_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.randn(50, 720).astype(np.float32)
    tx = torch.tensor(x)
    ref = ((tx - tx.mean(dim=0)) / (tx.std(dim=0) + 1e-6)).numpy()  # main.py:37
    got = np.asarray(feat.instance_norm(jnp.asarray(x), eps=1e-6))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_int16_device_conversion_matches_float_path():
    """PCM16 shipped raw to the device must featurize identically to
    host-converted float32 (the /32768 conversion moves inside the jit)."""
    import jax.numpy as jnp
    from chinese_asr_tpu.audio import features
    from chinese_asr_tpu.config import AudioConfig
    cfg = AudioConfig()
    rng = np.random.RandomState(0)
    pcm = (rng.randn(2, 16000) * 3000).astype(np.int16)
    lens = jnp.asarray(np.array([16000, 12000], np.int64))
    f_i16, l_i16 = features.featurize_batch(jnp.asarray(pcm), lens, cfg)
    f_f32, l_f32 = features.featurize_batch(
        jnp.asarray(pcm.astype(np.float32) / 32768.0), lens, cfg)
    np.testing.assert_array_equal(np.asarray(l_i16), np.asarray(l_f32))
    np.testing.assert_allclose(np.asarray(f_i16), np.asarray(f_f32),
                               rtol=1e-6, atol=1e-6)


def test_read_wav_int16(tmp_path):
    from chinese_asr_tpu.data import audio_io
    x = (np.random.RandomState(0).randn(4000) * 3000).astype(np.int16)
    p = str(tmp_path / "i.wav")
    audio_io.write_wav(p, x.astype(np.float32) / 32768.0)
    raw, rate = audio_io.read_wav(p, 16000, dtype="int16")
    assert raw.dtype == np.int16 and rate == 16000
    f32, _ = audio_io.read_wav(p, 16000)
    np.testing.assert_allclose(raw.astype(np.float32) / 32768.0, f32,
                               atol=2.0 / 32768)
