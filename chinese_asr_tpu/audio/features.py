"""Log-mel front end, TPU-native.

Reproduces the reference pipeline (reference data.py:129-280) bit-for-bit in
math while restructuring it for the MXU:

  preemphasis -> framing -> window+DFT **as two matmuls** -> power -> mel
  matmul -> eps-floor -> log -> delta/delta-delta conv -> x3 frame stacking

Key parity details honored:
* ``torch.stft(n_fft=512, hop=160, win_length=400, hann, center=False,
  onesided=True)`` (data.py:205-209): the 400-tap periodic Hann window is
  zero-padded to 512 **centered** (left offset 56), frames are
  ``x[t*160 : t*160+512]``, n_frames = (N-512)//160 + 1.  We never
  materialize 512-wide frames: the window and the DFT basis are folded into
  two [400, 257] matrices, so each frame is a 400-sample gather followed by
  MXU matmuls.
* The mel filterbank reproduces the reference's formula *including its
  quirk* that STFT bin centers are taken as linspace(f_min, f_max, 257)
  (data.py:43) rather than linspace(0, sr/2, 257).
* Zero power is floored to float32 eps before log (data.py:223-224).
* delta/delta-delta: 9-tap [identity; delta; delta*delta] filter stack,
  L2-normalized per filter, zero-padded 'same' conv (data.py:129-164).
* x3 downsample stacks channel-major: [3, T, 80] -> [T//3, 720] with layout
  (channel, frame-within-triple, mel) (data.py:244-249).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AudioConfig


# --------------------------------------------------------------------------
# host-side constants (computed once per AudioConfig)
# --------------------------------------------------------------------------
def hann_window_periodic(win_length: int) -> np.ndarray:
    """torch.hann_window default (periodic=True)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(np.float32)


def mel_filterbank(n_stft: int, f_min: float, f_max: float, n_mels: int) -> np.ndarray:
    """HTK triangular filterbank, reference formula data.py:21-57 (note the
    reference's stft_freqs = linspace(f_min, f_max, n_stft) quirk)."""
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    stft_freqs = np.linspace(f_min, f_max, n_stft)
    m_min = 0.0 if f_min == 0 else hz_to_mel(f_min)
    m_max = hz_to_mel(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]                       # (n_mels + 1,)
    slopes = f_pts[None, :] - stft_freqs[:, None]         # (n_stft, n_mels + 2)
    down = (-slopes[:, :-2]) / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def delta_filter_stack() -> np.ndarray:
    """[9, 3] tap stack: identity / delta / delta-delta, each L2-normalized
    (reference data.py:137-147; the scipy convolve is constant-folded)."""
    delta = np.array([2, 1, 0, -1, -2], dtype=np.float64)
    dd = np.convolve(delta, delta, mode="full")           # 9 taps
    stack = np.stack([
        np.pad([1.0], (4, 4)),
        np.pad(delta, (2, 2)),
        dd,
    ], axis=1)                                            # [9, 3]
    stack = stack / np.sqrt((stack ** 2).sum(axis=0, keepdims=True))
    return stack.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _constants(cfg: AudioConfig) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(cos_mat [win,257], sin_mat [win,257], mel_fb [257,80], deltas [9,3]).

    Window + centered zero-pad offset + DFT basis folded together:
    frame_sample m sits at DFT position (n_fft-win)//2 + m.
    """
    n_fft = cfg.n_fft
    win = cfg.win_length
    n_bins = n_fft // 2 + 1
    w = hann_window_periodic(win).astype(np.float64)
    offset = (n_fft - win) // 2
    n = offset + np.arange(win, dtype=np.float64)         # positions in 512 frame
    k = np.arange(n_bins, dtype=np.float64)
    phase = 2.0 * np.pi * np.outer(n, k) / n_fft          # [win, bins]
    cos_mat = (np.cos(phase) * w[:, None]).astype(np.float32)
    sin_mat = (-np.sin(phase) * w[:, None]).astype(np.float32)
    fb = mel_filterbank(n_bins, cfg.f_min, cfg.f_max, cfg.n_mels)
    return cos_mat, sin_mat, fb, delta_filter_stack()


def num_frames(n_samples, cfg: AudioConfig):
    """Frames for center=False STFT on the *post-preemphasis* signal
    (preemphasis drops one sample, data.py:202)."""
    n = n_samples - (1 if cfg.preemphasis > 0 else 0)
    return 1 + (n - cfg.n_fft) // cfg.hop_length


def feat_len_from_samples(n_samples, cfg: AudioConfig):
    t = num_frames(n_samples, cfg)
    return t // 3 if cfg.downsample else t


# --------------------------------------------------------------------------
# jit-able pipeline
# --------------------------------------------------------------------------
def _frame(x, n_frames_max: int, cfg: AudioConfig):
    """x [..., N] -> frames [..., T, win] via gather.

    Only the window's support is gathered: torch.stft frames are n_fft=512
    wide with the 400-tap window centered, so the live samples of frame t are
    x[t*hop + 56 : t*hop + 56 + 400].
    """
    offset = (cfg.n_fft - cfg.win_length) // 2
    idx = (jnp.arange(n_frames_max)[:, None] * cfg.hop_length + offset
           + jnp.arange(cfg.win_length)[None, :])         # [T, win]
    return x[..., idx]


def log_mel(audio, n_frames_max: int, cfg: AudioConfig, frame_mask=None):
    """audio [..., N] float32 (already dithered if training) ->
    log-mel [..., T, n_mels].

    frame_mask [..., T] (1 valid / 0 pad): if given, padded frames are zeroed
    *after* the log so the delta conv sees zeros beyond the true end, exactly
    like the reference's per-utterance zero padding (data.py:157-159).
    """
    cos_mat, sin_mat, fb, _ = _constants(cfg)
    cos_mat, sin_mat, fb = jnp.asarray(cos_mat), jnp.asarray(sin_mat), jnp.asarray(fb)

    if cfg.preemphasis > 0.0:
        audio = audio[..., 1:] - cfg.preemphasis * audio[..., :-1]
    frames = _frame(audio, n_frames_max, cfg)             # [..., T, win]
    re = frames @ cos_mat                                 # [..., T, bins]
    im = frames @ sin_mat
    power = re * re + im * im
    mel = power @ fb                                      # [..., T, n_mels]
    eps = jnp.float32(np.finfo(np.float32).eps)
    mel = jnp.where(mel == 0.0, eps, mel)
    out = jnp.log(mel)
    if frame_mask is not None:
        out = out * frame_mask[..., None]
    return out


def add_delta_deltas(feat):
    """feat [..., T, n_mels] -> [..., 3, T, n_mels] (reference data.py:129-164)."""
    _, _, _, taps = _constants(AudioConfig())             # taps independent of cfg
    taps = jnp.asarray(taps)                              # [9, 3]
    x = jnp.pad(feat, [(0, 0)] * (feat.ndim - 2) + [(4, 4), (0, 0)])
    # stack 9 shifted views then contract: [..., T, 9, M] x [9, 3]
    T = feat.shape[-2]
    shifts = jnp.stack([x[..., j:j + T, :] for j in range(9)], axis=-2)
    out = jnp.einsum("...tjm,jc->...ctm", shifts, taps)
    return out


def stack3(feat3):
    """[..., 3, T, M] -> [..., T//3, 9*M] channel-major stacking
    (reference data.py:244-249: view(3, T//3, 3M) -> transpose -> flatten)."""
    *lead, C, T, M = feat3.shape
    T3 = (T // 3) * 3
    f = feat3[..., :T3, :].reshape(*lead, C, T3 // 3, 3 * M)
    f = jnp.moveaxis(f, -3, -2)                           # [..., T//3, C, 3M]
    return f.reshape(*lead, T3 // 3, C * 3 * M)


def deltas_stack3(feat):
    """Fused ``stack3(add_delta_deltas(feat))``: [..., T, M] -> [..., T//3, 9M].

    Same math as the two-step path (delta conv then channel-major x3
    stacking, reference data.py:129-164 + 244-249) but emitted directly in
    the final layout: output column c*3M + r*M + m is
    ``sum_j taps[j, c] * x_pad[3*t3 + r + j, m]`` — nine 9-tap strided
    weighted sums concatenated on the feature axis.  This removes the
    [..., T, 9, M] stack, the [..., 3, T, M] intermediate, and the
    channel transpose that the TPU profile showed as a ~1.4 ms layout
    copy + 0.7 ms conv at B=128 (PERF.md); XLA fuses the whole thing
    into one elementwise loop over the output.

    Taps are summed j-ascending; the two-step path reduces the same nine
    f32 terms through the einsum, so results agree to f32 reassociation
    (parity test: tests/test_features.py::test_deltas_stack3_fused_parity).
    """
    _, _, _, taps = _constants(AudioConfig())             # taps independent of cfg
    T = feat.shape[-2]
    T3 = T // 3
    if T3 == 0:                                           # < one output frame
        lead = feat.shape[:-2]
        return jnp.zeros(lead + (0, 9 * feat.shape[-1]), feat.dtype)
    x = jnp.pad(feat, [(0, 0)] * (feat.ndim - 2) + [(4, 4), (0, 0)])
    comps = []
    for c in range(3):
        for r in range(3):
            acc = None
            for j in range(9):
                w = float(taps[j, c])
                if w == 0.0:
                    continue
                sl = jax.lax.slice_in_dim(x, r + j, r + j + 3 * (T3 - 1) + 1,
                                          stride=3, axis=feat.ndim - 2)
                acc = w * sl if acc is None else acc + w * sl
            comps.append(acc)                             # [..., T3, M]
    return jnp.concatenate(comps, axis=-1)                # [..., T3, 9M]


def instance_norm(feat, mask=None, eps: float = 1e-6, unbiased: bool = True):
    """(x - mean_t) / (std_t + eps) per utterance over valid frames
    (reference main.py:37 eps=1e-6; data.py:517 eps=1e-7 in the loader —
    pass eps accordingly).  torch .std() is unbiased (n-1)."""
    if mask is None:
        n = feat.shape[-2]
        mean = feat.mean(axis=-2, keepdims=True)
        var = ((feat - mean) ** 2).sum(axis=-2, keepdims=True) / max(n - 1, 1)
    else:
        m = mask[..., None]
        n = jnp.maximum(m.sum(axis=-2, keepdims=True), 1.0)
        mean = (feat * m).sum(axis=-2, keepdims=True) / n
        dof = jnp.maximum(n - 1.0, 1.0) if unbiased else n
        var = (((feat - mean) * m) ** 2).sum(axis=-2, keepdims=True) / dof
    out = (feat - mean) / (jnp.sqrt(var) + eps)
    if mask is not None:
        out = out * mask[..., None]
    return out


def _use_pallas() -> bool:
    """Fused Pallas kernel on TPU backends (ops/pallas/logmel.py); the
    pure-XLA path everywhere else.  Override with CHINESE_ASR_PALLAS=0/1."""
    import os

    flag = os.environ.get("CHINESE_ASR_PALLAS")
    if flag is not None:
        return flag != "0"
    import jax

    return jax.default_backend() == "tpu"


def featurize(audio, n_frames_max: int, cfg: AudioConfig, frame_mask=None):
    """Full front end: audio [..., N] -> features.

    Non-CNN2D layout: [..., T', feat_dim] with feat_dim = 720 for defaults.
    CNN2D layout is produced by the caller from the pre-stack tensor.
    """
    if _use_pallas():
        from ..ops.pallas import logmel as pallas_logmel

        lm = pallas_logmel.log_mel(audio, n_frames_max, cfg, frame_mask)
    else:
        lm = log_mel(audio, n_frames_max, cfg, frame_mask)  # [..., T, 80]
    if cfg.delta_delta and cfg.downsample:
        return deltas_stack3(lm)                          # fused, final layout
    if cfg.delta_delta:
        f3 = add_delta_deltas(lm)                         # [..., 3, T, 80]
    else:
        f3 = lm[..., None, :, :]
    if cfg.downsample:
        return stack3(f3)
    # no downsample: [..., T, C*M]
    f = jnp.moveaxis(f3, -3, -2)
    return f.reshape(f.shape[:-2] + (-1,))


def featurize_batch(wavs, wav_lens, cfg: AudioConfig, norm_eps: float = 1e-7,
                    scale=None):
    """Batched, fully jit-able: wavs [B, N] zero-padded, wav_lens [B] ->
    (features [B, T', D], feat_lens [B]).

    Padded frames are zeroed pre-delta (parity with per-utterance zero conv
    padding) and excluded from the instance-norm statistics.

    ``scale`` ([B] float32, optional) multiplies each utterance after the
    int16 -> float conversion; with ``audio_io.peak_scale`` factors this
    reproduces the host-side ``peak_normalize`` (sox --norm=-1) bitwise
    while still shipping raw PCM16 over the host->device link.
    """
    if wavs.dtype == jnp.int16:
        # raw PCM16 shipped host->device (half the transfer bytes);
        # converting here matches the host's int16 -> float32 /32768 exactly
        wavs = wavs.astype(jnp.float32) / 32768.0
    if scale is not None:
        wavs = wavs * scale[:, None].astype(wavs.dtype)
    B, N = wavs.shape
    T = int(num_frames(N, cfg))
    # clamp: wavs shorter than one frame yield 0 valid frames, not negative
    valid_frames = jnp.maximum(num_frames(wav_lens, cfg), 0)  # [B]
    fmask = (jnp.arange(T)[None, :] < valid_frames[:, None]).astype(wavs.dtype)
    feats = featurize(wavs, T, cfg, frame_mask=fmask)     # [B, T', D]
    feat_lens = valid_frames // 3 if cfg.downsample else valid_frames
    Tp = feats.shape[1]
    out_mask = (jnp.arange(Tp)[None, :] < feat_lens[:, None]).astype(feats.dtype)
    if cfg.normalize:
        feats = instance_norm(feats, out_mask, eps=norm_eps)
    else:
        feats = feats * out_mask[..., None]
    return feats, feat_lens


# --------------------------------------------------------------------------
# wire formats for the host->device wav upload
# --------------------------------------------------------------------------
# The device tunnel sustains ~40-60 MB/s, which makes the offline batch
# path upload-bound (PERF.md).  Two wire reductions, both expanded ON
# DEVICE so the featurizer input is a normal [B, N] float batch:
#
# * flat packing (lossless): ship exactly sum(lens) samples instead of a
#   zero-padded [B, N_max] matrix, and scatter into the padded layout with
#   one gather — removes the padding bytes the sorted buckets still carry.
# * mu-law companding (opt-in, lossy): 8-bit log-PCM (mu=255, the G.711
#   curve over the full int16 range), halving the 2-byte/sample floor.
#   Speech SNR ~35 dB — far above what an 80-mel log front end resolves;
#   transcript parity is proven by test (tests/test_wire.py) rather than
#   assumed.

MULAW_MU = 255.0


def mulaw_encode_i16(x: "np.ndarray") -> "np.ndarray":
    """int16 PCM -> uint8 mu-law code (host side, LUT over all 65536
    values; vectorized single gather)."""
    import numpy as _np
    global _MULAW_ENC_LUT
    try:
        lut = _MULAW_ENC_LUT
    except NameError:
        v = _np.arange(-32768, 32768, dtype=_np.int64) / 32768.0
        u = _np.sign(v) * _np.log1p(MULAW_MU * _np.abs(v)) / \
            _np.log1p(MULAW_MU)
        lut = _MULAW_ENC_LUT = _np.round(
            (u + 1.0) * 127.5).astype(_np.uint8)
    return lut[x.astype(_np.int64) + 32768]


def mulaw_decode_table() -> "np.ndarray":
    """[256] float32 decode table: code -> sample in [-1, 1) (the exact
    centers of the encoder's quantization bins)."""
    import numpy as _np
    q = _np.arange(256, dtype=_np.float64)
    u = q / 127.5 - 1.0
    x = _np.sign(u) * ((1.0 + MULAW_MU) ** _np.abs(u) - 1.0) / MULAW_MU
    return x.astype(_np.float32)


def mulaw_decode_jnp(q):
    """uint8 mu-law code -> float32 sample, elementwise (a 256-entry
    table gather costs ~300 ms for a 14M-sample batch on TPU; exp2 math
    is fused and ~free)."""
    u = q.astype(jnp.float32) * (1.0 / 127.5) - 1.0
    return jnp.sign(u) * (jnp.exp2(8.0 * jnp.abs(u)) - 1.0) / MULAW_MU


def unpack_flat(flat, lens, N: int):
    """Expand a flat concatenated wav buffer to the padded [B, N] batch
    layout on device.  ``flat`` is [sum(lens)+pad] of int16 (raw PCM),
    uint8 (mu-law), or float32; returns [B, N] float32 with exact zeros
    in the padding region — bit-identical to the host-padded matrix for
    int16/float32 wires.

    Rows are CONTIGUOUS runs of flat, so the expansion is a vmapped
    dynamic_slice (which XLA lowers to per-row DMA) rather than a
    whole-matrix gather (arbitrary-index gathers measured ~300 ms for
    128 x 112k elements on v5e)."""
    start = jnp.concatenate([jnp.zeros(1, lens.dtype),
                             jnp.cumsum(lens)[:-1]])
    # pad by N so every row's slice window [start, start+N) is in bounds
    # (dynamic_slice would otherwise clamp the tail rows' start, shifting
    # their samples); a 1-D device-side pad is a ~free HBM copy
    flat = jnp.pad(flat, (0, N))
    x = jax.vmap(lambda s: jax.lax.dynamic_slice(flat, (s,), (N,)))(start)
    if x.dtype == jnp.uint8:
        x = mulaw_decode_jnp(x)
    elif x.dtype == jnp.int16:
        x = x.astype(jnp.float32) / 32768.0
    else:
        x = x.astype(jnp.float32)
    mask = jnp.arange(N, dtype=lens.dtype)[None, :] < lens[:, None]
    return jnp.where(mask, x, 0.0)


def featurize_flat(flat, lens, N: int, cfg: AudioConfig,
                   norm_eps: float = 1e-7, scale=None):
    """featurize_batch over the flat wire layout (see unpack_flat)."""
    return featurize_batch(unpack_flat(flat, lens, N), lens, cfg,
                           norm_eps=norm_eps, scale=scale)


# --------------------------------------------------------------------------
# 4-bit block-adaptive ADPCM wire (opt-in; PERF.md lever #6)
# --------------------------------------------------------------------------
# Quarters the PCM16 wire (0.5 byte/sample + ~1.2% block headers) by coding
# the first-difference residual with an IMA-style 3-bit adaptive magnitude
# + sign.  Deviations from IMA (both deliberate, both for the TPU):
#
# * blocks of ADPCM_K samples are decode-INDEPENDENT (header carries the
#   initial predictor + step index), so the device decode is one
#   ``lax.scan`` of K steps vmapped across every block in the batch —
#   sequential in K only, parallel over ~Ltot/K lanes;
# * the step table is replaced by exact integer math
#   ``step(i) = (8 + (i & 7)) << (i >> 3)`` (geometric ~x1.09/step, range
#   8..30720 over i in [0, 95]) so the per-step lookup is elementwise
#   shift/and ops instead of a table gather (an 89-entry gather per scan
#   step measured ~300 ms/batch for the mu-law LUT's equivalent volume).
#
# Encoder (host, numpy) and decoder (device, jnp) share the same int32
# state machine, so the device reconstruction is BIT-EXACT to what the
# encoder tracked — pinned by test, as is transcript parity on an overfit
# model (tests/test_wire.py).

ADPCM_K = 256            # samples per block (16 ms @ 16 kHz)
_ADPCM_IDX_MAX = 95


def _adpcm_step(idx):
    """Exact integer step size for index ``idx`` (numpy or jnp int32)."""
    return (8 + (idx & 7)) << (idx >> 3)


def adpcm_bytes(n_samples: int) -> int:
    """Wire bytes for ``n_samples`` (must be a multiple of ADPCM_K)."""
    nb = n_samples // ADPCM_K
    return 3 * nb + nb * ADPCM_K // 2


def adpcm_encode_flat(x: "np.ndarray", out: "np.ndarray" = None):
    """Encode an int16 flat buffer (len a multiple of ADPCM_K) into the
    packed uint8 wire: [pred0 lo | pred0 hi | idx0 | nibbles], where the
    nibble block is [K/2, nb] with byte j holding codes (2j, 2j+1).

    Dispatches to the C++ kernel (runtime/cpp/adpcm.cpp) when the
    toolchain is available — the K python-level vector steps below cost
    ~1 s at the offline bench size vs ~60 ms native; both encoders are
    bit-identical by construction (integer-only math, pinned by test)."""
    import numpy as _np
    K = ADPCM_K
    assert x.dtype == _np.int16 and len(x) % K == 0, (x.dtype, len(x))
    if out is None:
        out = _np.empty(adpcm_bytes(len(x)), _np.uint8)
    else:
        # the C++ kernel writes through raw pointers — validate up front
        assert out.dtype == _np.uint8 and out.flags["C_CONTIGUOUS"] \
            and out.size == adpcm_bytes(len(x)), \
            (out.dtype, out.flags["C_CONTIGUOUS"], out.size)
    if not len(x):
        return out
    from ..runtime import native
    lib = native.get_adpcm()
    if lib is not None:
        lib(_np.ascontiguousarray(x), out)
        return out
    xi = x.astype(_np.int32)
    nb = len(x) // K
    blocks = xi.reshape(nb, K)
    # initial predictor = last original sample of the previous block
    pred0 = _np.concatenate([[0], blocks[:-1, -1]]).astype(_np.int32)
    # initial step index: first step >= 2 * mean|first difference| —
    # pure integer math (sum >> 7 == 2*mean for K=256) so the C++ and
    # numpy encoders agree bit-for-bit; any header choice decodes
    # correctly, adaptation converges within ~10 samples either way
    acc = _np.abs(_np.diff(blocks, axis=1,
                           prepend=pred0[:, None])).sum(1, _np.int64)
    table = _adpcm_step(_np.arange(_ADPCM_IDX_MAX + 1, dtype=_np.int32))
    idx0 = _np.minimum(
        _np.searchsorted(table, _np.maximum(acc >> 7, 8)),
        _ADPCM_IDX_MAX).astype(_np.int32)
    pred, idx = pred0.copy(), idx0.copy()
    codes = _np.empty((K, nb), _np.uint8)
    for t in range(K):
        s = blocks[:, t]
        step = _adpcm_step(idx)
        diff = s - pred
        sign = (diff < 0).astype(_np.int32)
        mag = _np.minimum((_np.abs(diff) << 2) // step, 7)
        dq = ((2 * mag + 1) * step) >> 3
        pred = _np.clip(pred + _np.where(sign, -dq, dq), -32768, 32767)
        idx = _np.clip(idx + _np.where(mag < 4, -1, 2 * (mag - 3)),
                       0, _ADPCM_IDX_MAX)
        codes[t] = ((sign << 3) | mag).astype(_np.uint8)
    nib = (codes[0::2] | (codes[1::2] << 4)).reshape(-1)
    out[:nb] = (pred0 & 255).astype(_np.uint8)
    out[nb: 2 * nb] = ((pred0 >> 8) & 255).astype(_np.uint8)
    out[2 * nb: 3 * nb] = idx0.astype(_np.uint8)
    out[3 * nb:] = nib
    return out


def adpcm_decode_flat(buf, nb: int):
    """Device-side decode of the packed ADPCM wire -> float32 flat buffer
    of nb*ADPCM_K samples in [-1, 1).  One lax.scan over the K in-block
    steps, all [nb] lanes in parallel; bit-exact mirror of the encoder's
    int32 state machine."""
    K = ADPCM_K
    lo = buf[:nb].astype(jnp.int32)
    hi = buf[nb: 2 * nb].astype(jnp.int32)
    pred0 = lo | (hi << 8)
    pred0 = pred0 - ((pred0 >> 15) << 16)          # sign-extend int16
    idx0 = buf[2 * nb: 3 * nb].astype(jnp.int32)
    nib = buf[3 * nb:].reshape(K // 2, nb)
    codes = jnp.stack([nib & 15, nib >> 4], axis=1).reshape(K, nb)

    def body(carry, code):
        pred, idx = carry
        step = _adpcm_step(idx)
        code = code.astype(jnp.int32)
        mag = code & 7
        dq = ((2 * mag + 1) * step) >> 3
        pred = pred + jnp.where(code >> 3 != 0, -dq, dq)
        pred = jnp.clip(pred, -32768, 32767)
        idx = jnp.clip(idx + jnp.where(mag < 4, -1, 2 * (mag - 3)),
                       0, _ADPCM_IDX_MAX)
        return (pred, idx), pred

    _, samples = jax.lax.scan(body, (pred0, idx0), codes, unroll=8)
    # [K, nb] -> flat sample order, scaled to the float wav convention
    return samples.T.reshape(-1).astype(jnp.float32) * (1.0 / 32768.0)


def featurize_adpcm(buf, lens, N: int, cfg: AudioConfig,
                    norm_eps: float = 1e-7, scale=None):
    """featurize_batch over the ADPCM wire (decode + flat row unpack)."""
    nb = buf.shape[0] // (3 + ADPCM_K // 2)
    flat = adpcm_decode_flat(buf, nb)
    return featurize_batch(unpack_flat(flat, lens, N), lens, cfg,
                           norm_eps=norm_eps, scale=scale)
