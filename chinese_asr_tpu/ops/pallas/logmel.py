"""Fused Pallas TPU kernel for the log-mel front end.

Replaces the XLA path in audio/features.log_mel (itself a restructuring of
reference data.py:199-224) with one kernel per utterance row that never
materializes the [T, 257] spectrum or the [T, 400] frame matrix in HBM:

  hop-chunked wav (VMEM) -> windowed DFT as PER-PART MXU matmuls ->
  power -> mel matmul -> eps-floor -> log -> [T, n_mels] out

Framing without gathers or reshapes: with hop=160 and a 400-tap window at
offset 56 inside the 512-sample frame, frame t covers samples
[t*160+56, t*160+456).  The host-side wrapper shifts by 56 and reshapes the
row into [T+3, 160] hop-chunks (free in XLA); inside the kernel frame t is
chunks (t, t+1, t+2), so the windowed DFT

  re[t] = frames[t] @ cos  ==  sum_i ch[t+i] @ cos_part_i

becomes three [T, 160] x [160, bins] MXU matmuls over sublane-shifted
views — no reshape/concat/gather ever reaches Mosaic (its vector layouts
reject 1D->2D casts of non-lane-aligned folds).  The last part's rows past
the window end are zero in the constant, so no lane slicing is needed
either.  DFT bins are zero-padded to 384 lanes (3x128) to tile the MXU;
padded bins yield zero power and zero mel rows.  Constants come from
audio/features._constants, so numerics match the XLA path up to matmul
accumulation order.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import AudioConfig
from ...audio import features as feat_mod

_LANE = 128


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _padded_constants(cfg: AudioConfig) -> Tuple[np.ndarray, np.ndarray,
                                                 np.ndarray, int, int]:
    """(cos_parts [P, hop, bins_p], sin_parts, fb [bins_p, n_mels],
    bins_p, P)."""
    cos_m, sin_m, fb, _ = feat_mod._constants(cfg)
    win, n_bins = cos_m.shape
    hop = cfg.hop_length
    bins_p = _round_up(n_bins, _LANE)
    P = -(-win // hop)                                    # parts per frame
    cos_parts = np.zeros((P, hop, bins_p), np.float32)
    sin_parts = np.zeros((P, hop, bins_p), np.float32)
    for i in range(P):
        rows = min(hop, win - i * hop)
        cos_parts[i, :rows, :n_bins] = cos_m[i * hop: i * hop + rows]
        sin_parts[i, :rows, :n_bins] = sin_m[i * hop: i * hop + rows]
    fb_p = np.zeros((bins_p, fb.shape[1]), np.float32)
    fb_p[:n_bins] = fb
    return cos_parts, sin_parts, fb_p, bins_p, P


def _kernel(ch_ref, cos_ref, sin_ref, fb_ref, out_ref, *,
            T: int, P: int, eps: float):
    re = None
    im = None
    for i in range(P):
        part = ch_ref[0, i:T + i, :]                      # [T, hop]
        r = jnp.dot(part, cos_ref[i], preferred_element_type=jnp.float32)
        s = jnp.dot(part, sin_ref[i], preferred_element_type=jnp.float32)
        re = r if re is None else re + r
        im = s if im is None else im + s
    power = re * re + im * im                             # [T, bins_p]
    mel = jnp.dot(power, fb_ref[:, :], preferred_element_type=jnp.float32)
    mel = jnp.where(mel == 0.0, eps, mel)
    out_ref[0, :, :] = jnp.log(mel)


def pallas_log_mel(wav, n_frames: int, cfg: AudioConfig,
                   interpret: bool = False):
    """wav [B, N] float32 (already pre-emphasized) -> [B, T, n_mels].

    Matches audio/features.log_mel applied after preemphasis."""
    B, N = wav.shape
    T = n_frames
    hop, win = cfg.hop_length, cfg.win_length
    offset = (cfg.n_fft - win) // 2
    cos_p, sin_p, fb_p, bins_p, P = _padded_constants(cfg)

    n_chunks = T + P
    need = offset + n_chunks * hop
    if need > N:
        wav = jnp.pad(wav, ((0, 0), (0, need - N)))
    # shift by the window offset and fold into hop-chunks (free in XLA)
    chunks = wav[:, offset:offset + n_chunks * hop].reshape(B, n_chunks, hop)

    eps = float(np.finfo(np.float32).eps)
    kernel = functools.partial(_kernel, T=T, P=P, eps=eps)
    flops = 2 * T * hop * bins_p * 2 * P + 2 * T * bins_p * cfg.n_mels
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n_chunks, hop), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, hop, bins_p), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, hop, bins_p), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bins_p, cfg.n_mels), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, cfg.n_mels), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, cfg.n_mels), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=B * flops,
            bytes_accessed=B * (n_chunks * hop + T * cfg.n_mels) * 4,
            transcendentals=B * T * cfg.n_mels),
        interpret=interpret,
    )(chunks, jnp.asarray(cos_p), jnp.asarray(sin_p), jnp.asarray(fb_p))


def log_mel(audio, n_frames: int, cfg: AudioConfig, frame_mask=None,
            interpret: bool = False):
    """Drop-in for audio/features.log_mel on TPU: preemphasis (XLA
    elementwise) + fused Pallas kernel + optional frame mask."""
    if cfg.preemphasis > 0.0:
        audio = audio[..., 1:] - cfg.preemphasis * audio[..., :-1]
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    out = pallas_log_mel(audio, n_frames, cfg, interpret=interpret)
    if squeeze:
        out = out[0]
    if frame_mask is not None:
        out = out * frame_mask[..., None]
    return out
