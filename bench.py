"""End-of-round benchmark: batched beam-search transcription throughput.

Measures the BASELINE.json north-star configuration — batched offline
transcription at beam width 16 — end to end on device: log-mel
featurization + encoder + compiled beam search, synthetic 10-second
16 kHz utterances, flagship model dimensions (720-dim features, 4x256
bidirectional LSTM encoder, 512 LSTM decoder, V=5004).

Prints ONE JSON line:
  {"metric": "rtf_bw16", "value": <x realtime per chip>, "unit":
   "x_realtime", "vs_baseline": value / 100.0}
vs_baseline is relative to the north-star target of 100x realtime per chip
(the reference publishes no numbers of its own — BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import os

    import jax
    import jax.numpy as jnp

    # persistent compilation cache: repeat runs skip the ~1 min compile
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from chinese_asr_tpu.audio import features
    from chinese_asr_tpu.config import Config
    from chinese_asr_tpu.decode import beam
    from chinese_asr_tpu.models import las

    cfg = Config()
    bw = 16
    B = 128
    secs = 10.0
    sr = cfg.audio.sample_rate
    N = int(secs * sr)

    params = las.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    wavs = (0.1 * rng.randn(B, N)).astype(np.float32)
    wav_lens = np.full(B, N, np.int64)
    # vary true lengths a little so masking is exercised
    wav_lens[1::2] = int(0.9 * N)
    for i, l in enumerate(wav_lens):
        wavs[i, l:] = 0.0

    @jax.jit
    def pipeline(params, wavs, wav_lens):
        feats, feat_lens = features.featurize_batch(wavs, wav_lens, cfg.audio)
        return beam.beam_decode(params, cfg, bw, feats, feat_lens)

    wavs_d = jnp.asarray(wavs)
    lens_d = jnp.asarray(wav_lens)

    # compile + warmup.  NOTE: sync via an actual device->host transfer —
    # under the axon tunnel block_until_ready alone does not guarantee the
    # computation ran to completion.
    res = pipeline(params, wavs_d, lens_d)
    np.asarray(res.fin_scores)

    iters = 0
    t0 = time.perf_counter()
    while True:
        res = pipeline(params, wavs_d, lens_d)
        np.asarray(res.fin_scores)
        iters += 1
        elapsed = time.perf_counter() - t0
        if iters >= 3 and elapsed > 5.0:
            break
        if elapsed > 60.0:
            break

    audio_seconds = float(wav_lens.sum()) / sr * iters
    rtf = audio_seconds / elapsed
    utts_per_sec = B * iters / elapsed

    result = {
        "metric": "rtf_bw16",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 100.0, 3),
    }
    print(json.dumps(result))
    print(f"# device={jax.devices()[0].platform} B={B} bw={bw} "
          f"iters={iters} elapsed={elapsed:.2f}s "
          f"utts/s/chip={utts_per_sec:.2f}", file=sys.stderr)


if __name__ == "__main__":
    main()
