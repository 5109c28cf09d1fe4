"""Where does the offline-API batch time go? (VERDICT r2 item #1.)

Replicates bench.py's offline_api_bw16 config (256 mixed-length int16
utterances, max_batch=128 -> 2 sorted chunks) and times each stage
SERIALLY (no overlap): host prep, host->device upload (synced via a tiny
device reduction — block_until_ready is a no-op through the axon tunnel),
device featurize+decode+select, host finalize.  Then times the real
overlapped transcribe_wavs for each wire format.

Run on the TPU host:  python tools/offline_split.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax
    import jax.numpy as jnp

    from chinese_asr_tpu.api import ASR, _identity_vocab
    from chinese_asr_tpu.config import Config
    from chinese_asr_tpu.data.audio_io import peak_scale
    from chinese_asr_tpu.models import las
    from chinese_asr_tpu.utils import compile_cache

    compile_cache.configure(ROOT, cpu=jax.default_backend() == "cpu")
    cfg = Config()
    SR = cfg.audio.sample_rate
    rng = np.random.RandomState(0)
    params = las.init_params(jax.random.PRNGKey(0), cfg)

    OFF = 256
    mix = [4.0, 5.5, 7.0, 8.5, 10.0, 6.0, 9.0, 5.0]
    wav_list = []
    for i in range(OFF):
        n = int(mix[i % len(mix)] * SR)
        wav_list.append((rng.randn(n) * 8000).clip(-32768, 32767)
                        .astype(np.int16))
    scales = [peak_scale(w) for w in wav_list]
    audio_s = sum(len(w) for w in wav_list) / SR
    total_mb = sum(len(w) for w in wav_list) * 2 / 1e6
    print(f"{OFF} utts, {audio_s:.0f} s audio, {total_mb:.1f} MB int16")

    def timed(label, fn, n=3):
        fn()                                    # warm
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        dt = (time.perf_counter() - t0) / n
        print(f"  {label:<28}{dt * 1e3:8.1f} ms")
        return dt

    wires = sys.argv[1:] or ("padded", "flat", "mulaw", "adpcm")
    for wire in wires:
        asr = ASR(cfg=cfg, bw=16, wire=wire,
                  vocab=_identity_vocab(cfg.vocab.vocab_size))
        asr.params = params
        print(f"\nwire={wire}")
        # ---- serialized stages over the two sorted chunks --------------
        order = sorted(range(OFF), key=lambda i: len(wav_list[i]))
        chunks = [order[s:s + 128] for s in range(0, OFF, 128)]
        if wire == "padded":
            prep_f, up_f = asr._prep_host, asr._upload
            feat_f = lambda d: asr._featurize_device(*d)       # noqa: E731
        else:
            prep_f, up_f = asr._prep_flat, asr._upload_flat
            feat_f = lambda d: asr._featurize_flat_device(*d)  # noqa: E731

        preps = [prep_f([wav_list[i] for i in idx],
                        [scales[i] for i in idx]) for idx in chunks]
        wire_mb = sum(p[0].nbytes for p in preps) / 1e6
        print(f"  wire bytes: {wire_mb:.1f} MB")

        timed("host prep", lambda: [prep_f([wav_list[i] for i in idx],
                                           [scales[i] for i in idx])
                                    for idx in chunks])

        def upload_sync():
            for p in preps:
                d = up_f(p)
                # force transfer completion with a 1-element readback
                np.asarray(jnp.sum(d[0][:8].astype(jnp.float32)))

        up = timed("upload (synced)", upload_sync)
        print(f"  -> effective wire rate: {wire_mb / up:.1f} MB/s")

        devs = [up_f(p) for p in preps]

        def device_only():
            outs = [asr._decode_dispatch(feat_f(d)) for d in devs]
            for o in outs:
                np.asarray(o.scores)

        timed("device feat+decode+select", device_only)

        outs = [asr._decode_dispatch(feat_f(d)) for d in devs]
        for o in outs:
            np.asarray(o.scores)
        timed("host finalize", lambda: [asr._decode_finalize(o)
                                        for o in outs])

        # ---- the real overlapped path ----------------------------------
        def e2e():
            assert len(asr.transcribe_wavs(wav_list, scales=scales)) == OFF

        dt = timed("transcribe_wavs (overlapped)", e2e)
        print(f"  => RTF {audio_s / dt:.0f}x   "
              f"{OFF / dt:.0f} utts/s/chip")


if __name__ == "__main__":
    main()
