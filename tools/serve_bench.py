"""Open-loop Poisson latency benchmark for the HTTP serving stack.

VERDICT r3 #7: serve.py's micro-batcher had CPU correctness tests only;
this tool measures what a serving user actually feels — request LATENCY
under load — on the real chip.  An open-loop Poisson client (arrivals
don't wait for completions, so queueing delay is measured honestly)
drives ``serve_http`` in-process at several request rates and reports
p50/p90/p99 latency, achieved RPS, and the realized batch-size
distribution, for each micro-batching window size under test.

Run on the TPU host:
  python tools/serve_bench.py --rates 5,20,60 --windows 0,15,40 \
      --duration 20 [--overfit 300]

--overfit trains the flagship on short eos-terminated targets first so
the batch-wide early exit fires (the production decode regime); without
it every decode runs all 40 steps (worst case).
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import struct
import sys
import threading
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def wav_bytes(wav: np.ndarray, sr: int) -> bytes:
    """Minimal PCM16 WAV container around an int16 waveform."""
    data = wav.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data), b"WAVE", b"fmt ",
        16, 1, 1, sr, sr * 2, 2, 16, b"data", len(data))
    return hdr + data


def run_load_point(port: int, payload: bytes, rate: float, duration: float,
                   rng: np.random.RandomState):
    """Open-loop: launch a request thread at each Poisson arrival time."""
    lat: list = []
    errs = [0]
    rej = [0]         # HTTP 429 fast-fails (load shedding), with latency
    rej_lat: list = []
    lock = threading.Lock()

    def one():
        t0 = time.perf_counter()
        status = None
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
            conn.request("POST", "/transcribe", body=payload)
            resp = conn.getresponse()
            body = resp.read()
            status = resp.status
            ok = resp.status == 200 and json.loads(body).get("text") is not None
            conn.close()
        except Exception:
            ok = False
        dt = time.perf_counter() - t0
        with lock:
            if ok:
                lat.append(dt)
            elif status == 429:
                rej[0] += 1
                rej_lat.append(dt)
            else:
                errs[0] += 1

    threads = []
    t_end = time.perf_counter() + duration
    while time.perf_counter() < t_end:
        th = threading.Thread(target=one)
        th.start()
        threads.append(th)
        time.sleep(rng.exponential(1.0 / rate))
    t_launch_end = time.perf_counter()
    for th in threads:
        th.join(timeout=180)
    lat.sort()

    def pct(p):
        return lat[min(len(lat) - 1, int(p / 100 * len(lat)))] if lat else 0.0

    rej_lat.sort()
    return {
        "sent": len(threads),
        "ok": len(lat),
        "errs": errs[0],
        "rej": rej[0],
        "rej_p99_ms": (rej_lat[int(0.99 * (len(rej_lat) - 1))] * 1e3
                       if rej_lat else 0.0),
        "rps": len(lat) / max(t_launch_end -
                              (t_end - duration), 1e-9),
        "p50_ms": pct(50) * 1e3,
        "p90_ms": pct(90) * 1e3,
        "p99_ms": pct(99) * 1e3,
        "max_ms": (lat[-1] if lat else 0.0) * 1e3,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rates", default="5,20,60",
                    help="request rates (RPS) to test, comma-separated")
    ap.add_argument("--windows", default="0,15,40",
                    help="micro-batch window sizes (ms) to test")
    ap.add_argument("--duration", type=float, default=20.0)
    ap.add_argument("--secs", type=float, default=7.0)
    ap.add_argument("--max-batch", type=int, default=128)
    ap.add_argument("--overfit", type=int, default=0,
                    help="train this many steps first (early-exit regime)")
    ap.add_argument("--small", action="store_true",
                    help="tiny model + forced CPU (flow smoke, not a bench)")
    args = ap.parse_args()
    if args.small:
        os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

    import jax
    import jax.numpy as jnp

    from chinese_asr_tpu.api import ASR, _identity_vocab
    from chinese_asr_tpu.config import Config
    from chinese_asr_tpu.models import las
    from chinese_asr_tpu.serve import serve_http
    from chinese_asr_tpu.utils import compile_cache

    if args.small:
        jax.config.update("jax_platforms", "cpu")
    compile_cache.configure(ROOT, cpu=jax.default_backend() == "cpu")
    cfg = Config()
    if args.small:
        cfg = (cfg.with_("encoder", hidden_size=16, num_layers=2)
                  .with_("decoder", hidden_size=32, embed_dim=12)
                  .with_("attention", attn_size=8)
                  .with_("vocab", max_num_words=60)
                  .with_("decode", max_len=6))
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    if args.overfit:
        import functools
        from chinese_asr_tpu.audio import features
        from chinese_asr_tpu.train import optim
        from chinese_asr_tpu.train.step import Batch, train_step
        rng0 = np.random.RandomState(0)
        TB, S, L = 64, 40, 12
        SRr = cfg.audio.sample_rate
        t_wavs = jnp.asarray((0.1 * rng0.randn(TB, int(args.secs * SRr))
                              ).astype(np.float32))
        t_lens = jnp.asarray(np.full(TB, int(args.secs * SRr), np.int64))
        t_feats, t_flens = jax.jit(lambda w, l: features.featurize_batch(
            w, l, cfg.audio))(t_wavs, t_lens)
        text = np.tile(rng0.randint(4, cfg.vocab.vocab_size, size=(1, L)),
                       (TB, 1)).astype(np.int32)
        pad = np.zeros((TB, S - 1 - L), np.int32)
        batch = Batch(
            t_feats, t_flens,
            jnp.asarray(np.concatenate(
                [np.full((TB, 1), cfg.vocab.sos, np.int32), text, pad], 1)),
            jnp.asarray(np.concatenate(
                [text, np.full((TB, 1), cfg.vocab.eos, np.int32), pad], 1)),
            jnp.asarray(np.full(TB, L + 1, np.int32)))
        tx = optim.make_optimizer(cfg.train)
        opt = tx.init(params)
        step = jax.jit(functools.partial(train_step, cfg=cfg, tx=tx))
        for i in range(args.overfit):
            params, opt, m = step(params, opt, batch=batch,
                                  rng=jax.random.PRNGKey(i))
        print(f"overfit {args.overfit} steps: "
              f"acc={float(m['accuracy']):.3f}", flush=True)

    sr = cfg.audio.sample_rate
    rng = np.random.RandomState(1)
    wav = (0.1 * rng.randn(int(args.secs * sr)) * 32767 / 4).astype(np.int16)
    payload = wav_bytes(wav, sr)

    print(f"# backend={jax.default_backend()} secs={args.secs} "
          f"max_batch={args.max_batch} overfit={args.overfit}")
    print(f"# {'window_ms':>9} {'rate':>6} {'sent':>5} {'ok':>5} "
          f"{'err':>4} {'429':>5} {'p50_ms':>8} {'p90_ms':>8} "
          f"{'p99_ms':>8} {'max_ms':>8} {'rej_p99':>8} {'avg_B':>6}")
    for window in [float(w) for w in args.windows.split(",")]:
        # fresh ASR per window: clean jit cache accounting, same params
        asr = ASR(cfg=cfg, bw=16, flat_pow2=True,
                  vocab=_identity_vocab(cfg.vocab.vocab_size))
        asr.params = params
        srv = serve_http(asr, port=0, max_batch=args.max_batch,
                         window_ms=window)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        port = srv.server_port
        t0 = time.time()
        n_warm = srv.batcher.warm(wav)
        print(f"# window={window}: warmed {n_warm} ladder sizes in "
              f"{time.time() - t0:.0f}s", flush=True)
        for rate in [float(r) for r in args.rates.split(",")]:
            b0, r0 = srv.batcher.batches, srv.batcher.requests
            res = run_load_point(port, payload, rate, args.duration, rng)
            db = srv.batcher.batches - b0
            avg_b = (srv.batcher.requests - r0) / max(db, 1)
            print(f"# {window:>9.0f} {rate:>6.1f} {res['sent']:>5} "
                  f"{res['ok']:>5} {res['errs']:>4} {res['rej']:>5} "
                  f"{res['p50_ms']:>8.0f} {res['p90_ms']:>8.0f} "
                  f"{res['p99_ms']:>8.0f} {res['max_ms']:>8.0f} "
                  f"{res['rej_p99_ms']:>8.0f} {avg_b:>6.1f}", flush=True)
        srv.shutdown()


if __name__ == "__main__":
    main()
