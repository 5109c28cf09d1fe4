"""HTTP serving + micro-batching (serve.py; the reference's commented
service handler, main.py:9-16, made real)."""

import io
import json
import threading
import urllib.request
import wave as wave_mod

import numpy as np
import pytest

from chinese_asr_tpu.api import ASR, _identity_vocab
from chinese_asr_tpu.config import Config


def _small_cfg():
    return (Config()
            .with_("encoder", hidden_size=16, num_layers=2)
            .with_("decoder", hidden_size=32, embed_dim=12)
            .with_("attention", attn_size=8)
            .with_("vocab", max_num_words=20)
            .with_("decode", max_len=8))


def _wav_bytes(seed: int, n: int = 8000) -> bytes:
    rng = np.random.RandomState(seed)
    pcm = (rng.randn(n) * 6000).clip(-32768, 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


@pytest.fixture(scope="module")
def server():
    from chinese_asr_tpu.serve import serve_http
    cfg = _small_cfg()
    asr = ASR(cfg=cfg, bw=2, vocab=_identity_vocab(cfg.vocab.vocab_size),
              wav_bucket=1600)
    srv = serve_http(asr, port=0, window_ms=120.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, asr
    srv.shutdown()
    srv.server_close()                       # also stops the batcher thread
    assert not srv.batcher._thread.is_alive()


def _post(port: int, data: bytes, path: str = "/transcribe"):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                 data=data, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_transcribe_endpoint_matches_direct(server):
    srv, asr = server
    data = _wav_bytes(0)
    status, obj = _post(srv.server_port, data)
    assert status == 200
    assert obj["text"] == asr.transcribe_bytes(data)


def test_healthz(server):
    srv, _ = server
    with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.server_port}/healthz", timeout=10) as r:
        obj = json.loads(r.read())
    assert obj["ok"] is True and "backend" in obj


def test_bad_audio_is_400_and_server_survives(server):
    srv, asr = server
    status, obj = _post(srv.server_port, b"this is not audio at all")
    assert status == 400 and "error" in obj
    status, obj = _post(srv.server_port, _wav_bytes(5))
    assert status == 200 and obj["text"] == asr.transcribe_bytes(_wav_bytes(5))


def test_unknown_path_404(server):
    srv, _ = server
    status, _ = _post(srv.server_port, b"x", path="/nope")
    assert status == 404


def test_concurrent_requests_are_microbatched(server):
    """N concurrent posts must coalesce into fewer decode batches than
    requests (the TPU-side point of the batcher) with every transcript
    equal to its direct single-utterance result."""
    srv, asr = server
    payloads = [_wav_bytes(100 + i, 6000 + 400 * i) for i in range(6)]
    expect = [asr.transcribe_bytes(p) for p in payloads]
    before = srv.batcher.batches
    results = [None] * len(payloads)

    def hit(i):
        status, obj = _post(srv.server_port, payloads[i])
        results[i] = (status, obj.get("text"))

    threads = [threading.Thread(target=hit, args=(i,))
               for i in range(len(payloads))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert all(s == 200 for s, _ in results)
    assert [t for _, t in results] == expect
    assert srv.batcher.batches - before < len(payloads)


def test_microbatcher_sheds_load_when_queue_full():
    """Saturation degrades to fast-fail rejection (Overloaded), not
    unbounded queueing — the overload behavior PERF.md's 60 RPS rows
    showed was missing."""
    import time

    from chinese_asr_tpu.serve import MicroBatcher, Overloaded

    entered = threading.Event()   # worker is inside decode #1
    release = threading.Event()   # let decode #1 finish

    class SlowASR:
        cfg = _small_cfg()

        def transcribe_wavs(self, wavs, max_batch=128, scales=None):
            entered.set()
            release.wait(timeout=30)
            return ["x"] * len(wavs)

    mb = MicroBatcher(SlowASR(), max_batch=1, window_ms=0.0,
                      pad_batches=False, max_queue=2)
    wav = np.zeros(10, np.int16)
    done = []
    ths = [threading.Thread(target=lambda: done.append(mb.submit(wav, 1.0)))
           for _ in range(3)]
    ths[0].start()
    assert entered.wait(timeout=30)     # worker holds #1 in decode...
    for t in ths[1:]:
        t.start()
    for _ in range(3000):               # ...while #2/#3 fill the queue
        if mb._q.qsize() >= 2:
            break
        time.sleep(0.01)
    assert mb._q.qsize() >= 2
    with pytest.raises(Overloaded):
        mb.submit(wav, 1.0)
    release.set()
    for t in ths:
        t.join(timeout=30)
    assert done == ["x"] * 3      # queued requests still complete
    assert mb.rejected == 1
    mb.stop()


def test_http_429_on_overload(server):
    """A saturated batcher maps to HTTP 429 (+ JSON error body)."""
    from chinese_asr_tpu.serve import Overloaded
    srv, _ = server

    def boom(wav, scale, timeout=None):
        raise Overloaded("pending queue at capacity (test)")

    srv.batcher.submit = boom     # instance attr shadows the method
    try:
        status, obj = _post(srv.server_port, _wav_bytes(9))
    finally:
        del srv.batcher.submit    # restore the class method
    assert status == 429
    assert "capacity" in obj["error"]
    status, obj = _post(srv.server_port, _wav_bytes(9))
    assert status == 200          # server still serves after shedding


def test_microbatcher_direct():
    """Batcher-level check without HTTP: coalescing + order fidelity."""
    from chinese_asr_tpu.serve import MicroBatcher
    cfg = _small_cfg()
    asr = ASR(cfg=cfg, bw=2, vocab=_identity_vocab(cfg.vocab.vocab_size),
              wav_bucket=1600)
    mb = MicroBatcher(asr, max_batch=8, window_ms=150.0)
    rng = np.random.RandomState(7)
    wavs = [(rng.randn(4800 + 320 * i) * 6000).astype(np.int16)
            for i in range(5)]
    expect = asr.transcribe_wavs(list(wavs),
                                 scales=[1.0] * len(wavs))
    out = [None] * len(wavs)
    threads = [threading.Thread(
        target=lambda i=i: out.__setitem__(i, mb.submit(wavs[i], 1.0)))
        for i in range(len(wavs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert out == expect
    assert mb.batches < len(wavs)
    mb.stop()
    assert not mb._thread.is_alive()         # no leaked worker threads


def test_microbatcher_batch_ladder():
    """Collected batches pad to the next power of two (bounded compile
    shapes) without changing any transcript, and warm() pre-compiles
    every ladder size."""
    from chinese_asr_tpu.serve import MicroBatcher
    cfg = _small_cfg()
    asr = ASR(cfg=cfg, bw=2, vocab=_identity_vocab(cfg.vocab.vocab_size),
              wav_bucket=1600)
    mb = MicroBatcher(asr, max_batch=8, window_ms=50.0)
    assert [mb._ladder(n) for n in (1, 2, 3, 4, 5, 7, 8)] == \
        [1, 2, 4, 4, 8, 8, 8]
    rng = np.random.RandomState(3)
    wav = (rng.randn(4000) * 6000).astype(np.int16)
    assert mb.warm(wav) == 4                    # sizes 1, 2, 4, 8
    # a 3-request burst rides one padded batch and matches direct decode
    wavs = [(rng.randn(4000 + 200 * i) * 6000).astype(np.int16)
            for i in range(3)]
    expect = asr.transcribe_wavs(list(wavs), scales=[1.0] * 3)
    out = [None] * 3
    threads = [threading.Thread(
        target=lambda i=i: out.__setitem__(i, mb.submit(wavs[i], 1.0)))
        for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert out == expect
    mb.stop()
    # unpadded mode keeps exact batch sizes
    mb2 = MicroBatcher(asr, max_batch=8, window_ms=50.0, pad_batches=False)
    assert mb2._ladder(5) == 5
    mb2.stop()
