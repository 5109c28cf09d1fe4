"""HTTP serving with request micro-batching.

The reference sketches (and comments out) a bytes-in web service handler
(main.py:9-16: AMR bytes -> ffmpeg -> parse).  This module is that
service, built for how a TPU actually serves: single-utterance decode
runs the chip at ~200x realtime while batch-128 runs ~10000x (PERF.md),
so concurrent requests are coalesced by a micro-batcher — the first
request opens a short window (default 15 ms) and everything that
arrives in it rides one compiled batched decode.  The 15 ms default is
measured, not guessed (PERF.md "Serving latency under load"): under an
open-loop Poisson client on the v5e it beats both window=0 and
window=40 on p99 at every rate >= 20 RPS (131 vs 273/154 ms at 20 RPS)
and degrades most gracefully under overload; window=0 wins only
light-load p50.

Endpoints:
  POST /transcribe[?suffix=.amr]  audio bytes in the body (WAV decodes
                                  directly; anything else goes through
                                  the ffmpeg transcoder) -> {"text": ...}
  GET  /healthz                   {"ok": true, "backend": "tpu", ...}

Run via ``python -m chinese_asr_tpu.api --serve-http 8000 ...`` or
``serve_http(asr, port=8000).serve_forever()``.
"""

from __future__ import annotations

import json
import os
import queue
import tempfile
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Tuple
from urllib.parse import parse_qs, urlparse

import numpy as np


def decode_request_audio(asr, data: bytes, suffix: str = ""
                         ) -> Tuple[np.ndarray, float]:
    """Audio BYTES -> (int16 waveform, device peak-gain scale).

    WAV bytes are read directly; anything else takes the reference's
    ffmpeg ingest (main.py:9-16/19-24).  Raises ValueError on
    undecodable input — callers turn that into a 400, BEFORE the
    request enters the shared batch."""
    from .data import audio_io

    is_wav = data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    with tempfile.NamedTemporaryFile(
            suffix=suffix or (".wav" if is_wav else ".bin"),
            delete=False) as tf:
        tf.write(data)
        src = tf.name
    tmp = None
    try:
        if not is_wav:
            with tempfile.NamedTemporaryFile(suffix=".wav",
                                             delete=False) as tf:
                tmp = tf.name
            try:
                audio_io.transcode(src, tmp, asr.cfg.audio.sample_rate)
            except Exception as e:      # ffmpeg missing or bytes it
                raise ValueError(       # can't demux -> client 400
                    f"cannot transcode request audio: {e}") from e
            path = tmp
        else:
            path = src
        try:
            wav, _ = audio_io.read_wav(path, asr.cfg.audio.sample_rate,
                                       dtype="int16")
        except Exception as e:
            raise ValueError(f"undecodable audio: {e}") from e
        if wav.size == 0:
            raise ValueError("empty audio")
        return wav, audio_io.peak_scale(wav)
    finally:
        os.unlink(src)
        if tmp is not None and os.path.exists(tmp):
            os.unlink(tmp)


_STOP = object()         # MicroBatcher.stop sentinel


class Overloaded(RuntimeError):
    """Raised by ``MicroBatcher.submit`` when the pending queue exceeds
    ``max_queue`` — the fast-fail path that turns saturation into
    bounded-latency rejection (HTTP 429) instead of unbounded queueing
    (the measured collapse mode: PERF.md's 60 RPS rows, p50 in seconds
    with open-loop queue growth)."""


class MicroBatcher:
    """Coalesce concurrent transcription requests into batched decodes.

    One worker thread owns every decode call (the device sees a single
    client, as the tunnel requires).  The first queued request opens a
    ``window_ms`` collection window; up to ``max_batch`` requests that
    arrive inside it are decoded as ONE ``transcribe_wavs`` batch.  Under
    no concurrency this adds at most ``window_ms`` latency; under load it
    multiplies throughput by the batch factor (PERF.md: 30 -> 1125
    utts/s/chip between B=1 and B=128).

    ``max_queue`` bounds the pending-request queue: a submit beyond it
    fails immediately with :class:`Overloaded` (429 at the HTTP layer)
    rather than joining a queue whose wait already exceeds any useful
    deadline.  The default (None -> 4x ``max_batch``) bounds queueing
    delay to ~4 full decode batches; pass 0 for unbounded queueing."""

    def __init__(self, asr, max_batch: int = 128, window_ms: float = 15.0,
                 pad_batches: bool = True, max_queue: Optional[int] = None):
        self.asr = asr
        self.max_batch = max_batch
        self.max_queue = 4 * max_batch if max_queue is None else max_queue
        self.rejected = 0           # fast-failed submits (stats/tests)
        self._rej_lock = threading.Lock()   # += races across HTTP threads
        self.window = window_ms / 1e3
        # Collected batches vary in size request-by-request, and every new
        # batch size is a new jit shape (30-90 s of XLA compile on the
        # TPU).  Padding each batch up to the next power of two bounds the
        # compiled variants at log2(max_batch)+1 — the standard serving
        # batch ladder — for at most 2x padded device work per decode.
        self.pad_batches = pad_batches
        self.batches = 0            # decode calls issued (stats/tests)
        self.requests = 0
        self._q: "queue.Queue" = queue.Queue()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _ladder(self, n: int) -> int:
        if not self.pad_batches:
            return n
        size = 1
        while size < n:
            size *= 2
        return min(size, self.max_batch)

    def warm(self, wav: np.ndarray, scale: float = 1.0) -> int:
        """Pre-compile every ladder batch size for ``wav``'s length bucket
        (cold-start control: first requests otherwise pay the compiles).
        Returns the number of decode calls issued."""
        sizes, n = [], 1
        while True:
            sizes.append(self._ladder(n))
            if sizes[-1] >= self.max_batch or not self.pad_batches:
                break
            n = sizes[-1] + 1
        for size in sizes:
            self.asr.transcribe_wavs([wav] * size, max_batch=self.max_batch,
                                     scales=[scale] * size)
        return len(sizes)

    def submit(self, wav: np.ndarray, scale: float,
               timeout: Optional[float] = None) -> str:
        """Block until the transcript for ``wav`` is ready; raises
        :class:`Overloaded` immediately when the pending queue is at
        ``max_queue`` (qsize is approximate under concurrency — the cap
        is a load-shedding threshold, not an exact invariant)."""
        if self.max_queue and self._q.qsize() >= self.max_queue:
            with self._rej_lock:
                self.rejected += 1
            raise Overloaded(
                f"pending queue at capacity ({self.max_queue}); retry later")
        ev = threading.Event()
        box: dict = {}
        self._q.put((wav, scale, ev, box))
        if not ev.wait(timeout):
            raise TimeoutError("transcription timed out")
        if "err" in box:
            raise box["err"]
        return box["text"]

    def stop(self) -> None:
        """Stop the worker thread (used by tests/embedders; the thread is
        a daemon, but a stopped batcher doesn't linger in long-lived
        processes that create many of them)."""
        self._q.put(_STOP)
        self._thread.join(timeout=30)

    def _loop(self) -> None:
        while True:
            first = self._q.get()
            if first is _STOP:
                return
            batch = [first]
            deadline = time.monotonic() + self.window
            stopping = False
            while len(batch) < self.max_batch:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    item = self._q.get(timeout=left)
                except queue.Empty:
                    break
                if item is _STOP:
                    stopping = True      # finish this batch, then exit
                    break
                batch.append(item)
            self.batches += 1
            self.requests += len(batch)
            try:
                wavs = [b[0] for b in batch]
                scales = [b[1] for b in batch]
                pad = self._ladder(len(batch)) - len(batch)
                if pad:
                    # dummies keep the batch dtype: an int16 dummy in a
                    # float batch (or vice versa) would silently flip the
                    # wire format (api._prep_flat keys on all-int16)
                    dt = np.asarray(wavs[0]).dtype
                    dt = np.int16 if np.issubdtype(dt, np.integer) else dt
                    wavs += [np.zeros(1, dt)] * pad
                    scales += [1.0] * pad
                texts = self.asr.transcribe_wavs(
                    wavs, max_batch=self.max_batch, scales=scales)
                for (_, _, ev, box), text in zip(batch, texts):
                    box["text"] = text
                    ev.set()
            except Exception as e:  # noqa: BLE001 — fail the whole batch
                for _, _, ev, box in batch:
                    box["err"] = e
                    ev.set()
            if stopping:
                return


def _make_handler(asr, batcher: MicroBatcher):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _reply(self, code: int, obj: dict) -> None:
            body = json.dumps(obj, ensure_ascii=False).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type",
                             "application/json; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 — http.server API
            if urlparse(self.path).path == "/healthz":
                import jax
                self._reply(200, {
                    "ok": True,
                    "backend": jax.default_backend(),
                    "batches": batcher.batches,
                    "requests": batcher.requests,
                    "rejected": batcher.rejected,
                })
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):  # noqa: N802
            url = urlparse(self.path)
            if url.path != "/transcribe":
                self._reply(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                data = self.rfile.read(n)
                suffix = parse_qs(url.query).get("suffix", [""])[0]
                wav, scale = decode_request_audio(asr, data, suffix)
            except ValueError as e:
                self._reply(400, {"error": str(e)})
                return
            try:
                text = batcher.submit(wav, scale)
            except Overloaded as e:   # shed load, don't queue unbounded
                body = json.dumps({"error": str(e)}).encode("utf-8")
                self.send_response(429)
                self.send_header("Content-Type", "application/json")
                self.send_header("Retry-After", "1")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            except Exception as e:  # noqa: BLE001 — decode failure
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})
                return
            self._reply(200, {"text": text})

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def serve_http(asr, port: int = 8000, host: str = "127.0.0.1",
               max_batch: int = 128, window_ms: float = 15.0,
               max_queue: Optional[int] = None) -> ThreadingHTTPServer:
    """Build the serving stack; call ``.serve_forever()`` on the result.
    ``server_port`` on the returned server reports the bound port (pass
    port=0 for an ephemeral one, as the tests do).  ``max_queue``: see
    :class:`MicroBatcher` (None -> 4x max_batch; saturated queues reply
    429 + Retry-After instead of queueing unbounded)."""
    batcher = MicroBatcher(asr, max_batch=max_batch, window_ms=window_ms,
                           max_queue=max_queue)

    class _Server(ThreadingHTTPServer):
        def server_close(self):  # stop the batcher thread with the server
            super().server_close()
            batcher.stop()

    server = _Server((host, port), _make_handler(asr, batcher))
    server.batcher = batcher  # type: ignore[attr-defined] — introspection
    return server
