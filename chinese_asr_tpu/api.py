"""Public API / CLI (reference main.py).

``ASR`` mirrors the reference service class (main.py:68-102) and its
three-mode contract (README.md:4-11), plus a fourth TPU-native mode:

  1. greedy                 ASR(ckpt)                      bw in (None, 0, 1)
  2. beam search            ASR(ckpt, bw=4/8/16)
  3. beam + LM second pass  ASR(ckpt, lm_path=..., bw>1)   rescore n-best
     — ON DEVICE by default (decode/rescore.py: the n-gram tables live
     in HBM, selection happens on device, only winning rows cross the
     host boundary); ``lm_mode="second_host"`` keeps the batched C++
     host rescorer (the oracle, and the fallback for LMs too large
     for HBM)
  4. fused on-device-LM 1st pass  ASR(..., lm_mode="first")  the LM (ARPA
     or .klm) drives token selection inside one jitted loop — no
     per-step host syncs (decode/lm_fused.py, PERF.md)

The parse pipeline (main.py:27-65) becomes: [optional ffmpeg transcode] ->
wav read + peak normalize (in-process ``sox --norm=-1``) -> device-side
featurization with per-utterance instance norm (main.py:37, eps 1e-6) ->
compiled greedy/beam decode -> host detokenize [+ n-gram rescoring].
"""

from __future__ import annotations

import os
import tempfile
from typing import List, Optional, Sequence, Union

import numpy as np

import jax
import jax.numpy as jnp

from .audio import features
from .config import Config
from .data import audio_io
from .decode import beam as beam_mod
from .decode import greedy as greedy_mod
from .decode import lm_fused as lm_fused_mod
from .lm import ngram
from .models import las
from .utils.checkpoint import load_checkpoint
from .vocab import Vocab


def _identity_vocab(n: int) -> Vocab:
    """Fallback vocab rendering ids as <id> markers (debug/random-weights)."""
    from .vocab import SPECIALS
    word2int = {t: i for i, t in enumerate(SPECIALS)}
    for i in range(4, n):
        word2int[f"<{i}>"] = i
    return Vocab(word2int, {i: w for w, i in word2int.items()})


class ASR:
    """Speech recognizer service (reference ASR, main.py:68-102)."""

    def __init__(self, ckpt_path: Optional[str] = None,
                 lm_path: Optional[str] = None,
                 bw: Optional[int] = None,
                 cfg: Optional[Config] = None,
                 vocab: Union[Vocab, str, None] = None,
                 wav_bucket: int = 16000,
                 compute_dtype: str = "float32",
                 wire: str = "flat",
                 flat_pow2: bool = False,
                 mesh=None,
                 lm_mode: str = "second",
                 lm_topn: int = 20):
        """``wire`` picks the host->device wav upload format (the offline
        batch path is upload-bound through the device tunnel, PERF.md):
        "flat" (default) ships exactly sum(lens) PCM16 samples and expands
        to the padded layout on device — lossless, bit-identical features;
        "mulaw" additionally companders to 8-bit log-PCM (half the bytes;
        ~38 dB SNR, transcript parity proven in tests/test_wire.py);
        "adpcm" codes 4-bit block-adaptive ADPCM (quarter the bytes;
        ~28 dB SNR on speech-like signals, decoded on device by a
        blockwise lax.scan — see features.adpcm_decode_flat); "padded"
        is the legacy zero-padded [B, N] matrix.  Lossy-wire SNR and
        transcript-parity figures come from SYNTHETIC audio and
        overfit/random-weight models (tests/test_wire.py) — no real
        speech corpus exists in this environment, so validate mulaw/adpcm
        on your own data before trusting them in production.

        ``mesh`` (a ``jax.sharding.Mesh`` from ``parallel.sharding
        .make_mesh``, or the string "auto" for all local devices) serves
        the decode over a multi-chip (data x model) SPMD mesh: the batch
        and flattened-beam dims shard across the data axis, the
        embedding/projection vocab dim across the model axis, and batch
        chunks are padded up to a multiple of the data-axis size."""
        assert wire in ("flat", "mulaw", "adpcm", "padded"), wire
        assert lm_mode in ("second", "second_host", "first"), lm_mode
        self.cfg = cfg or Config()
        self.bw = bw
        self.wav_bucket = wav_bucket
        self.wire = wire
        self.flat_pow2 = flat_pow2
        self.compute_dtype = jnp.dtype(compute_dtype)
        # LM only loads for beam widths > 1 (main.py:78-84).  lm_mode
        # "second" (default): ON-DEVICE n-best rescore (reference
        # model.py:749-763 semantics; decode/rescore.py — selection on
        # device, only winning rows cross the host boundary).
        # "second_host": the batched C++ host rescorer (the oracle, and
        # for LMs too large for HBM).  "first": the fused ON-DEVICE
        # first-pass decode (decode/lm_fused.py) — the n-gram tables
        # live in HBM and the LM drives token selection inside one
        # jitted loop (reference eval_with_lm, model.py:989-1360,
        # re-designed TPU-first).
        self.lm_mode = lm_mode
        self.lm_topn = lm_topn
        use_lm = bool(lm_path and bw and bw > 1)
        self.lm = ngram.load_lm(lm_path) \
            if (use_lm and lm_mode == "second_host") else None
        self.dlm = self.tok2lm = None
        self._lm_bos = self._lm_eos = None

        if isinstance(vocab, str):
            self.vocab = Vocab.load(vocab)
        elif isinstance(vocab, Vocab):
            self.vocab = vocab
        else:
            self.vocab = _identity_vocab(self.cfg.vocab.vocab_size)

        if use_lm and lm_mode in ("first", "second"):
            from .lm.device_ngram import DeviceNgramLM
            self.dlm = DeviceNgramLM.from_path(lm_path)
            self.tok2lm = jnp.asarray(self.dlm.token_id_table(self.vocab))
            bos_eos = self.dlm.word_ids(["<s>", "</s>"])
            self._lm_bos, self._lm_eos = int(bos_eos[0]), int(bos_eos[1])

        if ckpt_path is None:
            self.params = las.init_params(jax.random.PRNGKey(0), self.cfg)
        elif ckpt_path.endswith(".ckpt") and self._is_torch_ckpt(ckpt_path):
            # one-way converter from the reference torch schema
            self.params = las.load_torch_checkpoint(ckpt_path, self.cfg)
        else:
            self.params = jax.tree_util.tree_map(
                jnp.asarray, load_checkpoint(ckpt_path)["params"])

        emb_rows = self.params["decoder"]["embedding"].shape[0]
        if emb_rows != self.cfg.vocab.vocab_size:
            raise ValueError(
                f"checkpoint vocab size {emb_rows} != config vocab size "
                f"{self.cfg.vocab.vocab_size}; pass cfg=Config().with_("
                f"'vocab', max_num_words={emb_rows - 4})")

        if self.compute_dtype != jnp.float32:
            # bf16 inference: weights + activations in compute_dtype, beam /
            # greedy score arithmetic stays f32 (decode/ casts logits up)
            self.params = jax.tree_util.tree_map(
                lambda x: x.astype(self.compute_dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, self.params)

        self.mesh = None
        self._sharded = {}
        if mesh is not None:
            from .parallel import sharding
            if mesh == "auto":
                mesh = sharding.make_mesh(self.cfg)
            self.mesh = mesh
            self.params = sharding.shard_params(self.params, self.cfg, mesh)
            if self.dlm is not None:
                # LM tables + token map replicate across the mesh
                # (read-only gathers, no collectives)
                from jax.sharding import NamedSharding, PartitionSpec
                rep = NamedSharding(mesh, PartitionSpec())
                self.dlm = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, rep), self.dlm)
                self.tok2lm = jax.device_put(self.tok2lm, rep)

        self._feat_fns = {}

    @property
    def _dp(self) -> int:
        """Data-axis size: serving batches pad up to a multiple of it."""
        if self.mesh is None:
            return 1
        return self.mesh.shape[self.cfg.mesh.data_axis]

    def _sharded_fn(self, kind: str):
        fn = self._sharded.get(kind)
        if fn is None:
            from .parallel import sharding
            if kind == "greedy":
                fn = sharding.make_sharded_greedy(self.cfg, self.params,
                                                  self.mesh)
            elif kind == "beam_best":
                fn = sharding.make_sharded_beam_best(self.cfg, self.bw,
                                                     self.params, self.mesh)
            elif kind == "lm_fused_best":
                fn = sharding.make_sharded_lm_fused_best(
                    self.cfg, self.bw, self.params, self.mesh, self.dlm,
                    topn=self.lm_topn)
            elif kind == "beam_rescored":
                fn = sharding.make_sharded_beam_rescored(
                    self.cfg, self.bw, self.params, self.mesh, self.dlm,
                    self._lm_bos, self._lm_eos)
            else:
                fn = sharding.make_sharded_beam(self.cfg, self.bw,
                                                self.params, self.mesh)
            self._sharded[kind] = fn
        return fn

    @staticmethod
    def _is_torch_ckpt(path: str) -> bool:
        """torch.save zip archives start with PK; our pickles don't."""
        with open(path, "rb") as f:
            magic = f.read(2)
        return magic == b"PK"

    # ---- featurization ------------------------------------------------------
    @staticmethod
    def _as_wav(w) -> np.ndarray:
        """Integer PCM stays int16 (the jitted featurizer does the /32768
        on-device, matching data/dataset.py eval loading); floats pass
        through as float32."""
        w = np.asarray(w)
        if np.issubdtype(w.dtype, np.integer):
            return w.astype(np.int16)
        return w.astype(np.float32)

    def _prep_host(self, wavs: List[np.ndarray], scales=None):
        """Pad a wav list into one host matrix (+lens, per-utterance gain)."""
        from .data.dataset import round_up
        wavs = [self._as_wav(w) for w in wavs]
        N = round_up(max(1, max(len(w) for w in wavs)), self.wav_bucket)
        # a uniform int16 batch ships as raw PCM; any float wav forces the
        # whole batch to float32 (int16 members are scaled on host)
        all_i16 = all(w.dtype == np.int16 for w in wavs)
        mat = np.zeros((len(wavs), N), np.int16 if all_i16 else np.float32)
        lens = np.zeros(len(wavs), np.int32)
        for i, w in enumerate(wavs):
            if not all_i16 and w.dtype == np.int16:
                w = w.astype(np.float32) / 32768.0
            mat[i, : len(w)] = w
            lens[i] = len(w)
        sc = (np.ones(len(wavs), np.float32) if scales is None
              else np.asarray(scales, np.float32))
        return mat, lens, sc

    @staticmethod
    def _upload(prep):
        """Start the (async) host->device transfers for a prepped batch."""
        mat, lens, sc = prep
        return jnp.asarray(mat), jnp.asarray(lens), jnp.asarray(sc)

    # ---- flat / mu-law wire (see features.unpack_flat) ----------------------
    def _prep_flat(self, wavs: List[np.ndarray], scales=None):
        """Concatenate wavs into one flat wire buffer: no padding bytes on
        the wire; optional 8-bit mu-law companding."""
        from .audio import features as F
        from .data.dataset import round_up
        wavs = [self._as_wav(w) for w in wavs]
        lens = np.array([len(w) for w in wavs], np.int32)
        N = round_up(max(1, int(lens.max())), self.wav_bucket)
        total = int(lens.sum())
        # device-side row offsets are int32 cumsums; a >2^31-sample call
        # must be split by the caller (transcribe_wavs chunks at
        # max_batch, so this only triggers on absurd explicit batches)
        assert total < 2 ** 31, \
            f"flat wire: {total} samples overflow int32 offsets; lower " \
            f"max_batch"
        # flat length bucketed so the jitted unpack program is reused.
        # linear (default): multiples of 8*wav_bucket — tight wire, right
        # for upload-bound offline batches whose Ltot repeats per chunk.
        # pow2 (serving): next power-of-2 multiple of wav_bucket — at most
        # 2x wire padding but log-many compiled shapes, so a micro-batcher
        # seeing arbitrary traffic mixes stops hitting fresh Ltot buckets
        # (serve.MicroBatcher pairs this with its power-of-2 batch ladder).
        Ltot = max(1, total)
        if self.flat_pow2:
            b = self.wav_bucket
            while b < Ltot:
                b *= 2
            Ltot = b
        else:
            Ltot = round_up(Ltot, 8 * self.wav_bucket)
        all_i16 = all(w.dtype == np.int16 for w in wavs)
        if all_i16 and self.wire == "adpcm":
            Ltot = round_up(Ltot, F.ADPCM_K)
            x = np.zeros(Ltot, np.int16)
            pos = 0
            for w in wavs:
                x[pos: pos + len(w)] = w
                pos += len(w)
            flat = F.adpcm_encode_flat(x)
        elif all_i16 and self.wire == "mulaw":
            flat = np.zeros(Ltot, np.uint8)
            pos = 0
            for w in wavs:
                flat[pos: pos + len(w)] = F.mulaw_encode_i16(w)
                pos += len(w)
        elif all_i16:
            flat = np.zeros(Ltot, np.int16)
            pos = 0
            for w in wavs:
                flat[pos: pos + len(w)] = w
                pos += len(w)
        else:
            # a float wav in the batch: f32 wire (mu-law needs int16)
            flat = np.zeros(Ltot, np.float32)
            pos = 0
            for w in wavs:
                flat[pos: pos + len(w)] = (
                    w.astype(np.float32) / 32768.0
                    if w.dtype == np.int16 else w)
                pos += len(w)
        sc = (np.ones(len(wavs), np.float32) if scales is None
              else np.asarray(scales, np.float32))
        # lens and scales ride ONE array: each tunnel transfer pays
        # ~25-30 ms fixed latency regardless of size (lens < 2^24 are
        # exact in f32)
        meta = np.stack([lens.astype(np.float32), sc])
        return flat, meta, N

    @staticmethod
    def _upload_flat(prep):
        flat, meta, N = prep
        return jnp.asarray(flat), jnp.asarray(meta), N

    def _featurize_flat_device(self, flat_d, meta_d, N: int):
        from .audio import features as F
        # the adpcm wire has its own uint8 layout (headers + nibbles);
        # a mixed-dtype batch falls back to the f32 flat wire, so the
        # dispatch keys on the actual buffer dtype, not just self.wire
        adpcm = self.wire == "adpcm" and flat_d.dtype == jnp.uint8
        key = ("adpcm" if adpcm else "flat", flat_d.shape[0],
               str(flat_d.dtype), meta_d.shape[1], N)
        fn = self._feat_fns.get(key)
        if fn is None:
            cfg = self.cfg.audio
            feat = F.featurize_adpcm if adpcm else F.featurize_flat
            fn = jax.jit(lambda f, m, : feat(
                f, m[0].astype(jnp.int32), N, cfg, norm_eps=1e-6,
                scale=m[1]))
            self._feat_fns[key] = fn
        feats, feat_lens = fn(flat_d, meta_d)
        if self.compute_dtype != jnp.float32:
            feats = feats.astype(self.compute_dtype)
        return feats, jnp.maximum(feat_lens, 1)

    def _featurize_device(self, mat_d, lens_d, sc_d):
        N = mat_d.shape[1]
        fn = self._feat_fns.get(N)
        if fn is None:
            cfg = self.cfg.audio
            # per-utterance norm eps matches reference main.py:37 (1e-6)
            fn = jax.jit(lambda w, l, s: features.featurize_batch(
                w, l, cfg, norm_eps=1e-6, scale=s))
            self._feat_fns[N] = fn
        feats, feat_lens = fn(mat_d, lens_d, sc_d)
        if self.compute_dtype != jnp.float32:
            feats = feats.astype(self.compute_dtype)
        # degenerate (shorter than one frame) utterances: attend to one
        # zero frame instead of an empty (all -inf softmax mask) memory
        return feats, jnp.maximum(feat_lens, 1)

    # ---- transcription ------------------------------------------------------
    def transcribe_wavs(self, wavs: Sequence[np.ndarray],
                        max_batch: int = 128, scales=None) -> List[str]:
        """Transcribe a list of waveforms; lists longer than ``max_batch``
        are chunked (128 is the v5e throughput knee, see bench.py).
        ``scales`` (optional, one float per wav) applies a per-utterance
        gain on device — used by ``transcribe_files`` for peak
        normalization of raw PCM16."""
        if not wavs:
            return []
        wavs = list(wavs)
        n_real = len(wavs)
        if self._dp > 1:
            # mesh serving: every decode batch must split evenly over the
            # data axis — clamp max_batch to a multiple of dp and pad the
            # call with dummy wavs (their transcripts are dropped below)
            dp = self._dp
            max_batch = max(dp, max_batch - max_batch % dp)
            pad = (-n_real) % dp
            if pad:
                dt = np.asarray(wavs[0]).dtype
                dt = np.int16 if np.issubdtype(dt, np.integer) else dt
                wavs = wavs + [np.zeros(1, dt)] * pad
                if scales is not None:
                    scales = list(scales) + [1.0] * pad
        if self.wire == "padded":
            prep_host, upload = self._prep_host, self._upload
            featurize = lambda dev: self._featurize_device(*dev)  # noqa: E731
        else:
            prep_host, upload = self._prep_flat, self._upload_flat
            featurize = lambda dev: self._featurize_flat_device(*dev)  # noqa: E731
        if len(wavs) > max_batch:
            # length-sort before chunking (restore order after): mixed-length
            # batches otherwise pad every chunk to the global max, wasting
            # host->device upload and encoder steps (the reference buckets
            # training batches the same way, TrainSampler data.py:346-367).
            # Double-buffered: chunk i+1's host->device upload is issued
            # before chunk i's host finalization blocks, hiding the upload
            # (~60% of offline wall time through the device tunnel).
            order = sorted(range(len(wavs)), key=lambda i: len(wavs[i]))
            chunks = [order[s:s + max_batch]
                      for s in range(0, len(order), max_batch)]

            def prep(idx):     # one chunk at a time: peak host memory
                return prep_host(          # stays O(chunk), not O(corpus)
                    [wavs[i] for i in idx],
                    None if scales is None else [scales[i] for i in idx])

            out: List[str] = [""] * len(wavs)
            dev = upload(prep(chunks[0]))
            pend = None     # (chunk indices, in-flight device result)
            for c, idx in enumerate(chunks):
                # dispatch chunk c's device work FIRST: uploads through
                # the device tunnel BLOCK the host, so the next chunk's
                # upload (and chunk c-1's host finalization) must happen
                # while the device is already decoding chunk c — the old
                # upload-then-dispatch order serialized the entire upload
                # ahead of the decode (measured in tools/offline_split.py)
                res = self._decode_dispatch(featurize(dev))
                dev = (upload(prep(chunks[c + 1]))
                       if c + 1 < len(chunks) else None)
                if pend is not None:
                    for i, t in zip(pend[0], self._decode_finalize(pend[1])):
                        out[i] = t
                pend = (idx, res)
            for i, t in zip(pend[0], self._decode_finalize(pend[1])):
                out[i] = t
            return out[:n_real]
        return self._decode_batch(featurize(
            upload(prep_host(wavs, scales))))[:n_real]

    def _decode_dispatch(self, featurized):
        """Launch the device decode; returns the in-flight device result."""
        feats, feat_lens = featurized
        if self.mesh is not None:
            if not self.bw or self.bw <= 1:
                return self._sharded_fn("greedy")(self.params, feats,
                                                  feat_lens)
            if self.dlm is not None and self.lm_mode == "first":
                # winner selected on device (select_best_first_pass):
                # only [B, max_len] rows leave the mesh
                return self._sharded_fn("lm_fused_best")(
                    self.params, feats, feat_lens, self.dlm, self.tok2lm)
            if self.dlm is not None:
                # fused decode + passive LM track + rescored winner
                return self._sharded_fn("beam_rescored")(
                    self.params, feats, feat_lens, self.dlm, self.tok2lm)
            if self.lm is None:
                return self._sharded_fn("beam_best")(self.params, feats,
                                                     feat_lens)
            res = self._sharded_fn("beam")(self.params, feats, feat_lens)
            try:
                res.fin_count.copy_to_host_async()
            except AttributeError:
                pass
            return res
        if not self.bw or self.bw <= 1:
            return greedy_mod.greedy_decode_jit(self.params, self.cfg,
                                                feats, feat_lens)
        if self.dlm is not None and self.lm_mode == "first":
            # best finished (or the live-beam fallback) selected ON
            # DEVICE — the n-best buffers never cross the tunnel (they
            # were ~the whole finalization half of the round-4 bench row)
            return lm_fused_mod.lm_fused_decode_best_jit(
                self.params, self.cfg, self.bw, feats, feat_lens,
                self.dlm, self.tok2lm, self.lm_topn)
        if self.dlm is not None:
            # device second pass, fully fused (decode/rescore.py): the
            # beam decode tracks LM chains passively and the rescored
            # winner is selected in the SAME jitted program — no
            # decode->rescore host round trip, only [B, max_len] rows
            # cross the boundary
            from .decode import rescore as rescore_mod
            return rescore_mod.beam_rescored_best_jit(
                self.params, self.cfg, self.bw, feats, feat_lens,
                self.dlm, self.tok2lm, self.cfg.decode.lm_weight,
                self.cfg.decode.length_weight, self._lm_bos, self._lm_eos)
        if self.lm is None:
            # no second pass -> best hypothesis is selected ON DEVICE and
            # only [B, max_len] rows cross the host boundary (the n-best
            # buffers are ~13 MB per batch at bw=16 — transfer-bound
            # through the device tunnel)
            return beam_mod.beam_decode_best_jit(self.params, self.cfg,
                                                 self.bw, feats, feat_lens)
        res = beam_mod.beam_decode_jit(self.params, self.cfg, self.bw,
                                       feats, feat_lens)
        # start the tiny fin_count transfer now: it completes with the
        # decode, so the n-best compaction in _decode_finalize (which
        # needs it on host to pick a gather size) never stalls on it
        try:
            res.fin_count.copy_to_host_async()
        except AttributeError:
            pass
        return res

    def _decode_finalize(self, res) -> List[str]:
        if not self.bw or self.bw <= 1:
            return greedy_mod.finalize_greedy(res, self.vocab).pred_text
        if self.dlm is not None and self.lm_mode == "first":
            # fused first pass: winner already selected on device
            return beam_mod.finalize_best(res, self.vocab).pred_text
        if self.dlm is not None:
            # device second pass: winner already selected in the decode
            # program (the reference's logp + w_lm*lm + w_len*len
            # argmax, model.py:749-763)
            return beam_mod.finalize_best(res, self.vocab).pred_text
        if self.lm is None:
            return beam_mod.finalize_best(res, self.vocab).pred_text
        # compact the n-best buffers on device first: only the finite
        # slots cross the host boundary (lossless; see beam.compact_nbest)
        return beam_mod.finalize_beam(
            beam_mod.compact_nbest(res), self.cfg, self.vocab,
            lm_model=self.lm, second_pass=True,
            lm_weight=self.cfg.decode.lm_weight,
            length_weight=self.cfg.decode.length_weight).pred_text

    def _decode_batch(self, featurized) -> List[str]:
        return self._decode_finalize(self._decode_dispatch(featurized))

    def transcribe_files(self, paths: Sequence[str],
                         transcode: bool = False) -> List[str]:
        wavs = []
        scales: List[float] = []
        for p in paths:
            if transcode or not p.lower().endswith(".wav"):
                with tempfile.NamedTemporaryFile(suffix=".wav",
                                                 delete=False) as tf:
                    tmp = tf.name
                try:
                    audio_io.transcode(p, tmp, self.cfg.audio.sample_rate)
                    wav, _ = audio_io.read_wav(tmp, self.cfg.audio.sample_rate)
                finally:
                    os.unlink(tmp)
            else:
                # raw PCM16 + device-side peak gain: same sox --norm=-1
                # math as peak_normalize, half the host->device bytes
                wav, _ = audio_io.read_wav(p, self.cfg.audio.sample_rate,
                                           dtype="int16")
                scales.append(audio_io.peak_scale(wav))
            wavs.append(wav)
            scales += [1.0] * (len(wavs) - len(scales))   # transcoded entry
        return self.transcribe_wavs(wavs, scales=scales)

    def __call__(self, path: str) -> str:
        """One utterance in, transcript out (main.py:100-102)."""
        return self.transcribe_files([path])[0]

    def transcribe_bytes(self, data: bytes, suffix: str = "") -> str:
        """Transcribe raw audio BYTES — the in-memory service variant the
        reference sketches (its commented AMR-bytes handler, main.py:9-16).
        WAV bytes decode directly; anything else (amr/mp3/ogg/...) goes
        through the ffmpeg transcoder.  ``suffix`` (e.g. ".amr") helps
        ffmpeg pick a demuxer for headerless containers."""
        is_wav = data[:4] == b"RIFF" and data[8:12] == b"WAVE"
        with tempfile.NamedTemporaryFile(
                suffix=suffix or (".wav" if is_wav else ".bin"),
                delete=False) as tf:
            tf.write(data)
            tmp = tf.name
        try:
            return self.transcribe_files([tmp], transcode=not is_wav)[0]
        finally:
            os.unlink(tmp)

    def transcribe_long(self, path: str, chunk_s: float = 10.0,
                        search_s: float = 0.5) -> str:
        """Long-form audio beyond the reference's 10-second guidance
        (its comment at main.py:34): split into DISJOINT ~``chunk_s``
        windows — each cut placed at the lowest-energy sample within
        +-``search_s`` of the nominal boundary so chunks break at silence
        rather than mid-character — decode the batch in one device call,
        and concatenate the per-chunk transcripts.  Disjoint cuts mean no
        audio is transcribed twice (no duplicated boundary characters)."""
        wav, _ = audio_io.read_wav(path, self.cfg.audio.sample_rate,
                                   dtype="int16")
        gain = audio_io.peak_scale(wav)     # peak-normalize on device
        sr = self.cfg.audio.sample_rate
        step = int(chunk_s * sr)
        search = max(1, int(search_s * sr))
        if len(wav) <= step + search:
            return self.transcribe_wavs([wav], scales=[gain])[0]
        smooth = max(1, int(0.025 * sr))           # 25 ms energy window
        cuts = [0]
        while cuts[-1] + step < len(wav) - search:
            c = cuts[-1] + step
            lo = max(cuts[-1] + search, c - search)
            hi = min(len(wav) - 1, c + search)
            energy = np.convolve(
                np.square(wav[lo:hi].astype(np.float64)),
                np.ones(smooth) / smooth, mode="same")
            cuts.append(lo + int(np.argmin(energy)))
        cuts.append(len(wav))
        chunks = [wav[a:b] for a, b in zip(cuts[:-1], cuts[1:]) if b > a]
        return "".join(self.transcribe_wavs(chunks,
                                            scales=[gain] * len(chunks)))


def main(argv: Optional[List[str]] = None) -> None:
    """CLI — the argparse interface the reference sketches but comments out
    (main.py:107-120)."""
    import argparse
    ap = argparse.ArgumentParser(description="chinese_asr_tpu transcriber")
    ap.add_argument("--wav", nargs="*", default=[],
                    help="wav file(s); optional under --serve-http")
    ap.add_argument("--ckpt", default=None, help="checkpoint path "
                    "(framework .ckpt or reference torch .ckpt)")
    ap.add_argument("--vocab", default=None, help="dict.pkl path")
    ap.add_argument("--lm", default=None, help="n-gram LM path "
                    "(ARPA text or KenLM binary .klm)")
    ap.add_argument("--lm-mode", default="second",
                    choices=("second", "second_host", "first"),
                    help="second: on-device n-best rescore (rescore.py); "
                         "second_host: batched C++ host rescore; first: "
                         "fused on-device-LM first-pass decode "
                         "(lm_fused.py)")
    ap.add_argument("--bw", type=int, default=None, help="beam width")
    ap.add_argument("--transcode", action="store_true",
                    help="force ffmpeg ingest")
    ap.add_argument("--serve", action="store_true",
                    help="after the initial wavs, keep reading wav paths "
                         "from stdin, one transcript per line (the service "
                         "mode the reference sketches at main.py:9-16)")
    ap.add_argument("--serve-http", type=int, default=None, metavar="PORT",
                    help="serve POST /transcribe (audio bytes -> JSON) "
                         "with request micro-batching; see serve.py")
    args = ap.parse_args(argv)
    if not args.wav and args.serve_http is None and not args.serve:
        ap.error("nothing to do: pass --wav and/or --serve/--serve-http")

    asr = ASR(ckpt_path=args.ckpt, lm_path=args.lm, bw=args.bw,
              vocab=args.vocab, lm_mode=args.lm_mode)
    for path, text in zip(args.wav,
                          asr.transcribe_files(args.wav, args.transcode)):
        print(f"{path}\t{text}")
    if args.serve_http is not None:
        from .serve import serve_http
        server = serve_http(asr, port=args.serve_http, host="0.0.0.0")
        print(f"serving on :{server.server_port}", flush=True)
        server.serve_forever()
    if args.serve:
        import sys
        for line in sys.stdin:
            path = line.strip()
            if not path:
                continue
            try:
                print(f"{path}\t{asr(path)}", flush=True)
            except Exception as e:                      # keep serving
                print(f"{path}\tERROR: {e}", flush=True)


if __name__ == "__main__":
    main()
