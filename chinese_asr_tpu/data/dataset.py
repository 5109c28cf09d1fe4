"""Dataset / sampler / loader (reference data.py:346-540).

TPU-first restructure of the reference pipeline:

* The reference extracts log-mel features **on the host** in DataLoader
  workers (data.py:392-459) and ships [T, 720] float tensors to the device.
  Here the host only reads wavs, augments, and tokenizes; raw 16 kHz samples
  go to the device, and the whole featurizer runs inside the jitted program
  (audio/features.featurize_batch) — 45x less host->device traffic per
  second of audio and the STFT/mel matmuls land on the MXU.
* ``PackedSequence`` collation (data.py:478-493) is replaced by padded
  fixed-shape batches whose lengths are rounded up to bucket multiples, so
  the number of distinct compiled programs stays small.
* ``TrainSampler`` keeps the reference semantics (data.py:346-367): global
  shuffle, then length-sort inside windows of ``shuffle_updates * batch``
  utterances so batches are length-homogeneous but epoch order stays random.

Manifest format: one UTF-8 line per utterance, ``path<TAB>text`` (text
empty/absent for inference), mirroring the AISHELL-style lists the
reference's trimmed AudioBase expected (data.py:402-431).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..config import Config
from ..vocab import Vocab
from . import audio_io, augment as aug_mod


@dataclass
class Utterance:
    path: str
    text: Optional[str] = None
    num_samples: Optional[int] = None


def read_manifest(path: str) -> List[Utterance]:
    utts = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            parts = line.split("\t")
            utts.append(Utterance(parts[0],
                                  parts[1] if len(parts) > 1 else None))
    return utts


def write_manifest(path: str, utts: Sequence[Utterance]) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for u in utts:
            f.write(u.path + ("\t" + u.text if u.text is not None else "") + "\n")


class AudioDataset:
    """mode: 'train' (augment + dither + tokens), 'eval' (tokens), 'infer'
    (audio only) — reference AudioDst modes (data.py:392-459)."""

    def __init__(self, utts: Sequence[Utterance], cfg: Config, vocab: Vocab,
                 mode: str = "train", seed: int = 0):
        assert mode in ("train", "eval", "infer")
        self.utts = list(utts)
        self.cfg = cfg
        self.vocab = vocab
        self.mode = mode
        self.rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return len(self.utts)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, Optional[List[int]]]:
        u = self.utts[i]
        if self.mode == "train":
            wav, _ = audio_io.read_wav(u.path, self.cfg.audio.sample_rate)
            wav = aug_mod.augment(wav, self.cfg.augment, self.rng,
                                  self.cfg.audio.sample_rate)
            if self.cfg.audio.dither > 0:
                # train-only Gaussian dither (reference data.py:199-200)
                wav = wav + (self.cfg.audio.dither *
                             self.rng.randn(len(wav))).astype(np.float32)
            wav = wav.astype(np.float32)
        else:
            # eval/infer: raw PCM16 to the device, /32768 happens inside
            # the jitted featurizer (half the host->device bytes)
            wav, _ = audio_io.read_wav(u.path, self.cfg.audio.sample_rate,
                                       dtype="int16")
        ids = None
        if self.mode != "infer":
            # text -> ids with <unk> fallback (data.py:444-459)
            ids = self.vocab.encode(u.text or "")
        return wav, ids

    def sample_lengths(self) -> np.ndarray:
        """Utterance lengths in samples (cached in the manifest when
        available; otherwise read from the wav headers once)."""
        out = np.zeros(len(self.utts), np.int64)
        for i, u in enumerate(self.utts):
            if u.num_samples is None:
                wav, _ = audio_io.read_wav(u.path, None)
                u.num_samples = len(wav)
            out[i] = u.num_samples
        return out


def train_sampler_order(lengths: np.ndarray, batch_size: int,
                        shuffle_updates: int,
                        rng: np.random.RandomState) -> np.ndarray:
    """Reference TrainSampler (data.py:346-367): shuffle everything, then
    length-sort inside each window of shuffle_updates*batch_size."""
    n = len(lengths)
    order = rng.permutation(n)
    window = max(1, shuffle_updates * batch_size)
    for s in range(0, n, window):
        chunk = order[s:s + window]
        order[s:s + window] = chunk[np.argsort(lengths[chunk], kind="stable")]
    return order


def round_up(n: int, mult: int) -> int:
    return ((n + mult - 1) // mult) * mult


class Loader:
    """Collates padded fixed-shape batches.

    Wav lengths are padded to multiples of ``wav_bucket`` samples and token
    lengths to multiples of ``text_bucket`` so jit recompiles stay bounded
    (the reference re-packs per batch instead, data.py:478-540)."""

    def __init__(self, dataset: AudioDataset, batch_size: int,
                 shuffle: bool = False, seed: int = 0,
                 wav_bucket: int = 4800, text_bucket: int = 8,
                 drop_last: bool = False):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.wav_bucket = wav_bucket
        self.text_bucket = text_bucket
        self.drop_last = drop_last

    def __len__(self) -> int:
        n = len(self.ds)
        b = self.batch_size
        return n // b if self.drop_last else (n + b - 1) // b

    def _order(self) -> np.ndarray:
        if self.shuffle:
            lengths = self.ds.sample_lengths()
            return train_sampler_order(
                lengths, self.batch_size,
                self.ds.cfg.train.shuffle_updates, self.rng)
        return np.arange(len(self.ds))

    def __iter__(self) -> Iterator:
        cfg = self.ds.cfg
        order = self._order()
        b = self.batch_size
        for s in range(0, len(order), b):
            idx = order[s:s + b]
            if self.drop_last and len(idx) < b:
                break
            items = [self.ds[int(i)] for i in idx]
            wavs = [w for w, _ in items]
            N = round_up(max(len(w) for w in wavs), self.wav_bucket)
            wav_mat = np.zeros((len(wavs), N), wavs[0].dtype)
            wav_lens = np.zeros(len(wavs), np.int32)
            for j, w in enumerate(wavs):
                wav_mat[j, : len(w)] = w
                wav_lens[j] = len(w)
            if self.ds.mode == "infer":
                yield wav_mat, wav_lens, None, None, None
                continue
            texts = [ids for _, ids in items]
            S = round_up(max(len(t) for t in texts) + 1, self.text_bucket)
            tokens_in = np.full((len(texts), S), cfg.vocab.pad, np.int32)
            tokens_out = np.full((len(texts), S), cfg.vocab.pad, np.int32)
            text_lens = np.zeros(len(texts), np.int32)
            for j, t in enumerate(texts):
                # sos + text / text + eos packing (reference data.py:485-487)
                tokens_in[j, 0] = cfg.vocab.sos
                tokens_in[j, 1:1 + len(t)] = t
                tokens_out[j, : len(t)] = t
                tokens_out[j, len(t)] = cfg.vocab.eos
                text_lens[j] = len(t) + 1
            yield wav_mat, wav_lens, tokens_in, tokens_out, text_lens


def make_train_loader(manifest_path: str, cfg: Config, vocab: Vocab,
                      seed: int = 0, drop_last: bool = False) -> Loader:
    """``drop_last=True`` for mesh (SPMD) training: every batch must
    divide the data axis, so the remainder batch is dropped (one epoch's
    tail, reshuffled into the next epoch)."""
    ds = AudioDataset(read_manifest(manifest_path), cfg, vocab, "train", seed)
    return Loader(ds, cfg.train.batch_size, shuffle=True, seed=seed,
                  drop_last=drop_last)


def make_eval_loader(manifest_path: str, cfg: Config, vocab: Vocab) -> Loader:
    ds = AudioDataset(read_manifest(manifest_path), cfg, vocab, "eval")
    return Loader(ds, cfg.train.eval_batch_size, shuffle=False)


def prefetch(iterator, size: int = 2):
    """Background-thread prefetch: host wav reading / collation overlaps
    device compute (the role of the reference's DataLoader workers,
    data.py:467-474, without multiprocess overhead on a 1-core host).

    The worker must not outlive its consumer: an abandoned generator
    (e.g. a trainer stopping at max_steps mid-epoch) previously left the
    thread blocked in ``q.put`` forever, holding the source iterator
    alive — the stop event + timed puts below end it within ~100 ms."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    END = object()
    stop = threading.Event()
    err = []

    def worker():
        try:
            for item in iterator:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:                        # propagate to consumer
            err.append(e)
        finally:
            while True:               # consumer needs END even when the
                try:                  # queue is full of undrained items
                    q.put(END, timeout=0.1)
                    break
                except queue.Full:
                    if stop.is_set():
                        break         # consumer gone; nobody waits

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is END:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()                    # consumer closed/abandoned early


def batches_to_device(loader: Loader, cfg: Config):
    """Generator adapting host batches to jitted-featurizer train Batches:
    featurization runs on device (audio/features.py), then the Batch feeds
    the compiled train step."""
    import functools

    import jax
    import jax.numpy as jnp

    from ..audio import features
    from ..train.step import Batch

    @functools.lru_cache(maxsize=64)
    def feat_fn(n_samples: int):
        return jax.jit(lambda w, l: features.featurize_batch(w, l, cfg.audio))

    for wav_mat, wav_lens, ti, to, tl in prefetch(iter(loader)):
        feats, feat_lens = feat_fn(wav_mat.shape[1])(
            jnp.asarray(wav_mat), jnp.asarray(wav_lens))
        if ti is None:
            yield feats, feat_lens
        else:
            yield Batch(feats, feat_lens, jnp.asarray(ti), jnp.asarray(to),
                        jnp.asarray(tl))
