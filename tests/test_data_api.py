"""Data pipeline (io, augmentation, manifest/dataset/sampler/loader) and
the ASR API three-mode contract on synthetic wavs."""

import numpy as np
import pytest

from chinese_asr_tpu.config import Config
from chinese_asr_tpu.data import audio_io, augment, dataset
from chinese_asr_tpu.vocab import Vocab

SMALL = (Config()
         .with_("encoder", hidden_size=16, num_layers=2)
         .with_("decoder", hidden_size=32, embed_dim=12)
         .with_("attention", attn_size=8)
         .with_("vocab", max_num_words=20)
         .with_("decode", max_len=8)
         .with_("train", batch_size=2, eval_batch_size=2))


# --------------------------------------------------------------------------
# audio io
# --------------------------------------------------------------------------
def test_wav_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    x = (0.3 * rng.randn(16000)).astype(np.float32).clip(-1, 1)
    p = str(tmp_path / "a.wav")
    audio_io.write_wav(p, x, 16000)
    y, rate = audio_io.read_wav(p, 16000)
    assert rate == 16000
    np.testing.assert_allclose(y, x, atol=2.0 / 32768)


def test_peak_normalize():
    x = np.array([0.1, -0.25, 0.2], np.float32)
    y = audio_io.peak_normalize(x, -1.0)
    assert abs(np.abs(y).max() - 10 ** (-1 / 20)) < 1e-6
    assert np.all(audio_io.peak_normalize(np.zeros(5, np.float32)) == 0)


def test_rate_mismatch_warns(tmp_path):
    p = str(tmp_path / "b.wav")
    audio_io.write_wav(p, np.zeros(800, np.float32), 8000)
    with pytest.warns(UserWarning):
        audio_io.read_wav(p, 16000)


# --------------------------------------------------------------------------
# augmentation (reference data.py:283-343)
# --------------------------------------------------------------------------
def test_gain_db():
    x = np.ones(10, np.float32)
    np.testing.assert_allclose(augment.gain_db(x, 20.0), 10.0 * x, rtol=1e-6)
    np.testing.assert_allclose(augment.gain_db(x, -20.0), 0.1 * x, rtol=1e-6)


def test_change_speed_length():
    x = np.sin(np.linspace(0, 20, 16000)).astype(np.float32)
    assert len(augment.change_speed(x, 1.25)) == int(16000 / 1.25)
    assert len(augment.change_speed(x, 0.8)) == 16000 / 0.8
    assert augment.change_speed(x, 1.0) is x


def test_shift():
    x = np.arange(10, dtype=np.float32)
    r = augment.shift(x, 2 / 16.0, 16000)       # +2 samples
    assert r[0] == 0 and r[1] == 0 and r[2] == 0.0 == x[0] and r[3] == 1
    l = augment.shift(x, -2 / 16.0, 16000)
    assert l[0] == 2 and l[-1] == 0


def test_augment_prob_zero_identity():
    cfg = SMALL.augment
    x = np.random.RandomState(0).randn(100).astype(np.float32)
    assert augment.augment(x, cfg, np.random.RandomState(1)) is x


# --------------------------------------------------------------------------
# manifest / dataset / sampler / loader
# --------------------------------------------------------------------------
@pytest.fixture()
def corpus(tmp_path):
    rng = np.random.RandomState(0)
    utts = []
    texts = ["abc", "de", "fghij", "ab", "cde"]
    for i, t in enumerate(texts):
        n = 3200 + 1600 * i
        p = str(tmp_path / f"u{i}.wav")
        audio_io.write_wav(p, (0.1 * rng.randn(n)).astype(np.float32), 16000)
        utts.append(dataset.Utterance(p, t))
    mpath = str(tmp_path / "manifest.tsv")
    dataset.write_manifest(mpath, utts)
    return mpath, texts


def test_manifest_roundtrip(corpus):
    mpath, texts = corpus
    utts = dataset.read_manifest(mpath)
    assert [u.text for u in utts] == texts


def test_dataset_modes(corpus):
    mpath, texts = corpus
    vocab = Vocab.build(texts, max_num_words=SMALL.vocab.max_num_words)
    utts = dataset.read_manifest(mpath)
    ds = dataset.AudioDataset(utts, SMALL, vocab, "eval")
    wav, ids = ds[0]
    # eval ships raw PCM16 (device-side /32768 conversion)
    assert wav.dtype == np.int16 and len(wav) == 3200
    assert ids == vocab.encode("abc")
    ds_train = dataset.AudioDataset(utts, SMALL, vocab, "train")
    wav_t, _ = ds_train[0]
    assert wav_t.dtype == np.float32
    ds_inf = dataset.AudioDataset(utts, SMALL, vocab, "infer")
    _, ids_inf = ds_inf[0]
    assert ids_inf is None


def test_train_sampler_window_sorting():
    lengths = np.array([9, 1, 5, 3, 7, 2, 8, 4])
    rng = np.random.RandomState(0)
    order = dataset.train_sampler_order(lengths, batch_size=2,
                                        shuffle_updates=2, rng=rng)
    # every window of 4 must be length-sorted
    for s in range(0, 8, 4):
        w = lengths[order[s:s + 4]]
        assert np.all(np.diff(w) >= 0)
    assert sorted(order.tolist()) == list(range(8))


def test_loader_shapes_and_packing(corpus):
    mpath, texts = corpus
    vocab = Vocab.build(texts, max_num_words=SMALL.vocab.max_num_words)
    loader = dataset.make_eval_loader(mpath, SMALL, vocab)
    batches = list(loader)
    assert len(batches) == len(loader) == 3
    wav_mat, wav_lens, ti, to, tl = batches[0]
    assert wav_mat.shape[1] % 4800 == 0
    assert ti.shape == to.shape and ti.shape[1] % 8 == 0
    # sos/eos packing (reference data.py:485-487)
    j = 0
    ids = vocab.encode(texts[0])
    assert ti[j, 0] == SMALL.vocab.sos
    assert list(ti[j, 1:1 + len(ids)]) == ids
    assert list(to[j, : len(ids)]) == ids
    assert to[j, len(ids)] == SMALL.vocab.eos
    assert tl[j] == len(ids) + 1
    # padding beyond true wav length is zero
    assert np.all(wav_mat[0, wav_lens[0]:] == 0)


def test_batches_to_device(corpus):
    mpath, texts = corpus
    vocab = Vocab.build(texts, max_num_words=SMALL.vocab.max_num_words)
    loader = dataset.make_eval_loader(mpath, SMALL, vocab)
    b = next(iter(dataset.batches_to_device(loader, SMALL)))
    assert b.feats.shape[0] == 2
    assert b.feats.shape[2] == SMALL.audio.feat_dim
    assert int(b.feat_lens[0]) > 0


# --------------------------------------------------------------------------
# ASR API
# --------------------------------------------------------------------------
def test_asr_three_modes_and_determinism(tmp_path, corpus):
    mpath, texts = corpus
    utts = dataset.read_manifest(mpath)
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(
        "\\data\\\nngram 1=5\n\n\\1-grams:\n-1.0\t<unk>\n-0.5\t<s>\n"
        "-0.5\t</s>\n-0.7\ta\n-0.7\tb\n\n\\end\\\n")
    from chinese_asr_tpu.api import ASR

    # identity fallback vocab: random weights emit arbitrary ids, which a
    # corpus-built vocab could not render
    greedy = ASR(cfg=SMALL, wav_bucket=4800)
    t1 = greedy(utts[0].path)
    t2 = greedy(utts[0].path)
    assert isinstance(t1, str) and t1 == t2    # deterministic

    beam = ASR(cfg=SMALL, bw=3, wav_bucket=4800)
    tb = beam(utts[0].path)
    assert isinstance(tb, str)

    lm = ASR(cfg=SMALL, bw=3, lm_path=str(arpa), wav_bucket=4800)
    assert lm.dlm is not None and lm.lm is None    # device rescore default
    tl = lm(utts[0].path)
    assert isinstance(tl, str)
    lm_h = ASR(cfg=SMALL, bw=3, lm_path=str(arpa), lm_mode="second_host",
               wav_bucket=4800)
    assert lm_h.lm is not None and lm_h.dlm is None
    assert lm_h(utts[0].path) == tl                # host oracle agrees

    # lm ignored for greedy (main.py:78-84)
    g2 = ASR(cfg=SMALL, bw=1, lm_path=str(arpa))
    assert g2.lm is None and g2.dlm is None


def test_asr_zero_length_wav_no_crash(tmp_path):
    p = str(tmp_path / "z.wav")
    audio_io.write_wav(p, np.zeros(0, np.float32), 16000)
    from chinese_asr_tpu.api import ASR
    asr = ASR(cfg=SMALL, wav_bucket=4800)
    out = asr(p)
    assert isinstance(out, str)


def test_asr_batch_mixed_lengths(corpus):
    mpath, _ = corpus
    utts = dataset.read_manifest(mpath)
    from chinese_asr_tpu.api import ASR
    asr = ASR(cfg=SMALL, wav_bucket=4800)
    outs = asr.transcribe_files([u.path for u in utts[:3]])
    assert len(outs) == 3


def test_asr_bf16_mode(corpus):
    """bf16 compute: decode runs, scores are finite f32, output is a str."""
    mpath, _ = corpus
    utts = dataset.read_manifest(mpath)
    from chinese_asr_tpu.api import ASR
    import jax.numpy as jnp
    asr = ASR(cfg=SMALL, bw=3, wav_bucket=4800, compute_dtype="bfloat16")
    for leaf in __import__("jax").tree_util.tree_leaves(asr.params):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.bfloat16
    out = asr(utts[0].path)
    assert isinstance(out, str)
    g = ASR(cfg=SMALL, wav_bucket=4800, compute_dtype="bfloat16")
    assert isinstance(g(utts[0].path), str)


def test_transcribe_batch_chunking(corpus):
    mpath, _ = corpus
    utts = dataset.read_manifest(mpath)
    from chinese_asr_tpu.api import ASR
    asr = ASR(cfg=SMALL, wav_bucket=4800)
    paths = [u.path for u in utts]            # 5 files, max_batch=2
    wavs = []
    for p in paths:
        w, _ = audio_io.read_wav(p, 16000)
        wavs.append(audio_io.peak_normalize(w))
    chunked = asr.transcribe_wavs(wavs, max_batch=2)
    assert len(chunked) == 5
    single = asr.transcribe_wavs(wavs, max_batch=16)
    # note: different padding buckets can change compiled programs but the
    # transcripts must agree
    assert chunked == single


def test_transcribe_wavs_int16_matches_float(tmp_path):
    """int16 PCM input must transcribe identically to its float32/32768
    equivalent (ADVICE r1: blind float32 coercion skipped the /32768)."""
    from chinese_asr_tpu.api import ASR
    rng = np.random.RandomState(3)
    f32 = (0.3 * rng.randn(9000)).astype(np.float32).clip(-1, 1)
    i16 = (f32 * 32768).clip(-32768, 32767).astype(np.int16)
    f32_of_i16 = i16.astype(np.float32) / 32768.0
    asr = ASR(cfg=SMALL, wav_bucket=4800)
    assert asr.transcribe_wavs([i16]) == asr.transcribe_wavs([f32_of_i16])
    # mixed batch: the int16 member is host-scaled, same transcript
    assert (asr.transcribe_wavs([i16, f32])[0]
            == asr.transcribe_wavs([f32_of_i16, f32])[0])


def test_transcribe_long(tmp_path):
    from chinese_asr_tpu.api import ASR
    rng = np.random.RandomState(0)
    wav = (0.1 * rng.randn(16000 * 3)).astype(np.float32)  # 3 s
    p = str(tmp_path / "long.wav")
    audio_io.write_wav(p, wav)
    asr = ASR(cfg=SMALL, wav_bucket=4800)
    out = asr.transcribe_long(p, chunk_s=1.0, search_s=0.25)
    assert isinstance(out, str) and len(out) > 0


def test_transcribe_long_no_duplication(tmp_path):
    """Disjoint silence-seeking cuts: decoding 2 chunks must cover each
    audio sample exactly once (a tone+silence pattern makes the low-energy
    cut points land in the silent gaps)."""
    from chinese_asr_tpu.api import ASR
    sr = 16000
    t = np.arange(sr) / sr
    tone = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    gap = np.zeros(sr // 2, np.float32)
    wav = np.concatenate([tone, gap, tone, gap, tone])
    p = str(tmp_path / "tones.wav")
    audio_io.write_wav(p, wav)
    asr = ASR(cfg=SMALL, wav_bucket=4800)
    calls = []
    orig = asr.transcribe_wavs

    def spy(wavs, *a, **k):
        calls.append([np.asarray(w) for w in wavs])
        return orig(wavs, *a, **k)

    asr.transcribe_wavs = spy
    asr.transcribe_long(p, chunk_s=1.2, search_s=0.3)
    chunks = calls[0]
    total = sum(len(c) for c in chunks)
    assert total == len(wav)                       # nothing dropped/repeated
    # long-form ships raw PCM16 (peak gain applied on device)
    readback, _ = audio_io.read_wav(p, sr, dtype="int16")
    np.testing.assert_array_equal(np.concatenate(chunks), readback)


def test_device_peak_scale_matches_host_normalize(corpus):
    """transcribe_files (raw PCM16 + on-device peak gain) must produce the
    same transcripts as host-side peak_normalize + float32 upload."""
    mpath, _ = corpus
    utts = dataset.read_manifest(mpath)
    from chinese_asr_tpu.api import ASR
    asr = ASR(cfg=SMALL, wav_bucket=4800)
    paths = [u.path for u in utts[:3]]
    via_files = asr.transcribe_files(paths)
    host = []
    for p in paths:
        w, _ = audio_io.read_wav(p, 16000)
        host.append(audio_io.peak_normalize(w))
    assert via_files == asr.transcribe_wavs(host)


def test_prefetch_order_and_errors():
    from chinese_asr_tpu.data.dataset import prefetch
    assert list(prefetch(iter(range(7)), size=2)) == list(range(7))

    def bad():
        yield 1
        raise RuntimeError("boom")

    it = prefetch(bad(), size=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        list(it)


def test_prefetch_worker_exits_when_consumer_abandons():
    """An abandoned prefetch generator (trainer stopping at max_steps
    mid-epoch) must not leave its worker thread blocked in q.put forever
    holding the source iterator (round-4 leak: every full-suite crash
    dump showed one of these parked threads)."""
    import threading
    import time as _time
    from chinese_asr_tpu.data.dataset import prefetch

    before = {t.ident for t in threading.enumerate()}
    it = prefetch(iter(range(1000)), size=2)
    assert next(it) == 0                       # worker running, queue full
    it.close()                                 # consumer abandons
    deadline = _time.time() + 5.0
    while _time.time() < deadline:
        extra = [t for t in threading.enumerate()
                 if t.ident not in before and t.is_alive()]
        if not extra:
            break
        _time.sleep(0.05)
    assert not extra, f"leaked prefetch worker threads: {extra}"


def test_transcribe_chunking_sorts_by_length(corpus):
    """Chunked transcription length-sorts internally but returns results in
    input order, identical to the unchunked call."""
    from chinese_asr_tpu.api import ASR
    rng = np.random.RandomState(5)
    wavs = [(0.1 * rng.randn(n)).astype(np.float32)
            for n in [9000, 4000, 7000, 3000, 8000]]
    asr = ASR(cfg=SMALL, wav_bucket=4800)
    assert (asr.transcribe_wavs(wavs, max_batch=2)
            == asr.transcribe_wavs(wavs, max_batch=16))


def test_transcribe_empty_list():
    from chinese_asr_tpu.api import ASR
    assert ASR(cfg=SMALL, wav_bucket=4800).transcribe_wavs([]) == []


def test_transcribe_bytes_wav(tmp_path):
    """In-memory audio bytes (the reference's sketched service variant,
    main.py:9-16): WAV bytes must transcribe identically to the file."""
    import io
    import wave as wave_mod
    from chinese_asr_tpu.api import ASR, _identity_vocab

    rng = np.random.RandomState(0)
    pcm = (rng.randn(8000) * 6000).clip(-32768, 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(pcm.tobytes())
    data = buf.getvalue()
    p = tmp_path / "x.wav"
    p.write_bytes(data)

    asr = ASR(cfg=SMALL, bw=2, vocab=_identity_vocab(SMALL.vocab.vocab_size),
              wav_bucket=1600)
    assert asr.transcribe_bytes(data) == asr(str(p))


def test_asr_lm_first_mode(tmp_path, corpus):
    """Mode 4: ASR(lm_mode="first") runs the fused on-device-LM decode
    through the full file->transcript product path, for both an ARPA
    text LM and a .klm binary, deterministically."""
    mpath, _ = corpus
    utts = dataset.read_manifest(mpath)
    from chinese_asr_tpu.api import ASR, _identity_vocab
    from chinese_asr_tpu.lm import ngram

    # unigram LM over the identity-vocab markers so every token scores
    vocab = _identity_vocab(SMALL.vocab.vocab_size)
    words = [vocab.int2word[i] for i in range(4, SMALL.vocab.vocab_size)]
    lines = (["\\data\\", f"ngram 1={len(words) + 3}", "", "\\1-grams:",
              "-2.5\t<unk>", "-2.0\t<s>", "-0.9\t</s>"]
             + [f"{-0.5 - 0.05 * i}\t{w}" for i, w in enumerate(words)]
             + ["", "\\end\\", ""])
    arpa = tmp_path / "first.arpa"
    arpa.write_text("\n".join(lines))

    asr = ASR(cfg=SMALL, bw=3, lm_path=str(arpa), lm_mode="first",
              wav_bucket=4800)
    assert asr.dlm is not None and asr.lm is None
    t1 = asr(utts[0].path)
    t2 = asr(utts[0].path)
    assert isinstance(t1, str) and t1 == t2

    # same LM as a probing .klm binary -> same transcript
    blob = str(tmp_path / "first.klm")
    ngram.NgramLM(str(arpa)).write_binary(blob)
    asr_k = ASR(cfg=SMALL, bw=3, lm_path=blob, lm_mode="first",
                wav_bucket=4800)
    assert asr_k.dlm is not None and asr_k.dlm.hashed
    assert asr_k(utts[0].path) == t1
