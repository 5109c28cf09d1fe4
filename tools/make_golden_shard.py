"""Generate the frozen end-to-end golden shard (tests/golden/).

The golden shard pins the WHOLE product path — wav bytes -> featurizer
-> encoder -> decode mode -> LM -> detokenize — byte-for-byte across
rounds (the pattern of the reference's test harness, model.py:1370-1443,
made durable): a system-level regression in any stage can never move
all oracles at once, because the oracles are committed files, not
values recomputed per test run.

Writes (all committed to the repo, ~300 KB total):
  tests/golden/utt{i}.wav     6 synthetic tone-sequence utterances
  tests/golden/model.ckpt     a tiny LAS overfit on them (emits eos)
  tests/golden/lm.arpa        a small trigram LM over the same chars
  tests/golden/expected.json  transcripts for every decode mode

Run on CPU (the suite's platform — goldens are CPU-math artifacts):
  JAX_PLATFORM_NAME=cpu JAX_PLATFORMS=cpu python tools/make_golden_shard.py

Regenerate ONLY on an intentional semantics change, and say why in the
commit message.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import wave

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

SR = 16000
CHARS = "的一是不了人我在"          # 8 Hanzi; vocab ids 4..11
OUT = os.path.join(ROOT, "tests", "golden")


def golden_cfg():
    from chinese_asr_tpu.config import Config
    return (Config()
            .with_("audio", n_mels=8, delta_delta=False, downsample=False)
            .with_("encoder", hidden_size=16, num_layers=2)
            .with_("decoder", hidden_size=32, embed_dim=12)
            .with_("attention", attn_size=8)
            .with_("vocab", max_num_words=8)
            .with_("decode", max_len=8))


def golden_vocab():
    from chinese_asr_tpu.vocab import Vocab
    return Vocab.build([CHARS * 3], max_num_words=8)


def golden_wavs_and_texts():
    """6 deterministic 1-second tone-sequence utterances, 3 chars each
    (the make_synth_corpus recipe at fixture scale)."""
    rng = np.random.RandomState(123)
    wavs, texts = [], []
    for i in range(6):
        toks = rng.randint(0, len(CHARS), 3)
        seg = SR // len(toks)
        x = np.zeros(SR, np.float64)
        for j, t in enumerate(toks):
            f = 150.0 + 35.0 * t
            tt = np.arange(seg) / SR
            x[j * seg:(j + 1) * seg] = np.sin(2 * np.pi * f * tt)
        x += 0.05 * np.convolve(rng.randn(len(x)),
                                0.9 ** np.arange(50), "same")
        wavs.append((x / np.abs(x).max() * 18000).astype(np.int16))
        texts.append("".join(CHARS[t] for t in toks))
    return wavs, texts


def golden_arpa_text():
    """Fixed trigram ARPA over the golden chars (values chosen once,
    frozen here so the generator is deterministic)."""
    rng = np.random.RandomState(7)

    def lp(lo=-3.0, hi=-0.1):
        return round(float(rng.uniform(lo, hi)), 4)

    uni = ["-2.3\t<unk>", "-1.1\t<s>\t-0.4", "-1.4\t</s>"]
    uni += [f"{lp()}\t{c}\t{lp(-0.9, -0.1)}" for c in CHARS]
    bi, seen = [], set()
    toks = list(CHARS) + ["<s>"]
    for _ in range(40):
        a = str(rng.choice(toks))
        b = str(rng.choice(list(CHARS) + ["</s>"]))
        if (a, b) in seen:
            continue
        seen.add((a, b))
        bo = f"\t{lp(-0.8, -0.1)}" if rng.rand() < 0.7 else ""
        bi.append(f"{lp()}\t{a} {b}{bo}")
    tri, seen3 = [], set()
    for _ in range(30):
        key = (str(rng.choice(toks)), str(rng.choice(list(CHARS))),
               str(rng.choice(list(CHARS) + ["</s>"])))
        if key in seen3:
            continue
        seen3.add(key)
        tri.append(f"{lp()}\t{' '.join(key)}")
    lines = (["\\data\\", f"ngram 1={len(uni)}", f"ngram 2={len(bi)}",
              f"ngram 3={len(tri)}", "", "\\1-grams:"] + uni
             + ["", "\\2-grams:"] + bi + ["", "\\3-grams:"] + tri
             + ["", "\\end\\", ""])
    return "\n".join(lines)


def transcribe_all_modes(ckpt, arpa, wav_paths, vocab, cfg):
    """Every decode mode through the public ASR API."""
    from chinese_asr_tpu.api import ASR
    modes = {
        "greedy": dict(bw=None),
        "beam_bw4": dict(bw=4),
        "lm_second": dict(bw=4, lm_path=arpa, lm_mode="second"),
        "lm_second_host": dict(bw=4, lm_path=arpa, lm_mode="second_host"),
        "lm_first": dict(bw=4, lm_path=arpa, lm_mode="first", lm_topn=8),
    }
    out = {}
    for name, kw in modes.items():
        asr = ASR(ckpt_path=ckpt, cfg=cfg, vocab=vocab, wav_bucket=SR, **kw)
        out[name] = asr.transcribe_files(list(wav_paths))
    return out


def main():
    import jax
    import jax.numpy as jnp

    from chinese_asr_tpu.audio import features
    from chinese_asr_tpu.models import las
    from chinese_asr_tpu.train import optim
    from chinese_asr_tpu.train.step import Batch, train_step
    from chinese_asr_tpu.utils.checkpoint import save_checkpoint

    assert jax.default_backend() == "cpu", "goldens are CPU-math artifacts"
    os.makedirs(OUT, exist_ok=True)
    cfg = golden_cfg()
    vocab = golden_vocab()
    wavs, texts = golden_wavs_and_texts()

    wav_paths = []
    for i, x in enumerate(wavs):
        p = os.path.join(OUT, f"utt{i}.wav")
        with wave.open(p, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(SR)
            w.writeframes(x.astype("<i2").tobytes())
        wav_paths.append(p)

    arpa = os.path.join(OUT, "lm.arpa")
    with open(arpa, "w", encoding="utf-8") as f:
        f.write(golden_arpa_text())

    # overfit the tiny model on the 6 utterances until it emits the
    # targets confidently (eos fires -> every decode mode is non-trivial)
    feat_fn = jax.jit(lambda w, l: features.featurize_batch(
        w, l, cfg.audio, norm_eps=1e-6))
    mat = np.stack([x.astype(np.float32) / 32768.0 for x in wavs])
    feats, flens = feat_fn(jnp.asarray(mat),
                           jnp.asarray(np.full(len(wavs), SR, np.int64)))
    S = 5
    tok = np.stack([vocab.encode(t) for t in texts]).astype(np.int32)
    batch = Batch(
        feats=feats,
        feat_lens=flens,
        tokens_in=jnp.asarray(np.concatenate(
            [np.full((len(wavs), 1), 1, np.int32), tok,
             np.zeros((len(wavs), S - 1 - tok.shape[1]), np.int32)], 1)),
        tokens_out=jnp.asarray(np.concatenate(
            [tok, np.full((len(wavs), 1), 2, np.int32),
             np.zeros((len(wavs), S - 1 - tok.shape[1]), np.int32)], 1)),
        text_lens=jnp.asarray(np.full(len(wavs), tok.shape[1] + 1, np.int32)))
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(cfg.train)
    opt = tx.init(params)
    step = jax.jit(functools.partial(train_step, cfg=cfg, tx=tx))
    m = {}
    for i in range(400):
        params, opt, m = step(params, opt, batch=batch,
                              rng=jax.random.PRNGKey(i))
    acc = float(m["accuracy"])
    assert acc > 0.99, f"golden model did not converge (acc={acc})"

    ckpt = os.path.join(OUT, "model.ckpt")
    save_checkpoint(ckpt, params)

    expected = transcribe_all_modes(ckpt, arpa, wav_paths, vocab, cfg)
    # sanity: the overfit model should reproduce its training targets in
    # at least the acoustic modes (the LM can legitimately flip a char)
    assert expected["greedy"] == texts, (expected["greedy"], texts)
    assert expected["beam_bw4"] == texts
    assert expected["lm_second"] == expected["lm_second_host"]
    with open(os.path.join(OUT, "expected.json"), "w",
              encoding="utf-8") as f:
        json.dump({"texts": texts, "modes": expected}, f,
                  ensure_ascii=False, indent=1)
    print(f"golden shard written to {OUT} (train acc {acc:.3f})")
    for k, v in expected.items():
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
