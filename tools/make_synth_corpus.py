"""Generate a synthetic wav+TSV corpus for driving the training CLI.

No real speech exists in this environment; this makes the next best
thing for exercising the full product path (manifest -> loader ->
device featurize -> compiled step -> eval CER -> plateau LR ->
checkpoints): AR-filtered noise utterances whose TRANSCRIPTS are a
deterministic function of an utterance-level tone sequence, so the
model has real (if easy) structure to learn and eval CER moves.

  python tools/make_synth_corpus.py --out /tmp/corpus --n 256 \
      [--secs 2,4,6] [--vocab-size 64] [--chars-per-sec 2]

Writes <out>/utt%04d.wav (16 kHz PCM16), <out>/train.tsv, <out>/dev.tsv
(a 1/8 split).
"""

from __future__ import annotations

import argparse
import os
import sys
import wave

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SR = 16000
# a pool of real Hanzi so the vocab/tokenizer path sees multi-byte UTF-8
HANZI = ("的一是不了人我在有他这为之大来以个中上们到说国和地也子时道"
         "出而要于就下得可你年生自会那后能对着事其里所去行过家十用发")


def write_wav(path: str, x: np.ndarray) -> None:
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(x.astype("<i2").tobytes())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--secs", default="2,4,6",
                    help="utterance lengths cycle through these")
    ap.add_argument("--vocab-size", type=int, default=64)
    ap.add_argument("--chars-per-sec", type=float, default=2.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    os.makedirs(args.out, exist_ok=True)
    secs = [float(s) for s in args.secs.split(",")]
    chars = HANZI[: args.vocab_size]
    rows = []
    for i in range(args.n):
        dur = secs[i % len(secs)]
        n_char = max(1, int(dur * args.chars_per_sec))
        toks = rng.randint(0, len(chars), n_char)
        # each character renders as a tone segment (pitch = f(token)) in
        # AR noise: the mapping is learnable from log-mel features
        seg = int(dur * SR) // n_char
        x = np.zeros(int(dur * SR), np.float64)
        for j, t in enumerate(toks):
            f = 150.0 + 35.0 * t
            tt = np.arange(seg) / SR
            x[j * seg:(j + 1) * seg] = np.sin(2 * np.pi * f * tt)
        x += 0.05 * np.convolve(rng.randn(len(x)),
                                0.9 ** np.arange(50), "same")
        x = (x / np.abs(x).max() * 18000).astype(np.int16)
        path = os.path.join(args.out, f"utt{i:04d}.wav")
        write_wav(path, x)
        rows.append(f"{path}\t{''.join(chars[t] for t in toks)}")
    n_dev = max(1, args.n // 8)
    with open(os.path.join(args.out, "train.tsv"), "w",
              encoding="utf-8") as f:
        f.write("\n".join(rows[n_dev:]) + "\n")
    with open(os.path.join(args.out, "dev.tsv"), "w",
              encoding="utf-8") as f:
        f.write("\n".join(rows[:n_dev]) + "\n")
    print(f"wrote {args.n} wavs ({args.n - n_dev} train / {n_dev} dev) "
          f"to {args.out}")


if __name__ == "__main__":
    main()
