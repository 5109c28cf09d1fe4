"""On-device anti-diagonal Levenshtein vs the host implementations."""

import numpy as np
import pytest

import jax.numpy as jnp

from chinese_asr_tpu.ops.edit_distance_jax import (batched_cer,
                                                   batched_edit_distance)
from chinese_asr_tpu.ops.metrics import edit_distance


def pack(seqs, width):
    out = np.zeros((len(seqs), width), np.int32)
    lens = np.zeros(len(seqs), np.int32)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
        lens[i] = len(s)
    return jnp.asarray(out), jnp.asarray(lens)


def test_matches_host_on_random_batches():
    rng = np.random.RandomState(0)
    for trial in range(5):
        B = 8
        preds = [list(rng.randint(4, 20, size=rng.randint(0, 12)))
                 for _ in range(B)]
        refs = [list(rng.randint(4, 20, size=rng.randint(1, 12)))
                for _ in range(B)]
        P = max(1, max(len(p) for p in preds))
        R = max(len(r) for r in refs)
        p, pl = pack(preds, P)
        r, rl = pack(refs, R)
        got = np.asarray(batched_edit_distance(p, pl, r, rl))
        for b in range(B):
            want = edit_distance("".join(map(chr, preds[b])),
                                 "".join(map(chr, refs[b])))
            assert got[b] == want, (trial, b, preds[b], refs[b], got[b], want)


def test_known_values():
    p, pl = pack([[1, 2, 3], [1, 2, 3], []], 3)
    r, rl = pack([[1, 2, 3], [1, 4, 3], [5, 6]], 3)
    d = np.asarray(batched_edit_distance(p, pl, r, rl))
    np.testing.assert_array_equal(d, [0, 1, 2])
    c = np.asarray(batched_cer(p, pl, r, rl))
    np.testing.assert_allclose(c, [0.0, 1 / 3, 1.0])
