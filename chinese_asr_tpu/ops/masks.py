"""Length masks.

TPU-native replacement for the reference's mask helpers (reference
util.py:117-142) and for ``PackedSequence`` semantics generally: everything
here is fixed-shape + boolean/additive masks so it traces cleanly under
``jax.jit``.
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -jnp.inf


def length_mask(lens, max_len: int, dtype=jnp.float32):
    """1.0 for valid positions, 0.0 for padding.

    Shape [B, L] (batch-major; the reference's get_mask util.py:117-128 is
    time-major because torch RNNs are — under jit we keep batch first).
    """
    pos = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    return (pos < lens.astype(jnp.int32)[:, None]).astype(dtype)


def softmax_mask(lens, max_len: int, dtype=jnp.float32):
    """Additive mask: 0 for valid, -inf for padding (util.py:131-142).

    Shape [B, L]; add to attention scores before softmax over L.
    """
    pos = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    invalid = pos >= lens.astype(jnp.int32)[:, None]
    return jnp.where(invalid, NEG_INF, 0.0).astype(dtype)


def tile_beams(t, k: int):
    """[B, ...] -> [B*k, ...] with each row repeated k times.

    Matches the reference's beam tiling ``tile_batch`` (util.py:41-56):
    sample b's beams occupy rows [b*k, (b+1)*k).
    """
    return jnp.repeat(t, k, axis=0)
