"""Batched on-device Levenshtein distance (anti-diagonal DP under jit).

The reference computes CER on the host via python-Levenshtein one string at
a time (reference util.py:237-262); this is the eval-at-scale device path
(SURVEY.md section 2.b): the DP table is swept along anti-diagonals, so the
sequential loop is P+R steps of fully vectorized [B, R+1] updates instead
of P*R scalar cells — the whole dev-set CER can ride along in the jitted
eval program with no host round-trip.

Distance at cell (i, j) (i chars of pred, j chars of ref):
  d[i,j] = min(d[i-1,j] + 1, d[i,j-1] + 1, d[i-1,j-1] + (pred_i != ref_j))
Diagonal k holds cells with i + j == k; each step consumes diagonals k-1
and k-2 only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = jnp.int32(1 << 20)


def batched_edit_distance(pred, pred_lens, ref, ref_lens):
    """pred [B, P] int32, ref [B, R] int32 (zero-padded), true lengths in
    pred_lens / ref_lens -> int32 distances [B]."""
    B, P = pred.shape
    _, R = ref.shape
    K = P + R  # number of non-trivial diagonals

    j_idx = jnp.arange(R + 1, dtype=jnp.int32)[None, :]            # [1, R+1]
    pred_lens = pred_lens.astype(jnp.int32)[:, None]
    ref_lens_c = ref_lens.astype(jnp.int32)

    # diagonal 0: only cell (0,0) = 0
    d_prev2 = jnp.where(j_idx == 0, 0, _BIG) * jnp.ones((B, 1), jnp.int32)
    # diagonal 1: cells (1,0)=1 and (0,1)=1
    d_prev = jnp.where(j_idx <= 1, 1, _BIG) * jnp.ones((B, 1), jnp.int32)

    def body(carry, k):
        d2, d1 = carry                                             # k-2, k-1
        i = k - j_idx                                              # [1, R+1]
        # neighbors on diagonal k-1: (i-1, j) at column j; (i, j-1) at j-1
        up = d1 + 1
        left = jnp.concatenate([jnp.full((B, 1), _BIG), d1[:, :-1] + 1],
                               axis=1)
        # substitution from diagonal k-2 at column j-1 = cell (i-1, j-1)
        ch_p = jnp.take_along_axis(
            pred, jnp.clip(i - 1, 0, P - 1) * jnp.ones((B, 1), jnp.int32),
            axis=1)                                                # [B, R+1]
        ch_r = jnp.concatenate(
            [jnp.zeros((B, 1), ref.dtype), ref[:, :R]], axis=1)    # j-1 chars
        cost = (ch_p != ch_r).astype(jnp.int32)
        sub = jnp.concatenate([jnp.full((B, 1), _BIG),
                               d2[:, :-1] + cost[:, 1:]], axis=1)
        d = jnp.minimum(jnp.minimum(up, left), sub)
        # boundary cells of this diagonal
        d = jnp.where((i == 0), j_idx, d)                          # top row
        d = jnp.where(j_idx == 0, k, d)                            # left col
        # cells outside the table
        d = jnp.where((i < 0) | (i > P), _BIG, d)
        return (d1, d), d

    ks = jnp.arange(2, K + 1, dtype=jnp.int32)
    _, diags = jax.lax.scan(body, (d_prev2, d_prev), ks)           # [K-1,B,R+1]
    all_diags = jnp.concatenate(
        [d_prev2[None], d_prev[None], diags], axis=0)              # [K+1,B,R+1]
    k_out = (pred_lens[:, 0] + ref_lens_c)                         # [B]
    picked = all_diags[k_out, jnp.arange(B)]                       # [B, R+1]
    return jnp.take_along_axis(picked, ref_lens_c[:, None], axis=1)[:, 0]


def batched_cer(pred, pred_lens, ref, ref_lens):
    """Normalized per-utterance CER [B] float32 (distance / ref_len,
    reference util.py:237-251)."""
    d = batched_edit_distance(pred, pred_lens, ref, ref_lens)
    return d.astype(jnp.float32) / jnp.maximum(
        ref_lens.astype(jnp.float32), 1.0)
