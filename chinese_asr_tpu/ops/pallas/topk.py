"""Exact row-wise top-k as a fused Pallas TPU kernel.

The beam loop's dominant op is the per-beam top-(k+1) over the vocabulary
([B*k, V] f32): XLA lowers `lax.approx_max_k` to a partial-reduce custom
call that measured ~0.67 ms/step at B=128, bw=16 — 13x the memory-bound
cost of reading the scores once.  This kernel loads each row block into
VMEM once and runs k argmax+mask passes there (VMEM bandwidth, not HBM),
so the HBM cost is a single stream over the scores.

Semantics: exact descending top-k; ties broken by LOWER column index
first (jax.lax.top_k order).  Returns (values [R, k] f32,
indices [R, k] int32).

Used by decode/beam.py when running on a TPU backend (same
CHINESE_ASR_PALLAS=0/1 override as the other kernels); every other
backend keeps the `approx_max_k` path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG_INF = float(np.finfo(np.float32).min)


def _kernel(x_ref, vals_ref, idx_ref, *, k: int, n_valid: int):
    x = x_ref[...].astype(jnp.float32)                       # [BR, Vp]
    BR, Vp = x.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (BR, Vp), 1)
    neg_inf = jnp.float32(-jnp.inf)
    # Sort key treats NaN as +inf so a NaN row max (NaN != NaN) cannot make
    # `hit` all-False and emit an out-of-range index; the reported VALUE is
    # gathered from the original x, so a NaN scores row returns NaN at the
    # NaN's (lowest) position like lax.top_k.  (Only divergence from
    # lax.top_k's total order: a row holding BOTH +inf and NaN ranks them
    # equal instead of NaN-first — unreachable from logp inputs.)
    key = jnp.where(jnp.isnan(x), jnp.float32(jnp.inf), x)
    # "taken" mask instead of overwriting with a sentinel: rows that are
    # entirely -inf must still yield k DISTINCT ascending indices, exactly
    # like jax.lax.top_k
    taken = col >= n_valid                                   # padding cols
    for j in range(k):
        xm = jnp.where(taken, neg_inf, key)
        m = jnp.max(xm, axis=1, keepdims=True)               # [BR, 1]
        hit = (xm == m) & ~taken
        i = jnp.min(jnp.where(hit, col, Vp), axis=1,
                    keepdims=True)                           # first max
        # i < n_valid always: k <= n_valid so an untaken column exists
        vals_ref[:, j] = jnp.max(jnp.where(col == i, x, neg_inf), axis=1)
        idx_ref[:, j] = i[:, 0]
        taken = taken | (col == i)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _top_k_impl(x, k: int, interpret: bool):
    R, V = x.shape
    Vp = -(-V // 128) * 128
    if V < Vp:
        x = jnp.pad(x, ((0, 0), (0, Vp - V)), constant_values=NEG_INF)
    # Row blocking: a single whole-array block at arbitrary R (e.g. the
    # tail chunk of a >max_batch transcription, R = B*bw) can exceed VMEM
    # (704 x 5120 f32 ~ 14 MB + temporaries).  Pad R up to a multiple of
    # 128 and slice the outputs; rows <= 128 stay one un-padded block.
    Rp = R
    if R > 128 and R % 128 != 0:
        Rp = -(-R // 128) * 128
        x = jnp.pad(x, ((0, Rp - R), (0, 0)), constant_values=NEG_INF)
    BR = 128 if Rp % 128 == 0 else Rp
    grid = (Rp // BR,)
    vals, idx = pl.pallas_call(
        functools.partial(_kernel, k=k, n_valid=V),
        grid=grid,
        in_specs=[pl.BlockSpec((BR, Vp), lambda r: (r, 0))],
        out_specs=(pl.BlockSpec((BR, k), lambda r: (r, 0)),
                   pl.BlockSpec((BR, k), lambda r: (r, 0))),
        out_shape=(jax.ShapeDtypeStruct((Rp, k), jnp.float32),
                   jax.ShapeDtypeStruct((Rp, k), jnp.int32)),
        interpret=interpret,
    )(x)
    if Rp != R:
        vals, idx = vals[:R], idx[:R]
    return vals, idx


def top_k(x, k: int, interpret: bool = False):
    """Exact top-k along the last axis of a 2-D f32 array."""
    assert x.ndim == 2, x.shape
    assert k <= x.shape[1], (k, x.shape)
    return _top_k_impl(x, k, interpret)


def use_pallas_topk() -> bool:
    """Same policy as the featurizer kernel: on for TPU backends, off
    elsewhere.  CHINESE_ASR_PALLAS_TOPK=0/1 overrides just this kernel;
    CHINESE_ASR_PALLAS=0/1 overrides all pallas kernels."""
    flag = os.environ.get("CHINESE_ASR_PALLAS_TOPK",
                          os.environ.get("CHINESE_ASR_PALLAS"))
    if flag is not None:
        return flag != "0"
    return jax.default_backend() == "tpu"
