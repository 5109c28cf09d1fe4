"""Fused Pallas TPU kernel for the bidirectional LSTM time loop.

This is the framework's equivalent of cuDNN's fused LSTM (the single
biggest native hot loop of the reference — its packed-sequence nn.LSTM,
reference encoder.py:53-64): the whole T-step recurrence of BOTH
directions runs inside one kernel.

Split of labor (mirrors ops/rnn._bidir_lstm_layer_tm):
* XLA precomputes the input gates ``xg = x @ w_ih + b`` for both
  directions as two large MXU matmuls (forward order + statically flipped
  for backward) — that part is already roofline-bound.
* This kernel owns the sequential part: grid=(T/chunk,), ``chunk`` time
  steps per program.  The per-step xg slabs stream HBM->VMEM through
  Pallas's automatic block pipeline (double-buffered against compute),
  the (h, c) carries live in VMEM scratch across grid steps, the
  recurrent matmuls hit the MXU, and the masked state update freezes each
  sample's carry past its true length.  Final (h, c) are flushed on the
  last step through a constant-index output block.

Everything is TIME-MAJOR ([T, B, .]) and the two directions arrive as
separate operands: the round-3 layout probe measured the loop itself at
0.84 ms/layer but the batch-major wrapper's stack+moveaxis transposes at
~3 ms/layer (~700 MB of pure layout churn per layer) — so the kernel's
contract is "no relayout anywhere": xg is produced time-major by the
hoisted matmul, the mask arrives [T, B, 1] (B already on sublanes), and
all in-kernel math is 2-D per direction (Mosaic rule from the top-k
kernel: no 3-D intermediates).

Numerics match the lax.scan path up to MXU accumulation order.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xgf_ref, xgb_ref, mf_ref, mb_ref, whh_ref,
            ysf_ref, ysb_ref, hT_ref, cT_ref, h_scr, c_scr,
            *, steps: int, chunk: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    w0 = whh_ref[0]
    w1 = whh_ref[1]

    def one_dir(xg_t, m_t, w, h, c):
        gates = xg_t + jnp.dot(h, w, preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
        y = h2 * m_t
        h = y + (1.0 - m_t) * h
        c = m_t * c2 + (1.0 - m_t) * c
        return y, h, c

    def step(ci, carry):
        h0, c0, h1, c1 = carry
        y0, h0, c0 = one_dir(xgf_ref[ci], mf_ref[ci], w0, h0, c0)
        y1, h1, c1 = one_dir(xgb_ref[ci], mb_ref[ci], w1, h1, c1)
        ysf_ref[ci] = y0
        ysb_ref[ci] = y1
        return h0, c0, h1, c1

    h0, c0, h1, c1 = jax.lax.fori_loop(
        0, chunk, step, (h_scr[0], c_scr[0], h_scr[1], c_scr[1]))
    h_scr[0], h_scr[1] = h0, h1
    c_scr[0], c_scr[1] = c0, c1

    @pl.when(t == steps - 1)
    def _():
        hT_ref[0], hT_ref[1] = h0, h1
        cT_ref[0], cT_ref[1] = c0, c1


def bidir_lstm_time_loop(xg_f, xg_b, m_f, m_b, w_hh, chunk: int = 0,
                         interpret: bool = False, btile: int = 0):
    """xg_f/xg_b [T, B, 4H] f32 (backward direction already time-flipped),
    m_f/m_b [T, B] f32, w_hh [2, H, 4H] ->
    (ys_f [T, B, H], ys_b [T, B, H] — ys_b in the FLIPPED time order it
    was fed, hT [2, B, H], cT [2, B, H]).

    ``chunk`` time steps run per grid program (amortizing the per-block
    pipeline overhead); T is zero-padded up to a chunk multiple — masked
    padded steps leave the carry untouched and their outputs are sliced
    off.  Measured on v5e: chunk 2 vs 4 within noise, >=6 exhausts VMEM
    at the flagship shape (tools/lstm_chunk_ab.py).

    The batch dim is tiled onto the OUTER grid axis in slabs of <=128
    (``CHINESE_ASR_LSTM_BTILE`` overrides): per-program VMEM is bounded
    by the tile, not B, so large serving batches compile (B=256/512
    previously overflowed the 16 MB scoped-VMEM stack — the r4 batch
    sweep's failed rows).  Each tile runs its full time loop before the
    next starts (time is the minor grid axis), so the carry scratch is
    reset at t==0 per tile and flushed at t==steps-1 per tile."""
    T, B, H4 = xg_f.shape
    H = H4 // 4
    if btile <= 0:
        btile = int(os.environ.get("CHINESE_ASR_LSTM_BTILE", "0") or 0)
    if btile <= 0 or B % btile:
        btile = B
        while btile > 128 and btile % 2 == 0:
            btile //= 2
    nb = B // btile
    if chunk <= 0:
        env = os.environ.get("CHINESE_ASR_LSTM_CHUNK")
        if env:
            chunk = int(env)
        else:
            # keep the double-buffered xg slabs around 4 MB so VMEM holds
            # 2x2 slabs + weights + out chunks + carries within 16 MB
            # (chunk=4 at the flagship shape: measured marginally faster
            # than 2, and 6+ exhausts VMEM — tools/lstm_chunk_ab.py)
            chunk = max(1, min(16, (4 << 20) // (2 * btile * H4 * 4)))
    Tp = ((T + chunk - 1) // chunk) * chunk
    if Tp != T:
        pad = ((0, Tp - T), (0, 0), (0, 0))
        xg_f = jnp.pad(xg_f, pad)
        xg_b = jnp.pad(xg_b, pad)
        m_f = jnp.pad(m_f, pad[:2])
        m_b = jnp.pad(m_b, pad[:2])
    steps = Tp // chunk
    kernel = functools.partial(_kernel, steps=steps, chunk=chunk)
    flops = Tp * (2 * B * H * H4 * 2 + 10 * 2 * B * H4)
    xg_spec = pl.BlockSpec((chunk, btile, H4), lambda b, t: (t, b, 0),
                           memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((chunk, btile, 1), lambda b, t: (t, b, 0),
                          memory_space=pltpu.VMEM)
    ys_spec = pl.BlockSpec((chunk, btile, H), lambda b, t: (t, b, 0),
                           memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((2, btile, H), lambda b, t: (0, b, 0),
                           memory_space=pltpu.VMEM)
    ys_f, ys_b, hT, cT = pl.pallas_call(
        kernel,
        grid=(nb, steps),
        in_specs=[xg_spec, xg_spec, m_spec, m_spec,
                  pl.BlockSpec((2, H, H4), lambda b, t: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[ys_spec, ys_spec, st_spec, st_spec],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, H), xg_f.dtype),
            jax.ShapeDtypeStruct((Tp, B, H), xg_f.dtype),
            jax.ShapeDtypeStruct((2, B, H), xg_f.dtype),
            jax.ShapeDtypeStruct((2, B, H), xg_f.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, btile, H), jnp.float32),
            pltpu.VMEM((2, btile, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(2 * xg_f.size + 2 * Tp * B * H + 2 * H * H4) * 4,
            transcendentals=Tp * 2 * B * H4),
        interpret=interpret,
    )(xg_f, xg_b, m_f[..., None], m_b[..., None], w_hh)
    return ys_f[:T], ys_b[:T], hT, cT
