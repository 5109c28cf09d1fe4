"""Fused Pallas TPU kernel for the bidirectional LSTM time loop.

This is the framework's equivalent of cuDNN's fused LSTM (the single
biggest native hot loop of the reference — its packed-sequence nn.LSTM,
reference encoder.py:53-64): the whole T-step recurrence of BOTH
directions runs inside one kernel.

Split of labor (mirrors ops/rnn._scan_lstm_bidir):
* XLA precomputes the input gates ``xg = x @ w_ih + b`` for both
  directions as two large MXU matmuls (forward order + statically flipped
  for backward) — that part is already roofline-bound.
* This kernel owns the sequential part: grid=(T,), one program per time
  step.  The per-step xg slab streams HBM->VMEM through Pallas's automatic
  block pipeline (double-buffered against compute), the (h, c) carry lives
  in VMEM scratch across grid steps, the recurrent matmul hits the MXU,
  and the masked state update freezes each sample's carry past its true
  length.  Final (h, c) are flushed on the last step through a
  constant-index output block.

Numerics match the lax.scan path up to MXU accumulation order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xg_ref, m_ref, whh_ref, ys_ref, hT_ref, cT_ref, h_scr, c_scr,
            *, steps: int, chunk: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    w0 = whh_ref[0]
    w1 = whh_ref[1]

    def step(ci, carry):
        h, c = carry
        xg_t = xg_ref[ci]                                # [2, B, 4H]
        m_t = m_ref[ci]                                  # [2, B]
        gates0 = xg_t[0] + jnp.dot(h[0], w0,
                                   preferred_element_type=jnp.float32)
        gates1 = xg_t[1] + jnp.dot(h[1], w1,
                                   preferred_element_type=jnp.float32)
        gates = jnp.stack([gates0, gates1])              # [2, B, 4H]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
        m = m_t[:, :, None]
        h = m * h2 + (1.0 - m) * h
        c = m * c2 + (1.0 - m) * c
        ys_ref[ci] = h2 * m
        return h, c

    h, c = jax.lax.fori_loop(0, chunk, step, (h_scr[:], c_scr[:]))
    h_scr[:] = h
    c_scr[:] = c

    @pl.when(t == steps - 1)
    def _():
        hT_ref[:] = h
        cT_ref[:] = c


def bidir_lstm_time_loop(xg, m2, w_hh, chunk: int = 0,
                         interpret: bool = False):
    """xg [T, 2, B, 4H] f32, m2 [T, 2, B] f32, w_hh [2, H, 4H] ->
    (ys [T, 2, B, H], hT [2, B, H], cT [2, B, H]).

    ``chunk`` time steps run per grid program (amortizing the per-block
    pipeline overhead); T is zero-padded up to a chunk multiple — masked
    padded steps leave the carry untouched and their outputs are sliced
    off."""
    T, G, B, H4 = xg.shape
    H = H4 // 4
    if chunk <= 0:
        # keep the double-buffered xg slab around 2 MB so VMEM holds
        # 2 slabs + weights + out chunk + carry within the 16 MB budget
        chunk = max(1, min(16, (2 << 20) // (G * B * H4 * 4)))
    Tp = ((T + chunk - 1) // chunk) * chunk
    if Tp != T:
        xg = jnp.pad(xg, ((0, Tp - T), (0, 0), (0, 0), (0, 0)))
        m2 = jnp.pad(m2, ((0, Tp - T), (0, 0), (0, 0)))
    steps = Tp // chunk
    kernel = functools.partial(_kernel, steps=steps, chunk=chunk)
    flops = Tp * (2 * B * H * H4 * 2 + 10 * G * B * H4)
    ys, hT, cT = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((chunk, G, B, H4), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, G, B), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H, H4), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, G, B, H), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, B, H), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, B, H), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tp, G, B, H), xg.dtype),
            jax.ShapeDtypeStruct((G, B, H), xg.dtype),
            jax.ShapeDtypeStruct((G, B, H), xg.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((G, B, H), jnp.float32),
            pltpu.VMEM((G, B, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(xg.size + Tp * G * B * H + G * H * H4) * 4,
            transcendentals=Tp * G * B * H4),
        interpret=interpret,
    )(xg, m2, w_hh)
    return ys[:T], hT, cT
