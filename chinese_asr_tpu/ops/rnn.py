"""Recurrent ops as pure functions over parameter pytrees.

TPU-native redesign of the reference's RNN machinery (reference
util.py:69-114 init, util.py:726-746 factory, util.py:1149-1324 RNN_RES
residual stack, util.py:1624-1661 RNNCellBase decoder stack):

* ``PackedSequence`` is replaced by fixed-shape [B, T, D] tensors + length
  masks inside a single ``lax.scan`` — no host round-trips, no per-length
  recompiles beyond the bucketed T.
* The input-to-hidden matmul for the *whole sequence* is hoisted out of the
  scan as one large [B*T, D] x [D, 4H] MXU matmul (the reference hand-codes
  the same trick inside its custom LSTM, util.py:862); the scan body only
  does the [B, H] x [H, 4H] recurrent matmul.
* Bidirectionality is two scans over a value-reversed (per true length)
  sequence instead of cuDNN's packed reverse.

Parameter layout per layer/direction (torch-transposed for right-matmuls):
  w_ih [D, 4H] or [D, 3H] / [D, H]; w_hh [H, ...]; b_ih, b_hh [...]
Gate order matches torch: LSTM (i, f, g, o), GRU (r, z, n) — this keeps the
checkpoint converter a pure transpose (reference model.py:347-369 schema).
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

# lax.scan unroll factor for the time loops: amortizes per-step loop
# overhead on TPU (the steps are tiny [B,H]x[H,4H] matmuls).  Tuned on
# v5e; override with CHINESE_ASR_SCAN_UNROLL.
SCAN_UNROLL = int(os.environ.get("CHINESE_ASR_SCAN_UNROLL", "4"))

Params = Dict[str, jnp.ndarray]

_GATES = {"LSTM": 4, "GRU": 3, "RNN_TANH": 1, "RNN_RELU": 1}


# --------------------------------------------------------------------------
# init (reference util.py:90-114: zeros bias + LSTM forget-bias 0.5,
# orthogonal hh, xavier-normal ih)
# --------------------------------------------------------------------------
def _xavier_normal(key, shape, fan_in, fan_out, dtype=jnp.float32):
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def _orthogonal_gates(key, hidden, n_gates, dtype=jnp.float32):
    """torch orthogonal init is applied to the full [n*h, h] matrix; we store
    its transpose [h, n*h]."""
    w = jax.nn.initializers.orthogonal()(key, (n_gates * hidden, hidden), dtype)
    return w.T


def init_rnn_layer(key, mode: str, input_size: int, hidden_size: int,
                   dtype=jnp.float32) -> Params:
    n = _GATES[mode]
    k_ih, k_hh = jax.random.split(key)
    # torch xavier_normal_ on weight_ih [n*h, in]: fans are (in, n*h)
    w_ih = _xavier_normal(k_ih, (input_size, n * hidden_size),
                          fan_in=input_size, fan_out=n * hidden_size, dtype=dtype)
    w_hh = _orthogonal_gates(k_hh, hidden_size, n, dtype)
    b_ih = jnp.zeros((n * hidden_size,), dtype)
    b_hh = jnp.zeros((n * hidden_size,), dtype)
    if mode == "LSTM":
        # forget-gate bias 0.5 on each bias vector (util.py:100-104)
        fb = jnp.zeros_like(b_ih).at[hidden_size:2 * hidden_size].set(0.5)
        b_ih = b_ih + fb
        b_hh = b_hh + fb
    return {"w_ih": w_ih, "w_hh": w_hh, "b_ih": b_ih, "b_hh": b_hh}


# --------------------------------------------------------------------------
# single-step cells (decoder path; reference RNNCellBase util.py:1650-1661)
# --------------------------------------------------------------------------
def lstm_from_gates(gates, c):
    """(h', c') from pre-activation gates [.., 4H] (i, f, g, o order)."""
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
    return h2, c2


def lstm_step(p: Params, x, h, c):
    gates = x @ p["w_ih"] + h @ p["w_hh"] + p["b_ih"] + p["b_hh"]
    return lstm_from_gates(gates, c)


def gru_step(p: Params, x, h):
    gi = x @ p["w_ih"] + p["b_ih"]
    gh = h @ p["w_hh"] + p["b_hh"]
    ir, iz, inn = jnp.split(gi, 3, axis=-1)
    hr, hz, hn = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(ir + hr)
    z = jax.nn.sigmoid(iz + hz)
    n = jnp.tanh(inn + r * hn)
    return (1.0 - z) * n + z * h


def rnn_step(p: Params, x, h, act):
    return act(x @ p["w_ih"] + h @ p["w_hh"] + p["b_ih"] + p["b_hh"])


# --------------------------------------------------------------------------
# full-sequence scans with length masking
# --------------------------------------------------------------------------
def _scan_lstm(p: Params, x, mask, h0, c0):
    """x [B, T, D], mask [B, T] float; returns (y [B, T, H], (hT, cT))."""
    B, T, _ = x.shape
    # hoist the input matmul out of the scan: one big MXU op
    xg = (x.reshape(B * T, -1) @ p["w_ih"] + p["b_ih"] + p["b_hh"]).reshape(B, T, -1)

    def body(carry, inp):
        h, c = carry
        xg_t, m_t = inp
        gates = xg_t + h @ p["w_hh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
        m = m_t[:, None]
        h = m * h2 + (1.0 - m) * h
        c = m * c2 + (1.0 - m) * c
        return (h, c), h2 * m

    (hT, cT), ys = jax.lax.scan(
        body, (h0, c0), (jnp.swapaxes(xg, 0, 1), jnp.swapaxes(mask, 0, 1)),
        unroll=SCAN_UNROLL)
    return jnp.swapaxes(ys, 0, 1), (hT, cT)


def _scan_gru(p: Params, x, mask, h0):
    B, T, _ = x.shape
    gi = (x.reshape(B * T, -1) @ p["w_ih"] + p["b_ih"]).reshape(B, T, -1)

    def body(h, inp):
        gi_t, m_t = inp
        gh = h @ p["w_hh"] + p["b_hh"]
        ir, iz, inn = jnp.split(gi_t, 3, axis=-1)
        hr, hz, hn = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(ir + hr)
        z = jax.nn.sigmoid(iz + hz)
        n = jnp.tanh(inn + r * hn)
        h2 = (1.0 - z) * n + z * h
        m = m_t[:, None]
        h = m * h2 + (1.0 - m) * h
        return h, h2 * m

    hT, ys = jax.lax.scan(body, h0, (jnp.swapaxes(gi, 0, 1), jnp.swapaxes(mask, 0, 1)),
                          unroll=SCAN_UNROLL)
    return jnp.swapaxes(ys, 0, 1), hT


def _scan_rnn(p: Params, x, mask, h0, act):
    B, T, _ = x.shape
    gi = (x.reshape(B * T, -1) @ p["w_ih"] + p["b_ih"] + p["b_hh"]).reshape(B, T, -1)

    def body(h, inp):
        gi_t, m_t = inp
        h2 = act(gi_t + h @ p["w_hh"])
        m = m_t[:, None]
        h = m * h2 + (1.0 - m) * h
        return h, h2 * m

    hT, ys = jax.lax.scan(body, h0, (jnp.swapaxes(gi, 0, 1), jnp.swapaxes(mask, 0, 1)),
                          unroll=SCAN_UNROLL)
    return jnp.swapaxes(ys, 0, 1), hT


def reverse_sequence(x, lens, max_len: Optional[int] = None):
    """Reverse the valid prefix of each row of x [B, T, ...] in time.

    Replaces cuDNN's packed backward pass: position t < len maps to
    len-1-t; padding positions keep themselves (they are masked anyway).
    """
    T = x.shape[1] if max_len is None else max_len
    pos = jnp.arange(T, dtype=jnp.int32)[None, :]                      # [1, T]
    lens = lens.astype(jnp.int32)[:, None]                             # [B, 1]
    idx = jnp.where(pos < lens, lens - 1 - pos, pos)                   # [B, T]
    idx = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, jnp.broadcast_to(idx, x.shape[:2] + x.shape[2:]), axis=1)


def rnn_layer(mode: str, p: Params, x, mask, state=None):
    """One unidirectional layer. x [B,T,D], mask [B,T] -> (y [B,T,H], state).

    state: (h, c) for LSTM else h, each [B, H]; zeros if None.
    """
    B, T, _ = x.shape
    H = p["w_hh"].shape[0]
    if mode == "LSTM":
        if state is None:
            state = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
        return _scan_lstm(p, x, mask, *state)
    if state is None:
        state = jnp.zeros((B, H), x.dtype)
    if mode == "GRU":
        return _scan_gru(p, x, mask, state)
    act = jnp.tanh if mode == "RNN_TANH" else jax.nn.relu
    return _scan_rnn(p, x, mask, state, act)


def _bidir_lstm_layer_tm(p_fwd: Params, p_bwd: Params, x_tm, mask_tm):
    """One bidirectional LSTM layer, fully TIME-MAJOR.

    The backward direction iterates the STATICALLY time-flipped sequence
    with the flipped mask: while the (flipped) step sits in a sample's
    padding, the mask freezes the carry at zero, so the state only starts
    accumulating at that sample's true last frame — numerically identical
    to running on the per-length-reversed input, but with two static flips
    instead of per-sample `take_along_axis` gathers (which cost more than
    the LSTM math itself on TPU: full [B,T,H] index tensors).

    Time-major everywhere: the hoisted input matmul produces [T, B, 4H]
    directly and the directions stay separate operands, so NO transpose
    or stack touches the [T, B, 4H] gate tensors (the round-3 layout
    probe measured the old batch-major wrapper's stack+moveaxis at ~3 ms
    vs 0.84 ms for the recurrence itself).

    x_tm [T, B, D], mask_tm [T, B] -> (y [T, B, 2H] in natural time
    order, state_fwd, state_bwd)."""
    T, B, _ = x_tm.shape

    def hoist(p, xi):
        return (xi.reshape(T * B, -1) @ p["w_ih"] + p["b_ih"] + p["b_hh"]
                ).reshape(T, B, -1)

    # flip the INPUT, not the hoisted gates: hoist is per-position linear,
    # so flip(hoist(x)) == hoist(flip(x)) and the flip moves D instead of
    # 4H channels
    xg_f = hoist(p_fwd, x_tm)
    xg_b = hoist(p_bwd, jnp.flip(x_tm, axis=0))
    m_f = mask_tm
    m_b = jnp.flip(mask_tm, axis=0)
    w_hh = jnp.stack([p_fwd["w_hh"], p_bwd["w_hh"]])       # [2, H, 4H]

    from ..audio.features import _use_pallas
    if _use_pallas() and x_tm.dtype == jnp.float32:
        ys_f, ys_b, hT, cT = _bidir_core_pallas(xg_f, xg_b, m_f, m_b, w_hh)
    else:
        ys_f, ys_b, hT, cT = _bidir_core_scan(xg_f, xg_b, m_f, m_b, w_hh)
    y = jnp.concatenate([ys_f, jnp.flip(ys_b, axis=0)], axis=-1)
    return y, (hT[0], cT[0]), (hT[1], cT[1])


def _bidir_core_scan(xg_f, xg_b, m_f, m_b, w_hh):
    """Direction-fused LSTM time loop as a lax.scan (time-major, per-
    direction 2-D math — the same step formulas as the Pallas kernel).

    xg_f/xg_b [T, B, 4H] (backward already flipped), m_f/m_b [T, B],
    w_hh [2, H, 4H] -> (ys_f [T, B, H], ys_b [T, B, H] in the flipped
    order it was fed, hT [2, B, H], cT [2, B, H])."""
    _, B, H4 = xg_f.shape
    H = H4 // 4
    z = jnp.zeros((B, H), xg_f.dtype)

    def one_dir(xg_t, m_t, w, h, c):
        gates = xg_t + h @ w
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
        m = m_t[:, None]
        y = h2 * m
        return y, y + (1.0 - m) * h, m * c2 + (1.0 - m) * c

    def body(carry, inp):
        h0, c0, h1, c1 = carry
        xf, xb, mf, mb = inp
        y0, h0, c0 = one_dir(xf, mf, w_hh[0], h0, c0)
        y1, h1, c1 = one_dir(xb, mb, w_hh[1], h1, c1)
        return (h0, c0, h1, c1), (y0, y1)

    (h0, c0, h1, c1), (ys_f, ys_b) = jax.lax.scan(
        body, (z, z, z, z), (xg_f, xg_b, m_f, m_b), unroll=SCAN_UNROLL)
    return ys_f, ys_b, jnp.stack([h0, h1]), jnp.stack([c0, c1])


@jax.custom_vjp
def _bidir_core_pallas(xg_f, xg_b, m_f, m_b, w_hh):
    """Fused Pallas time loop (ops/pallas/lstm.py): carry resident in VMEM.

    custom_vjp because Pallas kernels carry no autodiff rule: the backward
    pass recomputes the forward with the scan implementation (identical
    math) and uses its VJP — rematerialization, exactly what a remat'd
    scan would do anyway."""
    from .pallas import lstm as pallas_lstm
    return tuple(pallas_lstm.bidir_lstm_time_loop(xg_f, xg_b, m_f, m_b, w_hh))


def _bidir_core_fwd(xg_f, xg_b, m_f, m_b, w_hh):
    return _bidir_core_pallas(xg_f, xg_b, m_f, m_b, w_hh), \
        (xg_f, xg_b, m_f, m_b, w_hh)


def _bidir_core_bwd(res, g):
    _, vjp = jax.vjp(_bidir_core_scan, *res)
    return vjp(tuple(g))


_bidir_core_pallas.defvjp(_bidir_core_fwd, _bidir_core_bwd)


def bidir_rnn_layer(mode: str, p_fwd: Params, p_bwd: Params, x, lens, mask):
    """Bidirectional layer -> (y [B,T,2H], state_fwd, state_bwd)."""
    if mode == "LSTM":
        y, s_f, s_b = _bidir_lstm_layer_tm(p_fwd, p_bwd,
                                           jnp.swapaxes(x, 0, 1),
                                           jnp.swapaxes(mask, 0, 1))
        return jnp.swapaxes(y, 0, 1), s_f, s_b
    x_r = reverse_sequence(x, lens)
    y_f, s_f = rnn_layer(mode, p_fwd, x, mask)
    y_b, s_b = rnn_layer(mode, p_bwd, x_r, mask)
    y_b = reverse_sequence(y_b, lens)
    return jnp.concatenate([y_f, y_b], axis=-1), s_f, s_b


# --------------------------------------------------------------------------
# residual multi-layer stack (reference RNN_RES util.py:1149-1324)
# --------------------------------------------------------------------------
def init_rnn_stack(key, mode: str, input_size: int, hidden_size: int,
                   num_layers: int, bidirectional: bool, dtype=jnp.float32
                   ) -> List[Params]:
    """Layer i>0 consumes num_directions*hidden (util.py:1157-1160)."""
    nd = 2 if bidirectional else 1
    keys = jax.random.split(key, num_layers * nd)
    layers = []
    for i in range(num_layers):
        in_sz = input_size if i == 0 else nd * hidden_size
        layer = {"fwd": init_rnn_layer(keys[i * nd], mode, in_sz, hidden_size, dtype)}
        if bidirectional:
            layer["bwd"] = init_rnn_layer(keys[i * nd + 1], mode, in_sz, hidden_size, dtype)
        layers.append(layer)
    return layers


def rnn_stack(mode: str, layers: List[Params], x, lens, mask,
              residual: bool = True, skip_step: int = 0):
    """Residual stack: y_i added onto the running sum from layer 1 on
    (util.py:1284-1291).  Returns (y, last_layer_states) where
    last_layer_states is ((h_f, c_f), (h_b, c_b)) for bidir LSTM, etc.

    skip_step > 0 subsamples time between layers (util.py:1294-1316);
    static Python control flow — shapes stay static under jit.
    """
    if mode == "LSTM" and layers and all("bwd" in l for l in layers):
        # flagship path: stay TIME-MAJOR across the whole stack — one
        # transpose in, one out, instead of per-layer layout churn
        x_tm = jnp.swapaxes(x, 0, 1)
        m_tm = jnp.swapaxes(mask, 0, 1)
        states = None
        for i, layer in enumerate(layers):
            y, s_f, s_b = _bidir_lstm_layer_tm(layer["fwd"], layer["bwd"],
                                               x_tm, m_tm)
            states = (s_f, s_b)
            x_tm = x_tm + y if (residual and i > 0) else y
            if skip_step > 0 and i < len(layers) - 1:
                x_tm = x_tm[::skip_step]
                lens = jnp.maximum(lens // skip_step, 1)
                m_tm = m_tm[::skip_step]
        return (jnp.swapaxes(x_tm, 0, 1), states, lens,
                jnp.swapaxes(m_tm, 0, 1))
    states = None
    for i, layer in enumerate(layers):
        if "bwd" in layer:
            y, s_f, s_b = bidir_rnn_layer(mode, layer["fwd"], layer["bwd"], x, lens, mask)
            states = (s_f, s_b)
        else:
            y, s = rnn_layer(mode, layer["fwd"], x, mask)
            states = (s,)
        x = x + y if (residual and i > 0) else y
        if skip_step > 0 and i < len(layers) - 1:
            x = x[:, ::skip_step]
            lens = jnp.maximum(lens // skip_step, 1)
            mask = mask[:, ::skip_step]
    return x, states, lens, mask


# --------------------------------------------------------------------------
# LocalRNN (reference util.py:1026-1146; its self-test util.py:2504-2520)
# --------------------------------------------------------------------------
def local_rnn(mode: str, layers: List[Params], x, lens, mask,
              residual: bool = False, skip_steps=None):
    """Per-layer-configurable stack.  Differences from ``rnn_stack``
    (reference RNN_RES):

    * ``skip_steps`` is per-layer and applies AFTER every layer including
      the last (util.py:1119-1141), keeping the first frame of each group
      (``x[::step]``) with ceil-div length update
      ``(lens + step - 1) // step``.
    * residual defaults off (LocalRNN signature res=False, util.py:1027).

    Returns (y, per_layer_states, lens, mask); states entry i is
    ``(state_fwd, state_bwd)`` for bidirectional layers else
    ``(state,)`` — the reference concatenates these over layers*dirs
    (util.py:1143-1148).
    """
    if skip_steps is None:
        skip_steps = [1] * len(layers)
    skip_steps = ([skip_steps] * len(layers) if isinstance(skip_steps, int)
                  else list(skip_steps))
    assert len(skip_steps) == len(layers)
    all_states = []
    for i, layer in enumerate(layers):
        if "bwd" in layer:
            y, s_f, s_b = bidir_rnn_layer(mode, layer["fwd"], layer["bwd"],
                                          x, lens, mask)
            all_states.append((s_f, s_b))
        else:
            y, s = rnn_layer(mode, layer["fwd"], x, mask)
            all_states.append((s,))
        x = x + y if (residual and i > 0) else y
        step = skip_steps[i]
        if step > 1:
            x = x[:, ::step]
            lens = (lens + step - 1) // step
            mask = mask[:, ::step]
    return x, all_states, lens, mask


# --------------------------------------------------------------------------
# decoder cell stack (reference RNNCellBase util.py:1624-1661)
# --------------------------------------------------------------------------
def init_cell_stack(key, mode: str, input_size: int, hidden_size: int,
                    num_layers: int, dtype=jnp.float32) -> List[Params]:
    keys = jax.random.split(key, num_layers)
    return [init_rnn_layer(keys[i], mode,
                           input_size if i == 0 else hidden_size,
                           hidden_size, dtype)
            for i in range(num_layers)]


def cell_stack_step(mode: str, layers: List[Params], x,
                    state: Optional[List]) -> List:
    """One decode step through the layer stack; returns new per-layer state
    list ((h,c) tuples for LSTM, h arrays otherwise)."""
    if state is None:
        state = [None] * len(layers)
    new_states = []
    for i, p in enumerate(layers):
        H = p["w_hh"].shape[0]
        B = x.shape[0]
        if mode == "LSTM":
            s = state[i] if state[i] is not None else (
                jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
            h, c = lstm_step(p, x, s[0], s[1])
            new_states.append((h, c))
            x = h
        elif mode == "GRU":
            s = state[i] if state[i] is not None else jnp.zeros((B, H), x.dtype)
            h = gru_step(p, x, s)
            new_states.append(h)
            x = h
        else:
            s = state[i] if state[i] is not None else jnp.zeros((B, H), x.dtype)
            act = jnp.tanh if mode == "RNN_TANH" else jax.nn.relu
            h = rnn_step(p, x, s, act)
            new_states.append(h)
            x = h
    return new_states
