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


def _extract_desc(key, col, k: int, sentinel: int, vals_ref, idx_ref):
    """k threshold-exclusion extraction passes over ``key``/``col`` (any
    shape with rows on axis 0; reduces run over all other axes), writing
    descending (value, index) pairs into the output refs.  Returns the
    k-th (last) extracted (value, col) — the selection threshold.

    Exclusion is implied by the last extracted (v, i): extraction runs in
    exact descending (value, then ascending col) order, so an element is
    already taken iff key > v, or key == v and col <= i.  Ties go to the
    LOWER col (jax.lax.top_k order); +inf keys read back as NaN (the
    NaN-above-+inf total order of lax.top_k)."""
    BR = key.shape[0]
    axes = tuple(range(1, key.ndim))
    neg_inf = jnp.float32(-jnp.inf)
    pos_inf = jnp.float32(jnp.inf)
    v = jnp.full((BR,) + (1,) * len(axes), pos_inf, jnp.float32)
    i = jnp.full((BR,) + (1,) * len(axes), -1, jnp.int32)
    for j in range(k):
        excl = (key > v) | ((key == v) & (col <= i))
        m = jnp.max(jnp.where(excl, neg_inf, key), axis=axes, keepdims=True)
        # first max AMONG NON-EXCLUDED cols: on all--inf rows the -inf
        # "excluded" sentinel ties with real -inf values, so the index
        # must come from the exclusion mask, not from argmax of the
        # masked array (which would re-pick col 0 forever)
        i = jnp.min(jnp.where((key == m) & ~excl, col, sentinel),
                    axis=axes, keepdims=True)
        v = m
        vals_ref[:, j] = jnp.where(v == pos_inf, jnp.float32(jnp.nan),
                                   v).reshape(BR)
        idx_ref[:, j] = i.reshape(BR)
    return v, i


def _kernel(x_ref, vals_ref, idx_ref, *, k: int, n_valid: int):
    """Descending extraction with THRESHOLD exclusion (round 3; the trace
    showed this kernel at 29% of the whole decode pipeline).

    Instead of materializing a "taken" mask (read+write per pass, plus a
    separate hit/min pass to find the argmax), exclusion is implied by
    the last extracted (value v, col i): since extraction is in exact
    descending (value, then ascending col) order, an element is already
    taken iff key > v, or key == v and col <= i.  Each pass is then ONE
    elementwise compare-sweep feeding two fused reduces (max, then
    first-hit-among-non-excluded col) — ~2x less VMEM traffic than the
    taken-mask formulation.

    Tie order: the index reduce takes the FIRST maximum among
    non-excluded cols, i.e. lower col — exactly jax.lax.top_k.  NaN ranks ABOVE +inf via key=+inf (lax.top_k's total
    order); the reported value maps +inf back to NaN, so a legitimate
    +inf input would read as NaN — unreachable from logp inputs.
    Padding cols carry key=-inf at the HIGHEST cols, so they lose every
    tie against real -inf cols and k <= n_valid keeps them out entirely.
    """
    x = x_ref[...].astype(jnp.float32)                       # [BR, Vp]
    BR, Vp = x.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (BR, Vp), 1)
    key = jnp.where(col >= n_valid, jnp.float32(-jnp.inf),
                    jnp.where(jnp.isnan(x), jnp.float32(jnp.inf), x))
    _extract_desc(key, col, k, Vp, vals_ref, idx_ref)


GROUP_LEVELS = 5  # per-group candidates S; fallback iff a group exhausts


def _kernel_grouped(x_ref, vals_ref, idx_ref, *, k: int, n_valid: int,
                    levels: int, onepass: bool = False):
    """Two-level extraction (round 3, PERF lever #1: the flat kernel's k
    full [BR, Vp] sweeps are 29% of the decode pipeline).

    Groups are INTERLEAVED along lanes — group j holds cols {j, 128+j,
    256+j, ...} — so the per-group max is a reduce over the *sublane*
    axis of [BR, Vp/128, 128]: plain cross-vreg vector maxes, as cheap
    as a full-row reduce, but yielding 128 group maxima at once.  S
    (=``levels``) such passes give every group's top-S as candidates
    [BR, S, 128]; the global top-k is then extracted from that small set
    (passes over S*128 lanes instead of Vp).

    Exactness: the candidate set provably contains the true top-k UNLESS
    some group had all S of its candidates selected (then its unseen
    S+1-th element might belong above the k-th pick).  That is detected
    with the selection threshold (the k-th extracted (value, col)) and
    the whole block falls back to the flat k-sweep extraction in-kernel
    (`pl.when`).  P(fallback) ~ C(k,S)/128^(S-1) per row (~2e-5 at k=17,
    S=5) — rare, and the fallback is merely the old kernel's cost.

    Caller guarantees Vp/128 > levels (else a group could run out of
    real elements mid-extraction) and k <= levels*128.

    Everything here is strictly 2-D [BR, 128] / [BR, S*128]: the first
    hardware compile of the original [BR, M, 128] formulation crashed
    Mosaic's layout pass on v5e (layout.h:320 ``Check failed:
    arr.size() >= layout_rank(implicit_dim)``), so the per-group reduce
    over members is a sequential scan of the M 128-lane column slices —
    cols ascend with the slice index, which makes "first max wins"
    reproduce the flat kernel's min-col-among-maxima tie rule."""
    x = x_ref[...].astype(jnp.float32)                       # [BR, Vp]
    BR, Vp = x.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (BR, Vp), 1)
    neg_inf = jnp.float32(-jnp.inf)
    key = jnp.where(col >= n_valid, neg_inf,
                    jnp.where(jnp.isnan(x), jnp.float32(jnp.inf), x))
    fn = _extract_grouped_onepass if onepass else _extract_grouped
    fn(key, col, k, Vp, levels, vals_ref, idx_ref)


def _extract_grouped_onepass(key, col, k: int, Vp: int, levels: int,
                             vals_ref, idx_ref):
    """One-pass variant of `_extract_grouped`: the S-level group phase
    reads the [BR, Vp] block S times (S serialized sweeps); here each
    lane-group maintains its running top-S as a sorted insertion network,
    so the data is read ONCE and each slice costs one compare + four
    selects per network stage.

    Tie order falls out of the scan order: slices are processed in
    ascending member (= column) order and insertion uses STRICT >, so an
    equal value never displaces an earlier (lower-col) one — exactly the
    min-col-among-maxima rule, with no column compares at all.

    The network is SEEDED with phantoms (value -inf, col = member j's
    column) so all--inf groups still emit their lowest-col members in
    order (lax.top_k's -inf tie behavior).  A phantom can shadow a true
    -inf candidate's column when its member turned out finite, so any
    extraction that REACHES -inf (k-th pick == -inf) falls back to the
    flat kernel — in the beam this happens only on the step-0 blocks
    whose duplicate-beam rows are force-masked to -inf.
    """
    BR = key.shape[0]
    M = Vp // 128
    neg_inf = jnp.float32(-jnp.inf)
    lane = jax.lax.broadcasted_iota(jnp.int32, (BR, 128), 1)
    vs = [jnp.full((BR, 128), neg_inf, jnp.float32) for _ in range(levels)]
    cs = [lane + j * 128 for j in range(levels)]
    for m in range(M):
        s = key[:, m * 128:(m + 1) * 128]                    # [BR, 128]
        c = lane + m * 128
        for j in range(levels):
            b = s > vs[j]
            vs[j], s = jnp.where(b, s, vs[j]), jnp.where(b, vs[j], s)
            cs[j], c = jnp.where(b, c, cs[j]), jnp.where(b, cs[j], c)
    cv = jnp.concatenate(vs, axis=1)                         # [BR, S*128]
    cc = jnp.concatenate(cs, axis=1)
    v_k, i_k = _extract_desc(cv, cc, k, Vp, vals_ref, idx_ref)
    taken = (cv > v_k) | ((cv == v_k) & (cc <= i_k))
    per_group = sum(taken[:, l * 128:(l + 1) * 128].astype(jnp.int32)
                    for l in range(levels))                  # [BR, 128]
    bad = jnp.any(per_group >= levels) | jnp.any(v_k == neg_inf)

    @pl.when(bad)
    def _fallback():
        _extract_desc(key, col, k, Vp, vals_ref, idx_ref)


def _extract_grouped(key, col, k: int, Vp: int, levels: int,
                     vals_ref, idx_ref):
    """Grouped two-level extraction of ``key``/``col`` [BR, Vp] into the
    output refs (see `_kernel_grouped` for the scheme and the Mosaic 2-D
    constraints).  ``col`` is only read un-sliced (fallback path)."""
    BR = key.shape[0]
    M = Vp // 128
    neg_inf = jnp.float32(-jnp.inf)
    # per-slice columns come from a fresh lane iota, NOT col[:, a:b]: a
    # broadcasted_iota constant along sublanes is stored sublane-
    # replicated, and strided-slicing that layout crashes Mosaic too
    # (array.h:480 Check failed: limits[i] <= dim(i))
    lane = jax.lax.broadcasted_iota(jnp.int32, (BR, 128), 1)
    vg = jnp.full((BR, 128), jnp.float32(jnp.inf), jnp.float32)
    ig = jnp.full((BR, 128), -1, jnp.int32)
    cvs, ccs = [], []
    for _ in range(levels):                 # per-group top-S, threshold
        mg = jnp.full((BR, 128), neg_inf, jnp.float32)       # exclusion
        jg = jnp.full((BR, 128), Vp, jnp.int32)              # as flat
        for m in range(M):                  # group g = lane g; member m
            s = key[:, m * 128:(m + 1) * 128]                # [BR, 128]
            c = lane + m * 128
            excl = (s > vg) | ((s == vg) & (c <= ig))
            # strict > keeps the earlier (lower) col on value ties; the
            # (s == mg) & (c < jg) arm only fires while jg is still the
            # Vp sentinel (all--inf tail lanes), matching the flat
            # kernel's min-col-among-non-excluded-maxima
            upd = ~excl & ((s > mg) | ((s == mg) & (c < jg)))
            mg = jnp.where(upd, s, mg)
            jg = jnp.where(upd, c, jg)
        vg, ig = mg, jg
        cvs.append(vg)
        ccs.append(ig)
    cv = jnp.concatenate(cvs, axis=1)                        # [BR, S*128]
    cc = jnp.concatenate(ccs, axis=1)
    v_k, i_k = _extract_desc(cv, cc, k, Vp, vals_ref, idx_ref)
    # exhaustion check: candidate c was selected iff it orders
    # before-or-equal the k-th pick (threshold test again); group g's
    # level-l candidate sits at concat col l*128 + g
    taken = (cv > v_k) | ((cv == v_k) & (cc <= i_k))
    per_group = sum(taken[:, l * 128:(l + 1) * 128].astype(jnp.int32)
                    for l in range(levels))                  # [BR, 128]
    bad = jnp.any(per_group >= levels)

    @pl.when(bad)
    def _fallback():
        _extract_desc(key, col, k, Vp, vals_ref, idx_ref)


def _row_block(Vp: int) -> int:
    """Rows per VMEM block.  The kernel materializes ~3 f32 copies of
    the [BR, Vp] block (x, key, col iota); v5e's scoped-vmem budget is
    ~16 MB, so a 128-row block overflows once Vp passes ~8k (observed:
    a [128, 80128] call asked Mosaic for an 82 MB stack frame and
    failed the compile).  Shrink the row block until ~3 copies fit in
    12 MB; return 0 when even 8 rows don't (caller falls back to
    lax.top_k — same values, same tie order)."""
    if Vp <= 8192:
        return 128
    BR = 64
    while BR > 8 and BR * Vp * 12 > 12 * 2**20:
        BR //= 2
    return 0 if BR * Vp * 12 > 12 * 2**20 else BR


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _top_k_impl(x, k: int, interpret: bool, grouped: bool = False,
                onepass: bool = False):
    R, V = x.shape
    Vp = -(-V // 128) * 128
    BR = _row_block(Vp)
    if BR == 0:
        vals, idx = jax.lax.top_k(x, k)
        return vals, idx.astype(jnp.int32)
    if V < Vp:
        x = jnp.pad(x, ((0, 0), (0, Vp - V)), constant_values=NEG_INF)
    # Row blocking: a single whole-array block at arbitrary R (e.g. the
    # tail chunk of a >max_batch transcription, R = B*bw) can exceed VMEM
    # (704 x 5120 f32 ~ 14 MB + temporaries).  Pad R up to a multiple of
    # BR and slice the outputs; rows <= BR stay one un-padded block.
    Rp = R
    if R > BR and R % BR != 0:
        Rp = -(-R // BR) * BR
        x = jnp.pad(x, ((0, Rp - R), (0, 0)), constant_values=NEG_INF)
    BR = BR if Rp % BR == 0 else Rp
    grid = (Rp // BR,)
    # grouped two-level extraction needs >levels rows per interleaved
    # group (so groups can't run dry) and candidates for every pick
    if grouped and Vp // 128 > GROUP_LEVELS and k <= 64:
        kernel = functools.partial(_kernel_grouped, k=k, n_valid=V,
                                   levels=GROUP_LEVELS, onepass=onepass)
    else:
        kernel = functools.partial(_kernel, k=k, n_valid=V)
    vals, idx = pl.pallas_call(
        kernel,
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


def use_grouped_topk() -> bool:
    """Default ON since the hardware measurement: the two-level grouped
    extraction is bit-identical to the flat kernel and ~8% faster on the
    whole decode pipeline (75.7-78.8 vs 82.1-82.4 ms/batch at B=128,
    bw=16 on v5e, tools/pipeline_topk_ab.py).  CHINESE_ASR_TOPK_GROUPED=0
    restores the flat kernel; shapes the scheme can't serve (small vocab,
    huge k) silently keep the flat kernel either way.  Read per call and
    threaded as a static jit arg, so flipping the env var takes effect
    immediately (no stale trace)."""
    return os.environ.get("CHINESE_ASR_TOPK_GROUPED", "1") != "0"


def use_onepass_topk() -> bool:
    """One-pass insertion-network group phase (reads the VMEM block once
    instead of once per candidate level).  Default ON since the
    in-pipeline A/B on v5e: 50.3-50.6 vs 56.2-61.7 ms/batch at B=128,
    bw=16 (bit-identical outputs; PERF.md).  CHINESE_ASR_TOPK_ONEPASS=0
    restores the multi-pass group phase."""
    return os.environ.get("CHINESE_ASR_TOPK_ONEPASS", "1") != "0"


def top_k(x, k: int, interpret: bool = False):
    """Exact top-k along the last axis of a 2-D f32 array."""
    assert x.ndim == 2, x.shape
    assert k <= x.shape[1], (k, x.shape)
    return _top_k_impl(x, k, interpret, use_grouped_topk(),
                       use_onepass_topk())


def use_fused_logp() -> bool:
    """Opt-in: fold the logit/T - logsumexp + score transform into the
    top-k kernel (top_k_fused).  Saves the [B*k, V] logp materialization
    (~150 us/step HBM at B=128, bw=16) but computes the logsumexp with
    Mosaic's reduction order, which can flip near-tied beam survivors
    relative to the XLA transform — the default keeps stage-1 selection
    bit-identical to the XLA path.  CHINESE_ASR_PALLAS_FUSED=1 enables.
    Measured twice as a pipeline NEGATIVE on v5e (B=128, bw=16): with
    flat extraction in mid round 3, and again with the grouped
    extraction it now shares (76.7-77.1 vs 75.6 ms/batch non-fused) —
    the in-kernel row logsumexp serializes against the extraction sweeps
    while XLA overlaps its transform with other loop work."""
    return os.environ.get("CHINESE_ASR_PALLAS_FUSED", "0") != "0"


def use_pallas_topk() -> bool:
    """Same policy as the featurizer kernel: on for TPU backends, off
    elsewhere.  CHINESE_ASR_PALLAS_TOPK=0/1 overrides just this kernel;
    CHINESE_ASR_PALLAS=0/1 overrides all pallas kernels."""
    flag = os.environ.get("CHINESE_ASR_PALLAS_TOPK",
                          os.environ.get("CHINESE_ASR_PALLAS"))
    if flag is not None:
        return flag != "0"
    return jax.default_backend() == "tpu"


# --------------------------------------------------------------------------
# fused logp + top-k for the beam loop's stage-1 selection
# --------------------------------------------------------------------------
def _fused_kernel(x_ref, bias_ref, vals_ref, idx_ref, *, k: int,
                  n_valid: int, inv_temp_is_div: float,
                  grouped: bool = False, onepass: bool = False):
    """key = x / T - logsumexp(x / T) + bias, then exact top-k extraction.

    Same selection semantics as running the XLA logp transform and then
    `_kernel` — but the [R, V] logp array is never materialized in HBM
    and the logsumexp reduce happens on the VMEM-resident block (the XLA
    chain costs a matmul write + reduce read + elementwise read/write +
    kernel read of ~41 MB each per decode step at B=128, bw=16).

    The division by T uses the same IEEE f32 divide as the XLA path; the
    only numerical difference is the logsumexp reduction order, which on
    near-exact ties can pick a different (equally-scored) candidate —
    backends already differ from each other the same way.
    """
    T = inv_temp_is_div
    x = x_ref[...].astype(jnp.float32) / jnp.float32(T)      # [BR, Vp]
    bias = bias_ref[...].astype(jnp.float32)                 # [BR, 1]
    BR, Vp = x.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (BR, Vp), 1)
    neg_inf = jnp.float32(-jnp.inf)
    pos_inf = jnp.float32(jnp.inf)
    valid = col < n_valid
    xv = jnp.where(valid, x, neg_inf)
    m = jnp.max(xv, axis=1, keepdims=True)                   # [BR, 1]
    s = jnp.sum(jnp.where(valid, jnp.exp(x - m), 0.0), axis=1,
                keepdims=True)
    lse = m + jnp.log(s)
    key = jnp.where(valid, jnp.where(jnp.isnan(x), pos_inf,
                                     x - lse + bias), neg_inf)
    # a NaN lse (NaN logit anywhere in the row) poisons the whole row in
    # the XLA path too; rank those entries first like plain NaN scores
    key = jnp.where(jnp.isnan(key), pos_inf, key)
    # rows DISABLED via a -inf bias (the beam's step-0 duplicate beams)
    # stay -inf even when their logits hold NaN — the XLA path's -inf
    # mask is applied after the NaN-producing transform and wins there
    key = jnp.where(jnp.isneginf(bias), neg_inf, key)
    if grouped:
        fn = _extract_grouped_onepass if onepass else _extract_grouped
        fn(key, col, k, Vp, GROUP_LEVELS, vals_ref, idx_ref)
    else:
        _extract_desc(key, col, k, Vp, vals_ref, idx_ref)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _top_k_fused_impl(x, bias, k: int, temp: float, interpret: bool,
                      grouped: bool = False, onepass: bool = False):
    R, V = x.shape
    Vp = -(-V // 128) * 128
    BR = _row_block(Vp)                       # same VMEM guard as top_k
    if BR == 0:
        xf = x.astype(jnp.float32) / temp
        logp = xf - jax.scipy.special.logsumexp(xf, axis=1, keepdims=True)
        vals, idx = jax.lax.top_k(logp + bias, k)
        return vals, idx.astype(jnp.int32)
    if V < Vp:
        x = jnp.pad(x, ((0, 0), (0, Vp - V)), constant_values=NEG_INF)
    Rp = R
    if R > BR and R % BR != 0:
        Rp = -(-R // BR) * BR
        x = jnp.pad(x, ((0, Rp - R), (0, 0)), constant_values=NEG_INF)
        bias = jnp.pad(bias, ((0, Rp - R), (0, 0)))
    BR = BR if Rp % BR == 0 else Rp
    grid = (Rp // BR,)
    grouped = grouped and Vp // 128 > GROUP_LEVELS and k <= 64
    vals, idx = pl.pallas_call(
        functools.partial(_fused_kernel, k=k, n_valid=V,
                          inv_temp_is_div=temp, grouped=grouped,
                          onepass=onepass),
        grid=grid,
        in_specs=[pl.BlockSpec((BR, Vp), lambda r: (r, 0)),
                  pl.BlockSpec((BR, 1), lambda r: (r, 0))],
        out_specs=(pl.BlockSpec((BR, k), lambda r: (r, 0)),
                   pl.BlockSpec((BR, k), lambda r: (r, 0))),
        out_shape=(jax.ShapeDtypeStruct((Rp, k), jnp.float32),
                   jax.ShapeDtypeStruct((Rp, k), jnp.int32)),
        interpret=interpret,
    )(x, bias)
    if Rp != R:
        vals, idx = vals[:R], idx[:R]
    return vals, idx


def top_k_fused(logit, bias, k: int, temp: float = 1.0,
                interpret: bool = False):
    """Exact top-k of ``logit / temp - logsumexp(logit / temp, axis=1)
    + bias`` without materializing the transformed array.  ``logit``
    [R, V] (any float dtype; math in f32), ``bias`` [R, 1] f32 (use -inf
    to disable whole rows, e.g. the beam's step-0 duplicate beams)."""
    assert logit.ndim == 2 and bias.shape == (logit.shape[0], 1), \
        (logit.shape, bias.shape)
    assert k <= logit.shape[1], (k, logit.shape)
    return _top_k_fused_impl(logit, bias, k, float(temp), interpret,
                             use_grouped_topk(), use_onepass_topk())
