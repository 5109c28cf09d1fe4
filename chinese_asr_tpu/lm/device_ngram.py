"""On-device n-gram LM: Katz-backoff scoring as pure XLA gathers.

The host-side first-pass-LM decode is pinned at the host<->device
boundary: one blocking token pull per step because the C++ LM lives on
the host (PERF.md "The stage split names the bottleneck" — 89% of wall
is tunnel round trips).  This module puts the LM itself on the chip:
every n-gram order's (logp, backoff) table becomes a linear-probing
hash table held in HBM as two device arrays, and scoring a batch of
(context, candidate) pairs is a handful of vectorized gathers + compares
inside whatever jit wants it — so a fused first-pass decode
(`decode/lm_fused.py`) runs its whole loop on device with ZERO per-step
host syncs.

Semantics match the host scorers exactly (reference model.py:1182-1194
via kenlm; first-party ports `lm/ngram.py` PyNgramLM/C++ NgramLM):
longest matching (context-suffix + word) n-gram wins, plus the backoff
weights of every *existing* longer context; OOV words map to ``<unk>``;
an ARPA without ``<unk>`` gets kenlm's synthesized -100 unigram.
Scores are log10, like kenlm.

Design notes (TPU-first):
- Open addressing with linear probing at load factor <= 0.5.  The build
  records the worst displacement D over all inserted keys, so a lookup
  probes exactly P = D+1 slots — if a key exists it sits within D of
  its home slot, hence P probes DECIDE membership with no early-exit
  control flow (static shapes).
- Each level is ONE packed int32 array ``tbl[cap + P - 1, k + 2]``:
  the k key columns, then logp/backoff bitcast to int32.  The first
  P-1 rows are re-appended past the end so a probe window never wraps
  (no ``& (cap-1)`` per probe slot), and each probe fetches keys AND
  values in one plain ROW gather (slice (1, k+2)) — the round-4
  separate key/value gathers were ~60% of the fused decode loop, and a
  single multi-row window gather (slice (P, k+2)) is a measured 4.7x
  NEGATIVE (see `_lookup`'s docstring).
- Lane-efficiency rule (round 5b): every elementwise op of the lookup
  runs on [P, N] / [N] planes with the flattened query axis minor —
  the gathered [P*N, k+2] window transposes ONCE to [k+2, P, N].  The
  earlier [..., P, k] stacked math left compares in vregs at <1% lane
  utilization and was the single largest op of the fused decode
  (trace: 1.19 ms/step of a 3.1 ms/step loop).
- Stored keys are unique, so at most one probe slot can match: the hit
  row's value is a masked SUM over the window (int32 bit patterns,
  zero identity) — no argmax, no second gather.
- Keys are stored as full id tuples and compared exactly — no 64-bit
  fingerprinting needed (jax x64 stays off), no false positives.
- Empty slots hold -1, which is also the "absent context" sentinel in
  queries: a query row containing -1 can never equal a stored key, so
  shorter-than-(order-1) histories fall through to lower orders for
  free, exactly like the host scorers' shrinking-context loop.
- The hash is FNV-1a over the int32 words with a murmur-style
  finalizer, computed identically by the numpy builder and the jitted
  lookup (uint32 wrap-around in both).
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .ngram import PyNgramLM


def _use_planes() -> bool:
    """Probe-math layout: ``planes`` (default) runs every elementwise op
    of the lookup on arrays whose minor dim is the flattened query axis
    (full 128-lane vregs); ``stacked`` keeps the round-5 [..., P, k]
    formulation whose tiny minor dims the trace priced at <1% lane
    utilization (fusion.230: 656k estimated cycles for 327k compares).
    Env ``CHINESE_ASR_DLM_LAYOUT=stacked`` restores the old math for
    in-process A/Bs; outputs are bit-identical (same gathers, same hash,
    same masked-sum order — pinned by test_device_ngram)."""
    return os.environ.get("CHINESE_ASR_DLM_LAYOUT", "planes") != "stacked"

_FNV_OFFSET = np.uint32(2166136261)
_FNV_PRIME = np.uint32(16777619)


def _hash_np(keys: np.ndarray) -> np.ndarray:
    """FNV-1a + murmur finalizer over int32 id rows.  keys [n, k]."""
    with np.errstate(over="ignore"):
        h = np.full(keys.shape[:-1], _FNV_OFFSET, np.uint32)
        for j in range(keys.shape[-1]):
            h = (h ^ keys[..., j].astype(np.uint32)) * _FNV_PRIME
        h ^= h >> np.uint32(16)
        h *= np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h *= np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
    return h


def _hash_jnp(keys: jnp.ndarray) -> jnp.ndarray:
    """The jit twin of :func:`_hash_np` (same math, same wrap-around)."""
    h = jnp.full(keys.shape[:-1], _FNV_OFFSET, jnp.uint32)
    for j in range(keys.shape[-1]):
        h = (h ^ keys[..., j].astype(jnp.uint32)) * _FNV_PRIME
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


# Probe-count targeting: every extra probe slot is P*k more elements in
# the hot gather of `_lookup` ([Q, C, P, k] random accesses — the trace
# of the fused decode put these gathers at ~60% of the loop), so growing
# a table to shave probes trades cheap HBM for hot-loop time.  Bounds:
# at most 2 doublings past load 0.5, and never past _MEM_CAP bytes per
# level (production LMs carry tens of millions of n-grams).
_TARGET_PROBES = 4
_MEM_CAP = 512 << 20

# Wide-window packing: the probe gather is DESCRIPTOR-latency-bound
# (round-5b trace: the [P*N] row gather alone is 1.4 ms/step of a
# 3.1 ms/step fused-decode loop at N=40960, P=4 — identical total
# whether the compares are lane-efficient or not), so LM assembly can
# duplicate each slot's whole forward window into ONE row of width
# P*(k+2): a lookup then issues N descriptors instead of P*N.  Memory
# cost is x P per level, so levels widen SMALLEST-FIRST until the
# widened tables total _WIDE_TOTAL_CAP bytes (v5e carries 16 GB HBM;
# the model itself is ~60 MB — descriptors are the scarce resource,
# not memory); oversized levels keep the narrow layout and its P-row
# gathers.  NOTE a multi-ROW slice gather (slice_sizes=(P, k+2)) is
# NOT an alternative — measured 4.7x negative (see `_lookup`).
# Env CHINESE_ASR_DLM_WIDE=0 keeps every level narrow (A/B knob; wide
# and narrow score bit-identically, pinned by test).
_WIDE_TOTAL_CAP = 2 << 30


def _use_wide() -> bool:
    return os.environ.get("CHINESE_ASR_DLM_WIDE", "1") != "0"


# Context-gated probing — MEASURED NEGATIVE, default OFF (opt-in env
# CHINESE_ASR_DLM_GATE=1; do not re-enable without a new in-pipeline
# trace).  ARPA/kenlm models guarantee that every n-gram's (n-1)-word
# prefix context is itself an entry (kenlm's builder never prunes a
# retained n-gram's context; its loaders assume the property —
# reference model.py:1182-1194 scores through exactly such lookups).
# Under that property a level-k gram probe can only HIT when the
# level-k context lookup (already computed for the backoff chain, [Q]
# queries — C× fewer than the [Q, C] gram probes) hit, so the gram
# probe's hash slot can be REDIRECTED to row 0 and its hit forced
# False wherever the context missed.  The hypothesis was that the
# redirected descriptors would ride one hot HBM row (the measured ~4x
# ns/descriptor gap between big and small tables, PERF.md round 5b).
# The in-pipeline A/B said otherwise: at the production 5-gram scale
# with random keys — the ALL-MISS bracket where every high-order probe
# redirects, i.e. the gate's best possible case — the gated fused
# decode ran 336 ms/batch vs 284 ungated (+18%,
# tools/lm_fused_scale_bench.py --gate-ab, 3/3 rounds).  Conclusion:
# the probe is descriptor-ISSUE bound, not row-locality bound, and the
# new context->gram data dependency (the redirect needs bo_hit before
# any gram gather can start) costs more than same-row fetches save.
# The machinery stays (bit-identical by test at orders 4-5, both key
# layouts, both probe-math layouts — for the HASHED layout "identical"
# is within the 64-bit-collision model kenlm's own probing tables
# accept: a query whose ngram_hash collides with a stored gram while
# its context is absent would hit ungated but miss gated, ~2^-64 per
# query; the tuple layout compares full id tuples and is exactly
# identical) as the recorded experiment; `ctx_gated` — verified for
# ARPA text at build, True for kenlm binaries by construction —
# remains an honest model property the knob needs.
def _use_gate() -> bool:
    return os.environ.get("CHINESE_ASR_DLM_GATE", "0") == "1"


def trace_variant():
    """Trace-time env knobs read inside ``score_candidates``: any jit
    cache whose program closes over device-LM lookups must include this
    tuple in its key (the beam.py `_kernel_variant` convention) so
    flipping CHINESE_ASR_DLM_LAYOUT / CHINESE_ASR_DLM_GATE between
    calls retraces instead of replaying the stale traced choice.
    CHINESE_ASR_DLM_WIDE needs no entry: it is a BUILD-time knob that
    changes the table shapes, which re-key every jit through the pytree
    structure on their own."""
    return (_use_planes(), _use_gate())


def _widen_tables(tbls, probes, skip=(), budget: int = None):
    """Widen narrow packed numpy tables smallest-first within a total
    byte budget.  tbls: list of [cap + P - 1, k + 2] arrays; levels in
    ``skip`` (e.g. a dense-unigram level the lookup never probes) stay
    narrow.  Returns a new list; widened level i becomes
    [cap, P*(k+2)] (see `_pack_wide`)."""
    if not _use_wide():
        return list(tbls)
    if budget is None:
        budget = _WIDE_TOTAL_CAP
    out = list(tbls)
    order = sorted(range(len(tbls)),
                   key=lambda i: tbls[i].nbytes * probes[i])
    spent = 0
    for i in order:
        if i in skip or probes[i] <= 1:
            continue
        k = tbls[i].shape[1] - 2
        wide_bytes = (tbls[i].shape[0] - (probes[i] - 1)) \
            * probes[i] * (k + 2) * 4
        if spent + wide_bytes > budget:
            continue
        out[i] = _pack_wide(tbls[i], probes[i], k)
        spent += wide_bytes
    return out


def _build_table(keys: np.ndarray, vals: np.ndarray):
    """Host-side linear-probing build, vectorized (production LMs carry
    tens of millions of n-grams; a per-entry Python loop costs minutes).

    Inserting in ascending-home order makes linear probing a parking
    function: with entries sorted by home slot, the final position is
    pos_i = max(home_i, pos_{i-1} + 1), which is one prefix-max —
    pos = max.accumulate(home - arange) + arange.  Any insertion order
    yields a valid table (lookups only need every key within the
    recorded worst displacement of its own home), so choosing this one
    loses nothing.  Entries pushed past the end wrap to the front; at
    load <= 0.5 that tail is tiny and placed with a short loop.

    keys [n, k] int32 (unique rows), vals [n, 2] f32 ->
    (tbl [cap + probes - 1, k + 2] int32 packed, probes).  The packed
    layout appends the first probes-1 rows after the end so a lookup's
    probe window is one CONTIGUOUS slice (see `_lookup`)."""
    n, k = keys.shape
    cap0 = 1 << max(3, int(np.ceil(np.log2(max(2 * n, 1) + 1))))
    best = None
    cap = cap0
    while True:
        built = _build_table_at(keys, vals, cap)
        if best is None or built[2] < best[2]:
            best = built
        if (built[2] <= _TARGET_PROBES or cap >= cap0 * 4
                or cap * (k + 2) * 4 * 2 > _MEM_CAP):
            ids, tv, probes = best
            return _pack_table(ids, tv, probes), probes
        cap *= 2


def _pack_table(ids: np.ndarray, tv: np.ndarray, probes: int) -> np.ndarray:
    """[cap, k] keys + [cap, 2] f32 vals -> [cap + probes - 1, k + 2]
    int32 (vals bitcast), first probes-1 rows appended for wrap-free
    contiguous probe windows."""
    tbl = np.concatenate([ids, tv.view(np.int32)], axis=1)
    if probes > 1:
        tbl = np.concatenate([tbl, tbl[: probes - 1]], axis=0)
    return np.ascontiguousarray(tbl)


def _pack_wide(tbl: np.ndarray, probes: int, k: int) -> np.ndarray:
    """Narrow packed [cap + P - 1, k + 2] -> wide [cap, P * (k + 2)]:
    row i holds slots i..i+P-1 concatenated (p-major), so a probe
    window is ONE row gather (see the _WIDE_TOTAL_CAP note)."""
    cap = tbl.shape[0] - (probes - 1)
    idx = np.arange(cap)[:, None] + np.arange(probes)[None, :]
    return np.ascontiguousarray(
        tbl[idx].reshape(cap, probes * (k + 2)))


def _build_table_at(keys: np.ndarray, vals: np.ndarray, cap: int):
    n, k = keys.shape
    ids = np.full((cap, k), -1, np.int32)
    tv = np.zeros((cap, 2), np.float32)
    if n == 0:
        return ids, tv, 1
    home = (_hash_np(keys) & np.uint32(cap - 1)).astype(np.int64)
    order = np.argsort(home, kind="stable")
    hs = home[order]
    ar = np.arange(n, dtype=np.int64)
    pos = np.maximum.accumulate(hs - ar) + ar
    disp = pos - hs
    wrap = pos >= cap
    fit = ~wrap
    ids[pos[fit]] = keys[order[fit]]
    tv[pos[fit]] = vals[order[fit]]
    max_disp = int(disp[fit].max()) if fit.any() else 0
    if wrap.any():
        occupied = np.zeros(cap, bool)
        occupied[pos[fit]] = True
        for i in np.nonzero(wrap)[0]:
            s = int(hs[i])
            d = 0
            while occupied[s]:
                s = (s + 1) & (cap - 1)
                d += 1
            occupied[s] = True
            ids[s] = keys[order[i]]
            tv[s] = vals[order[i]]
            if d > max_disp:
                max_disp = d
    return ids, tv, max_disp + 1


def _build_dense_uni(keys1: np.ndarray, vals: np.ndarray):
    """Dense [max_id+1, 2] f32 unigram table (logp, backoff); absent ids
    hold logp=NaN (no real logp is NaN, so presence tests as ~isnan).
    Level-1 keys are plain word ids in BOTH layouts, and word ids are
    small and near-contiguous (ARPA enumeration order / kenlm vocab
    ids), so a direct index replaces the probe gather — the fused
    decode's trace put the 7-probe unigram ids gather alone at ~30% of
    the whole loop."""
    capu = int(keys1.max()) + 1 if keys1.size else 1
    uni = np.full((capu, 2), np.nan, np.float32)
    uni[keys1, 0] = vals[:, 0]
    uni[keys1, 1] = vals[:, 1]
    return uni


# kenlm's CombineWordHash constants (lm/search_hashed.hh), split into
# u32 halves for the jit twin of runtime/cpp ngram_hash()
_M1 = 8978948897894561157
_M2 = 17894857484156487943


def _mul32_full(a, c: int):
    """u32 array × u32 constant -> (hi, lo) u32 full 64-bit product."""
    a0 = a & jnp.uint32(0xFFFF)
    a1 = a >> 16
    c0, c1 = c & 0xFFFF, c >> 16
    p00 = a0 * jnp.uint32(c0)
    p01 = a0 * jnp.uint32(c1)
    p10 = a1 * jnp.uint32(c0)
    p11 = a1 * jnp.uint32(c1)
    mid = (p00 >> 16) + (p01 & jnp.uint32(0xFFFF)) + (p10 & jnp.uint32(0xFFFF))
    lo = (p00 & jnp.uint32(0xFFFF)) | ((mid & jnp.uint32(0xFFFF)) << 16)
    hi = p11 + (p01 >> 16) + (p10 >> 16) + (mid >> 16)
    return hi, lo


def _mul64_const(a_hi, a_lo, c: int):
    """(hi, lo) u32 arrays × u64 constant, mod 2^64."""
    c_hi, c_lo = (c >> 32) & 0xFFFFFFFF, c & 0xFFFFFFFF
    p_hi, p_lo = _mul32_full(a_lo, c_lo)
    hi = p_hi + a_lo * jnp.uint32(c_hi) + a_hi * jnp.uint32(c_lo)
    return hi, p_lo


def _combine_word_hash(h_hi, h_lo, nxt):
    """kenlm CombineWordHash: h*M1 ^ (1+next)*M2 — nxt u32 array."""
    t_hi, t_lo = _mul64_const(h_hi, h_lo, _M1)
    n1 = nxt + jnp.uint32(1)
    u_hi, u_lo = _mul32_full(n1, _M2 & 0xFFFFFFFF)
    u_hi = u_hi + n1 * jnp.uint32(_M2 >> 32)
    return t_hi ^ u_hi, t_lo ^ u_lo


def _u32_to_i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


class DeviceNgramLM:
    """Per-order probing hash tables as device arrays (a jax pytree:
    the packed tables are leaves; order/probe counts are static aux
    data, so the same jitted program serves any model with the same
    structure).  ``word2id`` is host-only (token mapping happens
    before jit) and does not survive pytree flattening.

    Two key layouts share all machinery:
    - ``hashed=False`` (from_arpa): level-k keys are the full id tuple.
    - ``hashed=True`` (from_lm — text/probing/trie `.klm` via the C++
      reader's `dump_order`): level-1 keys are [id]; level-k>=2 keys are
      kenlm's 64-bit ngram_hash split into [hi, lo] int32, with the jit
      side computing the same hash chain in u32-pair arithmetic
      (`_combine_word_hash`).  Exact-compare on the stored 64-bit key —
      the same collision model kenlm's own probing tables accept."""

    def __init__(self, order: int, tbls, probes, unk_id: int,
                 word2id: Dict[str, int] = None, hashed: bool = False,
                 uni=None, ctx_gated: bool = False):
        self.order = order
        self.tbls = tuple(tbls)     # tbls[k][cap_k + P_k - 1, kcols + 2]
        self.probes = tuple(probes)
        self.unk_id = unk_id
        self.word2id = word2id
        self.hashed = hashed
        self.uni = uni              # dense [max_id+1, 2], NaN = absent
        self.ctx_gated = ctx_gated  # context property verified (see _use_gate)
        self._host_lm = None        # set by from_lm (host-only)
        self._bos_id = None if word2id is None else \
            word2id.get("<s>", unk_id)

    # ---------------------------------------------------------------- build
    @classmethod
    def from_arpa(cls, path: str) -> "DeviceNgramLM":
        py = PyNgramLM(path)
        order = py.order
        # id assignment: unigram enumeration order (stable)
        word2id: Dict[str, int] = {}
        for key in py.grams:
            if len(key) == 1 and key[0] not in word2id:
                word2id[key[0]] = len(word2id)
        if "<unk>" not in word2id:      # kenlm's synthesized -100 unigram
            word2id["<unk>"] = len(word2id)
            py.grams[("<unk>",)] = (-100.0, 0.0)
        per_order: List[List] = [[] for _ in range(order)]
        for key, (logp, bo) in py.grams.items():
            if all(w in word2id for w in key):
                per_order[len(key) - 1].append(
                    ([word2id[w] for w in key], (logp, bo)))
        tbls, probes = [], []
        uni = None
        for k in range(order):
            rows = per_order[k]
            if rows:
                keys_np = np.asarray([r[0] for r in rows], np.int32)
                vals_np = np.asarray([r[1] for r in rows], np.float32)
            else:
                keys_np = np.zeros((0, k + 1), np.int32)
                vals_np = np.zeros((0, 2), np.float32)
            t, p = _build_table(keys_np, vals_np)
            tbls.append(t)
            probes.append(p)
            if k == 0:
                uni = jnp.asarray(_build_dense_uni(keys_np[:, 0], vals_np))
        tbls = [jnp.asarray(t)
                for t in _widen_tables(tbls, probes, skip=(0,))]
        # context property over the tables AS BUILT (per_order filters
        # n-grams containing words with no unigram, so check the stored
        # id tuples, not py.grams): level-k key's (k-1)-prefix must be a
        # level-(k-1) entry for the probe gate to be sound
        gated = True
        prev = {(r[0][0],) for r in per_order[0]}
        for k in range(1, order):
            cur = {tuple(r[0]) for r in per_order[k]}
            if any(key[:-1] not in prev for key in cur):
                gated = False
                break
            prev = cur
        return cls(order, tbls, probes, word2id["<unk>"], word2id,
                   uni=uni, ctx_gated=gated)

    @classmethod
    def from_lm(cls, lm) -> "DeviceNgramLM":
        """Build from a loaded `lm.ngram.NgramLM` — ARPA text OR any
        KenLM binary `.klm` layout the C++ reader handles (probing,
        trie, quantized/array trie).  Uses the reader's per-order
        enumeration (`dump_order`); keys for orders >= 2 are kenlm's
        64-bit ngram_hash (probing binaries store only hashes, so id
        tuples are unrecoverable there — the device side computes the
        same hash chain instead)."""
        order = lm.order
        tbls, probes = [], []
        uni = None
        for k in range(1, order + 1):
            hi, lo, prob, bo = lm.dump_order(k)
            if k == 1:
                assert lo.size == 0 or int(lo.max()) < 2**31, \
                    "word ids must fit int31"
                keys = lo.astype(np.int32)[:, None]
            else:
                keys = np.stack([hi.view(np.int32), lo.view(np.int32)],
                                axis=1)
            vals_np = np.stack([prob, bo], axis=1).astype(np.float32)
            t, p = _build_table(np.ascontiguousarray(keys), vals_np)
            tbls.append(t)
            probes.append(p)
            if k == 1:
                uni = jnp.asarray(_build_dense_uni(keys[:, 0], vals_np))
        tbls = [jnp.asarray(t)
                for t in _widen_tables(tbls, probes, skip=(0,))]
        unk_id = int(lm.word_ids(["<unk>"])[0])
        obj = cls(order, tbls, probes, unk_id, None, hashed=True,
                  uni=uni, ctx_gated=bool(lm.context_property()))
        obj._host_lm = lm
        obj._bos_id = int(lm.word_ids(["<s>"])[0])
        return obj

    @classmethod
    def from_path(cls, path: str) -> "DeviceNgramLM":
        """ARPA text or any `.klm` binary: prefer the C++ reader's
        enumeration (handles every layout); fall back to the pure-python
        ARPA parse when the native kernel is unavailable."""
        from . import ngram as ngram_mod
        lm = ngram_mod.load_lm(path)
        if lm is not None and getattr(lm, "_py", None) is None:
            return cls.from_lm(lm)
        return cls.from_arpa(path)

    # ------------------------------------------------------------- host API
    def word_ids(self, words: Sequence[str]) -> np.ndarray:
        if self.word2id is not None:
            return np.asarray(
                [self.word2id.get(w, self.unk_id) for w in words], np.int32)
        return np.asarray(self._host_lm.word_ids(list(words)), np.int32)

    def token_id_table(self, vocab) -> np.ndarray:
        """token id -> LM word id (OOV -> <unk>), like NgramLM's."""
        return self.word_ids([vocab.int2word[t]
                              for t in range(len(vocab.int2word))])

    def begin_context(self, n_rows: int) -> np.ndarray:
        """[n_rows, order-1] histories = (<s>,) — kenlm begin state."""
        ctx = np.full((n_rows, max(self.order - 1, 1)), -1, np.int32)
        if self.order > 1:
            ctx[:, -1] = self._bos_id
        return ctx

    def null_context(self, n_rows: int) -> np.ndarray:
        """[n_rows, order-1] empty histories — kenlm null state."""
        return np.full((n_rows, max(self.order - 1, 1)), -1, np.int32)


def _tree_flatten(lm: DeviceNgramLM):
    return ((lm.tbls, lm.uni),
            (lm.order, lm.probes, lm.unk_id, lm.hashed, lm.ctx_gated))


def _tree_unflatten(aux, children):
    order, probes, unk_id, hashed, ctx_gated = aux
    tbls, uni = children
    return DeviceNgramLM(order, tbls, probes, unk_id, None,
                         hashed=hashed, uni=uni, ctx_gated=ctx_gated)


jax.tree_util.register_pytree_node(DeviceNgramLM, _tree_flatten,
                                   _tree_unflatten)


def _lookup(tbl, probes: int, keys):
    """Probe one packed table.  tbl [cap + P - 1, k + 2] int32 (key
    columns then bitcast logp/backoff; see `_pack_table`), keys [..., k]
    int32 -> (hit [...] bool, logp [...] f32, backoff [...] f32); a
    miss returns (False, 0.0, 0.0).

    Each probe is a plain ROW gather from the packed table (keys and
    values ride the same row), so the old separate value gather is
    gone, and the wrap-free padding (`_pack_table`) removes the
    ``& (cap-1)`` on every probe slot.  Stored keys are unique, hence
    at most one probe slot matches and the value select is a masked
    sum (int32 bit patterns, zero identity) — no argmax, no
    take_along_axis.

    MEASURED NEGATIVE (round 5, do not re-try without a new trace):
    fetching the whole [P, k+2] window as ONE lax.gather of contiguous
    slices (slice_sizes=(P, k+2)) — "one descriptor per query" — made
    the fused decode 4.7x SLOWER end-to-end (408 -> 1908 ms/batch at
    B=128, bw=16): the TPU backend expands multi-row slice gathers
    inside the decode loop into a SEQUENTIAL while loop of
    dynamic-slices (the trace shows a nested `while.9` at 564 ms/run
    plus 527 ms of dynamic-slice fusions), while standard row gathers
    (slice_sizes=(1, row)) take the fast vectorized path."""
    return _lookup_cols(tbl, probes,
                        [keys[..., j] for j in range(keys.shape[-1])])


def _hash_cols(cols) -> jnp.ndarray:
    """:func:`_hash_jnp` over a list of same-shaped id plane arrays."""
    h = jnp.full(cols[0].shape, _FNV_OFFSET, jnp.uint32)
    for c in cols:
        h = (h ^ c.astype(jnp.uint32)) * _FNV_PRIME
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _lookup_cols(tbl, probes: int, cols, active=None):
    """:func:`_lookup` with the key COLUMNS as separate plane arrays
    (shape [...] each) — the callers' natural form (the hashed path
    carries g_hi/g_lo planes; the tuple path broadcasts context
    columns), so no [..., k] stack is ever materialized.

    ``active`` (optional bool plane, same shape as the cols) gates the
    probe: inactive queries are REDIRECTED to row 0 (their descriptors
    all fetch one hot row instead of random HBM rows — the probe is
    descriptor-latency-bound, PERF.md round 5b) and their hit is forced
    False.  Callers may only pass queries whose miss is already known
    (see `_use_gate`); with ``active=None`` behavior is unchanged.

    Layout rule (the whole point — trace round 5b): every elementwise
    op here runs on [P, N] / [N] arrays with the flattened query axis
    N minor, so vregs are full 128-lane; the round-5 stacked
    [..., P, k] formulation left compares at <1% utilization and was
    the single largest op of the fused LM decode (fusion.230,
    1.19 ms/step of a 3.1 ms/step loop).  The gathered [P*N, k+2]
    window is transposed once to [k+2, P, N] planes; XLA fuses that
    relayout into the gather."""
    k = len(cols)
    P = probes
    wide = P > 1 and tbl.shape[1] == P * (k + 2)   # see _pack_wide
    cap_mask = jnp.uint32(tbl.shape[0] - 1 if wide
                          else tbl.shape[0] - (P - 1) - 1)
    shape = cols[0].shape
    flat = [c.reshape(-1) for c in cols]                   # k × [N]
    N = flat[0].shape[0] if flat[0].ndim else 1
    if not _use_planes():
        keys = jnp.stack(cols, axis=-1)
        h = (_hash_jnp(keys) & cap_mask).astype(jnp.int32)
        if active is not None:
            h = jnp.where(active, h, 0)
        if wide:
            win = tbl[h].reshape(*h.shape, P, k + 2)       # [..., P, k+2]
        else:
            slots = h[..., None] + jnp.arange(P, dtype=jnp.int32)
            win = tbl[slots]                               # [..., P, k+2]
        hit_p = jnp.all(win[..., :k] == keys[..., None, :], axis=-1)
        if active is not None:
            hit_p = hit_p & active[..., None]
        hit = jnp.any(hit_p, axis=-1)
        v = jnp.where(hit_p[..., None], win[..., k:], 0).sum(axis=-2)
        v = jax.lax.bitcast_convert_type(v, jnp.float32)   # [..., 2]
        return hit, v[..., 0], v[..., 1]
    h = (_hash_cols(flat) & cap_mask).astype(jnp.int32)    # [N]
    act = None if active is None else active.reshape(-1)   # [N]
    if act is not None:
        h = jnp.where(act, h, 0)
    if wide:
        win = jnp.take(tbl, h, axis=0)                     # [N, P*(k+2)]
        planes = win.reshape(N, P, k + 2).transpose(2, 1, 0)
    else:
        slots = (jnp.arange(P, dtype=jnp.int32)[:, None]
                 + h[None, :]).reshape(-1)                 # [P*N] p-major
        win = jnp.take(tbl, slots, axis=0)                 # [P*N, k+2]
        planes = win.T.reshape(k + 2, P, N)                # [k+2, P, N]
    hit_p = planes[0] == flat[0][None, :]
    for j in range(1, k):
        hit_p = hit_p & (planes[j] == flat[j][None, :])    # [P, N]
    if act is not None:
        hit_p = hit_p & act[None, :]
    hit = jnp.any(hit_p, axis=0)                           # [N]
    v0 = jnp.where(hit_p, planes[k], 0).sum(axis=0)        # [N] i32
    v1 = jnp.where(hit_p, planes[k + 1], 0).sum(axis=0)
    lp = jax.lax.bitcast_convert_type(v0, jnp.float32)
    bo = jax.lax.bitcast_convert_type(v1, jnp.float32)
    return hit.reshape(shape), lp.reshape(shape), bo.reshape(shape)


def _lookup_uni(uni, key1):
    """Dense level-1 lookup.  key1 [...] int32 word ids (may be -1 /
    out-of-range) -> (hit, logp, backoff); absent slots hold NaN logp
    (see `_build_dense_uni`).  Same layout rule as `_lookup_cols`: the
    fetched [N, 2] rows transpose to two [N] planes before any
    elementwise math."""
    shape = key1.shape
    capu = uni.shape[0]
    k1 = key1.reshape(-1)                                # [N]
    v = jnp.take(uni, jnp.clip(k1, 0, capu - 1), axis=0).T   # [2, N]
    hit = (k1 >= 0) & (k1 < capu) & ~jnp.isnan(v[0])
    return (hit.reshape(shape), v[0].reshape(shape),
            jnp.where(hit, v[1], 0.0).reshape(shape))


def _lookup_level(lm: "DeviceNgramLM", k: int, cols, active=None):
    """Level-k (0-based) lookup over key COLUMN planes; level 0 takes
    the dense path when the LM carries one (hand-constructed tables may
    not).  ``active`` gates the probe (see `_lookup_cols`); the dense
    unigram path ignores it (a direct index, nothing to redirect)."""
    if k == 0 and lm.uni is not None:
        return _lookup_uni(lm.uni, cols[0])
    return _lookup_cols(lm.tbls[k], lm.probes[k], cols, active=active)


def score_candidates(lm: DeviceNgramLM, ctx_ids, cand_ids):
    """Batch Katz-backoff base scores, fully on device.

    ctx_ids  [Q, order-1] int32 LM word ids, -1 = absent, most recent
             word RIGHTMOST (row q is one beam's history).
    cand_ids [Q, C] int32 candidate LM word ids (>= 0; OOV pre-mapped
             to <unk> by ``token_id_table``).
    Returns  [Q, C] f32 log10 scores — equal (to f32) to
             ``NgramLM.base_score_batch_np`` / PyNgramLM on the same
             (context, word) pairs.
    """
    M = lm.order
    C = cand_ids.shape[-1]
    # context-gated probing (see _use_gate): a level-k gram probe can
    # only hit when the level-k context exists, so redirect the rest of
    # its [Q, C] descriptors to one hot row.  Sound only on models with
    # the verified context property (ctx_gated).
    gate = lm.ctx_gated and _use_gate()

    def _gram_active(k, bo_hit):
        if not gate or k == 0:
            return None
        return jnp.broadcast_to(bo_hit[k - 1][..., None], cand_ids.shape)

    if lm.hashed:
        # kenlm ngram_hash chains, computed incrementally right-to-left
        # (the predicted word seeds the hash, then history words fold in)
        cw = cand_ids.astype(jnp.uint32)                   # [Q, C]
        # validity: level k usable iff the k-th most recent context word
        # exists; -1-padded histories are contiguous on the left
        valid = [None]
        g_hi = jnp.zeros_like(cw)
        g_lo = cw
        gram_keys = [[cand_ids]]                           # level 1: [id]
        c_hi = c_lo = None
        ctx_keys = [None]                                  # 1-indexed pad
        for k in range(1, M):
            w_k = ctx_ids[..., M - 1 - k]                  # [Q]
            valid.append(w_k >= 0)
            wk_u = w_k.astype(jnp.uint32)
            g_hi, g_lo = _combine_word_hash(g_hi, g_lo, wk_u[..., None])
            gram_keys.append([_u32_to_i32(g_hi), _u32_to_i32(g_lo)])
            if k == 1:
                ctx_keys.append([w_k.astype(jnp.int32)])
                c_hi = jnp.zeros_like(wk_u)
                c_lo = wk_u
            else:
                c_hi, c_lo = _combine_word_hash(c_hi, c_lo, wk_u)
                ctx_keys.append([_u32_to_i32(c_hi), _u32_to_i32(c_lo)])
        bo_hit, bo_val = [], []
        for k in range(1, M):
            h, _lp, bo = _lookup_level(lm, k - 1, ctx_keys[k])
            h = h & valid[k]
            bo_hit.append(h)
            bo_val.append(jnp.where(h, bo, 0.0))
        gram = []
        for k in range(M):
            h, lp, bo = _lookup_level(lm, k, gram_keys[k],
                                      active=_gram_active(k, bo_hit))
            if k > 0:
                h = h & valid[k][..., None]
            gram.append((h, lp, bo))
    else:
        # context lookups (shared across a row's candidates): level k
        # uses the last k context words
        bo_hit, bo_val = [], []
        for k in range(1, M):
            cols = [ctx_ids[..., j] for j in range(M - 1 - k, M - 1)]
            h, _lp, bo = _lookup_level(lm, k - 1, cols)
            bo_hit.append(h)
            bo_val.append(jnp.where(h, bo, 0.0))
        # gram lookups: level k keys = (last k context words, candidate)
        gram = []
        for k in range(M):
            cols = [jnp.broadcast_to(ctx_ids[..., j][..., None],
                                     cand_ids.shape)
                    for j in range(M - 1 - k, M - 1)] + [cand_ids]
            gram.append(_lookup_level(lm, k, cols,
                                      active=_gram_active(k, bo_hit)))
    # longest hitting level wins; add the backoffs of every existing
    # context LONGER than the match (the host scorers' shrinking loop)
    S = jnp.zeros(cand_ids.shape, jnp.float32)
    out = jnp.zeros(cand_ids.shape, jnp.float32)
    chosen = jnp.zeros(cand_ids.shape, bool)
    for k in range(M - 1, -1, -1):
        hit, lp, _bo = gram[k]
        if k == 0:
            # unigram level always resolves: a miss is kenlm's
            # synthesized <unk> (present in the table by construction,
            # so this is only reachable for ids outside the vocab)
            lp = jnp.where(hit, lp, -100.0)
            hit = jnp.ones_like(hit)
        total = lp + S
        out = jnp.where(chosen, out, jnp.where(hit, total, out))
        chosen = chosen | hit
        if k > 0:
            S = S + bo_val[k - 1][..., None]
    return out


def advance_context(ctx_ids, new_ids):
    """Shift one word into each history (jit-friendly).  ctx [Q, M-1],
    new [Q] -> [Q, M-1].

    NOTE this is a WINDOW, not kenlm state minimization: kenlm prunes a
    state to the longest context that can still extend, which changes
    nothing about scores (the extra words just miss) — only about state
    equality.  The fused decode never compares states, so the window is
    enough."""
    if ctx_ids.shape[-1] == 0:
        return ctx_ids
    return jnp.concatenate(
        [ctx_ids[..., 1:], new_ids[..., None].astype(ctx_ids.dtype)], axis=-1)
