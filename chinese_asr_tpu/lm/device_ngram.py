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
  control flow (static shapes; XLA unrolls the tiny P loop into
  gathers).
- Keys are stored as full id tuples (``ids[cap, k]`` int32) and
  compared exactly — no 64-bit fingerprinting needed (jax x64 stays
  off), no false positives.
- Empty slots hold -1, which is also the "absent context" sentinel in
  queries: a query row containing -1 can never equal a stored key, so
  shorter-than-(order-1) histories fall through to lower orders for
  free, exactly like the host scorers' shrinking-context loop.
- The hash is FNV-1a over the int32 words with a murmur-style
  finalizer, computed identically by the numpy builder and the jitted
  lookup (uint32 wrap-around in both).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .ngram import PyNgramLM

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


def _build_table(keys: np.ndarray, vals: np.ndarray):
    """Host-side linear-probing build.  keys [n, k] int32 (unique rows),
    vals [n, 2] f32 -> (ids [cap, k], vals [cap, 2], probes)."""
    n, k = keys.shape
    cap = 1 << max(3, int(np.ceil(np.log2(max(2 * n, 1) + 1))))
    ids = np.full((cap, k), -1, np.int32)
    tv = np.zeros((cap, 2), np.float32)
    home = (_hash_np(keys) & np.uint32(cap - 1)).astype(np.int64)
    occupied = np.zeros(cap, bool)
    max_disp = 0
    for i in range(n):
        s = home[i]
        d = 0
        while occupied[s]:
            s = (s + 1) & (cap - 1)
            d += 1
        occupied[s] = True
        ids[s] = keys[i]
        tv[s] = vals[i]
        if d > max_disp:
            max_disp = d
    return ids, tv, max_disp + 1


class DeviceNgramLM:
    """Per-order probing hash tables as device arrays (a jax pytree:
    the tables are leaves; order/capacities/probe counts are static
    aux data, so the same jitted program serves any model with the
    same structure).  ``word2id`` is host-only (token mapping happens
    before jit) and does not survive pytree flattening."""

    def __init__(self, order: int, ids, vals, probes, unk_id: int,
                 word2id: Dict[str, int] = None):
        self.order = order
        self.ids = tuple(ids)       # ids[k][cap_k, k+1] for k-gram level k+1
        self.vals = tuple(vals)     # vals[k][cap_k, 2] (log10 p, backoff)
        self.probes = tuple(probes)
        self.unk_id = unk_id
        self.word2id = word2id

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
        ids, vals, probes = [], [], []
        for k in range(order):
            rows = per_order[k]
            if rows:
                keys_np = np.asarray([r[0] for r in rows], np.int32)
                vals_np = np.asarray([r[1] for r in rows], np.float32)
            else:
                keys_np = np.zeros((0, k + 1), np.int32)
                vals_np = np.zeros((0, 2), np.float32)
            i, v, p = _build_table(keys_np, vals_np)
            ids.append(jnp.asarray(i))
            vals.append(jnp.asarray(v))
            probes.append(p)
        return cls(order, ids, vals, probes, word2id["<unk>"], word2id)

    # ------------------------------------------------------------- host API
    def word_ids(self, words: Sequence[str]) -> np.ndarray:
        return np.asarray([self.word2id.get(w, self.unk_id) for w in words],
                          np.int32)

    def token_id_table(self, vocab) -> np.ndarray:
        """token id -> LM word id (OOV -> <unk>), like NgramLM's."""
        return self.word_ids([vocab.int2word[t]
                              for t in range(len(vocab.int2word))])

    def begin_context(self, n_rows: int) -> np.ndarray:
        """[n_rows, order-1] histories = (<s>,) — kenlm begin state."""
        ctx = np.full((n_rows, max(self.order - 1, 1)), -1, np.int32)
        if self.order > 1:
            ctx[:, -1] = self.word2id.get("<s>", self.unk_id)
        return ctx

    def null_context(self, n_rows: int) -> np.ndarray:
        """[n_rows, order-1] empty histories — kenlm null state."""
        return np.full((n_rows, max(self.order - 1, 1)), -1, np.int32)


def _tree_flatten(lm: DeviceNgramLM):
    return (lm.ids, lm.vals), (lm.order, lm.probes, lm.unk_id)


def _tree_unflatten(aux, children):
    order, probes, unk_id = aux
    ids, vals = children
    return DeviceNgramLM(order, ids, vals, probes, unk_id, None)


jax.tree_util.register_pytree_node(DeviceNgramLM, _tree_flatten,
                                   _tree_unflatten)


def _lookup(ids, vals, probes: int, keys):
    """Probe one table.  keys [..., k] int32 ->
    (hit [...] bool, logp [...] f32, backoff [...] f32)."""
    cap = ids.shape[0]
    h = _hash_jnp(keys) & jnp.uint32(cap - 1)
    slots = (h[..., None].astype(jnp.int32)
             + jnp.arange(probes, dtype=jnp.int32)) & (cap - 1)  # [..., P]
    cand = ids[slots]                                    # [..., P, k]
    hit_p = jnp.all(cand == keys[..., None, :], axis=-1)  # [..., P]
    hit = jnp.any(hit_p, axis=-1)
    idx = jnp.argmax(hit_p, axis=-1)                     # first hit slot
    slot = jnp.take_along_axis(slots, idx[..., None], axis=-1)[..., 0]
    v = vals[slot]                                       # [..., 2]
    return hit, v[..., 0], v[..., 1]


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
    # context lookups (shared across a row's candidates): level k uses
    # the last k context words
    bo_hit, bo_val = [], []
    for k in range(1, M):
        h, _lp, bo = _lookup(lm.ids[k - 1], lm.vals[k - 1], lm.probes[k - 1],
                             ctx_ids[..., M - 1 - k:])
        bo_hit.append(h)
        bo_val.append(jnp.where(h, bo, 0.0))
    # gram lookups: level k keys = (last k context words, candidate)
    gram = []
    for k in range(M):
        if k == 0:
            keys = cand_ids[..., None]                     # [Q, C, 1]
        else:
            ctx_k = jnp.broadcast_to(ctx_ids[..., None, M - 1 - k:],
                                     (*cand_ids.shape, k))
            keys = jnp.concatenate([ctx_k, cand_ids[..., None]], axis=-1)
        gram.append(_lookup(lm.ids[k], lm.vals[k], lm.probes[k], keys))
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
