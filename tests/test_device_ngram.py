"""On-device n-gram LM vs the Python oracle (and, transitively, the C++
kernel — their agreement is pinned by test_lm.py's fuzz).

The device scorer must reproduce PyNgramLM's Katz-backoff chain on the
same structurally-randomized ARPAs the host scorers fuzz with: pruned
holes, missing backoffs, OOV words, contexts shorter than order-1."""

import numpy as np
import jax.numpy as jnp
import pytest

from chinese_asr_tpu.lm import ngram
from chinese_asr_tpu.lm.device_ngram import (DeviceNgramLM, advance_context,
                                             score_candidates)
from test_lm import _random_arpa


def _mapped(py, w):
    return py._vocab_map(w)


def test_matches_python_oracle_on_random_pairs(tmp_path):
    rng = np.random.RandomState(7)
    for idx in range(6):
        path, vocab = _random_arpa(tmp_path, rng, idx)
        py = ngram.PyNgramLM(path)
        dev = DeviceNgramLM.from_arpa(path)
        M = dev.order
        words = vocab + ["oovword", "<unk>", "</s>", "<s>"]
        Q, C = 9, 5
        ctx_dev = np.full((Q, max(M - 1, 1)), -1, np.int32)
        ctx_py = []
        for q in range(Q):
            n_ctx = int(rng.randint(0, M))          # 0..order-1 words
            picked = [str(rng.choice(words)) for _ in range(n_ctx)]
            mapped = [_mapped(py, w) for w in picked]
            ctx_py.append(tuple(mapped))
            if n_ctx:
                ctx_dev[q, -n_ctx:] = dev.word_ids(mapped)
        cand_w = [[str(rng.choice(words)) for _ in range(C)]
                  for _ in range(Q)]
        cand_dev = np.stack([dev.word_ids([_mapped(py, w) for w in row])
                             for row in cand_w])
        got = np.asarray(score_candidates(dev, jnp.asarray(ctx_dev),
                                          jnp.asarray(cand_dev)))
        for q in range(Q):
            for c in range(C):
                want = py._score_one(ctx_py[q], _mapped(py, cand_w[q][c]))
                assert got[q, c] == pytest.approx(want, abs=1e-5), (
                    idx, ctx_py[q], cand_w[q][c])


def test_sentence_chain_matches_python_score(tmp_path):
    """begin-state + advance_context chain == PyNgramLM.score with
    bos/eos, i.e. the device state window walks the same path kenlm's
    state advance does."""
    rng = np.random.RandomState(11)
    for idx in range(4):
        path, vocab = _random_arpa(tmp_path, rng, idx + 100)
        py = ngram.PyNgramLM(path)
        dev = DeviceNgramLM.from_arpa(path)
        words = vocab + ["oovword", "<unk>"]
        for bos in (True, False):
            n = int(rng.randint(1, 7))
            sent_w = [str(rng.choice(words)) for _ in range(n)]
            ctx = jnp.asarray(dev.begin_context(1) if bos
                              else dev.null_context(1))
            total = 0.0
            for w in sent_w + ["</s>"]:
                wid = jnp.asarray(dev.word_ids([_mapped(py, w)])[None, :])
                total += float(score_candidates(dev, ctx, wid)[0, 0])
                ctx = advance_context(ctx, wid[:, 0])
            want = py.score(" ".join(sent_w), bos=bos, eos=True)
            assert total == pytest.approx(want, abs=1e-4)


def test_matches_cpp_incremental_states(tmp_path):
    """Three-way: device == the C++ kernel's base_score_batch_np on the
    same (state, word) pairs (the exact call the host first-pass decode
    makes)."""
    rng = np.random.RandomState(3)
    path, vocab = _random_arpa(tmp_path, rng, 55)
    cpp = ngram.NgramLM(path)
    dev = DeviceNgramLM.from_arpa(path)
    M = dev.order
    words = vocab + ["oovword"]
    n = 16
    # roll C++ states and the device window forward together
    st = [cpp.begin_state() for _ in range(n)]
    ctx = jnp.asarray(dev.begin_context(n))
    for step in range(4):
        picked = [str(rng.choice(words)) for _ in range(n)]
        wid = jnp.asarray(dev.word_ids(picked))
        got = np.asarray(score_candidates(dev, ctx, wid[:, None]))[:, 0]
        for i in range(n):
            want, st[i] = cpp.base_score(st[i], picked[i])
            assert got[i] == pytest.approx(want, abs=1e-5), (step, picked[i])
        ctx = advance_context(ctx, wid)


def test_probe_bound_is_tight_and_lookup_static(tmp_path):
    """The build's recorded probe count must cover every stored key
    (membership decided in P static probes, no while loops)."""
    rng = np.random.RandomState(5)
    path, _ = _random_arpa(tmp_path, rng, 77)
    dev = DeviceNgramLM.from_arpa(path)
    py = ngram.PyNgramLM(path)
    for key, (logp, _bo) in py.grams.items():
        k = len(key)
        ids = dev.word_ids(list(key))
        # direct probe of the level-k packed table
        from chinese_asr_tpu.lm.device_ngram import _lookup
        hit, lp, _ = _lookup(dev.tbls[k - 1], dev.probes[k - 1],
                             jnp.asarray(ids[None, :]))
        assert bool(hit[0]), key
        assert float(lp[0]) == pytest.approx(logp, abs=1e-6)


def _pairs(rng, py, dev, M, Q=8, C=4, words=()):
    ctx_dev = np.full((Q, max(M - 1, 1)), -1, np.int32)
    ctx_py = []
    for q in range(Q):
        n_ctx = int(rng.randint(0, M))
        picked = [str(rng.choice(words)) for _ in range(n_ctx)]
        mapped = [_mapped(py, w) for w in picked]
        ctx_py.append(tuple(mapped))
        if n_ctx:
            ctx_dev[q, -n_ctx:] = dev.word_ids(mapped)
    cand_w = [[str(rng.choice(words)) for _ in range(C)] for _ in range(Q)]
    cand_dev = np.stack([dev.word_ids([_mapped(py, w) for w in row])
                         for row in cand_w])
    return ctx_dev, ctx_py, cand_w, cand_dev


@pytest.mark.parametrize("layout", ["text", "probing", "trie", "quant_trie"])
def test_from_lm_matches_oracle_all_backends(tmp_path, layout):
    """from_lm builds hash-keyed device tables via the C++ reader's
    enumeration — for ARPA text AND the .klm binary family (probing
    stores only 64-bit ngram hashes; the jit side recomputes kenlm's
    hash chain in u32-pair arithmetic).  Scores must match the Python
    oracle on the same random pruned ARPAs from_arpa is tested with."""
    rng = np.random.RandomState(13)
    for idx in range(4):
        path, vocab = _random_arpa(tmp_path, rng, 200 + idx)
        py = ngram.PyNgramLM(path)
        src = ngram.NgramLM(path)
        if layout == "text":
            lm = src
        else:
            blob = str(tmp_path / f"m{idx}_{layout}.klm")
            kw = {"probing": dict(layout="probing"),
                  "trie": dict(layout="trie"),
                  "quant_trie": dict(layout="quant_trie", prob_bits=10,
                                     backoff_bits=9)}[layout]
            src.write_binary(blob, **kw)
            lm = ngram.NgramLM(blob)
        dev = DeviceNgramLM.from_lm(lm)
        assert dev.hashed
        M = dev.order
        words = vocab + ["oovword", "<unk>", "</s>", "<s>"]
        ctx_dev, ctx_py, cand_w, cand_dev = _pairs(rng, py, dev, M,
                                                   words=words)
        got = np.asarray(score_candidates(dev, jnp.asarray(ctx_dev),
                                          jnp.asarray(cand_dev)))
        # quantized tries score with binned values: compare against the
        # C++ scorer on the SAME quantized model instead of the oracle
        if layout == "quant_trie":
            for q in range(got.shape[0]):
                st = _state_of(lm, ctx_py[q])
                for c in range(got.shape[1]):
                    want, _ = lm.base_score(st, _mapped(py, cand_w[q][c]))
                    assert got[q, c] == pytest.approx(want, abs=1e-5)
        else:
            for q in range(got.shape[0]):
                for c in range(got.shape[1]):
                    want = py._score_one(ctx_py[q], _mapped(py, cand_w[q][c]))
                    assert got[q, c] == pytest.approx(want, abs=1e-5), (
                        idx, ctx_py[q], cand_w[q][c])


@pytest.mark.parametrize("layout", ["tuple", "hashed"])
def test_matches_oracle_high_order(tmp_path, layout):
    """Orders 4-5 at a few hundred grams per level over a 40-word vocab:
    the reference's shipped artifact is a pruned 5-GRAM
    (zh_giga.no_cna_cmn.prune01244.klm, reference gpd.py:121), so the
    u32-pair ngram_hash chain at orders 4-5 (hashed layout) and the
    deep shrinking-context backoff paths (tuple layout) need coverage
    beyond the order-2/3 fuzz."""
    rng = np.random.RandomState(41)
    for idx, order in enumerate([4, 5]):
        path, vocab = _random_arpa(tmp_path, rng, 300 + idx, order=order,
                                   nvocab=40, n_per_order=250)
        py = ngram.PyNgramLM(path)
        if layout == "tuple":
            dev = DeviceNgramLM.from_arpa(path)
        else:
            lm = ngram.NgramLM(path)
            if lm._py is not None:
                pytest.skip("hashed layout needs the C++ LM kernel")
            dev = DeviceNgramLM.from_lm(lm)
        assert dev.order == order
        words = vocab + ["oovword", "<unk>", "</s>", "<s>"]
        ctx_dev, ctx_py, cand_w, cand_dev = _pairs(rng, py, dev, order,
                                                   Q=12, C=5, words=words)
        # force some full-length contexts (the deepest hash chain)
        full = [str(rng.choice(vocab)) for _ in range(order - 1)]
        ctx_py[0] = tuple(_mapped(py, w) for w in full)
        ctx_dev[0] = dev.word_ids(list(ctx_py[0]))
        got = np.asarray(score_candidates(dev, jnp.asarray(ctx_dev),
                                          jnp.asarray(cand_dev)))
        for q in range(got.shape[0]):
            for c in range(got.shape[1]):
                want = py._score_one(ctx_py[q], _mapped(py, cand_w[q][c]))
                assert got[q, c] == pytest.approx(want, abs=1e-4), (
                    order, ctx_py[q], cand_w[q][c])


def test_build_at_production_scale():
    """A synthetic table at the reference artifact's per-level entry
    count regime (millions of hashed 64-bit keys): the vectorized build
    must stay fast (the PERF.md claim is ~11 s for 10M entries — pin a
    generous bound at 2M), respect _MEM_CAP in its doubling policy,
    record a usable probe count, and look up correctly."""
    import time
    from chinese_asr_tpu.lm.device_ngram import (_MEM_CAP, _build_table,
                                                 _lookup)
    rng = np.random.RandomState(71)
    n = 2_000_000
    keys = rng.randint(0, 2**31 - 1, size=(n, 2), dtype=np.int32)
    keys = np.unique(keys, axis=0)
    vals = rng.randn(len(keys), 2).astype(np.float32)
    t0 = time.perf_counter()
    tbl, probes = _build_table(keys, vals)
    build_s = time.perf_counter() - t0
    assert build_s < 60.0, f"vectorized build took {build_s:.1f}s"
    assert tbl.nbytes <= _MEM_CAP
    # load factor <= 0.5 keeps worst displacement small even without
    # doubling headroom; anything beyond ~32 probes would make the hot
    # gather window absurd
    assert probes <= 32
    sample = keys[rng.randint(0, len(keys), 4096)]
    hit, lp, _ = _lookup(jnp.asarray(tbl), probes, jnp.asarray(sample))
    assert bool(np.asarray(hit).all())


def _state_of(lm, ctx_words):
    """Roll a C++ incremental state through ctx_words from the null
    state (the device context window's semantics)."""
    st = lm.null_state()
    for w in ctx_words:
        _, st = lm.base_score(st, w)
    return st


def test_vectorized_build_fuzz():
    """The parking-function build must place EVERY key within the
    recorded probe window (incl. wrap-around clusters), and misses must
    stay misses — fuzzed at a size where the vectorized path and the
    wrap tail both engage."""
    from chinese_asr_tpu.lm.device_ngram import _build_table, _lookup
    rng = np.random.RandomState(17)
    for trial, n in [(0, 20000), (1, 513), (2, 7)]:
        keys = np.unique(rng.randint(0, 2**31 - 1, size=(n * 2, 2),
                                     dtype=np.int32), axis=0)[:n]
        vals = rng.randn(len(keys), 2).astype(np.float32)
        tbl, probes = _build_table(keys, vals)
        hit, lp, bo = _lookup(jnp.asarray(tbl), probes, jnp.asarray(keys))
        assert bool(np.asarray(hit).all()), trial
        np.testing.assert_array_equal(np.asarray(lp), vals[:, 0])
        np.testing.assert_array_equal(np.asarray(bo), vals[:, 1])
        # misses: keys not inserted (flip a bit outside the set)
        miss = keys.copy()
        miss[:, 1] ^= 1
        miss_rows = ~(miss[:, None, :] == keys[None, :, :]).all(-1).any(1)
        h2, _, _ = _lookup(jnp.asarray(tbl), probes, jnp.asarray(miss))
        assert not np.asarray(h2)[miss_rows].any(), trial


def test_dense_uni_path_matches_probing_fallback(tmp_path):
    """Level-1 scoring goes through the dense [max_id+1, 2] table (the
    fused-decode trace priced the old 7-probe unigram gather at ~30% of
    the loop); a DeviceNgramLM with uni=None (old pickles, hand
    construction) must fall back to the probing table with identical
    scores."""
    rng = np.random.RandomState(23)
    path, words = _random_arpa(tmp_path, rng, 99)
    dev = DeviceNgramLM.from_arpa(path)
    assert dev.uni is not None
    assert dev.uni.shape[1] == 2
    Q, C = 6, 5
    M = dev.order
    ctx = np.full((Q, max(M - 1, 1)), -1, np.int32)
    ctx[:, -1] = dev.word_ids([str(rng.choice(words)) for _ in range(Q)])
    cand = np.stack([dev.word_ids([str(rng.choice(words))
                                   for _ in range(C)]) for _ in range(Q)])
    dense = score_candidates(dev, jnp.asarray(ctx),
                                          jnp.asarray(cand))
    legacy = DeviceNgramLM(dev.order, dev.tbls, dev.probes,
                           dev.unk_id, dev.word2id, hashed=dev.hashed,
                           uni=None)
    probed = score_candidates(legacy, jnp.asarray(ctx),
                                           jnp.asarray(cand))
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(probed))
    # absent id (beyond the dense cap) and -1 both resolve like a miss
    oob = np.full((2, 1), int(dev.uni.shape[0]) + 7, np.int32)
    oob[1, 0] = -1
    s_oob = score_candidates(
        dev, jnp.asarray(np.full((2, max(M - 1, 1)), -1, np.int32)),
        jnp.asarray(oob))
    s_ref = score_candidates(
        legacy, jnp.asarray(np.full((2, max(M - 1, 1)), -1, np.int32)),
        jnp.asarray(oob))
    np.testing.assert_array_equal(np.asarray(s_oob), np.asarray(s_ref))


def test_build_table_targets_probe_count():
    """When the initial load-0.5 capacity needs a long probe window the
    build doubles capacity (bounded at 4x / _MEM_CAP) to shrink it —
    every gathered probe slot is hot-loop time in the fused decode."""
    from chinese_asr_tpu.lm.device_ngram import (_TARGET_PROBES,
                                                 _build_table,
                                                 _build_table_at, _lookup)
    rng = np.random.RandomState(31)
    keys = np.unique(rng.randint(0, 2**31 - 1, size=(60000, 2),
                                 dtype=np.int32), axis=0)[:40000]
    vals = rng.randn(len(keys), 2).astype(np.float32)
    tbl, probes = _build_table(keys, vals)
    base_cap = 1 << int(np.ceil(np.log2(2 * len(keys) + 1)))
    _, _, probes_base = _build_table_at(keys, vals, base_cap)
    assert probes <= max(_TARGET_PROBES, probes_base)
    assert tbl.shape[0] - (probes - 1) <= base_cap * 4
    if probes_base > _TARGET_PROBES:
        assert probes < probes_base     # growth actually helped
    hit, lp, bo = _lookup(jnp.asarray(tbl), probes, jnp.asarray(keys[:500]))
    assert bool(np.asarray(hit).all())
    np.testing.assert_array_equal(np.asarray(lp), vals[:500, 0])


def test_probe_layouts_bit_identical(tmp_path, monkeypatch):
    """planes (default) vs stacked probe math: same gathers, same hash,
    same masked-sum — scores must be BIT-identical on both key layouts
    (CHINESE_ASR_DLM_LAYOUT is an A/B knob, not a semantics switch)."""
    rng = np.random.RandomState(47)
    path, vocab = _random_arpa(tmp_path, rng, 400)
    py = ngram.PyNgramLM(path)
    for mk in (DeviceNgramLM.from_arpa, DeviceNgramLM.from_path):
        dev = mk(path)
        words = vocab + ["oovword", "<unk>", "</s>", "<s>"]
        ctx_dev, _ctx_py, _cand_w, cand_dev = _pairs(rng, py, dev,
                                                     dev.order, Q=16, C=6,
                                                     words=words)
        monkeypatch.delenv("CHINESE_ASR_DLM_LAYOUT", raising=False)
        a = np.asarray(score_candidates(dev, jnp.asarray(ctx_dev),
                                        jnp.asarray(cand_dev)))
        monkeypatch.setenv("CHINESE_ASR_DLM_LAYOUT", "stacked")
        b = np.asarray(score_candidates(dev, jnp.asarray(ctx_dev),
                                        jnp.asarray(cand_dev)))
        monkeypatch.delenv("CHINESE_ASR_DLM_LAYOUT", raising=False)
        np.testing.assert_array_equal(a, b)


def test_wide_window_packing_bit_identical(tmp_path, monkeypatch):
    """Wide-window tables (one row gather per probe window,
    CHINESE_ASR_DLM_WIDE default) vs narrow tables: same hash, same
    slots, same unique hit -> scores must be BIT-identical; and the
    total-byte budget must leave oversized levels narrow."""
    from chinese_asr_tpu.lm.device_ngram import (_build_table, _lookup,
                                                 _widen_tables)
    rng = np.random.RandomState(53)
    path, vocab = _random_arpa(tmp_path, rng, 500)
    py = ngram.PyNgramLM(path)
    monkeypatch.delenv("CHINESE_ASR_DLM_WIDE", raising=False)
    dev_w = DeviceNgramLM.from_arpa(path)
    monkeypatch.setenv("CHINESE_ASR_DLM_WIDE", "0")
    dev_n = DeviceNgramLM.from_arpa(path)
    monkeypatch.delenv("CHINESE_ASR_DLM_WIDE", raising=False)
    # at least one level should actually have taken the wide layout
    widened = [kk for kk in range(dev_w.order)
               if dev_w.tbls[kk].shape != dev_n.tbls[kk].shape]
    assert widened, "no level widened; the gate or the build regressed"
    words = vocab + ["oovword", "<unk>", "</s>", "<s>"]
    ctx_dev, _ctx_py, _cand_w, cand_dev = _pairs(rng, py, dev_w,
                                                 dev_w.order, Q=16, C=6,
                                                 words=words)
    a = np.asarray(score_candidates(dev_w, jnp.asarray(ctx_dev),
                                    jnp.asarray(cand_dev)))
    b = np.asarray(score_candidates(dev_n, jnp.asarray(ctx_dev),
                                    jnp.asarray(cand_dev)))
    np.testing.assert_array_equal(a, b)
    # the budget gate: under a tiny total budget every level stays
    # narrow; with room, smallest-first widening engages and widened
    # tables still look up every stored key
    n = 2000
    keys = np.unique(rng.randint(0, 2**31 - 1, size=(n, 2),
                                 dtype=np.int32), axis=0)
    vals = rng.randn(len(keys), 2).astype(np.float32)
    tbl, probes = _build_table(keys, vals)
    assert tbl.shape[1] == keys.shape[1] + 2        # build stays narrow
    kept = _widen_tables([tbl], [probes], budget=16)
    assert kept[0].shape == tbl.shape
    wide = _widen_tables([tbl], [probes], budget=1 << 30)
    if probes > 1:
        assert wide[0].shape[1] == probes * (keys.shape[1] + 2)
    hit, lp, _ = _lookup(jnp.asarray(wide[0]), probes, jnp.asarray(keys))
    assert bool(np.asarray(hit).all())
    np.testing.assert_array_equal(np.asarray(lp), vals[:, 0])


def _prefix_closed_arpa(tmp_path, rng, idx, order=5, nvocab=12,
                        n_chains=120):
    """ARPA closed under prefixes: every written n-gram's (n-1)-word
    context is also written — the property kenlm's builder guarantees
    for every real artifact (and verifies at load), which
    DeviceNgramLM's context-gated probing relies on (ctx_gated)."""
    vocab = [f"w{i}" for i in range(nvocab)]
    grams = {}
    for w in ["<unk>", "<s>", "</s>"] + vocab:
        grams[(w,)] = (round(float(-rng.rand() * 4 - 0.05), 4),
                       round(float(-rng.rand()), 4))
    for _ in range(n_chains):
        o = int(rng.randint(2, order + 1))
        key = tuple([str(rng.choice(["<s>"] + vocab))]
                    + [str(rng.choice(vocab)) for _ in range(o - 2)]
                    + [str(rng.choice(vocab + ["</s>"]))])
        for L in range(2, o + 1):
            pre = key[:L]
            if pre not in grams and "</s>" not in pre[:-1]:
                bo = round(float(-rng.rand() * 0.5), 4) if L < order else 0.0
                grams[pre] = (round(float(-rng.rand() * 4 - 0.05), 4), bo)
    per = {o: [] for o in range(1, order + 1)}
    for k, (lp, bo) in grams.items():
        per[len(k)].append((k, lp, bo))
    lines = ["\\data\\"] + [f"ngram {o}={len(per[o])}"
                            for o in range(1, order + 1)] + [""]
    for o in range(1, order + 1):
        lines.append(f"\\{o}-grams:")
        for k, lp, bo in per[o]:
            tail = f"\t{bo}" if (o < order and bo != 0.0) else ""
            lines.append(f"{lp}\t{' '.join(k)}{tail}")
        lines.append("")
    lines += ["\\end\\", ""]
    p = tmp_path / f"closed{idx}.arpa"
    p.write_text("\n".join(lines))
    return str(p), vocab


def test_context_gate_detection(tmp_path):
    """ctx_gated turns on exactly when the context property holds: True
    for prefix-closed ARPAs (all three checkers agree), False for a
    model with a 3-gram whose 2-gram context is pruned away."""
    rng = np.random.RandomState(61)
    path, _ = _prefix_closed_arpa(tmp_path, rng, 0, order=4)
    cpp = ngram.NgramLM(path)
    assert cpp.context_property()
    assert ngram.PyNgramLM(path).context_property()
    assert DeviceNgramLM.from_arpa(path).ctx_gated
    assert DeviceNgramLM.from_lm(cpp).ctx_gated
    viol = tmp_path / "viol.arpa"
    viol.write_text("\n".join([
        "\\data\\", "ngram 1=4", "ngram 2=1", "ngram 3=1", "",
        "\\1-grams:", "-2.0\t<unk>\t-0.3", "-1.5\t<s>\t-0.3",
        "-1.5\t</s>", "-1.0\ta\t-0.2", "",
        "\\2-grams:", "-0.7\t<s> a\t-0.1", "",
        "\\3-grams:", "-0.4\ta a a", "",       # context (a, a) missing
        "\\end\\", ""]))
    cpp_v = ngram.NgramLM(str(viol))
    assert not cpp_v.context_property()
    assert not ngram.PyNgramLM(str(viol)).context_property()
    assert not DeviceNgramLM.from_arpa(str(viol)).ctx_gated
    assert not DeviceNgramLM.from_lm(cpp_v).ctx_gated


@pytest.mark.parametrize("layout", ["tuple", "hashed"])
def test_context_gate_parity(tmp_path, layout, monkeypatch):
    """Gated probing (redirect + forced miss where the level-k context
    missed) must be BIT-identical to ungated probing on property-holding
    models — at orders 4 and 5 in both key layouts, and in the stacked
    probe-math layout too — and still match the Python oracle.  The
    gate is a measured in-pipeline NEGATIVE (see _use_gate), so it is
    opt-in; this pins the opt-in path's correctness."""
    monkeypatch.setenv("CHINESE_ASR_DLM_GATE", "1")
    rng = np.random.RandomState(67)
    for idx, order in enumerate([4, 5]):
        path, vocab = _prefix_closed_arpa(tmp_path, rng, 10 + idx,
                                          order=order)
        py = ngram.PyNgramLM(path)
        if layout == "tuple":
            dev = DeviceNgramLM.from_arpa(path)
        else:
            dev = DeviceNgramLM.from_lm(ngram.NgramLM(path))
        assert dev.ctx_gated
        ungated = DeviceNgramLM(dev.order, dev.tbls, dev.probes,
                                dev.unk_id, dev.word2id, hashed=dev.hashed,
                                uni=dev.uni, ctx_gated=False)
        words = vocab + ["oovword", "<unk>", "</s>", "<s>"]
        ctx_dev, ctx_py, cand_w, cand_dev = _pairs(rng, py, dev, order,
                                                   Q=12, C=5, words=words)
        got = np.asarray(score_candidates(dev, jnp.asarray(ctx_dev),
                                          jnp.asarray(cand_dev)))
        plain = np.asarray(score_candidates(ungated, jnp.asarray(ctx_dev),
                                            jnp.asarray(cand_dev)))
        np.testing.assert_array_equal(got, plain)
        monkeypatch.setenv("CHINESE_ASR_DLM_LAYOUT", "stacked")
        stacked = np.asarray(score_candidates(dev, jnp.asarray(ctx_dev),
                                              jnp.asarray(cand_dev)))
        monkeypatch.delenv("CHINESE_ASR_DLM_LAYOUT")
        np.testing.assert_array_equal(got, stacked)
        for q in range(got.shape[0]):
            for c in range(got.shape[1]):
                want = py._score_one(ctx_py[q], _mapped(py, cand_w[q][c]))
                assert got[q, c] == pytest.approx(want, abs=1e-5), (
                    order, ctx_py[q], cand_w[q][c])


def test_trace_variant_rekeys_jit_caches(monkeypatch):
    """The DLM env knobs are read at TRACE time inside score_candidates,
    so every jit cache that closes over device-LM lookups keys on
    `trace_variant()` (the beam.py _kernel_variant convention) —
    flipping CHINESE_ASR_DLM_GATE / _LAYOUT between calls must retrace,
    not replay the stale traced choice."""
    from chinese_asr_tpu.decode import rescore
    from chinese_asr_tpu.lm.device_ngram import trace_variant

    monkeypatch.delenv("CHINESE_ASR_DLM_GATE", raising=False)
    monkeypatch.delenv("CHINESE_ASR_DLM_LAYOUT", raising=False)
    base = trace_variant()
    monkeypatch.setenv("CHINESE_ASR_DLM_GATE", "1")
    gated = trace_variant()
    assert gated != base
    monkeypatch.setenv("CHINESE_ASR_DLM_LAYOUT", "stacked")
    stacked = trace_variant()
    assert stacked != gated
    # distinct variants -> distinct lru entries (hence distinct traces)
    n0 = rescore._jitted.cache_info().currsize
    rescore._jitted(0.125, 0.25, 1, 2, base)
    rescore._jitted(0.125, 0.25, 1, 2, gated)
    rescore._jitted(0.125, 0.25, 1, 2, stacked)
    assert rescore._jitted.cache_info().currsize == n0 + 3
