"""Pallas exact top-k: interpret-mode parity with jax.lax.top_k, including
tie-breaking (lower index first) and vocab-size padding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chinese_asr_tpu.ops.pallas import topk as pallas_topk


@pytest.mark.parametrize("R,V,k", [(8, 64, 5), (6, 100, 4), (256, 5004, 17)])
def test_matches_lax_top_k(R, V, k, monkeypatch):
    # pin the FLAT kernel (grouped is the default since the hardware
    # measurement; its parity is pinned by test_grouped_matches_lax_top_k)
    monkeypatch.setenv("CHINESE_ASR_TOPK_GROUPED", "0")
    rng = np.random.RandomState(R + V + k)
    x = jnp.asarray(rng.randn(R, V).astype(np.float32))
    v_ref, i_ref = jax.lax.top_k(x, k)
    v, i = pallas_topk.top_k(x, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_ties_prefer_lower_index():
    x = np.zeros((4, 40), np.float32)
    x[:, [3, 17, 29]] = 7.0                       # three-way tie at the top
    x[:, 5] = 2.0
    v, i = pallas_topk.top_k(jnp.asarray(x), 4, interpret=True)
    np.testing.assert_array_equal(np.asarray(i)[0], [3, 17, 29, 5])
    v_ref, i_ref = jax.lax.top_k(jnp.asarray(x), 4)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_row_padding_keeps_vmem_blocks():
    """R not a multiple of 128 (tail chunk of a >max_batch transcription,
    e.g. R = 44*16 = 704) must be padded into 128-row grid blocks, not one
    whole-array block (14 MB+ of VMEM on TPU), and the padded rows sliced
    back off."""
    rng = np.random.RandomState(0)
    R, V, k = 200, 300, 6
    x = jnp.asarray(rng.randn(R, V).astype(np.float32))
    v_ref, i_ref = jax.lax.top_k(x, k)
    v, i = pallas_topk.top_k(x, k, interpret=True)
    assert v.shape == (R, k) and i.shape == (R, k)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_nan_rows_stay_in_range():
    """A NaN row max (e.g. one bad bf16 step) must emit the NaN's position
    and value like lax.top_k, never an out-of-range index."""
    x = np.random.RandomState(1).randn(4, 96).astype(np.float32)
    x[0, 11] = np.nan
    x[2, :] = np.nan
    v, i = pallas_topk.top_k(jnp.asarray(x), 3, interpret=True)
    v, i = np.asarray(v), np.asarray(i)
    assert (i >= 0).all() and (i < 96).all()
    v_ref, i_ref = jax.lax.top_k(jnp.asarray(x), 3)
    np.testing.assert_array_equal(i, np.asarray(i_ref))
    np.testing.assert_array_equal(v, np.asarray(v_ref))


def test_neg_inf_rows():
    """Rows full of -inf (empty beams) must yield k DISTINCT ascending
    indices like lax.top_k — the -inf "excluded" sentinel must never
    collide with real -inf values (regression: the first threshold
    rewrite re-picked col 0 forever on such rows)."""
    x = np.full((8, 130), -np.inf, np.float32)
    x[1, 7] = 1.0
    v, i = pallas_topk.top_k(jnp.asarray(x), 3, interpret=True)
    assert int(i[1, 0]) == 7 and float(v[1, 0]) == 1.0
    v_ref, i_ref = jax.lax.top_k(jnp.asarray(x), 3)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_array_equal(np.asarray(v)[np.isfinite(np.asarray(v))],
                                  np.asarray(v_ref)[
                                      np.isfinite(np.asarray(v_ref))])
    assert (np.asarray(i)[0] == [0, 1, 2]).all()


@pytest.mark.parametrize("onepass", ["0", "1"])
@pytest.mark.parametrize("R,V,k", [(8, 5004, 17), (200, 1000, 9),
                                   (8, 64, 5)])
def test_grouped_matches_lax_top_k(R, V, k, onepass, monkeypatch):
    """CHINESE_ASR_TOPK_GROUPED=1: the two-level grouped extraction must
    equal lax.top_k exactly (small V silently keeps the flat kernel —
    still exact), in both the multi-pass and one-pass group phases."""
    monkeypatch.setenv("CHINESE_ASR_TOPK_GROUPED", "1")
    monkeypatch.setenv("CHINESE_ASR_TOPK_ONEPASS", onepass)
    rng = np.random.RandomState(R + V + k)
    x = jnp.asarray(rng.randn(R, V).astype(np.float32))
    v_ref, i_ref = jax.lax.top_k(x, k)
    v, i = pallas_topk.top_k(x, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


@pytest.mark.parametrize("onepass", ["0", "1"])
def test_grouped_exhausted_group_falls_back(onepass, monkeypatch):
    """>levels of the top-k packed into ONE interleaved lane-group (cols
    = 7 mod 128) must trigger the in-kernel exhaustion fallback and stay
    exact — the candidate set alone cannot see the 6th element."""
    monkeypatch.setenv("CHINESE_ASR_TOPK_GROUPED", "1")
    monkeypatch.setenv("CHINESE_ASR_TOPK_ONEPASS", onepass)
    rng = np.random.RandomState(3)
    V, k = 5004, 17
    x = rng.randn(8, V).astype(np.float32)
    group7 = [7 + 128 * m for m in range(8)]          # 8 > GROUP_LEVELS
    x[:, group7] = 100.0 + np.arange(8)[None, :]      # dominate top-17
    v_ref, i_ref = jax.lax.top_k(jnp.asarray(x), k)
    v, i = pallas_topk.top_k(jnp.asarray(x), k, interpret=True)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


@pytest.mark.parametrize("onepass", ["0", "1"])
def test_grouped_ties_nan_neginf(onepass, monkeypatch):
    """Grouped mode keeps lax.top_k's full total order: ties -> lower
    col (including ties INSIDE one group, which span candidate levels),
    NaN above everything, all--inf rows yield ascending cols."""
    monkeypatch.setenv("CHINESE_ASR_TOPK_GROUPED", "1")
    monkeypatch.setenv("CHINESE_ASR_TOPK_ONEPASS", onepass)
    V, k = 1000, 6
    x = np.zeros((4, V), np.float32)
    x[0, [5, 133, 261, 700]] = 7.0       # cols 5/133/261 share group 5
    x[1, 11] = np.nan
    x[2, :] = -np.inf
    x[3, :500] = np.linspace(0, 1, 500, dtype=np.float32)
    v_ref, i_ref = jax.lax.top_k(jnp.asarray(x), k)
    v, i = pallas_topk.top_k(jnp.asarray(x), k, interpret=True)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    f = np.isfinite(np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(v)[f], np.asarray(v_ref)[f])
    assert np.isnan(np.asarray(v)[1, 0]) and int(np.asarray(i)[1, 0]) == 11


@pytest.mark.parametrize("onepass", ["0", "1"])
def test_grouped_tie_heavy_fuzz(onepass, monkeypatch):
    """Adversarial fuzz: values drawn from a tiny integer set (massive
    tie groups spanning lanes, members, and candidate levels), random
    -inf/NaN contamination, random shapes — exact lax.top_k total order
    must hold elementwise for both group-phase variants."""
    monkeypatch.setenv("CHINESE_ASR_TOPK_GROUPED", "1")
    monkeypatch.setenv("CHINESE_ASR_TOPK_ONEPASS", onepass)
    rng = np.random.RandomState(int(onepass) + 100)
    for trial in range(6):
        R = int(rng.randint(1, 9))
        V = int(rng.randint(650, 1400))          # M > GROUP_LEVELS
        k = int(rng.randint(1, 20))
        x = rng.randint(0, 4, size=(R, V)).astype(np.float32)
        # contaminate: whole -inf rows, random -inf cells, a NaN or two
        if trial % 2:
            x[rng.randint(R)] = -np.inf
        x[rng.rand(R, V) < 0.1] = -np.inf
        if trial % 3 == 0:
            x[rng.randint(R), rng.randint(V)] = np.nan
        v_ref, i_ref = jax.lax.top_k(jnp.asarray(x), k)
        v, i = pallas_topk.top_k(jnp.asarray(x), k, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(i), np.asarray(i_ref),
            err_msg=f"trial {trial} R={R} V={V} k={k}")
        f = np.isfinite(np.asarray(v_ref))
        np.testing.assert_array_equal(np.asarray(v)[f], np.asarray(v_ref)[f])
        np.testing.assert_array_equal(np.isnan(np.asarray(v)),
                                      np.isnan(np.asarray(v_ref)))


def test_grouped_onepass_phantom_seed_fallback(monkeypatch):
    """One-pass-specific: a row with fewer than k finite values makes
    -inf reach the k-th pick — the phantom seeds (col = member j even
    when member j turned out finite) could then shadow the true -inf
    column order, so the kernel must fall back to the flat extraction
    and stay exactly lax.top_k."""
    monkeypatch.setenv("CHINESE_ASR_TOPK_GROUPED", "1")
    monkeypatch.setenv("CHINESE_ASR_TOPK_ONEPASS", "1")
    V, k = 1000, 6
    x = np.full((4, V), -np.inf, np.float32)
    x[0, [0, 1, 2]] = [3.0, 2.0, 1.0]     # finite member-0s, -inf top-k tail
    x[1, [130, 750]] = [5.0, 4.0]
    x[2, 999] = 9.0
    x[3, :] = np.linspace(0, 1, V, dtype=np.float32)  # control: no -inf
    v_ref, i_ref = jax.lax.top_k(jnp.asarray(x), k)
    v, i = pallas_topk.top_k(jnp.asarray(x), k, interpret=True)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    f = np.isfinite(np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(v)[f], np.asarray(v_ref)[f])


@pytest.mark.parametrize("R,V,k,temp", [(8, 64, 5, 1.0), (6, 100, 4, 1.3),
                                        (256, 5004, 17, 1.0)])
def test_fused_matches_xla_composition(R, V, k, temp):
    """top_k_fused(logit, bias) must equal the XLA chain
    top_k(logit/T - logsumexp(logit/T) + bias) — the beam's stage-1
    contract (values to 1e-6; indices exactly, random floats never tie)."""
    rng = np.random.RandomState(R + V + k)
    logit = jnp.asarray(rng.randn(R, V).astype(np.float32) * 3)
    bias = jnp.asarray(rng.randn(R, 1).astype(np.float32))
    x = logit / temp
    key = x - jax.scipy.special.logsumexp(x, axis=1, keepdims=True) + bias
    v_ref, i_ref = jax.lax.top_k(key, k)
    v, i = pallas_topk.top_k_fused(logit, bias, k, temp, interpret=True)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=2e-6, atol=2e-6)


def test_fused_disabled_rows_and_nan():
    """-inf bias rows yield ascending indices / -inf values (the beam's
    step-0 duplicate-beam masking); a NaN logit poisons its whole row
    like the XLA logsumexp does."""
    rng = np.random.RandomState(0)
    logit = rng.randn(4, 96).astype(np.float32)
    logit[2, 30] = np.nan
    bias = np.zeros((4, 1), np.float32)
    bias[1, 0] = -np.inf
    v, i = pallas_topk.top_k_fused(jnp.asarray(logit), jnp.asarray(bias),
                                   3, interpret=True)
    v, i = np.asarray(v), np.asarray(i)
    assert (i[1] == [0, 1, 2]).all() and np.isneginf(v[1]).all()
    assert np.isnan(v[2]).all() and (i[2] == [0, 1, 2]).all()
    key = logit - jax.scipy.special.logsumexp(
        jnp.asarray(logit), axis=1, keepdims=True)
    v_ref, i_ref = jax.lax.top_k(jnp.asarray(key), 3)
    np.testing.assert_array_equal(i[[0, 3]], np.asarray(i_ref)[[0, 3]])


def test_fused_disabled_row_beats_nan():
    """A -inf-bias (disabled) row with NaN logits must stay -inf — the
    XLA path's step-0 mask is applied after the NaN-producing transform
    and wins there too."""
    logit = np.random.RandomState(1).randn(2, 64).astype(np.float32)
    logit[0, 5] = np.nan
    bias = np.array([[-np.inf], [0.0]], np.float32)
    v, i = pallas_topk.top_k_fused(jnp.asarray(logit), jnp.asarray(bias),
                                   3, interpret=True)
    assert np.isneginf(np.asarray(v)[0]).all()
    assert (np.asarray(i)[0] == [0, 1, 2]).all()


def test_row_block_vmem_guard_choices():
    """Wide rows shrink the VMEM row block (the kernel holds ~3 f32
    copies of the [BR, Vp] block); beyond ~128k cols even 8 rows don't
    fit and the impl hands the call to lax.top_k (BR == 0).  Regression:
    a [128, 80128] k=33 call asked Mosaic for an 82 MB stack frame and
    failed the hardware compile (vmem OOM)."""
    assert pallas_topk._row_block(5120) == 128      # the product shape
    assert pallas_topk._row_block(8192) == 128
    assert pallas_topk._row_block(16384) == 64
    assert pallas_topk._row_block(80128) == 8       # the crash shape
    assert pallas_topk._row_block(131072) == 8      # last pallas width
    assert pallas_topk._row_block(131200) == 0      # lax fallback


def test_wide_rows_shrink_block_and_match(monkeypatch):
    """[R, 80064] (the full [B, k*V] flat-beam width) must compile into
    8-row blocks and stay exactly lax.top_k.  Flat kernel: interpret
    mode traces the grouped scan's 626 slices too slowly."""
    monkeypatch.setenv("CHINESE_ASR_TOPK_GROUPED", "0")
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(12, 80064).astype(np.float32))
    v_ref, i_ref = jax.lax.top_k(x, 5)
    v, i = pallas_topk.top_k(x, 5, interpret=True)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_beyond_pallas_width_falls_back_to_lax():
    """Vp > ~128k: top_k and top_k_fused must return lax-exact results
    through the fallback branch (no pallas_call at any width)."""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(3, 131201).astype(np.float32))
    v_ref, i_ref = jax.lax.top_k(x, 4)
    v, i = pallas_topk.top_k(x, 4, interpret=True)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    bias = jnp.asarray(rng.randn(3, 1).astype(np.float32))
    xs = x / 1.3
    key = xs - jax.scipy.special.logsumexp(xs, axis=1, keepdims=True) + bias
    v_ref, i_ref = jax.lax.top_k(key, 4)
    v, i = pallas_topk.top_k_fused(x, bias, 4, 1.3, interpret=True)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=2e-6, atol=2e-6)
