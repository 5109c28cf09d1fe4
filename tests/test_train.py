"""Training stack: loss formula, compiled train step, plateau LR,
checkpoint manager, end-to-end overfit of one tiny batch."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chinese_asr_tpu.config import Config
from chinese_asr_tpu.models import las
from chinese_asr_tpu.train import optim
from chinese_asr_tpu.train.loss import label_smoothed_ce
from chinese_asr_tpu.train.step import Batch, loss_fn, train_step
from chinese_asr_tpu.utils.checkpoint import (CheckpointManager, TrainVar,
                                              load_checkpoint, save_checkpoint,
                                              view_ckpt)

SMALL = (Config()
         .with_("audio", n_mels=8, delta_delta=False, downsample=False)
         .with_("encoder", hidden_size=16, num_layers=2)
         .with_("decoder", hidden_size=32, embed_dim=12)
         .with_("attention", attn_size=8)
         .with_("vocab", max_num_words=20)
         .with_("train", label_smooth=0.1, base_lr=3e-3, l2_decay=0.0))


def make_batch(cfg, seed=0, B=4, T=9, S=6):
    rng = np.random.RandomState(seed)
    feats = rng.randn(B, T, cfg.audio.feat_dim).astype(np.float32)
    feat_lens = np.full(B, T, np.int32)
    text = rng.randint(4, cfg.vocab.vocab_size, size=(B, S - 1))
    tokens_in = np.concatenate(
        [np.full((B, 1), cfg.vocab.sos), text], axis=1).astype(np.int32)
    tokens_out = np.concatenate(
        [text, np.full((B, 1), cfg.vocab.eos)], axis=1).astype(np.int32)
    text_lens = np.full(B, S, np.int32)
    return Batch(jnp.asarray(feats), jnp.asarray(feat_lens),
                 jnp.asarray(tokens_in), jnp.asarray(tokens_out),
                 jnp.asarray(text_lens))


# --------------------------------------------------------------------------
# loss
# --------------------------------------------------------------------------
def test_label_smoothing_matches_explicit_distribution():
    rng = np.random.RandomState(0)
    logits = rng.randn(5, 11).astype(np.float32)
    tgt = rng.randint(0, 11, size=5)
    ls = 0.1
    # explicit: -(sum_k q_k log p_k), q_tgt = 1-ls, q_other = ls/(K-1)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    K = 11
    q = np.full((5, K), ls / (K - 1))
    q[np.arange(5), tgt] = 1.0 - ls
    expected = -(q * logp).sum(-1).mean()
    got = label_smoothed_ce(jnp.asarray(logits), jnp.asarray(tgt),
                            label_smooth=ls)
    np.testing.assert_allclose(float(got), expected, rtol=1e-5)


def test_label_smoothing_zero_is_cross_entropy():
    rng = np.random.RandomState(1)
    logits = rng.randn(7, 9).astype(np.float32)
    tgt = rng.randint(0, 9, size=7)
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    expected = -logp[np.arange(7), tgt].mean()
    got = label_smoothed_ce(jnp.asarray(logits), jnp.asarray(tgt),
                            label_smooth=0.0)
    np.testing.assert_allclose(float(got), expected, rtol=1e-5)


# --------------------------------------------------------------------------
# train step
# --------------------------------------------------------------------------
def test_train_step_overfits_tiny_batch():
    cfg = SMALL
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(cfg.train)
    opt_state = tx.init(params)
    batch = make_batch(cfg)
    step = jax.jit(lambda p, o, b: train_step(p, o, cfg, tx, b))
    first = None
    for i in range(30):
        params, opt_state, metrics = step(params, opt_state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first * 0.7, (first, last)
    assert not bool(metrics["skipped"])


def test_train_remat_matches_no_remat():
    """train.remat=True (jax.checkpoint on the decoder scan body) must
    leave loss AND gradients identical — it only changes what the
    backward pass stores vs recomputes."""
    from chinese_asr_tpu.train.step import loss_fn as lf

    cfg_r = SMALL.with_("train", remat=True)
    params = las.init_params(jax.random.PRNGKey(2), cfg_r)
    batch = make_batch(cfg_r, seed=9)

    def scalar(cfg):
        return lambda p: lf(p, cfg, batch)[0]

    l0, g0 = jax.value_and_grad(scalar(SMALL))(params)
    l1, g1 = jax.value_and_grad(scalar(cfg_r))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # and through the ss>0 (scheduled-sampling) scan as well
    cfg_ss = SMALL.with_("train", ss=0.3)
    cfg_ss_r = SMALL.with_("train", ss=0.3, remat=True)
    rng = jax.random.PRNGKey(4)
    l2 = float(lf(params, cfg_ss, batch, rng)[0])
    l3 = float(lf(params, cfg_ss_r, batch, rng)[0])
    np.testing.assert_allclose(l2, l3, rtol=1e-6)


def test_forward_logits_hoisted_matches_stepwise():
    """The teacher-forced (ss=0) path hoists the embedding and logit
    matmuls out of the scan; its logits must match an explicit per-step
    decoder_step loop with gold tokens."""
    from chinese_asr_tpu.models import decoder as dec_ops
    from chinese_asr_tpu.train.step import forward_logits

    cfg = SMALL
    params = las.init_params(jax.random.PRNGKey(1), cfg)
    batch = make_batch(cfg, seed=5)
    got = np.asarray(forward_logits(params, cfg, batch))

    eb = las.encode(params, cfg, batch.feats, batch.feat_lens, train=True)
    B, S = batch.tokens_in.shape
    dcfg, acfg = cfg.decoder, cfg.attention
    ctx = dec_ops.attn_hidden_width(acfg, eb.values.shape[-1])
    cell = eb.init_cell_state
    if cell is None:
        z = jnp.zeros((B, dcfg.hidden_size), batch.feats.dtype)
        cell = [(z, z) if dcfg.decoder_type == "LSTM" else z] * dcfg.num_layers
    attn = jnp.zeros((B, ctx), batch.feats.dtype)
    ref = []
    for t in range(S):
        out = dec_ops.decoder_step(
            params["decoder"], params["attention"], dcfg, acfg,
            eb.mask, eb.keys, eb.values, batch.tokens_in[:, t], cell, attn)
        cell, attn = out.cell_state, out.attn_hidden_state
        ref.append(np.asarray(out.logit))
    ref = np.stack(ref, axis=1)                            # [B, S, V]
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_forward_logits_gate_hoist_parity():
    """The layer-0 gate-partial hoist (PERF lever #5, auto-on at B >= 64)
    is a reassociation of the same math: logits and gradients must match
    the unhoisted scan to f32 rounding."""
    from chinese_asr_tpu.train.step import forward_logits

    cfg = SMALL
    params = las.init_params(jax.random.PRNGKey(2), cfg)
    batch = make_batch(cfg, seed=7)
    l0 = forward_logits(params, cfg, batch, gate_hoist=False)
    l1 = forward_logits(params, cfg, batch, gate_hoist=True)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                               rtol=2e-5, atol=2e-5)

    S = batch.tokens_out.shape[1]
    mask = jnp.ones(batch.tokens_out.shape, bool)

    def loss(p, gh):
        return label_smoothed_ce(
            forward_logits(p, cfg, batch, gate_hoist=gh),
            batch.tokens_out, mask, cfg.train.label_smooth)

    g0 = jax.grad(lambda p: loss(p, False))(params)
    g1 = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_train_step_mixed_precision_bf16():
    """train.compute_dtype="bfloat16": fwd/bwd in bf16, but master params
    and optimizer state stay f32, losses track the f32 run, and the model
    still overfits the tiny batch."""
    cfg = SMALL.with_("train", compute_dtype="bfloat16")
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(cfg.train)
    opt_state = tx.init(params)
    batch = make_batch(cfg)
    step = jax.jit(lambda p, o, b: train_step(p, o, cfg, tx, b))
    step_f32 = jax.jit(lambda p, o, b: train_step(p, o, SMALL, tx, b))

    # first-step loss within bf16 rounding of the f32 loss
    _, _, m_bf = step(params, opt_state, batch)
    _, _, m_f32 = step_f32(params, opt_state, batch)
    assert abs(float(m_bf["loss"]) - float(m_f32["loss"])) < 0.05, \
        (float(m_bf["loss"]), float(m_f32["loss"]))

    first = None
    for _ in range(30):
        params, opt_state, metrics = step(params, opt_state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last) and last < first * 0.7, (first, last)
    # master weights and optimizer state never leave f32
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == jnp.float32, leaf.dtype
    for leaf in jax.tree_util.tree_leaves(opt_state):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32, leaf.dtype


def test_train_step_skips_nonfinite():
    cfg = SMALL
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(cfg.train)
    opt_state = tx.init(params)
    batch = make_batch(cfg)
    bad = batch._replace(feats=batch.feats.at[0, 0, 0].set(jnp.nan))
    p2, o2, metrics = jax.jit(
        lambda p, o, b: train_step(p, o, cfg, tx, b))(params, opt_state, bad)
    assert bool(metrics["skipped"])
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scheduled_sampling_changes_logits_not_shapes():
    cfg = SMALL.with_("train", ss=0.5)
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    batch = make_batch(cfg)
    loss1, _ = loss_fn(params, cfg, batch, jax.random.PRNGKey(1))
    loss2, _ = loss_fn(params, cfg.with_("train", ss=0.0), batch, None)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert abs(float(loss1) - float(loss2)) > 0  # sampling took effect


# --------------------------------------------------------------------------
# optimizers / LR control
# --------------------------------------------------------------------------
def test_adabound_converges_on_quadratic():
    tx = optim.adabound(5e-2, final_lr=0.1)
    params = {"w": jnp.asarray(np.array([3.0, -2.0], np.float32))}
    state = tx.init(params)

    @jax.jit
    def step(p, s):
        g = jax.grad(lambda q: (q["w"] ** 2).sum())(p)
        u, s = tx.update(g, s, p)
        return jax.tree_util.tree_map(lambda a, b: a + b, p, u), s

    for _ in range(300):
        params, state = step(params, state)
    assert float(jnp.abs(params["w"]).max()) < 0.05


def test_plateau_lr_reduces_after_patience():
    cfg = SMALL.with_("train", patience=2, factor=0.5, base_lr=1e-3,
                      min_lr=1e-4, dec_rate_threshold=0.0)
    pl = optim.PlateauLR(cfg.train)
    assert not pl.step(0.5)          # improvement
    assert not pl.step(0.6)          # no imprv 1
    assert not pl.step(0.6)          # no imprv 2
    assert pl.step(0.6)              # no imprv 3 > patience -> reduce
    assert pl.lr == pytest.approx(5e-4)
    assert not pl.step(0.4)          # new best resets


def test_ramp_up():
    assert optim.ramp_up_lr(1.0, 0, 10) == pytest.approx(0.1)
    assert optim.ramp_up_lr(1.0, 9, 10) == pytest.approx(1.0)
    assert optim.ramp_up_lr(1.0, 50, 10) == 1.0
    assert optim.ramp_up_lr(1.0, 0, 0) == 1.0


def test_set_get_lr():
    cfg = SMALL
    tx = optim.make_optimizer(cfg.train)
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    state = tx.init(params)
    assert optim.get_lr(state) == pytest.approx(cfg.train.base_lr)
    state = optim.set_lr(state, 1e-4)
    assert optim.get_lr(state) == pytest.approx(1e-4)


# --------------------------------------------------------------------------
# checkpointing
# --------------------------------------------------------------------------
def test_checkpoint_roundtrip(tmp_path):
    cfg = SMALL
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    tv = TrainVar(step=7, loss=1.5, best_wer=0.2, lr=1e-3)
    path = str(tmp_path / "x.ckpt")
    save_checkpoint(path, params, train_var=tv, config_json=cfg.to_json())
    payload = load_checkpoint(path)
    assert payload["train_var"].step == 7
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(payload["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    names = view_ckpt(path)
    assert len(names) == len(jax.tree_util.tree_leaves(params))


def test_checkpoint_manager_best_latest(tmp_path):
    m = CheckpointManager(str(tmp_path))
    params = {"w": jnp.zeros((2,))}
    m.save(100, 0.5, params)
    m.save(200, 0.3, params)
    m.save(300, 0.4, params)
    assert m.latest_checkpoint().endswith("step-300_wer-0.40000.ckpt")
    assert m.best_checkpoint().endswith("step-200_wer-0.30000.ckpt")


def test_bn_running_stats_update_with_torch_semantics():
    """ADVICE r1 (medium): BN running stats were never updated and train
    never used batch statistics.  One train_step on a BN conv encoder must
    move running stats by exactly the torch moving average
    running = 0.9*running + 0.1*batch_stat (unbiased var for running_var),
    with NO optimizer/weight-decay contamination of the buffers."""
    from chinese_asr_tpu.models import encoder as enc_ops

    cfg = (SMALL
           .with_("encoder", encoder_type="CNN1D", conv_channels=8,
                  norm="BN", act="RELU", ks=3, stride=(2, 2))
           .with_("train", l2_decay=1e-2))     # big decay: contamination trips
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(cfg.train, params)
    batch = make_batch(cfg, T=12)

    # expected batch stats: same forward, recorded outside grad
    tape = []
    enc_ops.apply_encoder(params["encoder"], cfg, batch.feats,
                          batch.feat_lens, train=True, bn_updates=tape)
    assert len(tape) == len(params["encoder"]["convs"])
    expect = []
    for p, m, v, n in tape:
        expect.append((np.asarray(m), np.asarray(v) * n / (n - 1)))

    new_params, _, metrics = train_step(params, tx.init(params), cfg, tx,
                                        batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    for i, (m, v) in enumerate(expect):
        blk = new_params["encoder"]["convs"][i]
        np.testing.assert_allclose(np.asarray(blk["bn_mean"]), 0.1 * m,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(blk["bn_var"]),
                                   0.9 * 1.0 + 0.1 * v, rtol=1e-5, atol=1e-6)
    # and a second step keeps compounding the moving average
    new2, _, _ = train_step(new_params, tx.init(new_params), cfg, tx, batch,
                            jax.random.PRNGKey(2))
    b0, b1 = (np.asarray(new_params["encoder"]["convs"][0]["bn_mean"]),
              np.asarray(new2["encoder"]["convs"][0]["bn_mean"]))
    assert not np.allclose(b0, b1)


def test_bn_eval_uses_learned_running_stats():
    """After training, eval-mode (train=False) must normalize with the
    running stats, not the init mean=0/var=1."""
    from chinese_asr_tpu.models import encoder as enc_ops

    cfg = SMALL.with_("encoder", encoder_type="CNN1D", conv_channels=8,
                      norm="BN", act="RELU", ks=3, stride=(2, 2))
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(cfg.train, params)
    batch = make_batch(cfg, T=12)
    new_params, _, _ = train_step(params, tx.init(params), cfg, tx, batch,
                                  jax.random.PRNGKey(1))

    out_old_stats = enc_ops.apply_encoder(
        dict(new_params["encoder"], convs=[
            dict(c, bn_mean=params["encoder"]["convs"][i]["bn_mean"],
                 bn_var=params["encoder"]["convs"][i]["bn_var"])
            for i, c in enumerate(new_params["encoder"]["convs"])]),
        cfg, batch.feats, batch.feat_lens)
    out_new_stats = enc_ops.apply_encoder(new_params["encoder"], cfg,
                                          batch.feats, batch.feat_lens)
    assert not np.allclose(np.asarray(out_old_stats.out),
                           np.asarray(out_new_stats.out))
