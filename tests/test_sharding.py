"""Multi-chip SPMD: the sharded train step and decode programs must compile
and run on an 8-device (4 data x 2 model) CPU mesh and agree numerically
with the single-device programs."""

import numpy as np

import jax
import jax.numpy as jnp

from chinese_asr_tpu.config import Config
from chinese_asr_tpu.decode import greedy
from chinese_asr_tpu.models import las
from chinese_asr_tpu.parallel import sharding
from chinese_asr_tpu.train import optim
from chinese_asr_tpu.train.step import train_step

from test_train import SMALL, make_batch


def mesh_cfg():
    return SMALL.with_("mesh", data_parallel=4, model_parallel=2)


def test_mesh_shapes():
    cfg = mesh_cfg()
    mesh = sharding.make_mesh(cfg)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")


def test_sharded_train_step_matches_single_device():
    cfg = mesh_cfg()
    mesh = sharding.make_mesh(cfg)
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(cfg.train)
    opt_state = tx.init(params)
    batch = make_batch(cfg, B=8)

    p1, o1, m1 = jax.jit(
        lambda p, o, b: train_step(p, o, cfg, tx, b))(params, opt_state, batch)

    sp = sharding.shard_params(params, cfg, mesh)
    sb = sharding.shard_batch(batch, cfg, mesh)
    step = sharding.make_sharded_train_step(cfg, tx, params, mesh)
    p2, o2, m2 = step(sp, tx.init(sp), sb, None)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_sharded_train_step_mixed_precision():
    """bf16 mixed precision must compose with the mesh train step: the
    sharded bf16 loss tracks the single-device bf16 loss and master
    params stay f32 on the mesh."""
    cfg = mesh_cfg().with_("train", compute_dtype="bfloat16")
    mesh = sharding.make_mesh(cfg)
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(cfg.train)
    batch = make_batch(cfg, B=8)

    _, _, m1 = jax.jit(
        lambda p, o, b: train_step(p, o, cfg, tx, b))(params, tx.init(params),
                                                      batch)
    sp = sharding.shard_params(params, cfg, mesh)
    step = sharding.make_sharded_train_step(cfg, tx, params, mesh)
    p2, _, m2 = step(sp, tx.init(sp), sharding.shard_batch(batch, cfg, mesh),
                     None)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-2)
    assert np.isfinite(float(m2["loss"]))
    for leaf in jax.tree_util.tree_leaves(p2):
        assert leaf.dtype == jnp.float32, leaf.dtype


def test_sharded_greedy_matches_single_device():
    cfg = mesh_cfg()
    mesh = sharding.make_mesh(cfg)
    params = las.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(0)
    B, T = 8, 9
    feats = rng.randn(B, T, cfg.audio.feat_dim).astype(np.float32)
    lens = np.full(B, T, np.int32)

    r1 = greedy.greedy_decode_jit(params, cfg, jnp.asarray(feats),
                                  jnp.asarray(lens))
    run = sharding.make_sharded_greedy(cfg, params, mesh)
    sp = sharding.shard_params(params, cfg, mesh)
    r2 = run(sp, jnp.asarray(feats), jnp.asarray(lens))

    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r2.tokens))
    np.testing.assert_array_equal(np.asarray(r1.final_lens),
                                  np.asarray(r2.final_lens))


def test_sharded_beam_matches_single_device():
    cfg = mesh_cfg()
    mesh = sharding.make_mesh(cfg)
    params = las.init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.RandomState(1)
    B, T = 8, 9
    feats = rng.randn(B, T, cfg.audio.feat_dim).astype(np.float32)
    lens = np.full(B, T, np.int32)

    from chinese_asr_tpu.decode import beam
    r1 = beam.beam_decode_jit(params, cfg, 2, jnp.asarray(feats),
                              jnp.asarray(lens))
    run = sharding.make_sharded_beam(cfg, 2, params, mesh)
    sp = sharding.shard_params(params, cfg, mesh)
    r2 = run(sp, jnp.asarray(feats), jnp.asarray(lens))

    np.testing.assert_array_equal(np.asarray(r1.live_tokens),
                                  np.asarray(r2.live_tokens))
    np.testing.assert_array_equal(np.asarray(r1.fin_count),
                                  np.asarray(r2.fin_count))
    np.testing.assert_allclose(np.asarray(r1.fin_scores),
                               np.asarray(r2.fin_scores), rtol=1e-5, atol=1e-6)


def test_trainer_on_mesh(tmp_path):
    """Full Trainer loop compiled over the 8-device mesh."""
    from chinese_asr_tpu.train.trainer import Trainer
    from chinese_asr_tpu.vocab import Vocab
    from test_train import make_batch

    cfg = (mesh_cfg()
           .with_("train", batch_size=8, eval_batch_size=8, epochs=1,
                  num_eval_steps=-1, save_dir=str(tmp_path / "ck")))
    mesh = sharding.make_mesh(cfg)
    params = las.init_params(jax.random.PRNGKey(0), cfg)
    vocab = Vocab.build(["abcdefghijklmnop"],
                        max_num_words=cfg.vocab.max_num_words)
    tr = Trainer(cfg, params, vocab, mesh=mesh)
    batch = make_batch(cfg, B=8)

    def loader():
        for _ in range(3):
            yield batch

    tv = tr.fit(loader, None, max_steps=3)
    assert tv.step == 3 and np.isfinite(tv.loss)


def test_asr_api_serves_over_mesh():
    """ASR(mesh=...) routes greedy/beam decode through the sharded SPMD
    programs with identical transcripts, including batch sizes that do
    not divide the data axis (padded + trimmed) and the chunked path."""
    from chinese_asr_tpu.api import ASR, _identity_vocab

    cfg = mesh_cfg()
    mesh = sharding.make_mesh(cfg)
    rng = np.random.RandomState(0)
    wavs = [(rng.randn(n) * 6000).clip(-32768, 32767).astype(np.int16)
            for n in (1700, 900, 2400, 1300, 800, 2000, 1500, 600, 1100)]

    for bw in (None, 2):
        a1 = ASR(cfg=cfg, bw=bw, vocab=_identity_vocab(cfg.vocab.vocab_size),
                 wav_bucket=800)
        am = ASR(cfg=cfg, bw=bw, vocab=_identity_vocab(cfg.vocab.vocab_size),
                 wav_bucket=800, mesh=mesh)
        t1 = a1.transcribe_wavs(wavs)                   # single batch
        tm = am.transcribe_wavs(wavs)                   # padded to dp=4
        assert tm == t1, f"bw={bw}"
        t1c = a1.transcribe_wavs(wavs, max_batch=4)     # chunked
        tmc = am.transcribe_wavs(wavs, max_batch=5)     # clamped to 4
        assert tmc == t1c, f"bw={bw} chunked"


def test_asr_api_mesh_with_second_pass(tmp_path):
    """Mesh serving through the LM second-pass path, BOTH variants:
    the default on-device rescore (sharded beam decode, device-side
    compaction, replicated LM tables, device selection) and the
    "second_host" C++ rescore — each equal to its single-device
    twin, and device == host transcripts."""
    import sys
    sys.path.insert(0, "tests")
    from test_lm_binary import ARPA_TRI
    from chinese_asr_tpu.api import ASR, _identity_vocab

    arpa = tmp_path / "t.arpa"
    arpa.write_text(ARPA_TRI, encoding="utf-8")
    cfg = mesh_cfg()
    mesh = sharding.make_mesh(cfg)
    rng = np.random.RandomState(1)
    wavs = [(rng.randn(n) * 6000).clip(-32768, 32767).astype(np.int16)
            for n in (1500, 900, 1900, 700, 1200)]
    outs = {}
    for mode in ("second", "second_host"):
        kw = dict(cfg=cfg, bw=2, lm_path=str(arpa), lm_mode=mode,
                  wav_bucket=800,
                  vocab=_identity_vocab(cfg.vocab.vocab_size))
        t1 = ASR(**kw).transcribe_wavs(wavs)
        tm = ASR(mesh=mesh, **kw).transcribe_wavs(wavs)
        assert tm == t1, mode
        outs[mode] = t1
    assert outs["second"] == outs["second_host"]


def test_sharded_lm_fused_matches_single_device(tmp_path):
    """The fused on-device-LM decode over the mesh: n-gram tables
    replicate (read-only gathers, no collectives), batch/beam dims
    shard — outputs equal the single-device fused decode."""
    import jax.numpy as jnp

    from chinese_asr_tpu.decode import lm_fused
    from chinese_asr_tpu.lm.device_ngram import DeviceNgramLM
    from test_lm_fused import (SMALL as LM_SMALL, make_vocab,
                               random_trigram_arpa)

    cfg = LM_SMALL.with_("mesh", data_parallel=4, model_parallel=2)
    mesh = sharding.make_mesh(cfg)
    vocab = make_vocab()
    rng = np.random.RandomState(31)
    dlm = DeviceNgramLM.from_arpa(random_trigram_arpa(tmp_path, rng, 31))
    tok2lm = jnp.asarray(dlm.token_id_table(vocab))
    params = las.init_params(jax.random.PRNGKey(31), cfg)
    B, T = 8, 7
    feats = jnp.asarray(rng.randn(B, T, cfg.audio.feat_dim)
                        .astype(np.float32))
    lens = jnp.asarray(np.full(B, T, np.int32))

    r1 = lm_fused.lm_fused_decode_jit(params, cfg, 2, feats, lens, dlm,
                                      tok2lm, topn=6)
    run = sharding.make_sharded_lm_fused(cfg, 2, params, mesh, dlm, topn=6)
    sp = sharding.shard_params(params, cfg, mesh)
    r2 = run(sp, feats, lens, dlm, tok2lm)

    np.testing.assert_array_equal(np.asarray(r1.fin_tokens),
                                  np.asarray(r2.fin_tokens))
    np.testing.assert_array_equal(np.asarray(r1.live_tokens),
                                  np.asarray(r2.live_tokens))
    np.testing.assert_allclose(np.asarray(r1.fin_scores),
                               np.asarray(r2.fin_scores),
                               rtol=1e-5, atol=1e-6)


def test_asr_api_mesh_lm_first_pass(tmp_path):
    """Mesh serving through the FUSED on-device-LM first pass: same
    transcripts as the single-device ASR in the same mode, including a
    batch size that needs data-axis padding."""
    import sys
    sys.path.insert(0, "tests")
    from test_lm_binary import ARPA_TRI

    from chinese_asr_tpu.api import ASR, _identity_vocab

    arpa = tmp_path / "t.arpa"
    arpa.write_text(ARPA_TRI, encoding="utf-8")
    cfg = mesh_cfg()
    mesh = sharding.make_mesh(cfg)
    rng = np.random.RandomState(2)
    wavs = [(rng.randn(n) * 6000).clip(-32768, 32767).astype(np.int16)
            for n in (1500, 900, 1900, 700, 1200)]
    kw = dict(cfg=cfg, bw=2, lm_path=str(arpa), lm_mode="first",
              lm_topn=6, wav_bucket=800,
              vocab=_identity_vocab(cfg.vocab.vocab_size))
    a1 = ASR(**kw)
    am = ASR(**kw, mesh=mesh)
    assert a1.dlm is not None and am.dlm is not None
    t1 = a1.transcribe_wavs(wavs)
    tm = am.transcribe_wavs(wavs)
    assert tm == t1
