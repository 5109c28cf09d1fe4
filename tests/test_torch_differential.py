"""Differential tests vs PyTorch (the reference's runtime, available CPU-only
here): the torch-checkpoint converter (las.params_from_torch_state) plus our
masked-scan encoder / cell stack / attention must reproduce torch modules
carrying the same weights — the SURVEY section 4 tier-1 test strategy.

Weight layout contract being validated (reference model.py:347-369 schema,
test.py:16-21 names):
  encoder:  rnn.rnn.{i}.weight_ih_l0[(_reverse)], weight_hh_l0, bias_*
  decoder:  embedding.weight, cell.cell.{i}.weight_ih/hh, bias_ih/hh,
            proj_linear.weight/bias, attn_mechanism.{W_enc,b_attn,W_hidden,v}
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from chinese_asr_tpu.config import Config
from chinese_asr_tpu.models import las
from chinese_asr_tpu.models import encoder as enc_ops
from chinese_asr_tpu.models import decoder as dec_ops
from chinese_asr_tpu.models import attention as attn_ops

CFG = (Config()
       .with_("audio", n_mels=8, delta_delta=False, downsample=False)
       .with_("encoder", hidden_size=12, num_layers=3)
       .with_("decoder", hidden_size=24, embed_dim=10)
       .with_("attention", attn_size=7)
       .with_("vocab", max_num_words=16))


def torch_state_dicts(cfg, seed=0):
    """Random tensors under the reference state-dict names."""
    g = torch.Generator().manual_seed(seed)
    ecfg, dcfg, acfg, vcfg = cfg.encoder, cfg.decoder, cfg.attention, cfg.vocab
    D, H = cfg.audio.feat_dim, ecfg.hidden_size
    enc_sd = {}
    for i in range(ecfg.num_layers):
        in_sz = D if i == 0 else 2 * H
        for suf in ("", "_reverse"):
            enc_sd[f"rnn.rnn.{i}.weight_ih_l0{suf}"] = torch.randn(4 * H, in_sz, generator=g) * 0.2
            enc_sd[f"rnn.rnn.{i}.weight_hh_l0{suf}"] = torch.randn(4 * H, H, generator=g) * 0.2
            enc_sd[f"rnn.rnn.{i}.bias_ih_l0{suf}"] = torch.randn(4 * H, generator=g) * 0.1
            enc_sd[f"rnn.rnn.{i}.bias_hh_l0{suf}"] = torch.randn(4 * H, generator=g) * 0.1
    V = vcfg.vocab_size
    enc_size = 2 * H
    ctx = enc_size
    dec_in = dcfg.embed_dim + ctx
    dec_sd = {
        "embedding.weight": torch.randn(V, dcfg.embed_dim, generator=g) * 0.2,
        "proj_linear.weight": torch.randn(V, dcfg.hidden_size + ctx, generator=g) * 0.2,
        "proj_linear.bias": torch.randn(V, generator=g) * 0.1,
        "attn_mechanism.W_enc": torch.randn(enc_size, acfg.attn_size, generator=g) * 0.2,
        "attn_mechanism.b_attn": torch.randn(acfg.attn_size, generator=g) * 0.1,
        "attn_mechanism.W_hidden": torch.randn(dcfg.hidden_size, acfg.attn_size, generator=g) * 0.2,
        "attn_mechanism.v": torch.randn(acfg.attn_size, generator=g) * 0.2,
    }
    for i in range(dcfg.num_layers):
        in_sz = dec_in if i == 0 else dcfg.hidden_size
        dec_sd[f"cell.cell.{i}.weight_ih"] = torch.randn(4 * dcfg.hidden_size, in_sz, generator=g) * 0.2
        dec_sd[f"cell.cell.{i}.weight_hh"] = torch.randn(4 * dcfg.hidden_size, dcfg.hidden_size, generator=g) * 0.2
        dec_sd[f"cell.cell.{i}.bias_ih"] = torch.randn(4 * dcfg.hidden_size, generator=g) * 0.1
        dec_sd[f"cell.cell.{i}.bias_hh"] = torch.randn(4 * dcfg.hidden_size, generator=g) * 0.1
    return enc_sd, dec_sd


@pytest.fixture(scope="module")
def converted():
    enc_sd, dec_sd = torch_state_dicts(CFG)
    params = las.params_from_torch_state(
        {k: v.numpy() for k, v in enc_sd.items()},
        {k: v.numpy() for k, v in dec_sd.items()}, CFG)
    return enc_sd, dec_sd, params


def test_encoder_matches_torch_packed_lstm(converted):
    """Our masked bidirectional scan stack vs torch nn.LSTM over packed
    sequences with residual adds (reference RNN_RES semantics,
    util.py:1249-1291)."""
    enc_sd, _, params = converted
    cfg = CFG
    H = cfg.encoder.hidden_size
    rng = np.random.RandomState(0)
    B, T, D = 3, 9, cfg.audio.feat_dim
    x = rng.randn(B, T, D).astype(np.float32)
    lens = np.array([9, 6, 4], np.int32)
    for i, l in enumerate(lens):
        x[i, l:] = 0.0

    # torch reference: per-layer packed bidir LSTM + residual from layer 1
    xt = torch.from_numpy(x)
    packed_lens = torch.from_numpy(lens.astype(np.int64))
    cur = xt
    final_state = None
    with torch.no_grad():
        for i in range(cfg.encoder.num_layers):
            lstm = torch.nn.LSTM(cur.shape[-1], H, 1, batch_first=True,
                                 bidirectional=True)
            sd = {k.replace(f"rnn.rnn.{i}.", ""): v
                  for k, v in enc_sd.items() if k.startswith(f"rnn.rnn.{i}.")}
            lstm.load_state_dict(sd)
            packed = torch.nn.utils.rnn.pack_padded_sequence(
                cur, packed_lens, batch_first=True, enforce_sorted=False)
            out, (h, c) = lstm(packed)
            y, _ = torch.nn.utils.rnn.pad_packed_sequence(
                out, batch_first=True, total_length=T)
            cur = cur + y if i > 0 else y
            final_state = (h, c)
        h, c = final_state
        # [2, B, H] -> [B, 2H] (directions concatenated)
        ref_h = h.transpose(0, 1).reshape(B, -1).numpy()
        ref_c = c.transpose(0, 1).reshape(B, -1).numpy()
        ref_y = cur.numpy()

    out = enc_ops.apply_encoder(params["encoder"], cfg, jnp.asarray(x),
                                jnp.asarray(lens))
    got_y = np.asarray(out.out)
    for i, l in enumerate(lens):
        np.testing.assert_allclose(got_y[i, :l], ref_y[i, :l],
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.state[0]), ref_h,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.state[1]), ref_c,
                               rtol=1e-4, atol=1e-5)


def test_decoder_step_matches_torch_cells(converted):
    """One decode step: embedding + input feeding + LSTMCell stack +
    Bahdanau attention + projection vs torch ops on the same weights."""
    enc_sd, dec_sd, params = converted
    cfg = CFG
    dcfg, acfg = cfg.decoder, cfg.attention
    B, L = 3, 7
    enc_size = 2 * cfg.encoder.hidden_size
    rng = np.random.RandomState(1)
    enc_out = rng.randn(B, L, enc_size).astype(np.float32)
    lens = np.array([7, 5, 3], np.int32)
    token = np.array([4, 9, 2], np.int32)
    attn_hidden = rng.randn(B, enc_size).astype(np.float32)
    h0 = rng.randn(B, dcfg.hidden_size).astype(np.float32)
    c0 = rng.randn(B, dcfg.hidden_size).astype(np.float32)

    # --- torch reference --------------------------------------------------
    with torch.no_grad():
        W_enc = dec_sd["attn_mechanism.W_enc"]
        b_attn = dec_sd["attn_mechanism.b_attn"]
        W_hidden = dec_sd["attn_mechanism.W_hidden"]
        v = dec_sd["attn_mechanism.v"]
        eo = torch.from_numpy(enc_out)
        keys = eo @ W_enc + b_attn                       # [B, L, a]
        emb = dec_sd["embedding.weight"][torch.from_numpy(token).long()]
        x = torch.cat([emb, torch.from_numpy(attn_hidden)], dim=1)
        cell = torch.nn.LSTMCell(x.shape[-1], dcfg.hidden_size)
        cell.load_state_dict({
            "weight_ih": dec_sd["cell.cell.0.weight_ih"],
            "weight_hh": dec_sd["cell.cell.0.weight_hh"],
            "bias_ih": dec_sd["cell.cell.0.bias_ih"],
            "bias_hh": dec_sd["cell.cell.0.bias_hh"]})
        h, c = cell(x, (torch.from_numpy(h0), torch.from_numpy(c0)))
        q = h @ W_hidden                                  # [B, a]
        e = (torch.tanh(keys + q[:, None]) * v).sum(-1)   # [B, L]
        mask = torch.zeros(B, L)
        for i, l in enumerate(lens):
            mask[i, l:] = float("-inf")
        align = torch.softmax(e + mask, dim=1)
        context = (align[..., None] * eo).sum(1)
        logit = torch.cat([h, context], 1) @ dec_sd["proj_linear.weight"].T \
            + dec_sd["proj_linear.bias"]

    # --- ours ---------------------------------------------------------------
    from chinese_asr_tpu.ops.masks import softmax_mask
    keys_j, values_j = attn_ops.compute_key_value(
        params["attention"], acfg, jnp.asarray(enc_out))
    out = dec_ops.decoder_step(
        params["decoder"], params["attention"], dcfg, acfg,
        softmax_mask(jnp.asarray(lens), L), keys_j, values_j,
        jnp.asarray(token),
        [(jnp.asarray(h0), jnp.asarray(c0))], jnp.asarray(attn_hidden))

    np.testing.assert_allclose(np.asarray(out.logit), logit.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.alignment), align.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.attn_hidden_state),
                               context.numpy(), rtol=1e-4, atol=1e-5)


def test_torch_ckpt_file_roundtrip(tmp_path, converted):
    """load_torch_checkpoint reads a torch.save'd reference-schema file."""
    enc_sd, dec_sd, params = converted
    path = str(tmp_path / "ref.ckpt")
    torch.save({"encoder_state_dict": enc_sd, "decoder_state_dict": dec_sd,
                "optimizer_state_dict": {}, "args": None}, path)
    loaded = las.load_torch_checkpoint(path, CFG)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # ASR auto-detects the torch format
    from chinese_asr_tpu.api import ASR
    asr = ASR(ckpt_path=path, cfg=CFG, wav_bucket=4800)
    assert asr.params is not None


def test_featurizer_matches_torch_stft():
    """Our two-matmul framed DFT vs torch.stft with the reference's exact
    settings (data.py:205-224): n_fft=512, hop=160, win=400, hann,
    center=False, onesided, power, mel, eps-floor, log."""
    from chinese_asr_tpu.audio import features
    cfg = Config().audio
    rng = np.random.RandomState(0)
    wav = (0.1 * rng.randn(16000)).astype(np.float32)

    with torch.no_grad():
        t = torch.from_numpy(wav)
        t = t[1:] - cfg.preemphasis * t[:-1]
        spec = torch.stft(t, n_fft=512, hop_length=160, win_length=400,
                          window=torch.hann_window(400), center=False,
                          onesided=True, return_complex=True)
        power = spec.abs() ** 2                          # [257, T]
        fb = torch.from_numpy(features.mel_filterbank(257, cfg.f_min,
                                                      cfg.f_max, cfg.n_mels))
        mel = power.T @ fb                               # [T, 80]
        mel = torch.where(mel == 0, torch.finfo(torch.float32).eps, mel)
        ref = torch.log(mel).numpy()

    T = features.num_frames(len(wav), cfg)
    got = np.asarray(features.log_mel(jnp.asarray(wav), T, cfg))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_encoder_gradients_match_torch(converted):
    """Gradient-tier differential (the reference's test_lstm checks
    forward+grad equality vs nn.LSTM, util.py:2834-2876): d(sum of valid
    encoder outputs)/d(input) must match torch autograd through the packed
    bidirectional stack."""
    enc_sd, _, params = converted
    cfg = CFG
    H = cfg.encoder.hidden_size
    rng = np.random.RandomState(3)
    B, T, D = 2, 7, cfg.audio.feat_dim
    x = rng.randn(B, T, D).astype(np.float32)
    lens = np.array([7, 4], np.int32)
    for i, l in enumerate(lens):
        x[i, l:] = 0.0

    # torch grad
    xt = torch.from_numpy(x).requires_grad_(True)
    cur = xt
    packed_lens = torch.from_numpy(lens.astype(np.int64))
    for i in range(cfg.encoder.num_layers):
        lstm = torch.nn.LSTM(cur.shape[-1], H, 1, batch_first=True,
                             bidirectional=True)
        sd = {k.replace(f"rnn.rnn.{i}.", ""): v
              for k, v in enc_sd.items() if k.startswith(f"rnn.rnn.{i}.")}
        lstm.load_state_dict(sd)
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            cur, packed_lens, batch_first=True, enforce_sorted=False)
        out, _ = lstm(packed)
        y, _ = torch.nn.utils.rnn.pad_packed_sequence(
            out, batch_first=True, total_length=T)
        cur = cur + y if i > 0 else y
    loss_t = cur.sum()
    loss_t.backward()
    ref_grad = xt.grad.numpy()

    # jax grad
    def loss_fn(feats):
        out = enc_ops.apply_encoder(params["encoder"], cfg, feats,
                                    jnp.asarray(lens))
        return out.out.sum()

    got_grad = np.asarray(jax.grad(loss_fn)(jnp.asarray(x)))
    # padding positions contribute nothing in both systems
    np.testing.assert_allclose(got_grad, ref_grad, rtol=1e-3, atol=1e-4)


def test_torch_export_roundtrip(tmp_path):
    """save_torch_checkpoint (reference schema) -> load_torch_checkpoint
    reproduces the exact params pytree, including the learned decoder init
    state."""
    import jax as _jax
    for cfg in (CFG,
                CFG.with_("decoder", init_cell_state_as_param=True)):
        params = las.init_params(_jax.random.PRNGKey(3), cfg)
        path = str(tmp_path / "export.ckpt")
        las.save_torch_checkpoint(path, params, cfg)
        loaded = las.load_torch_checkpoint(path, cfg)
        la, lb = (_jax.tree_util.tree_leaves(params),
                  _jax.tree_util.tree_leaves(loaded))
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
