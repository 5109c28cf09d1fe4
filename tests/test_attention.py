"""Attention: golden determinism (reference attention.py:114-137 pattern) +
differential vs a torch re-expression of the Bahdanau formula."""

import numpy as np
import torch

import jax.numpy as jnp

from chinese_asr_tpu.config import AttentionConfig
from chinese_asr_tpu.models import attention as A
from chinese_asr_tpu.ops.masks import softmax_mask


def ones_params(cfg, enc_size, dec_hidden):
    p = {
        "w_enc": jnp.ones((enc_size, cfg.attn_size)),
        "b_attn": jnp.ones((cfg.attn_size,)),
        "w_hidden": jnp.ones((dec_hidden, cfg.attn_size)),
        "v": jnp.ones((cfg.attn_size,)),
    }
    if cfg.map_enc:
        p["map_enc"] = jnp.ones((enc_size, cfg.attn_size))
    return p


def test_golden_ones_multihead_map_enc():
    """Reference test_attn config (l=100, b=4, enc=512, heads=4, map_enc,
    dec hidden 256, all-ones): context.sum() == 262143.98 (measured by
    running the reference under torch 2.13; the 2048.0002 comment at
    attention.py:136 is stale)."""
    cfg = AttentionConfig(heads=4, map_enc=True)
    l, b, enc_size, dec_hidden = 100, 4, 512, 256
    p = ones_params(cfg, enc_size, dec_hidden)
    enc = jnp.ones((b, l, enc_size))
    hidden = jnp.ones((b, dec_hidden))
    mask = softmax_mask(jnp.full((b,), l), l)
    keys, values = A.compute_key_value(p, cfg, enc)
    context, align = A.attend(p, cfg, mask, hidden, keys, values)
    assert abs(float(context.sum()) - 262144.0) < 1.0
    np.testing.assert_allclose(np.asarray(align.sum(axis=1)), 1.0, atol=1e-5)


def test_single_head_matches_torch_formula():
    """score = v . tanh(enc W_enc + b + h W_h), softmax over time with -inf
    padding, context = sum(align * values) (attention.py:92-95)."""
    rng = np.random.RandomState(0)
    cfg = AttentionConfig()
    b, l, enc_size, H, a = 3, 7, 10, 6, 4
    cfg = AttentionConfig(attn_size=a)
    W_enc = rng.randn(enc_size, a).astype(np.float32)
    b_attn = rng.randn(a).astype(np.float32)
    W_h = rng.randn(H, a).astype(np.float32)
    v = rng.randn(a).astype(np.float32)
    enc = rng.randn(b, l, enc_size).astype(np.float32)
    h = rng.randn(b, H).astype(np.float32)
    lens = np.array([7, 4, 6], np.int32)

    # torch reference (time-major like the reference module)
    te = torch.tensor(enc).transpose(0, 1)                        # [l, b, d]
    keys_t = torch.matmul(te, torch.tensor(W_enc)) + torch.tensor(b_attn)
    sc = (torch.tanh(keys_t + torch.tensor(h) @ torch.tensor(W_h))
          * torch.tensor(v)).sum(dim=2)                           # [l, b]
    m = torch.zeros(l, b)
    for i, ln in enumerate(lens):
        m[ln:, i] = -np.inf
    al = torch.softmax(m + sc, dim=0)
    ctx_t = (al[..., None] * te).sum(dim=0).numpy()               # [b, d]

    p = {"w_enc": jnp.asarray(W_enc), "b_attn": jnp.asarray(b_attn),
         "w_hidden": jnp.asarray(W_h), "v": jnp.asarray(v)}
    mask = softmax_mask(jnp.asarray(lens), l)
    keys, values = A.compute_key_value(p, cfg, jnp.asarray(enc))
    ctx, align = A.attend(p, cfg, mask, jnp.asarray(h), keys, values)
    np.testing.assert_allclose(np.asarray(ctx), ctx_t, atol=1e-5)
    # alignment zero at padding
    assert float(np.asarray(align)[1, 4:].max()) == 0.0
