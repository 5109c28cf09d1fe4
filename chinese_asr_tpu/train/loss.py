"""Losses (reference util.py:265-295 label smoothing; model.py:53-56 CE).

Label-smoothed cross entropy computed directly from logits with a single
logsumexp — the reference's optimized form (util.py:265-279): the smoothed
target distribution puts (1 - ls) on the target class and ls/(K-1) on each
of the K-1 non-target classes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def label_smoothed_ce(logits, targets, mask=None, label_smooth: float = 0.1):
    """Per-token smoothed CE, averaged over valid tokens.

    logits [..., V]; targets [...] int; mask [...] (1 valid / 0 pad).
    With label_smooth == 0 this is exact cross entropy (model.py:53-56).
    """
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    if label_smooth == 0.0:
        per_tok = lse - tgt
    else:
        K = logits.shape[-1]
        off = label_smooth / (K - 1)
        per_tok = lse - (1.0 - label_smooth) * tgt - off * (logits.sum(axis=-1) - tgt)
    if mask is None:
        return per_tok.mean()
    mask = mask.astype(per_tok.dtype)
    return (per_tok * mask).sum() / jnp.maximum(mask.sum(), 1.0)
