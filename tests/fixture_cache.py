"""Disk cache for expensive overfit-training test fixtures (VERDICT r3 #3).

Several tests train the same tiny model to convergence (250-300 compiled
steps, tens of seconds each on the 1-core CPU suite) only to use the
resulting *confident* parameters for transcript-parity assertions
(test_bf16.py, test_wire.py).  ``cached_overfit`` runs the training
closure once and stores the parameter pytree under
``tests/.fixture_cache/`` keyed on a recipe tag plus the full Config
JSON, so later runs (and later tests in the same run wanting the same
regime) load it in milliseconds.

Safety: the convergence assertion runs inside the training closure (on
miss), and every parity assertion downstream re-derives its expectations
from the loaded params, so a stale-but-converged entry cannot fake a
pass.  A params STRUCTURE change makes the load fail and falls back to
retraining.  Bump the recipe tag (``_v2``) when changing a recipe's
semantics; delete tests/.fixture_cache to force retraining everywhere.
"""

from __future__ import annotations

import hashlib
import os

import jax
import jax.numpy as jnp

from chinese_asr_tpu.utils import checkpoint

_DIR = os.path.join(os.path.dirname(__file__), ".fixture_cache")


def cached_overfit(recipe: str, cfg, train_fn):
    """Return ``train_fn()``'s params, cached on (recipe, cfg)."""
    key = hashlib.sha1(
        (recipe + "|" + cfg.to_json()).encode()).hexdigest()[:16]
    path = os.path.join(_DIR, f"{recipe}-{key}.ckpt")
    if os.path.exists(path):
        try:
            loaded = checkpoint.load_checkpoint(path)["params"]
            return jax.tree_util.tree_map(jnp.asarray, loaded)
        except Exception:
            pass                     # corrupt/stale structure: retrain
    params = train_fn()
    os.makedirs(_DIR, exist_ok=True)
    tmp = path + f".tmp{os.getpid()}"   # unique per xdist worker
    checkpoint.save_checkpoint(tmp, params)
    os.replace(tmp, path)            # atomic: no torn cache entries
    return params
