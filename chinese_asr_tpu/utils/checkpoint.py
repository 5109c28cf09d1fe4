"""Checkpoint save/load + run-directory management.

Mirrors the reference's checkpoint subsystem (reference model.py:347-369
save/load; util.py:1591-1621 ``Checkpoint`` filename discovery;
util.py:2356-2363 ``TrainVar`` resume state; util.py:691-723 ``view_ckpt``)
with a JAX pytree payload: every leaf is converted to numpy and pickled
together with the config JSON, so a checkpoint is self-describing and loads
with no framework state.

Filename contract kept verbatim: ``step-{step}_wer-{wer:.5f}.ckpt`` — the
manager finds the best/latest checkpoint by parsing names, exactly like the
reference (util.py:1600-1618).
"""

from __future__ import annotations

import dataclasses
import os
import pickle
import re
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np


@dataclass
class TrainVar:
    """Resume state (reference util.py:2356-2363)."""

    step: int = 0
    loss: float = 0.0
    best_wer: float = float("inf")
    lr: float = 1e-3
    duration: float = 0.0        # accumulated train seconds
    num_no_imprv: int = 0

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "TrainVar":
        fields = {f.name for f in dataclasses.fields(TrainVar)}
        return TrainVar(**{k: v for k, v in d.items() if k in fields})


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params, opt_state=None,
                    train_var: Optional[TrainVar] = None,
                    config_json: Optional[str] = None,
                    extra: Optional[Dict[str, Any]] = None) -> None:
    """Write a checkpoint (reference Model.save, model.py:347-355 writes
    {encoder/decoder/optimizer state_dicts, args}; here one params pytree
    replaces the two state dicts)."""
    payload = {
        "format": "chinese_asr_tpu.v1",
        "params": _to_numpy(params),
        "opt_state": None if opt_state is None else _to_numpy(opt_state),
        "train_var": None if train_var is None else train_var.to_dict(),
        "config_json": config_json,
        "extra": extra or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if payload.get("format") != "chinese_asr_tpu.v1":
        raise ValueError(f"not a chinese_asr_tpu checkpoint: {path}")
    if payload.get("train_var") is not None:
        payload["train_var"] = TrainVar.from_dict(payload["train_var"])
    return payload


def view_ckpt(path: str) -> List[Tuple[str, Tuple[int, ...], str]]:
    """Inspector (reference util.py:691-723 / test.py:16-21): list of
    (flat name, shape, dtype) for every tensor in the checkpoint."""
    payload = load_checkpoint(path)
    out = []
    flat = jax.tree_util.tree_flatten_with_path(payload["params"])[0]
    for kp, leaf in flat:
        name = jax.tree_util.keystr(kp)
        out.append((name, tuple(np.shape(leaf)), str(np.asarray(leaf).dtype)))
    return out


# --------------------------------------------------------------------------
# run-directory manager (reference Checkpoint, util.py:1591-1621)
# --------------------------------------------------------------------------
_CKPT_RE = re.compile(r"^step-(\d+)_wer-([0-9.]+?)\.ckpt$")


class CheckpointManager:
    def __init__(self, save_dir: str, keep: int = 0):
        self.save_dir = save_dir
        self.keep = keep
        os.makedirs(save_dir, exist_ok=True)

    def _entries(self) -> List[Tuple[int, float, str]]:
        out = []
        for name in os.listdir(self.save_dir):
            m = _CKPT_RE.match(name)
            if m:
                out.append((int(m.group(1)), float(m.group(2)),
                            os.path.join(self.save_dir, name)))
        return out

    def latest_checkpoint(self) -> Optional[str]:
        entries = self._entries()
        return max(entries, key=lambda e: e[0])[2] if entries else None

    def best_checkpoint(self) -> Optional[str]:
        entries = self._entries()
        return min(entries, key=lambda e: e[1])[2] if entries else None

    def path_for(self, step: int, wer: float) -> str:
        return os.path.join(self.save_dir, f"step-{step}_wer-{wer:.5f}.ckpt")

    def save(self, step: int, wer: float, params, opt_state=None,
             train_var: Optional[TrainVar] = None,
             config_json: Optional[str] = None) -> str:
        path = self.path_for(step, wer)
        save_checkpoint(path, params, opt_state, train_var, config_json)
        if self.keep > 0:
            self._gc()
        return path

    def _gc(self) -> None:
        """Keep the best + the ``keep`` latest checkpoints."""
        entries = self._entries()
        if len(entries) <= self.keep:
            return
        best = min(entries, key=lambda e: e[1])[2]
        latest = [e[2] for e in sorted(entries, key=lambda e: -e[0])[: self.keep]]
        for _, _, p in entries:
            if p != best and p not in latest:
                try:
                    os.remove(p)
                except OSError:
                    pass
