"""Optimizers + LR control (reference model.py:105-119, util.py:673-688,
util.py:2124-2353).

* ``make_optimizer`` — ADAM / SGD selection with torch-style L2 (weight
  decay added to the gradient before the moment updates, matching
  ``torch.optim.Adam(weight_decay=l2)`` used at reference model.py:106-110).
* ``adabound`` / ``adaboundw`` — first-party optax re-implementations of the
  AdaBound optimizers the reference vendors (util.py:2124-2353): Adam whose
  per-parameter step size is clipped into a band that tightens toward a
  final SGD learning rate.
* ``PlateauLR`` — reduce-on-plateau controller (util.py:673-688): after
  ``patience`` evals without sufficient improvement, lr <- max(lr * factor,
  min_lr).  Host-side state; the live lr is injected via
  ``optax.inject_hyperparams``.
* ``ramp_up_lr`` — linear warmup factor (model.py:185-187).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import TrainConfig


# --------------------------------------------------------------------------
# AdaBound (Luo et al. 2019), matching the torch reference semantics
# --------------------------------------------------------------------------
class AdaBoundState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def _adabound_core(learning_rate: float, final_lr: float, b1: float, b2: float,
                   gamma: float, eps: float, weight_decay: float,
                   decoupled: bool) -> optax.GradientTransformation:
    def init(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdaBoundState(jnp.zeros([], jnp.int32), zeros(), zeros())

    def update(grads, state, params=None):
        count = state.count + 1
        t = count.astype(jnp.float32)
        if weight_decay and not decoupled:
            grads = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, grads, params)
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
        bc1 = 1 - b1 ** t
        bc2 = 1 - b2 ** t
        # the torch code folds bias correction into the step size
        step_size = learning_rate * jnp.sqrt(bc2) / bc1
        # bound band converging to final_lr (the SGD rate)
        lower = final_lr * (1 - 1 / (gamma * t + 1))
        upper = final_lr * (1 + 1 / (gamma * t))

        def upd(m, v):
            denom = jnp.sqrt(v) + eps
            eta = jnp.clip(step_size / denom, lower, upper)
            return -eta * m

        updates = jax.tree_util.tree_map(upd, mu, nu)
        if weight_decay and decoupled:
            updates = jax.tree_util.tree_map(
                lambda u, p: u - learning_rate * weight_decay * p,
                updates, params)
        return updates, AdaBoundState(count, mu, nu)

    return optax.GradientTransformation(init, update)


def adabound(learning_rate: float = 1e-3, final_lr: float = 0.1,
             b1: float = 0.9, b2: float = 0.999, gamma: float = 1e-3,
             eps: float = 1e-8, weight_decay: float = 0.0):
    """AdaBound (reference util.py:2124-2237)."""
    return _adabound_core(learning_rate, final_lr, b1, b2, gamma, eps,
                          weight_decay, decoupled=False)


def adaboundw(learning_rate: float = 1e-3, final_lr: float = 0.1,
              b1: float = 0.9, b2: float = 0.999, gamma: float = 1e-3,
              eps: float = 1e-8, weight_decay: float = 0.0):
    """AdaBoundW — decoupled weight decay variant (util.py:2240-2353)."""
    return _adabound_core(learning_rate, final_lr, b1, b2, gamma, eps,
                          weight_decay, decoupled=True)


# --------------------------------------------------------------------------
# optimizer factory (reference model.py:105-119)
# --------------------------------------------------------------------------
def fine_tune_mask(params):
    """Trainable mask for fine_tune mode: only the output projection and
    the attention parameters update (the reference's fine-tune intent,
    model.py:62-66 — its published branches are identical, the commented
    one trains proj_linear + attention only)."""
    def trainable(path, leaf):
        names = {getattr(p, "key", getattr(p, "name", "")) for p in path}
        return bool(names & {"proj_w", "proj_b", "attention"})
    import jax
    return jax.tree_util.tree_map_with_path(trainable, params)


def buffer_mask(params):
    """True for gradient-trained parameters, False for buffers (BatchNorm
    running stats) — torch never applies the optimizer or weight decay to
    buffers; they move only via the train step's moving-average merge."""
    import jax

    def trainable(path, leaf):
        name = ""
        if path:
            name = getattr(path[-1], "key", getattr(path[-1], "name", ""))
        return name not in ("bn_mean", "bn_var")
    return jax.tree_util.tree_map_with_path(trainable, params)


def _inverse_buffer_mask(params):
    import jax
    return jax.tree_util.tree_map(lambda t: not t, buffer_mask(params))


def make_optimizer(tcfg: TrainConfig, params=None
                   ) -> optax.GradientTransformation:
    """Returns an ``inject_hyperparams`` wrapped optimizer so the plateau
    controller can mutate ``opt_state.hyperparams['learning_rate']``.

    BatchNorm running-stat buffers are always frozen (``buffer_mask``);
    with ``tcfg.fine_tune`` and a params pytree, non-projection/attention
    parameters are frozen via ``optax.masked``."""
    kind = tcfg.optimizer.upper()
    clip = tcfg.clip

    def build(learning_rate):
        if kind == "ADAM":
            core = optax.chain(
                optax.add_decayed_weights(tcfg.l2_decay),
                optax.scale_by_adam(),
                optax.scale(-1.0),
                optax.scale(learning_rate),
            )
        elif kind == "SGD":
            core = optax.chain(
                optax.add_decayed_weights(tcfg.l2_decay),
                optax.trace(decay=tcfg.momentum),
                optax.scale(-1.0),
                optax.scale(learning_rate),
            )
        elif kind == "ADABOUND":
            # torch AdaBound rescales final_lr with lr/base_lr as lr changes
            core = adabound(learning_rate,
                            final_lr=0.1 * learning_rate / tcfg.base_lr,
                            weight_decay=tcfg.l2_decay)
        elif kind == "ADABOUNDW":
            core = adaboundw(learning_rate,
                             final_lr=0.1 * learning_rate / tcfg.base_lr,
                             weight_decay=tcfg.l2_decay)
        else:
            raise ValueError(f"unknown optimizer {kind}")
        if clip > 0:
            core = optax.chain(optax.clip_by_global_norm(clip), core)
        # buffers get a zero update regardless of optimizer kind (the mask
        # callable re-derives from whatever params tree reaches init/update)
        core = optax.chain(optax.masked(core, buffer_mask),
                           optax.masked(optax.set_to_zero(),
                                        _inverse_buffer_mask))
        if tcfg.fine_tune and params is not None:
            import jax
            labels = jax.tree_util.tree_map(
                lambda t: "train" if t else "freeze", fine_tune_mask(params))
            core = optax.multi_transform(
                {"train": core, "freeze": optax.set_to_zero()}, labels)
        return core

    return optax.inject_hyperparams(build)(learning_rate=tcfg.base_lr)


def set_lr(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = jnp.asarray(
        lr, opt_state.hyperparams["learning_rate"].dtype)
    return opt_state


def get_lr(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def ramp_up_lr(base_lr: float, step: int, ramp_up_iters: int) -> float:
    """Linear warmup (reference model.py:185-187)."""
    if ramp_up_iters <= 0 or step >= ramp_up_iters:
        return base_lr
    return base_lr * (step + 1) / ramp_up_iters


# --------------------------------------------------------------------------
# reduce-on-plateau (reference util.py:673-688)
# --------------------------------------------------------------------------
class PlateauLR:
    """Tracks a minimized metric (dev CER); reduces lr after ``patience``
    evals without improvement beyond ``threshold``."""

    def __init__(self, tcfg: TrainConfig, lr: Optional[float] = None,
                 best: float = float("inf"), num_no_imprv: int = 0):
        self.patience = tcfg.patience
        self.factor = tcfg.factor
        self.min_lr = tcfg.min_lr
        self.threshold = tcfg.dec_rate_threshold
        self.lr = tcfg.base_lr if lr is None else lr
        self.best = best
        self.num_no_imprv = num_no_imprv

    def step(self, metric: float) -> bool:
        """Feed one eval metric; returns True if lr was reduced."""
        if metric < self.best * (1.0 - self.threshold):
            self.best = min(self.best, metric)
            self.num_no_imprv = 0
            return False
        self.best = min(self.best, metric)
        self.num_no_imprv += 1
        if self.num_no_imprv > self.patience:
            new_lr = max(self.lr * self.factor, self.min_lr)
            reduced = new_lr < self.lr
            self.lr = new_lr
            self.num_no_imprv = 0
            return reduced
        return False
