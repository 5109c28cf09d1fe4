"""Training loop (reference Model.train, model.py:84-345).

Same capability surface as the reference's (commented-out) trainer — epoch
loop, LR ramp-up, EMA-smoothed console line, periodic greedy eval with CER,
reduce-on-plateau LR, checkpoint per eval with the ``step-X_wer-Y.ckpt``
naming — rebuilt around one jitted train step per (T, S) length bucket.
"""

from __future__ import annotations

import functools
import sys
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from ..config import Config
from ..decode.greedy import finalize_greedy, greedy_decode_jit
from ..utils.checkpoint import CheckpointManager, TrainVar, load_checkpoint
from ..utils.observe import EMA, Duration, MetricsLogger, rand_disp_list
from . import optim, step as step_mod
from .step import Batch


class Trainer:
    def __init__(self, cfg: Config, params, vocab=None,
                 logger: Optional[MetricsLogger] = None, mesh=None):
        """``mesh``: optional jax.sharding.Mesh for multi-chip SPMD
        training — params get the parallel/sharding.py layout (data-
        parallel batch, vocab-dim tensor parallelism) and the train step
        compiles over the mesh."""
        self.cfg = cfg
        self.vocab = vocab
        self.tx = optim.make_optimizer(cfg.train, params)
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import sharding
            params = sharding.shard_params(params, cfg, mesh)
            self._step_fn = sharding.make_sharded_train_step(
                cfg, self.tx, params, mesh)
            self._shard_batch = lambda b: sharding.shard_batch(b, cfg, mesh)
        else:
            # donate params + opt_state (~190 MB at the flagship size):
            # the step overwrites them anyway, donation lets XLA update in
            # place instead of allocating fresh buffers.  CPU ignores
            # donation with a warning, so only donate off-CPU.
            donate = () if jax.default_backend() == "cpu" else (0, 1)
            jit_fn = jax.jit(functools.partial(
                step_mod.train_step, cfg=cfg, tx=self.tx),
                donate_argnums=donate)
            self._step_fn = lambda p, o, batch, rng: jit_fn(
                p, o, batch=batch, rng=rng)
            self._shard_batch = lambda b: b
        self.params = params
        self.opt_state = self.tx.init(params)
        self.tv = TrainVar(lr=cfg.train.base_lr)
        self.plateau = optim.PlateauLR(cfg.train)
        self.ckpt = CheckpointManager(cfg.train.save_dir)
        self.logger = logger or MetricsLogger(cfg.train.save_dir)
        self.ema = EMA(0.99)
        self.duration = Duration()
        self._rng = jax.random.PRNGKey(cfg.train.seed)

    # ---- resume (reference model.py:137-158) ------------------------------
    def resume(self, path: Optional[str] = None) -> bool:
        path = path or self.cfg.train.continue_train_ckpt_path \
            or self.ckpt.latest_checkpoint()
        if not path:
            return False
        payload = load_checkpoint(path)
        self.params = jax.tree_util.tree_map(jax.numpy.asarray,
                                             payload["params"])
        if payload.get("opt_state") is not None:
            self.opt_state = jax.tree_util.tree_map(
                jax.numpy.asarray, payload["opt_state"])
        if payload.get("train_var") is not None:
            self.tv = payload["train_var"]
            self.plateau = optim.PlateauLR(
                self.cfg.train, lr=self.tv.lr, best=self.tv.best_wer,
                num_no_imprv=self.tv.num_no_imprv)
            self.duration.seconds = self.tv.duration
            self.opt_state = optim.set_lr(self.opt_state, self.tv.lr)
        return True

    # ---- eval (reference model.py:240-261) ---------------------------------
    def evaluate(self, eval_loader: Iterable[Batch]) -> float:
        from ..utils.observe import batch_alignment_images

        cers, weights = [], []
        first = True
        for b in eval_loader:
            res = greedy_decode_jit(self.params, self.cfg,
                                    jax.numpy.asarray(b.feats),
                                    jax.numpy.asarray(b.feat_lens))
            to_np = np.asarray(b.tokens_out)       # one transfer per batch
            tl_np = np.asarray(b.text_lens)
            text = [to_np[i, : tl_np[i] - 1].tolist()
                    for i in range(len(tl_np))]                # strip eos
            out = finalize_greedy(res, self.vocab, text=text,
                                  want_alignment=first)
            cers.append(out.wer)
            weights.append(out.n)
            if first:
                # attention-alignment heatmaps + sample transcripts of the
                # first eval batch (reference model.py:268-281)
                first = False
                lens = np.asarray(b.feat_lens)
                tl = np.asarray(res.final_lens)
                for i, img in enumerate(batch_alignment_images(
                        out.alignment[:2], lens[:2], np.maximum(tl[:2], 1))):
                    self.logger.image(f"eval/alignment{i}", img, self.tv.step)
                for line in rand_disp_list(out.pred_text, out.text,
                                           n=min(3, out.n)):
                    self.logger.text("eval/sample", line, self.tv.step)
        if not cers:
            return float("inf")
        return float(np.average(cers, weights=weights))

    # ---- main loop (reference model.py:160-345) ----------------------------
    def fit(self, train_loader_fn: Callable[[], Iterable[Batch]],
            eval_loader_fn: Optional[Callable[[], Iterable[Batch]]] = None,
            max_steps: Optional[int] = None) -> TrainVar:
        cfg = self.cfg.train
        steps_per_eval = cfg.num_eval_steps
        for epoch in range(cfg.epochs):
            epoch_steps = 0
            for batch in train_loader_fn():
                self.duration.tic()
                # LR ramp-up (model.py:185-187)
                if cfg.ramp_up_iters > 0 and self.tv.step < cfg.ramp_up_iters:
                    self.opt_state = optim.set_lr(
                        self.opt_state,
                        optim.ramp_up_lr(self.plateau.lr, self.tv.step,
                                         cfg.ramp_up_iters))
                self._rng, sk = jax.random.split(self._rng)
                jb = self._shard_batch(
                    Batch(*[jax.numpy.asarray(x) for x in batch]))
                self.params, self.opt_state, metrics = self._step_fn(
                    self.params, self.opt_state, jb, sk)
                loss = float(metrics["loss"])
                self.tv.step += 1
                self.tv.loss = loss
                epoch_steps += 1
                dt = self.duration.toc()
                ema = self.ema.update(loss)
                if self.cfg.verbose and self.tv.step % 10 == 0:
                    # console line (model.py:216-224)
                    print(f"step {self.tv.step} epoch {epoch} "
                          f"loss {loss:.4f} ema {ema:.4f} {dt * 1e3:.0f}ms "
                          f"lr {optim.get_lr(self.opt_state):.2e} "
                          f"best_wer {self.tv.best_wer:.5f} "
                          f"no_imprv {self.plateau.num_no_imprv}",
                          file=sys.stderr)
                self.logger.scalar("train/loss", loss, self.tv.step)
                self.logger.scalar("train/grad_norm",
                                   float(metrics["grad_norm"]), self.tv.step)
                do_eval = (steps_per_eval > 0
                           and self.tv.step % steps_per_eval == 0)
                if do_eval:
                    self._eval_and_checkpoint(eval_loader_fn)
                if max_steps is not None and self.tv.step >= max_steps:
                    self._eval_and_checkpoint(eval_loader_fn)
                    return self.tv
            # num_eval_steps == -1 -> eval once per epoch (gpd.py:117 semantics)
            if steps_per_eval <= 0:
                self._eval_and_checkpoint(eval_loader_fn)
        return self.tv

    def _eval_and_checkpoint(self, eval_loader_fn) -> None:
        wer = self.evaluate(eval_loader_fn()) if eval_loader_fn else \
            float(self.tv.loss)
        self.tv.best_wer = min(self.tv.best_wer, wer)
        self.logger.scalar("eval/wer", wer, self.tv.step)
        # plateau LR (model.py:286-291, util.py:673-688)
        if self.plateau.step(wer):
            self.opt_state = optim.set_lr(self.opt_state, self.plateau.lr)
        self.tv.lr = self.plateau.lr
        self.tv.num_no_imprv = self.plateau.num_no_imprv
        self.tv.duration = self.duration.seconds
        # checkpoint per eval (model.py:294)
        self.ckpt.save(self.tv.step, wer, self.params, self.opt_state,
                       self.tv, self.cfg.to_json())
