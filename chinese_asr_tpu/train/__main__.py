"""Training CLI — the entry point the reference never shipped (its train
loop and argparse are commented out, reference model.py:84-345,
main.py:107-120; training there means editing source).  Here:

    python -m chinese_asr_tpu.train \
        --train-manifest train.tsv --eval-manifest dev.tsv \
        --vocab dict.pkl --save-dir ./ckpt [--config cfg.json] \
        [--bf16] [--remat] [--mesh auto] [--resume] [--max-steps N]

Manifests are TSV lines of ``wav_path\ttranscript`` (data.read_manifest).
``--vocab`` accepts the reference's ``dict.pkl`` or a plain word list;
without it a character vocab is built from the train manifest.  All
heavy lifting is the library: device-side featurization
(data.batches_to_device), the compiled train step (train.step), plateau
LR / EMA / NaN-skip / ``step-X_wer-Y.ckpt`` checkpointing (Trainer), and
optional multi-chip SPMD (``--mesh auto``, parallel.sharding).
"""

from __future__ import annotations

import argparse
import dataclasses
import sys


def build_config(args) -> "Config":
    from ..config import Config

    if args.config:
        with open(args.config, "r", encoding="utf-8") as f:
            cfg = Config.from_json(f.read())
    else:
        cfg = Config()
    train_over = {}
    for field, name in [("batch_size", "batch_size"), ("epochs", "epochs"),
                        ("base_lr", "lr"), ("save_dir", "save_dir"),
                        ("ss", "ss"), ("seed", "seed")]:
        v = getattr(args, name)
        if v is not None:
            train_over[field] = v
    if args.bf16:
        train_over["compute_dtype"] = "bfloat16"
    if args.remat:
        train_over["remat"] = True
    if train_over:
        cfg = cfg.with_("train", **train_over)
    if args.verbose:
        cfg = dataclasses.replace(cfg, verbose=True)
    return cfg


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m chinese_asr_tpu.train",
        description="Train the LAS recognizer from wav manifests.")
    ap.add_argument("--train-manifest", required=True,
                    help="TSV: wav_path<TAB>transcript per line")
    ap.add_argument("--eval-manifest", default=None)
    ap.add_argument("--vocab", default=None,
                    help="dict.pkl / word list; default: build from the "
                         "train manifest's transcripts")
    ap.add_argument("--config", default=None, help="Config JSON file")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--ss", type=float, default=None,
                    help="scheduled-sampling probability")
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--save-dir", default=None)
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--bf16", action="store_true",
                    help="mixed precision (bf16 fwd/bwd, f32 masters)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize the decoder scan in the backward")
    ap.add_argument("--mesh", default=None, choices=[None, "auto"],
                    help="'auto': (data x model) SPMD over all local devices")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the newest checkpoint in save-dir")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)

    import os

    import jax

    # honor an env request for the CPU backend explicitly: through the
    # axon TPU tunnel JAX_PLATFORMS alone is not always enough (CLAUDE.md)
    if (os.environ.get("JAX_PLATFORM_NAME") == "cpu"
            or os.environ.get("JAX_PLATFORMS") == "cpu"):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    from .. import vocab as vocab_mod
    from ..data import dataset
    from ..models import las
    from .trainer import Trainer

    cfg = build_config(args)

    if args.vocab:
        vocab = vocab_mod.Vocab.load(args.vocab)
    else:
        utts = dataset.read_manifest(args.train_manifest)
        vocab = vocab_mod.Vocab.build(
            (u.text for u in utts if u.text), cfg.vocab.max_num_words)
    if len(vocab) != cfg.vocab.vocab_size:
        cfg = cfg.with_("vocab", max_num_words=len(vocab) - 4)

    mesh = None
    if args.mesh == "auto":
        from ..parallel import sharding
        mesh = sharding.make_mesh(cfg)

    params = las.init_params(jax.random.PRNGKey(cfg.train.seed), cfg)
    tr = Trainer(cfg, params, vocab, mesh=mesh)
    if args.resume:
        tr.resume()

    def train_loader_fn():
        # SPMD training: every batch must divide the data axis -> drop
        # the epoch's remainder batch (reshuffled into later epochs)
        loader = dataset.make_train_loader(args.train_manifest, cfg, vocab,
                                           seed=cfg.train.seed,
                                           drop_last=mesh is not None)
        return dataset.batches_to_device(loader, cfg)

    eval_loader_fn = None
    if args.eval_manifest:
        def eval_loader_fn():
            loader = dataset.make_eval_loader(args.eval_manifest, cfg, vocab)
            return dataset.batches_to_device(loader, cfg)

    tv = tr.fit(train_loader_fn, eval_loader_fn, max_steps=args.max_steps)
    print(f"done: step {tv.step} loss {tv.loss:.4f} "
          f"best_wer {tv.best_wer:.5f}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
