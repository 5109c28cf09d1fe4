"""End-to-end drive of the training CLI (python -m chinese_asr_tpu.train):
wav files on disk -> manifest -> built vocab -> device featurization ->
compiled train step -> checkpoint written."""

import os

import numpy as np

from chinese_asr_tpu.data import audio_io, dataset


def _write_corpus(tmp_path, n=6):
    rng = np.random.RandomState(0)
    utts = []
    texts = ["你好", "好的", "你说", "说好", "的你", "好好"]
    for i in range(n):
        p = str(tmp_path / f"u{i}.wav")
        audio_io.write_wav(p, (0.1 * rng.randn(8000)).astype(np.float32))
        utts.append(dataset.Utterance(p, texts[i % len(texts)]))
    man = str(tmp_path / "train.tsv")
    dataset.write_manifest(man, utts)
    return man


def test_train_cli_end_to_end(tmp_path):
    from chinese_asr_tpu.train.__main__ import main

    man = _write_corpus(tmp_path)
    save = str(tmp_path / "ckpt")
    cfg_json = str(tmp_path / "cfg.json")
    from chinese_asr_tpu.config import Config
    small = (Config()
             .with_("encoder", hidden_size=16, num_layers=1)
             .with_("decoder", hidden_size=32, embed_dim=12)
             .with_("attention", attn_size=8))
    with open(cfg_json, "w") as f:
        f.write(small.to_json())

    rc = main(["--train-manifest", man, "--eval-manifest", man,
               "--config", cfg_json, "--batch-size", "3", "--epochs", "1",
               "--max-steps", "2", "--save-dir", save, "--remat",
               "--seed", "0"])
    assert rc == 0
    cks = [f for f in os.listdir(save) if f.endswith(".ckpt")]
    assert cks, "no checkpoint written"


def test_train_cli_mesh_auto(tmp_path):
    """--mesh auto trains SPMD over the suite's 8 virtual CPU devices."""
    from chinese_asr_tpu.train.__main__ import main

    man = _write_corpus(tmp_path)
    save = str(tmp_path / "ckpt")
    cfg_json = str(tmp_path / "cfg.json")
    from chinese_asr_tpu.config import Config
    small = (Config()
             .with_("encoder", hidden_size=16, num_layers=1)
             .with_("decoder", hidden_size=32, embed_dim=12)
             .with_("attention", attn_size=8)
             .with_("mesh", data_parallel=4, model_parallel=2))
    with open(cfg_json, "w") as f:
        f.write(small.to_json())
    rc = main(["--train-manifest", man, "--eval-manifest", man,
               "--config", cfg_json, "--batch-size", "4", "--epochs", "1",
               "--max-steps", "2", "--save-dir", save, "--mesh", "auto"])
    assert rc == 0
    assert any(f.endswith(".ckpt") for f in os.listdir(save))


def test_train_cli_resume(tmp_path):
    from chinese_asr_tpu.train.__main__ import main

    man = _write_corpus(tmp_path)
    save = str(tmp_path / "ckpt")
    cfg_json = str(tmp_path / "cfg.json")
    from chinese_asr_tpu.config import Config
    small = (Config()
             .with_("encoder", hidden_size=16, num_layers=1)
             .with_("decoder", hidden_size=32, embed_dim=12)
             .with_("attention", attn_size=8))
    with open(cfg_json, "w") as f:
        f.write(small.to_json())
    args = ["--train-manifest", man, "--config", cfg_json,
            "--batch-size", "3", "--epochs", "1", "--max-steps", "1",
            "--save-dir", save, "--eval-manifest", man]
    assert main(args) == 0
    # second invocation resumes from the written checkpoint
    assert main(args + ["--resume", "--max-steps", "2"]) == 0
