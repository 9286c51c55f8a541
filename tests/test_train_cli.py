"""f5-tts_train YAML entry point end-to-end on a tiny prepared dataset."""

import os

import numpy as np

from korean_f5_tts_tpu.utils.audio import save_wav


def test_train_main_two_updates(tmp_path, monkeypatch):
    from korean_f5_tts_tpu.train.datasets.prepare import prepare
    from korean_f5_tts_tpu.train.train import main

    # tiny corpus -> data/<name>_char
    root = tmp_path / "corpus"
    (root / "wavs").mkdir(parents=True)
    sr = 24000
    rng = np.random.default_rng(0)
    lines = []
    for i in range(4):
        wav = (0.1 * np.sin(2 * np.pi * (200 + 40 * i) * np.arange(sr) / sr)
               + 0.01 * rng.standard_normal(sr)).astype(np.float32)
        save_wav(str(root / "wavs" / f"u{i}.wav"), wav, sr)
        lines.append(f"u{i}|ab cd {i}")
    (root / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")
    data_dir = str(tmp_path / "data")
    prepare(str(root), "tinyds", "char", data_dir=data_dir)

    yaml_path = tmp_path / "run.yaml"
    yaml_path.write_text(
        """
model:
  name: tiny
  backbone: DiT
  tokenizer: char
  arch: {dim: 32, depth: 2, heads: 2, dim_head: 16, ff_mult: 2, mel_dim: 100,
         text_dim: 16, conv_layers: 1}
  mel_spec: {target_sample_rate: 24000, n_mel_channels: 100, hop_length: 256,
             win_length: 1024, n_fft: 1024, mel_spec_type: vocos}
datasets:
  name: tinyds
  batch_size_per_gpu: 400
  batch_size_type: frame
  max_samples: 4
optim:
  epochs: 50
  learning_rate: 1.0e-4
  num_warmup_updates: 2
ckpts:
  save_per_updates: 1000
  last_per_updates: 2
  logger: null
""",
        encoding="utf-8",
    )
    monkeypatch.setenv("F5_TTS_DATA_DIR", data_dir)
    monkeypatch.chdir(tmp_path)
    main(["-c", str(yaml_path), "--max_updates", "2",
          "ckpts.save_dir=ckpts/tinyrun"])
    assert os.path.exists(tmp_path / "ckpts" / "tinyrun" / "model_last.npz")


def test_shipped_configs_parse():
    """Every yaml in configs/ must resolve through the train.py loading path:
    model_config_from_dict + a known tokenizer mode + Trainer-known keys."""
    import glob

    import yaml

    from korean_f5_tts_tpu.config import PRESETS, model_config_from_dict
    from korean_f5_tts_tpu.text.vocab import VOCAB_FILE_TOKENIZERS

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    paths = sorted(glob.glob(os.path.join(root, "*.yaml")))
    assert paths, "configs/ must ship training yamls"
    for p in paths:
        cfg = yaml.safe_load(open(p, encoding="utf-8"))
        mc = model_config_from_dict(cfg)
        assert mc.backbone in ("DiT", "UNetT", "MMDiT"), p
        # named presets must agree with the preset table (arch drift guard)
        if mc.name in PRESETS:
            want = PRESETS[mc.name]["arch"]
            got = {k: getattr(mc.arch, k) for k in want}
            assert got == want, (p, got, want)
        tok = cfg["model"]["tokenizer"]
        assert tok in VOCAB_FILE_TOKENIZERS + ["byte", "custom"], (p, tok)
        assert cfg["datasets"]["batch_size_type"] in ("frame", "sample"), p


def test_config_matrix_complete():
    """Every reference training/finetune config has a counterpart in configs/
    (round-3 VERDICT missing-item 5; artifacts via scripts/gen_config_matrix)."""
    ref_dir = "/root/reference/src/f5_tts/configs"
    if not os.path.isdir(ref_dir):
        import pytest

        pytest.skip("reference tree not mounted")
    ours = set(os.listdir(os.path.join(os.path.dirname(__file__), "..", "configs")))
    missing = [f for f in os.listdir(ref_dir)
               if f.endswith(".yaml") and f not in ours]
    assert not missing, missing


def test_train_lora_recipe_config_merge(tmp_path):
    """--config fills train-lora args from the recipe matrix; flags win."""
    import argparse

    from korean_f5_tts_tpu.train.train_lora import apply_recipe_config

    cfgs = os.path.join(os.path.dirname(__file__), "..", "configs")
    recipe = os.path.join(cfgs, "F5TTS_Base_ft_Lora_A100_inf.yaml")

    args = argparse.Namespace(
        exp_name="F5TTS_Base", dataset_name=None, pretrain=None,
        load_path=None, learning_rate=None, batch_size_per_gpu=None,
        epochs=None, tokenizer=None, tokenizer_path=None)
    apply_recipe_config(args, recipe)
    assert args.dataset_name == "KSS_n2gk_inf"
    assert args.load_path == "data/KSS_n2gk_inf"
    assert args.pretrain == "ckpts/pretrained/model_pretrained_1200000.pt"
    assert args.learning_rate == 1e-5
    assert args.batch_size_per_gpu == 19200
    assert args.tokenizer == "custom"

    # explicit flag beats the file
    args2 = argparse.Namespace(
        exp_name="F5TTS_Base", dataset_name="other", pretrain="x.npz",
        load_path=None, learning_rate=3e-4, batch_size_per_gpu=None,
        epochs=None, tokenizer=None, tokenizer_path=None)
    apply_recipe_config(args2, recipe)
    assert args2.dataset_name == "other" and args2.learning_rate == 3e-4


def test_train_main_pretrained_path_resume(tmp_path, monkeypatch):
    """ckpts.pretrained_path loads weights before training (ft configs)."""
    import jax
    import yaml

    from korean_f5_tts_tpu.config import DiTConfig
    from korean_f5_tts_tpu.models.dit import init_dit
    from korean_f5_tts_tpu.train.checkpoint import save_checkpoint
    from korean_f5_tts_tpu.train.datasets.prepare import prepare
    from korean_f5_tts_tpu.train.train import main
    from korean_f5_tts_tpu.utils.audio import save_wav

    root = tmp_path / "corpus"
    (root / "wavs").mkdir(parents=True)
    sr = 24000
    rng = np.random.default_rng(0)
    lines = []
    for i in range(2):
        wav = (0.1 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
        save_wav(str(root / "wavs" / f"u{i}.wav"), wav, sr)
        lines.append(f"u{i}|ab cd")
    (root / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")
    data_dir = str(tmp_path / "data")
    prepare(str(root), "tinyds", "char", data_dir=data_dir)

    # vocab for char tokenizer of tinyds: get size by reading vocab file
    vocab_file = os.path.join(data_dir, "tinyds_char", "vocab.txt")
    vocab_size = len(open(vocab_file, encoding="utf-8").read().splitlines())
    arch = DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2,
                     mel_dim=100, text_dim=16, conv_layers=1,
                     text_num_embeds=vocab_size + 1)
    marker = init_dit(jax.random.PRNGKey(7), arch)
    marker["proj_out"]["b"] = np.full_like(np.asarray(marker["proj_out"]["b"]),
                                           0.123)
    pre_path = str(tmp_path / "pretrained.npz")
    save_checkpoint(pre_path, marker)

    cfg = {
        "model": {"name": "tiny", "backbone": "DiT", "tokenizer": "char",
                  "arch": {"dim": 32, "depth": 2, "heads": 2, "dim_head": 16,
                           "ff_mult": 2, "mel_dim": 100, "text_dim": 16,
                           "conv_layers": 1},
                  "mel_spec": {"target_sample_rate": 24000,
                               "n_mel_channels": 100, "hop_length": 256,
                               "win_length": 1024, "n_fft": 1024,
                               "mel_spec_type": "vocos"}},
        "datasets": {"name": "tinyds", "batch_size_per_gpu": 400,
                     "batch_size_type": "frame", "max_samples": 4},
        "optim": {"epochs": 10, "learning_rate": 0.0,
                  "num_warmup_updates": 2},
        "ckpts": {"save_per_updates": 1000, "last_per_updates": 1,
                  "logger": None, "pretrained_path": pre_path},
    }
    yaml_path = tmp_path / "ft.yaml"
    yaml_path.write_text(yaml.safe_dump(cfg), encoding="utf-8")
    monkeypatch.setenv("F5_TTS_DATA_DIR", data_dir)
    monkeypatch.chdir(tmp_path)
    main(["-c", str(yaml_path), "--max_updates", "1",
          "ckpts.save_dir=ckpts/ftrun"])
    out = dict(np.load(tmp_path / "ckpts" / "ftrun" / "model_last.npz"))
    # lr=0: the marker bias must survive one update exactly
    np.testing.assert_allclose(out["params/proj_out/b"], 0.123, atol=1e-6)
