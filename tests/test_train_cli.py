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
