"""Deep end-to-end flows: TOML config CLI, chunk saving, Korean grid loop."""

import csv
import json
import os

import numpy as np
import pytest

import jax

from korean_f5_tts_tpu.config import DiTConfig, ModelConfig
from korean_f5_tts_tpu.infer.model import load_model
from korean_f5_tts_tpu.utils.audio import load_wav, save_wav


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("flows")
    arch = DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, mel_dim=100,
                     text_num_embeds=40, text_dim=16, conv_layers=1)
    model = load_model(ModelConfig(name="tiny", backbone="DiT", arch=arch,
                                   tokenizer="custom"), use_n2gk_plus=False)
    model.vocab_char_map = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.,!")}
    sr = 24000
    rng = np.random.default_rng(3)
    ref = (0.2 * np.sin(2 * np.pi * 300 * np.arange(2 * sr) / sr)
           + 0.01 * rng.standard_normal(2 * sr)).astype(np.float32)
    ref_path = str(tmp / "ref300.wav")
    save_wav(ref_path, ref, sr)
    return {"tmp": tmp, "model": model, "ref": ref_path}


class TestCliTomlFlow:
    def test_toml_config_with_voices_and_chunks(self, setup, monkeypatch, tmp_path):
        from korean_f5_tts_tpu.infer import cli

        alt_ref = str(tmp_path / "alt.wav")
        sr = 24000
        save_wav(alt_ref, (0.15 * np.sin(2 * np.pi * 410 * np.arange(sr) / sr))
                 .astype(np.float32), sr)
        toml_path = str(tmp_path / "run.toml")
        out_dir = str(tmp_path / "out")
        with open(toml_path, "w", encoding="utf-8") as f:
            f.write(f'''
ref_audio = "{setup['ref']}"
ref_text = "main reference text"
gen_text = "first part. [town] second voice part. [main] back again."
output_dir = "{out_dir}"
output_file = "story.wav"
nfe_step = 2

[voices.town]
ref_audio = "{alt_ref}"
ref_text = "town reference words"
''')
        monkeypatch.setattr(cli, "load_model", lambda *a, **k: setup["model"])
        cli.main(["-c", toml_path, "--no_n2gk_plus", "--save_chunk"])
        assert os.path.exists(os.path.join(out_dir, "story.wav"))
        chunks = os.listdir(os.path.join(out_dir, "story_chunks"))
        assert len(chunks) == 3  # main, town, main
        wav, sr2 = load_wav(os.path.join(out_dir, "story.wav"))
        assert sr2 == 24000 and wav.shape[-1] > 3000


class TestKoreanGridLoop:
    def test_evaluate_one_model_with_injected_asr(self, setup, tmp_path):
        from korean_f5_tts_tpu.eval.evaluate_korean import evaluate_one_model

        test_rows = [{"utt": f"t{i}", "text": f"abc def {i}."} for i in range(2)]
        mapping = {r["utt"]: {"audio_path": setup["ref"], "text": "ref words."}
                   for r in test_rows}
        out_dir = str(tmp_path / "grid")

        # fake ASR echoing ground truth -> CER 0
        gt = {r["utt"]: r["text"] for r in test_rows}

        def transcribe(path):
            utt = os.path.splitext(os.path.basename(path))[0]
            return gt[utt]

        summary = evaluate_one_model(setup["model"], None, test_rows, mapping,
                                     out_dir, nfe_step=2, transcribe_fn=transcribe,
                                     seed=0)
        assert summary["cer"] == 0.0 and summary["wer"] == 0.0
        # wavs written + details.csv rows
        assert os.path.exists(os.path.join(out_dir, "t0.wav"))
        with open(os.path.join(out_dir, "details.csv"), newline="",
                  encoding="utf-8") as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 2

        # resumability: second run skips everything (no duplicate rows)
        summary2 = evaluate_one_model(setup["model"], None, test_rows, mapping,
                                      out_dir, nfe_step=2, transcribe_fn=transcribe,
                                      seed=0)
        with open(os.path.join(out_dir, "details.csv"), newline="",
                  encoding="utf-8") as f:
            rows2 = list(csv.DictReader(f))
        assert len(rows2) == 2


class TestBatchInferCli:
    def test_metadata_jsonl_flow(self, setup, tmp_path):
        from korean_f5_tts_tpu.infer.batch_infer import batch_generate

        meta = [{"utt": "a1", "text": "abc."}, {"utt": "a2", "text": "def abc."}]
        out = batch_generate(setup["model"], None, meta, str(tmp_path / "bi"),
                             ref_audio=setup["ref"], ref_text="ref words",
                             nfe_step=2, seed=3)
        assert len(out) == 2
        for p in out:
            wav, sr = load_wav(p)
            assert wav.shape[-1] > 1000
