"""Finetune-studio functional cores added in round 2 (settings persistence,
train auto-configure, vocab check, project/sample browsing)."""

import json
import os

import pytest

from korean_f5_tts_tpu.train import finetune_gradio as fg


class TestSettings:
    def test_roundtrip_and_defaults(self, tmp_path):
        ckpt_root = str(tmp_path / "ckpts")
        msg = fg.save_settings("proj_pinyin", {"learning_rate": 3e-5}, ckpt_root)
        assert msg == "Settings saved!"
        s = fg.load_settings("proj", ckpt_root)  # suffix-stripped name matches
        assert s["learning_rate"] == 3e-5
        assert s["mixed_precision"] == "bf16"          # TPU default
        assert s["exp_name"] == "F5TTS_v1_Base"
        raw = json.load(open(os.path.join(ckpt_root, "proj", "setting.json")))
        assert raw["batch_size_per_gpu"] == 9600

    def test_load_without_file_gives_defaults(self, tmp_path):
        s = fg.load_settings("nope", str(tmp_path))
        assert s == fg.DEFAULT_SETTINGS


class TestCalculateTrain:
    def _project(self, tmp_path, durations):
        d = tmp_path / "proj_pinyin"
        d.mkdir()
        (d / "duration.json").write_text(json.dumps({"duration": durations}))
        return str(d)

    def test_frame_batch_floors_at_longest_sample(self, tmp_path):
        proj = self._project(tmp_path, [200.0, 5.0])  # 200 s * 93.75 frames/s
        out = fg.calculate_train(proj, batch_size_type="frame")
        assert out["batch_size_per_gpu"] == int(200.0 * 24000 / 256)

    def test_frame_batch_scales_with_hbm(self, tmp_path):
        proj = self._project(tmp_path, [5.0] * 100)
        b16 = fg.calculate_train(proj, hbm_gb_per_chip=16.0)["batch_size_per_gpu"]
        b32 = fg.calculate_train(proj, hbm_gb_per_chip=32.0)["batch_size_per_gpu"]
        assert b16 == 9600 and b32 == 19200

    def test_sample_type_and_small_dataset_rules(self, tmp_path):
        proj = self._project(tmp_path, [4.0] * 20)
        out = fg.calculate_train(proj, batch_size_type="sample",
                                 num_warmup_updates=0)
        assert out["batch_size_per_gpu"] == int(200 / 4.0)
        assert out["max_samples"] == 5                  # 25% of 20
        assert out["num_warmup_updates"] == max(0, int(20 * 0.05))
        assert out["learning_rate"] == 1e-5

    def test_missing_project(self, tmp_path):
        assert "error" in fg.calculate_train(str(tmp_path / "nope"))

    def test_epochs_capped_by_max_updates(self, tmp_path):
        proj = self._project(tmp_path, [10.0] * 10)
        out = fg.calculate_train(proj)
        assert out["epochs"] == int(fg.MAX_UPDATES / (
            sum([10.0] * 10) / (out["batch_size_per_gpu"] * 256 / 24000)))


class TestVocabCheck:
    def test_missing_and_complete(self, tmp_path):
        proj = tmp_path
        (proj / "metadata.csv").write_text("a.wav|가나\n", encoding="utf-8")
        vocab = proj / "vocab.txt"
        vocab.write_text("ㄱ\nㅏ\n", encoding="utf-8")
        info, miss = fg.vocab_check(str(proj), str(vocab), "kor_grapheme")
        assert "missing" in info and "ㄴ" in miss.split(",")
        vocab.write_text("ㄱ\nㅏ\nㄴ\n \n", encoding="utf-8")
        info, miss = fg.vocab_check(str(proj), str(vocab), "kor_grapheme")
        assert miss == "" and "train" in info

    def test_vocab_count(self):
        assert fg.vocab_count("a,b,c") == 3


class TestBrowsing:
    def test_projects_and_checkpoints(self, tmp_path, monkeypatch):
        (tmp_path / "data" / "one_pinyin").mkdir(parents=True)
        (tmp_path / "data" / "junk").mkdir()
        assert fg.get_list_projects(str(tmp_path / "data")) == ["one_pinyin"]

        ck = tmp_path / "ckpts" / "one"
        ck.mkdir(parents=True)
        for s in (100, 20, 3):
            (ck / f"model_{s}.npz").write_bytes(b"")
        got = fg.get_checkpoints_project("one_pinyin", str(tmp_path / "ckpts"))
        assert [os.path.basename(p) for p in got] == [
            "model_3.npz", "model_20.npz", "model_100.npz"]

    def test_random_sample_transcribe(self, tmp_path):
        (tmp_path / "metadata.csv").write_text("x.wav|안녕\n", encoding="utf-8")
        text, audio = fg.get_random_sample_transcribe(str(tmp_path), seed=1)
        assert text == "안녕" and audio.endswith(os.path.join("wavs", "x.wav"))
        assert fg.get_random_sample_transcribe(str(tmp_path / "no")) == ("", None)


def test_format_seconds_to_hms():
    assert fg.format_seconds_to_hms(3725) == "01:02:05"
