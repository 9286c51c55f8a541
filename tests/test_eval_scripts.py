"""Eval metrics, ETL pipeline, scripts, speech edit tests."""

import json
import os

import numpy as np
import pytest

from korean_f5_tts_tpu.eval.metrics import char_error_rate, strip_punctuation, word_error_rate


class TestMetrics:
    def test_wer(self):
        assert word_error_rate("a b c", "a b c") == 0.0
        assert word_error_rate("a b c", "a x c") == pytest.approx(1 / 3)
        assert word_error_rate("a b c", "a b") == pytest.approx(1 / 3)
        assert word_error_rate("a b", "a x b y") == pytest.approx(1.0)

    def test_cer_korean(self):
        assert char_error_rate("안녕하세요", "안녕하세요") == 0.0
        assert char_error_rate("안녕하세요", "안녕하세오") == pytest.approx(1 / 5)
        # spaces ignored
        assert char_error_rate("안녕 하세요", "안녕하세요") == 0.0

    def test_strip_punctuation(self):
        assert strip_punctuation("안녕, 하세요!") == "안녕 하세요"


class TestPreparePipeline:
    def test_csv_corpus_end_to_end(self, tmp_path):
        from korean_f5_tts_tpu.train.datasets.prepare import prepare
        from korean_f5_tts_tpu.utils.audio import save_wav

        root = tmp_path / "corpus"
        (root / "wavs").mkdir(parents=True)
        sr = 24000
        rows = []
        for i, text in enumerate(["국물 좋다", "같이 가요"]):
            wav = (0.1 * np.sin(2 * np.pi * (200 + 50 * i)
                                * np.arange(sr) / sr)).astype(np.float32)
            save_wav(str(root / "wavs" / f"u{i}.wav"), wav, sr)
            rows.append(f"u{i}|{text}")
        (root / "metadata.csv").write_text("\n".join(rows), encoding="utf-8")

        out = prepare(str(root), "testset", "kor_allophone",
                      data_dir=str(tmp_path / "data"), use_n2gk_plus=True)
        assert os.path.exists(os.path.join(out, "raw.arrow"))
        durs = json.load(open(os.path.join(out, "duration.json")))["duration"]
        assert len(durs) == 2 and all(0.9 < d < 1.1 for d in durs)
        vocab = open(os.path.join(out, "vocab.txt"), encoding="utf-8").read().splitlines()
        assert vocab[0] == " "
        assert any("ⁱ" in v for v in vocab)  # allophone marks present

        # round-trip through the training data layer
        from korean_f5_tts_tpu.data.dataset import load_dataset

        ds = load_dataset("testset", "kor_allophone", data_dir=str(tmp_path / "data"))
        assert len(ds) == 2
        assert ds.get_frame_len(0) > 0

    def test_kss_reader(self, tmp_path):
        from korean_f5_tts_tpu.train.datasets.prepare import read_kss_corpus

        (tmp_path / "transcript.v.1.4.txt").write_text(
            "1/1_0000.wav|그는 괜찮은 척했다|그는 괜찮은 척했다|그는 괜차는 척핻따|"
            "He pretended|3.5\n",
            encoding="utf-8",
        )
        rows = read_kss_corpus(str(tmp_path))
        assert rows[0]["duration"] == 3.5
        assert rows[0]["text"].startswith("그는")


class TestScripts:
    def test_count_params_output(self, capsys):
        from korean_f5_tts_tpu.scripts.count_params_gflops import main

        main([])
        out = capsys.readouterr().out
        # DiT Base parity with reference (335.8M, rounding differs by 0.1)
        assert "335.9 M" in out or "335.8 M" in out
        assert "333.2 M" in out  # E2 UNetT Base parity

    def test_generate_korean_vocab(self, tmp_path):
        from korean_f5_tts_tpu.scripts.generate_korean_vocab import main, vocab_for_mode

        main(["--out_dir", str(tmp_path)])
        files = os.listdir(tmp_path)
        assert len(files) == 13
        v = vocab_for_mode("kor_allophone")
        assert v[0] == " " and "ㄱⁱ" in v and "ㄴᶜ" in v and "ㅅʲ" in v
        v_nf = vocab_for_mode("kor_nf")
        assert "ㄱⁱ" not in v_nf and "ㄴᶜ" in v_nf and "ㄱᶜ" not in v_nf


class TestSpeechEdit:
    def test_edit_mask(self):
        from korean_f5_tts_tpu.infer.speech_edit import build_edit_mask

        keep, offsets = build_edit_mask(100, [(0.213, 0.427)], sample_rate=24000,
                                        hop_length=256)
        s, e = int(0.213 * 24000 / 256), int(0.427 * 24000 / 256)
        assert len(keep) == 100
        assert not keep[s:e].any() and keep[:s].all() and keep[e:].all()

    def test_edit_mask_retimed(self):
        from korean_f5_tts_tpu.infer.speech_edit import build_edit_mask

        keep, _ = build_edit_mask(100, [(0.0, 0.1)], fix_durations_s=[0.2],
                                  sample_rate=24000, hop_length=256)
        extra = int(0.2 * 24000 / 256) - int(0.1 * 24000 / 256)
        assert len(keep) == 100 + extra

    def test_edit_speech_preserves_unedited(self):
        import jax

        from korean_f5_tts_tpu.config import DiTConfig, ModelConfig
        from korean_f5_tts_tpu.infer.model import load_model
        from korean_f5_tts_tpu.infer.speech_edit import edit_speech

        arch = DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2,
                         mel_dim=100, text_num_embeds=40, text_dim=16, conv_layers=1)
        model = load_model(ModelConfig(name="tiny", backbone="DiT", arch=arch,
                                       tokenizer="custom"), use_n2gk_plus=False)
        model.vocab_char_map = {c: i for i, c in enumerate(" abcdefghij")}
        sr = 24000
        wav = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
        out_mel = edit_speech(model, wav, "abc def", "abc hij",
                              edit_spans_s=[(0.4, 0.6)], nfe_step=2, seed=0)
        src_mel = model.mel_of_wav(wav)
        n = min(len(out_mel), len(src_mel))
        s, e = int(0.4 * sr / 256), int(0.6 * sr / 256)
        np.testing.assert_allclose(out_mel[:s], src_mel[:s], atol=1e-5)
        assert not np.allclose(out_mel[s:e], src_mel[s:e])
