"""Validation-split harness (reference validate_models_1h.py parity)."""

import csv
import os

import numpy as np
import pytest

from korean_f5_tts_tpu.eval.validate_models import (
    build_reversed_mapping,
    filter_validation_rows,
    is_valid_candidate,
    min_duration_for,
    resolve_mode,
    write_summary,
)


class TestMappingAndFilters:
    def test_reversed_mapping_is_self_inverse_pairing(self):
        rows = [{"utt": f"u{i}", "text": f"t{i}"} for i in range(5)]
        m = build_reversed_mapping(rows)
        assert m["u0"]["utt"] == "u4"
        assert m["u4"]["utt"] == "u0"
        assert m["u2"]["utt"] == "u2"  # odd middle maps to itself

    def test_candidate_validity_rules(self):
        assert is_valid_candidate("안녕하세요.")
        assert not is_valid_candidate("안녕, 하세요.")     # comma
        assert not is_valid_candidate("안녕. 하세요.")     # mid-sentence period
        assert is_valid_candidate("질문입니까?")

    def test_min_duration_scales_with_chars(self):
        assert min_duration_for("가나") == pytest.approx(2.7)  # floor
        long_text = "가" * 20
        assert min_duration_for(long_text) == pytest.approx(20 * 0.33)

    def test_filter_rows(self):
        rows = [
            {"utt": "a", "text": "짧다.", "duration": 3.0},
            {"utt": "b", "text": "쉼표, 있음.", "duration": 5.0},
            {"utt": "c", "text": "가" * 30 + ".", "duration": 3.0},  # too short
            {"utt": "d", "text": "괜찮은 문장입니다.", "duration": 4.0},
        ]
        kept = [r["utt"] for r in filter_validation_rows(rows)]
        assert kept == ["a", "d"]

    def test_mode_map_legacy_names(self):
        assert resolve_mode("salt_n") == "kor_n_only"
        assert resolve_mode("V+N+L-H") == "kor_efficient_allophone"
        assert resolve_mode("kor_grapheme") == "kor_grapheme"  # passthrough


def test_validation_grid_end_to_end(tmp_path):
    """Tiny model through run_grid with injected ASR; summary csv written."""
    from korean_f5_tts_tpu.config import DiTConfig, ModelConfig
    from korean_f5_tts_tpu.eval.evaluate_korean import run_grid
    from korean_f5_tts_tpu.infer.model import load_model
    from korean_f5_tts_tpu.utils.audio import save_wav

    sr = 24_000
    wav = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
    rows = []
    for i in range(2):
        p = tmp_path / f"v{i}.wav"
        save_wav(str(p), wav, sr)
        rows.append({"utt": f"v{i}", "audio_path": str(p),
                     "text": "한 문장입니다.", "duration": 1.0})
    mapping = build_reversed_mapping(rows)

    arch = DiTConfig(dim=32, depth=1, heads=2, dim_head=16, ff_mult=2,
                     mel_dim=100, text_num_embeds=40, text_dim=16,
                     conv_layers=0)
    model = load_model(ModelConfig(name="tiny", backbone="DiT", arch=arch,
                                   tokenizer="custom"), use_n2gk_plus=False)

    from korean_f5_tts_tpu.api import load_vocoder

    vocoder = load_vocoder("vocos")

    results = run_grid(
        ["kor_grapheme"], [50_000],
        ckpt_dir_fn=lambda m, s: str(tmp_path),          # exists -> cell runs
        model_loader_fn=lambda m, c: (model, vocoder),
        test_rows=rows, mapping=mapping,
        results_dir=str(tmp_path / "val_out"),
        nfe_step=2, transcribe_fn=lambda p: "한 문장입니다.",
    )
    assert len(results) == 1 and results[0]["cer"] == 0.0

    out_csv = tmp_path / "val_out" / "validation_summary.csv"
    write_summary(results, str(out_csv))
    with open(out_csv, newline="", encoding="utf-8") as f:
        recs = list(csv.DictReader(f))
    assert recs[0]["mode"] == "kor_grapheme" and recs[0]["step"] == "50000"
    assert os.path.exists(tmp_path / "val_out" / "kor_grapheme_50000" / "v0.wav")
