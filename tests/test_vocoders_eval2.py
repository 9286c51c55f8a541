"""BigVGAN, gradio helpers, Korean eval-grid pieces, dataset stats tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.models.bigvgan import (
    BigVGANConfig,
    bigvgan_decode,
    init_bigvgan,
    snake_beta,
)

torch = pytest.importorskip("torch")

TINY_BV = BigVGANConfig(
    num_mels=8, upsample_initial_channel=32, upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4), resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
)


class TestBigVGAN:
    def test_upsampling_factor_and_range(self):
        p = init_bigvgan(jax.random.PRNGKey(0), TINY_BV)
        mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 16)).astype(np.float32))
        wav = bigvgan_decode(p, mel, TINY_BV)
        assert wav.shape == (2, 16 * 8)
        w = np.asarray(wav)
        assert np.isfinite(w).all() and np.abs(w).max() <= 1.0

    def test_snake_beta_formula(self):
        x = np.linspace(-2, 2, 11).astype(np.float32)
        alpha = np.log(np.full(11, 2.0, np.float32))
        beta = np.log(np.full(11, 0.5, np.float32))
        ours = np.asarray(snake_beta(jnp.asarray(x), jnp.asarray(alpha), jnp.asarray(beta)))
        ref = x + (1 / 0.5) * np.sin(2.0 * x) ** 2
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_no_anti_aliasing_variant(self):
        import dataclasses

        cfg = dataclasses.replace(TINY_BV, use_anti_aliasing=False)
        p = init_bigvgan(jax.random.PRNGKey(1), cfg)
        mel = jnp.zeros((1, 8, 12))
        wav = bigvgan_decode(p, mel, cfg)
        assert wav.shape == (1, 12 * 8)


class TestGradioHelpers:
    def test_parse_speechtypes(self):
        from korean_f5_tts_tpu.infer.infer_gradio import parse_speechtypes_text

        segs = parse_speechtypes_text("{Regular} Hello. {Shouting} HEY! {Regular} ok")
        assert segs == [
            {"name": "Regular", "seed": -1, "speed": 1.0, "text": "Hello."},
            {"name": "Shouting", "seed": -1, "speed": 1.0, "text": "HEY!"},
            {"name": "Regular", "seed": -1, "speed": 1.0, "text": "ok"},
        ]

    def test_no_tag_defaults_regular(self):
        from korean_f5_tts_tpu.infer.infer_gradio import parse_speechtypes_text

        assert parse_speechtypes_text("plain text") == [
            {"name": "Regular", "seed": -1, "speed": 1.0, "text": "plain text"}
        ]

    def test_json_tag_with_seed_and_speed(self):
        # reference infer_gradio.py:361-392: a tag may be a JSON dict
        from korean_f5_tts_tpu.infer.infer_gradio import parse_speechtypes_text

        segs = parse_speechtypes_text(
            '{"name": "S1_Happy", "seed": 7, "speed": 1.2} hi there '
            "{Sad} oh no")
        assert segs == [
            {"name": "S1_Happy", "seed": 7, "speed": 1.2, "text": "hi there"},
            {"name": "Sad", "seed": -1, "speed": 1.0, "text": "oh no"},
        ]

    def test_build_app_requires_gradio(self):
        from korean_f5_tts_tpu.infer.infer_gradio import build_app

        with pytest.raises(ImportError, match="gradio"):
            build_app()


class TestKoreanGrid:
    def test_reference_mapping_constraints(self):
        from korean_f5_tts_tpu.eval.evaluate_korean import build_reference_mapping

        test_rows = [{"utt": f"t{i}", "text": "x"} for i in range(5)]
        train_rows = [
            {"audio_path": "a.wav", "text": "좋은 문장이다.", "duration": 5.0},
            {"audio_path": "b.wav", "text": "너무 짧다.", "duration": 1.0},  # too short
            {"audio_path": "c.wav", "text": "구두점 없음", "duration": 5.0},  # no punct
            {"audio_path": "d.wav", "text": "괜찮은 문장?", "duration": 7.0},
        ]
        mapping = build_reference_mapping(test_rows, train_rows)
        assert len(mapping) == 5
        used = {m["audio_path"] for m in mapping.values()}
        assert used <= {"a.wav", "d.wav"}

    def test_mapping_deterministic(self):
        from korean_f5_tts_tpu.eval.evaluate_korean import build_reference_mapping

        rows = [{"utt": f"t{i}", "text": "x"} for i in range(3)]
        pool = [{"audio_path": f"{i}.wav", "text": "문장이다.", "duration": 5.0}
                for i in range(10)]
        m1 = build_reference_mapping(rows, pool, seed=1)
        m2 = build_reference_mapping(rows, pool, seed=1)
        assert {k: v["audio_path"] for k, v in m1.items()} == \
               {k: v["audio_path"] for k, v in m2.items()}

    def test_normalize_for_scoring(self):
        from korean_f5_tts_tpu.eval.evaluate_korean import normalize_for_scoring

        assert normalize_for_scoring("3개!") == "세개"


class TestDatasetStats:
    def test_entropy_and_gini(self):
        from collections import Counter

        from korean_f5_tts_tpu.scripts.analyze_dataset_stats import entropy, gini

        uniform = Counter({("a",): 10, ("b",): 10, ("c",): 10, ("d",): 10})
        skewed = Counter({("a",): 97, ("b",): 1, ("c",): 1, ("d",): 1})
        assert entropy(uniform) == pytest.approx(2.0)
        assert entropy(skewed) < 0.5
        assert gini(uniform) == pytest.approx(0.0, abs=1e-9)
        assert gini(skewed) > 0.5

    def test_duration_stats(self):
        from korean_f5_tts_tpu.scripts.analyze_dataset_stats import duration_stats

        s = duration_stats([1.0, 2.0, 3.0])
        assert s["n"] == 3 and s["mean_s"] == 2.0
