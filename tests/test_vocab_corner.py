"""Corner paths: get_tokenizer file modes, MMDiT pos-table overflow clamp."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.text.vocab import get_tokenizer


class TestGetTokenizer:
    def test_custom_path_mode(self, tmp_path):
        p = tmp_path / "vocab.txt"
        p.write_text(" \na\nb\n", encoding="utf-8")
        vocab, size = get_tokenizer(str(p), "custom")
        assert size == 3 and vocab["a"] == 1

    def test_dataset_dir_mode_with_space_check(self, tmp_path):
        d = tmp_path / "KSS_kor_grapheme"
        d.mkdir()
        (d / "vocab.txt").write_text(" \nㄱ\nㅏ\n", encoding="utf-8")
        vocab, size = get_tokenizer("KSS", "kor_grapheme", data_dir=str(tmp_path))
        assert size == 3 and vocab[" "] == 0

    def test_space_not_first_asserts(self, tmp_path):
        d = tmp_path / "X_char"
        d.mkdir()
        (d / "vocab.txt").write_text("a\n \n", encoding="utf-8")
        with pytest.raises(AssertionError):
            get_tokenizer("X", "char", data_dir=str(tmp_path))

    def test_byte_mode(self):
        vocab, size = get_tokenizer("anything", "byte")
        assert vocab is None and size == 256

    def test_unknown_mode_raises(self):
        with pytest.raises(ValueError):
            get_tokenizer("x", "nope")


class TestMMDiTPosOverflow:
    def test_text_longer_than_pos_table(self):
        from korean_f5_tts_tpu.config import MMDiTConfig
        from korean_f5_tts_tpu.models.mmdit import (
            MMDIT_PRECOMPUTE_MAX_POS,
            init_mmdit,
            mmdit_text_embedding,
        )

        cfg = MMDiTConfig(dim=16, depth=1, heads=1, dim_head=16, ff_mult=2,
                          mel_dim=4, text_num_embeds=10)
        p = init_mmdit(jax.random.PRNGKey(0), cfg)
        nt = MMDIT_PRECOMPUTE_MAX_POS + 7  # overflow clamps to last row
        text = jnp.asarray(np.zeros((1, nt), np.int32))
        emb = mmdit_text_embedding(p["text_embed"], cfg, text)
        assert emb.shape == (1, nt, 16)
        assert np.isfinite(np.asarray(emb)).all()


class TestJaxCacheHelper:
    def test_enable_is_idempotent_and_safe(self, tmp_path, monkeypatch):
        from korean_f5_tts_tpu.utils.jax_cache import enable_compilation_cache

        monkeypatch.setenv("F5_TTS_COMPILE_CACHE_DIR", str(tmp_path / "cc"))
        enable_compilation_cache()
        enable_compilation_cache()  # idempotent
        import os
        assert os.path.isdir(tmp_path / "cc")
        monkeypatch.setenv("F5_TTS_COMPILE_CACHE", "0")
        enable_compilation_cache()  # disabled path is a no-op
