"""Inference pipeline tests: chunking, audio utils, end-to-end CLI on a tiny
model."""

import os

import numpy as np
import pytest

import jax

from korean_f5_tts_tpu.infer.utils_infer import (
    chunk_text,
    infer_process,
    preprocess_ref_audio_text,
)
from korean_f5_tts_tpu.utils import audio as au


class TestChunkText:
    def test_short_text_single_chunk(self):
        assert chunk_text("Hello world.", max_chars=100) == ["Hello world."]

    def test_splits_on_sentences(self):
        text = "First sentence. Second sentence. Third sentence."
        chunks = chunk_text(text, max_chars=20)
        assert len(chunks) == 3
        assert chunks[0] == "First sentence."

    def test_utf8_budget_korean(self):
        text = "안녕하세요. 반갑습니다. 좋은 하루입니다."
        chunks = chunk_text(text, max_chars=20)
        assert len(chunks) >= 2
        assert all(len(c.encode("utf-8")) <= 40 for c in chunks)

    def test_cjk_punctuation_split(self):
        chunks = chunk_text("第一句。第二句。", max_chars=10)
        assert len(chunks) == 2


class TestAudioUtils:
    def test_wav_roundtrip(self, tmp_path):
        sr = 24000
        wav = (0.3 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
        path = str(tmp_path / "t.wav")
        au.save_wav(path, wav, sr)
        loaded, sr2 = au.load_wav(path)
        assert sr2 == sr
        np.testing.assert_allclose(au.to_mono(loaded), wav, atol=1e-3)

    def test_resample(self):
        wav = np.sin(2 * np.pi * 100 * np.arange(16000) / 16000).astype(np.float32)
        out = au.resample(wav, 16000, 24000)
        assert abs(len(out) - 24000) <= 2

    def test_silence_edges(self):
        sr = 1000
        wav = np.concatenate([np.zeros(500), 0.5 * np.ones(1000), np.zeros(500)]).astype(np.float32)
        trimmed = au.remove_silence_edges(wav, sr)
        assert 900 <= len(trimmed) <= 1100

    def test_split_on_silence_spans(self):
        sr = 1000
        wav = np.concatenate(
            [0.5 * np.ones(500), np.zeros(1500), 0.5 * np.ones(500)]
        ).astype(np.float32)
        spans = au.split_on_silence_spans(wav, sr, min_silence_ms=1000,
                                          keep_silence_ms=100)
        assert len(spans) == 2


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    """Tiny model + vocab + ref wav for end-to-end runs."""
    import dataclasses

    from korean_f5_tts_tpu.config import DiTConfig, ModelConfig
    from korean_f5_tts_tpu.infer.model import load_model
    from korean_f5_tts_tpu.ops.mel import MelConfig

    tmp = tmp_path_factory.mktemp("e2e")
    vocab_chars = [" "] + list("abcdefghijklmnopqrstuvwxyz.,!?'")
    vocab_path = str(tmp / "vocab.txt")
    with open(vocab_path, "w", encoding="utf-8") as f:
        f.writelines(c + "\n" for c in vocab_chars)

    sr = 24000
    rng = np.random.default_rng(0)
    ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(2 * sr) / sr)
           + 0.02 * rng.standard_normal(2 * sr)).astype(np.float32)
    ref_path = str(tmp / "ref.wav")
    au.save_wav(ref_path, ref, sr)

    arch = DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, mel_dim=100,
                     text_num_embeds=len(vocab_chars), text_dim=16, conv_layers=1)
    model_cfg = ModelConfig(name="tiny", backbone="DiT", arch=arch, mel=MelConfig(),
                            tokenizer="custom")
    model = load_model(model_cfg, vocab_file=vocab_path, use_n2gk_plus=False)
    return {"model": model, "vocab": vocab_path, "ref": ref_path, "tmp": tmp}


class TestEndToEnd:
    def test_preprocess_ref_audio(self, tiny_setup):
        (wav, sr), text = preprocess_ref_audio_text(tiny_setup["ref"], "hello there")
        assert sr == 24000 and len(wav) > 0
        assert text.endswith(". ")

    def test_infer_process_produces_audio(self, tiny_setup):
        (wav_ref, sr), ref_text = preprocess_ref_audio_text(
            tiny_setup["ref"], "hello there"
        )
        wav, out_sr, spec = infer_process(
            (wav_ref, sr), ref_text, "a short test.", tiny_setup["model"],
            vocoder=None, nfe_step=2, show_info=lambda *a: None,
        )
        assert out_sr == 24000
        assert wav is not None and len(wav) > 0
        assert spec.shape[0] == 100

    def test_cli_end_to_end(self, tiny_setup, tmp_path, monkeypatch):
        # run through the installed CLI entry (library surface -> CLI surface)
        from korean_f5_tts_tpu.infer import cli

        out_dir = str(tmp_path / "out")
        # tiny model injection: patch the CLI's imported load_model
        monkeypatch.setattr(cli, "load_model", lambda *a, **k: tiny_setup["model"])
        cli.main([
            "-r", tiny_setup["ref"], "-s", "hello there", "-t", "ok then.",
            "-o", out_dir, "-w", "out.wav", "--nfe_step", "2", "--no_n2gk_plus",
        ])
        # load_model above is patched where cli imported it
        produced = os.path.join(out_dir, "out.wav")
        assert os.path.exists(produced)
        wav, sr = au.load_wav(produced)
        assert sr == 24000 and wav.shape[-1] > 1000


class TestFixDuration:
    def test_fix_duration_controls_length(self, tiny_setup):
        (wav_ref, sr), ref_text = preprocess_ref_audio_text(
            tiny_setup["ref"], "hello there"
        )
        wav, out_sr, spec = infer_process(
            (wav_ref, sr), ref_text, "abc.", tiny_setup["model"], vocoder=None,
            nfe_step=2, fix_duration=4.0, show_info=lambda *a: None,
        )
        # total 4.0s = ref + gen; generated = 4.0s - ref_len
        ref_frames = int(len(wav_ref) / 256)
        expected_gen_frames = int(4.0 * 24000 / 256) - ref_frames
        assert abs(spec.shape[1] - expected_gen_frames) <= 2


class TestVocodeBucketed:
    """_vocode_bucketed: shape-stable vocoder batching (utils_infer.py)."""

    def _mel(self, n, b=1, d=10):
        rng = np.random.default_rng(n)
        return rng.standard_normal((b, d, n)).astype(np.float32)

    def test_istft_convention_length(self):
        from korean_f5_tts_tpu.infer.utils_infer import _vocode_bucketed

        hop = 256
        calls = []

        def voc(mel):  # (n-1)*hop samples, like torch.istft
            calls.append(mel.shape[-1])
            n = mel.shape[-1]
            return np.zeros((mel.shape[0], (n - 1) * hop), np.float32)

        out = _vocode_bucketed(voc, self._mel(100))
        assert out.shape == (1, 99 * hop)
        assert calls == [256]  # padded to the bucket

    def test_upsample_convention_length(self):
        from korean_f5_tts_tpu.infer.utils_infer import _vocode_bucketed

        def voc(mel):  # n*256 samples, like bigvgan
            n = mel.shape[-1]
            return np.zeros((mel.shape[0], n * 256), np.float32)

        out = _vocode_bucketed(voc, self._mel(300))
        assert out.shape == (1, 300 * 256)

    def test_exact_multiple_passthrough(self):
        from korean_f5_tts_tpu.infer.utils_infer import _vocode_bucketed

        calls = []

        def voc(mel):
            calls.append(mel.shape[-1])
            return np.zeros((mel.shape[0], mel.shape[-1] * 4), np.float32)

        _vocode_bucketed(voc, self._mel(512))
        assert calls == [512]  # no padding when already on a bucket boundary

    def test_disable_env(self, monkeypatch):
        from korean_f5_tts_tpu.infer.utils_infer import _vocode_bucketed

        monkeypatch.setenv("F5_TTS_VOCODER_BUCKET", "0")
        calls = []

        def voc(mel):
            calls.append(mel.shape[-1])
            return np.zeros((mel.shape[0], mel.shape[-1] * 4), np.float32)

        _vocode_bucketed(voc, self._mel(100))
        assert calls == [100]  # exact length when disabled

    def test_linear_vocoder_prefix_exact(self):
        """For a zero-pad-linear vocoder, bucketing must not change values."""
        from korean_f5_tts_tpu.infer.utils_infer import _vocode_bucketed

        k = np.linspace(-1, 1, 10).astype(np.float32)

        def voc(mel):  # per-frame linear map, n*hop samples
            m = np.asarray(mel)
            y = np.einsum("bdn,d->bn", m, k)
            return np.repeat(y, 256, axis=-1)

        mel = self._mel(100)
        exact = voc(mel)
        bucketed = _vocode_bucketed(voc, mel)
        np.testing.assert_allclose(bucketed, exact, rtol=1e-6)
