"""Golden tests for the mel/STFT frontend.

STFT is checked against torch.stft (torch CPU is the oracle); mel filterbanks
are checked against independent float64 constructions plus structural
partition-of-unity properties; ISTFT is checked by round-trip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.ops.mel import (
    MelConfig,
    istft,
    log_mel_spectrogram,
    mel_filterbank,
    overlap_add,
    stft_spectrogram,
)

torch = pytest.importorskip("torch")


def _rand_wav(batch, nw, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((batch, nw)) * 0.1).astype(np.float32)


class TestSTFT:
    @pytest.mark.parametrize("nw", [24000, 30001, 4096])
    def test_matches_torch_stft_center(self, nw):
        wav = _rand_wav(2, nw, seed=nw)
        ours = np.asarray(stft_spectrogram(jnp.asarray(wav), 1024, 256, 1024, center=True))
        ref = torch.stft(
            torch.from_numpy(wav),
            n_fft=1024,
            hop_length=256,
            win_length=1024,
            window=torch.hann_window(1024),
            center=True,
            pad_mode="reflect",
            normalized=False,
            onesided=True,
            return_complex=True,
        ).abs().numpy()
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)

    def test_matches_torch_stft_uncentered_bigvgan_padding(self):
        wav = _rand_wav(1, 24000, seed=7)
        pad = (1024 - 256) // 2
        padded = np.pad(wav, [(0, 0), (pad, pad)], mode="reflect")
        ours = np.asarray(
            stft_spectrogram(jnp.asarray(padded), 1024, 256, 1024, center=False, magnitude_eps=1e-9)
        )
        spec = torch.stft(
            torch.from_numpy(padded),
            n_fft=1024,
            hop_length=256,
            win_length=1024,
            window=torch.hann_window(1024),
            center=False,
            return_complex=True,
        )
        ref = torch.sqrt(torch.view_as_real(spec).pow(2).sum(-1) + 1e-9).numpy()
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)

    def test_frame_count_formula(self):
        # torch.stft(center=True): n_frames = nw // hop + 1
        for nw in [24000, 12345 // 256 * 256]:
            wav = jnp.zeros((1, nw))
            spec = stft_spectrogram(wav, 1024, 256, 1024, center=True)
            assert spec.shape[-1] == nw // 256 + 1


class TestMelFilterbank:
    def test_vocos_fb_shape_and_partition(self):
        cfg = MelConfig(mel_spec_type="vocos")
        fb = mel_filterbank(cfg)
        assert fb.shape == (513, 100)
        assert (fb >= 0).all()
        # htk norm=None triangles partition unity strictly inside the span
        freqs = np.linspace(0, 12000, 513)
        lo = 2595 * np.log10(1 + np.array([0, 12000]) / 700)
        pts = 700 * (10 ** (np.linspace(lo[0], lo[1], 102) / 2595) - 1)
        interior = (freqs > pts[1] + 1) & (freqs < pts[-2] - 1)
        np.testing.assert_allclose(fb.sum(axis=1)[interior], 1.0, atol=1e-4)

    def test_bigvgan_fb_slaney_norm(self):
        cfg = MelConfig(mel_spec_type="bigvgan")
        fb = mel_filterbank(cfg)
        assert fb.shape == (513, 100)
        # slaney-normalised filters: area under each triangle ~ 2/(width) * width/2 = 1
        # in continuous freq; check discrete sum scaled by bin width is ~1
        bin_w = 12000.0 / 512.0
        areas = fb.sum(axis=0) * bin_w
        assert np.all(areas > 0.5) and np.all(areas < 1.5)

    def test_fb_against_float64_reference(self):
        # independent float64 torchaudio-style construction
        cfg = MelConfig(mel_spec_type="vocos")
        fb = mel_filterbank(cfg)
        all_freqs = np.linspace(0, 12000, 513)
        m = 2595.0 * np.log10(1.0 + all_freqs / 700.0)
        m_pts = np.linspace(0.0, 2595.0 * np.log10(1.0 + 12000.0 / 700.0), 102)
        f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
        ref = np.zeros((513, 100))
        for i in range(100):
            left, center, right = f_pts[i], f_pts[i + 1], f_pts[i + 2]
            up = (all_freqs - left) / (center - left)
            down = (right - all_freqs) / (right - center)
            ref[:, i] = np.maximum(0.0, np.minimum(up, down))
        np.testing.assert_allclose(fb, ref, atol=1e-5)


class TestLogMel:
    def test_output_layout_and_finite(self):
        cfg = MelConfig()
        wav = jnp.asarray(_rand_wav(3, 24000))
        mel = log_mel_spectrogram(wav, cfg)
        assert mel.shape == (3, 100, 24000 // 256 + 1)
        assert np.isfinite(np.asarray(mel)).all()
        # silence maps to log(1e-5)
        mel0 = log_mel_spectrogram(jnp.zeros((1, 24000)), cfg)
        np.testing.assert_allclose(np.asarray(mel0), np.log(1e-5), atol=1e-6)

    def test_matches_torch_composed_pipeline(self):
        """End-to-end vocos-mel vs torch.stft + our float64 fb (oracle compose)."""
        cfg = MelConfig()
        wav = _rand_wav(2, 24000, seed=3)
        ours = np.asarray(log_mel_spectrogram(jnp.asarray(wav), cfg))
        spec = torch.stft(
            torch.from_numpy(wav),
            n_fft=1024, hop_length=256, win_length=1024,
            window=torch.hann_window(1024), center=True, pad_mode="reflect",
            normalized=False, onesided=True, return_complex=True,
        ).abs()
        fb = torch.from_numpy(mel_filterbank(cfg))
        ref = torch.matmul(fb.T, spec).clamp(min=1e-5).log().numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-3)

    def test_bigvgan_variant_runs(self):
        cfg = MelConfig(mel_spec_type="bigvgan")
        wav = jnp.asarray(_rand_wav(1, 24000))
        mel = log_mel_spectrogram(wav, cfg)
        # center=False with (n_fft-hop)//2 pad: n_frames = nw // hop
        assert mel.shape == (1, 100, 24000 // 256)


class TestISTFT:
    def test_overlap_add_constant(self):
        frames = jnp.ones((5, 1024))
        out = np.asarray(overlap_add(frames, 256))
        assert out.shape == (4 * 256 + 1024,)
        # interior samples receive exactly 4 contributions
        np.testing.assert_allclose(out[1024:-1024], 4.0)

    def test_roundtrip(self):
        wav = _rand_wav(2, 24000, seed=11)
        n_fft, hop = 1024, 256
        x = jnp.asarray(np.pad(wav, [(0, 0), (n_fft // 2, n_fft // 2)], mode="reflect"))
        window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
        frames = np.lib.stride_tricks.sliding_window_view(np.asarray(x), n_fft, axis=-1)[:, ::hop]
        spec = np.fft.rfft(frames * window, axis=-1)
        re = jnp.asarray(np.swapaxes(spec.real, -1, -2).astype(np.float32))
        im = jnp.asarray(np.swapaxes(spec.imag, -1, -2).astype(np.float32))
        rec = np.asarray(istft(re, im, n_fft, hop, n_fft, center=True))
        # torch.istft(center=True) semantics: output length (T-1)*hop
        n_frames = re.shape[-1]
        assert rec.shape[-1] == (n_frames - 1) * hop
        np.testing.assert_allclose(rec, wav[:, : rec.shape[-1]], atol=1e-4)

    def test_matches_torch_istft(self):
        wav = _rand_wav(1, 24000, seed=13)
        n_fft, hop = 1024, 256
        spec = torch.stft(
            torch.from_numpy(wav), n_fft, hop_length=hop, win_length=n_fft,
            window=torch.hann_window(n_fft), center=True, pad_mode="reflect",
            return_complex=True,
        )
        ref = torch.istft(
            spec, n_fft, hop_length=hop, win_length=n_fft,
            window=torch.hann_window(n_fft), center=True,
        ).numpy()
        rec = np.asarray(
            istft(
                jnp.asarray(spec.real.numpy()), jnp.asarray(spec.imag.numpy()),
                n_fft, hop, n_fft, center=True,
            )
        )
        np.testing.assert_allclose(rec, ref, atol=1e-4)
