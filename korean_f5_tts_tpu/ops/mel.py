"""Mel-spectrogram frontend and ISTFT, TPU-first.

Capability parity with reference `src/f5_tts/model/modules.py:33-146` (MelSpec
with "vocos" and "bigvgan" variants). Rather than calling an FFT library, the
STFT is expressed as windowed framing + a DFT matmul: on TPU the [frames,
n_fft] x [n_fft, n_freqs] contraction rides the MXU and XLA fuses the
magnitude/mel/log chain behind it. hop | n_fft lets framing be pure
reshape/slice (no gather).

Semantics implemented exactly:
  vocos   — torchaudio.transforms.MelSpectrogram(power=1, center=True,
            norm=None, mel_scale="htk"), then clamp(1e-5).log()
            (reference modules.py:78-104)
  bigvgan — reflect pad (n_fft-hop)//2, torch.stft(center=False),
            sqrt(re^2+im^2+1e-9), librosa slaney-scale/slaney-norm mel fb,
            log(clamp(1e-5)) (reference modules.py:33-75)
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MelConfig:
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mel_channels: int = 100
    target_sample_rate: int = 24_000
    mel_spec_type: str = "vocos"  # "vocos" | "bigvgan"

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1


# ---------------------------------------------------------------------------
# Filterbanks (host-side numpy; become jit constants)
# ---------------------------------------------------------------------------


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3.0
    mel = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3.0
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def _triangular_fb(all_freqs: np.ndarray, f_pts: np.ndarray) -> np.ndarray:
    """[n_freqs, n_mels] triangular filters with vertices at f_pts (Hz)."""
    f_diff = f_pts[1:] - f_pts[:-1]  # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return np.maximum(0.0, np.minimum(down, up))


def mel_filterbank(cfg: MelConfig) -> np.ndarray:
    """[n_freqs, n_mels] float32 filterbank for the configured variant."""
    sr = cfg.target_sample_rate
    n_freqs = cfg.n_freqs
    if cfg.mel_spec_type == "vocos":
        # torchaudio melscale_fbanks: htk scale, norm=None,
        # all_freqs = linspace(0, sr // 2, n_freqs)
        all_freqs = np.linspace(0, sr // 2, n_freqs)
        m_min, m_max = _hz_to_mel_htk(0.0), _hz_to_mel_htk(sr / 2.0)
        f_pts = _mel_to_hz_htk(np.linspace(m_min, m_max, cfg.n_mel_channels + 2))
        fb = _triangular_fb(all_freqs, f_pts)
    elif cfg.mel_spec_type == "bigvgan":
        # librosa.filters.mel: slaney scale + slaney area norm, fmin=0, fmax=sr/2
        all_freqs = np.linspace(0, sr / 2.0, n_freqs)
        m_min, m_max = _hz_to_mel_slaney(0.0), _hz_to_mel_slaney(sr / 2.0)
        f_pts = _mel_to_hz_slaney(np.linspace(m_min, m_max, cfg.n_mel_channels + 2))
        fb = _triangular_fb(all_freqs, f_pts)
        enorm = 2.0 / (f_pts[2:] - f_pts[:-2])
        fb = fb * enorm[None, :]
    else:
        raise ValueError(f"unknown mel_spec_type: {cfg.mel_spec_type}")
    return fb.astype(np.float32)


# ---------------------------------------------------------------------------
# Framing + DFT
# ---------------------------------------------------------------------------


def _hann_window(win_length: int) -> np.ndarray:
    # torch.hann_window(periodic=True)
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _dft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-FFT basis: cos/sin matrices of shape [n_fft, n_freqs]."""
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def frame_signal(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """[..., nw] -> [..., n_frames, n_fft] with n_frames = (nw - n_fft)//hop + 1.

    When hop divides n_fft this is overlap-factor slicing (no gather): split
    the signal into hop-sized chunks, frame f = chunks[f : f + n_fft//hop].
    """
    nw = x.shape[-1]
    n_frames = (nw - n_fft) // hop + 1
    if n_fft % hop == 0:
        factor = n_fft // hop
        usable = (n_frames - 1 + factor) * hop
        chunks = x[..., :usable].reshape(*x.shape[:-1], -1, hop)
        parts = [chunks[..., k : k + n_frames, :] for k in range(factor)]
        return jnp.concatenate(parts, axis=-1)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[..., idx]


def _reflect_pad_last(x: jax.Array, pad: int) -> jax.Array:
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")


def stft_spectrogram(
    x: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
    center: bool = True,
    magnitude_eps: float = 0.0,
) -> jax.Array:
    """Magnitude STFT |X| of shape [..., n_freqs, n_frames].

    center=True matches torch.stft(center=True, pad_mode="reflect"); the
    caller does its own padding for center=False variants.
    """
    if center:
        x = _reflect_pad_last(x, n_fft // 2)
    window = _hann_window(win_length)
    if win_length < n_fft:  # torch zero-pads window symmetrically to n_fft
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    frames = frame_signal(x, n_fft, hop_length) * window  # [..., F, n_fft]
    cos_m, sin_m = _dft_matrices(n_fft)
    re = jnp.matmul(frames, cos_m, preferred_element_type=jnp.float32)
    im = jnp.matmul(frames, sin_m, preferred_element_type=jnp.float32)
    power = re * re + im * im
    if magnitude_eps:
        power = power + magnitude_eps
    mag = jnp.sqrt(jnp.maximum(power, 0.0) if not magnitude_eps else power)
    return jnp.swapaxes(mag, -1, -2)  # [..., n_freqs, n_frames]


def log_mel_spectrogram(wav: jax.Array, cfg: MelConfig) -> jax.Array:
    """[b, nw] (or [b, 1, nw]) waveform -> [b, n_mels, n_frames] log-mel.

    Output layout matches reference MelSpec.forward (`modules.py:133-146`).
    """
    if wav.ndim == 3:
        wav = wav[:, 0, :]
    assert wav.ndim == 2, f"expected [b, nw], got {wav.shape}"
    fb = mel_filterbank(cfg)  # [n_freqs, n_mels]
    if cfg.mel_spec_type == "vocos":
        spec = stft_spectrogram(wav, cfg.n_fft, cfg.hop_length, cfg.win_length, center=True)
        mel = jnp.einsum("bft,fm->bmt", spec, fb)
        return jnp.log(jnp.clip(mel, 1e-5, None))
    elif cfg.mel_spec_type == "bigvgan":
        pad = (cfg.n_fft - cfg.hop_length) // 2
        wav = _reflect_pad_last(wav, pad)
        spec = stft_spectrogram(
            wav, cfg.n_fft, cfg.hop_length, cfg.win_length, center=False, magnitude_eps=1e-9
        )
        mel = jnp.einsum("bft,fm->bmt", spec, fb)
        return jnp.log(jnp.clip(mel, 1e-5, None))
    raise ValueError(f"unknown mel_spec_type: {cfg.mel_spec_type}")


@functools.partial(jax.jit, static_argnames=("cfg", "out_frames"))
def log_mel_prepadded(wav_padded: jax.Array, cfg: MelConfig,
                      out_frames: int) -> jax.Array:
    """[b, L] pre-padded waveform -> [b, out_frames, n_mels] log-mel.

    Serving front-end: the caller performs the variant's reflect padding on
    HOST (exact, per-request numpy) and zero-pads to a bucketed length
    L = (F_b - 1)*hop + n_fft, so this jitted center=False program has a
    handful of fixed shapes instead of one per wav length. Through the TPU
    relay the eager `log_mel_spectrogram` chain was ~15 separate ~25 ms
    dispatches (383 ms/request measured by scripts/profile_serving_request.py);
    this is ONE. Frames beyond the true count read zero-pad samples and are
    garbage — callers mask rows >= the true frame count (cfm step_cond does).
    Frame rows out to `out_frames` are zero-padded so every wav bucket yields
    one cond shape. Output layout is [b, frames, n_mels] (already transposed
    for the sampler's cond input).
    """
    fb = mel_filterbank(cfg)
    eps = 1e-9 if cfg.mel_spec_type == "bigvgan" else 0.0
    spec = stft_spectrogram(wav_padded, cfg.n_fft, cfg.hop_length,
                            cfg.win_length, center=False, magnitude_eps=eps)
    mel = jnp.einsum("bft,fm->btm", spec, fb)  # [b, F, n_mels]
    mel = jnp.log(jnp.clip(mel, 1e-5, None))
    F = mel.shape[1]
    if out_frames > F:
        mel = jnp.pad(mel, ((0, 0), (0, out_frames - F), (0, 0)))
    return mel[:, :out_frames]


# ---------------------------------------------------------------------------
# ISTFT (for the Vocos head)
# ---------------------------------------------------------------------------


def overlap_add(frames: jax.Array, hop: int) -> jax.Array:
    """[..., n_frames, n_fft] -> [..., (n_frames-1)*hop + n_fft] overlap-add.

    With hop | n_fft, sample block b receives contributions from exactly
    n_fft//hop frames; decompose each frame into hop-sized chunks and add
    shifted copies — pure slicing, no scatter.
    """
    n_frames, n_fft = frames.shape[-2], frames.shape[-1]
    assert n_fft % hop == 0
    factor = n_fft // hop
    total = (n_frames - 1) * hop + n_fft
    n_blocks = total // hop
    out = jnp.zeros((*frames.shape[:-2], n_blocks, hop), dtype=frames.dtype)
    chunks = frames.reshape(*frames.shape[:-1], factor, hop)
    for k in range(factor):
        pad_cfg = [(0, 0)] * (frames.ndim - 2) + [(k, n_blocks - n_frames - k)]
        shifted = jnp.pad(chunks[..., k, :], pad_cfg + [(0, 0)])
        out = out + shifted
    return out.reshape(*frames.shape[:-2], total)


def istft(
    spec_real: jax.Array,
    spec_imag: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int,
    center: bool = True,
    eps: float = 1e-11,
) -> jax.Array:
    """Inverse STFT with hann window and window-envelope normalisation.

    Inputs [..., n_freqs, n_frames]; returns [..., nw]. Matches
    torch.istft(center=True) semantics used by the Vocos ISTFT head
    (reference exports it as conv-STFT for TRT — `scripts/conv_stft.py`;
    here it stays a fused XLA op in the same graph as the vocoder).
    """
    cos_m, sin_m = _dft_matrices(n_fft)  # [n_fft, n_freqs]
    # irfft via the adjoint basis with hermitian weighting
    n_freqs = n_fft // 2 + 1
    w = np.full((n_freqs,), 2.0, dtype=np.float32)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    re = jnp.swapaxes(spec_real, -1, -2)  # [..., n_frames, n_freqs]
    im = jnp.swapaxes(spec_imag, -1, -2)
    frames = (
        jnp.matmul(re * w, cos_m.T, preferred_element_type=jnp.float32)
        - jnp.matmul(im * w, (-sin_m).T, preferred_element_type=jnp.float32)
    ) / n_fft
    window = _hann_window(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    sig = overlap_add(frames * window, hop_length)
    n_frames = frames.shape[-2]
    env_frames = np.tile((window * window)[None, :], (n_frames, 1))
    env = overlap_add(jnp.asarray(env_frames), hop_length)
    sig = sig / jnp.clip(env, eps, None)
    if center:
        sig = sig[..., n_fft // 2 : -(n_fft // 2)]
    return sig
