"""BigVGAN vocoder generator (mel -> waveform), JAX/XLA implementation.

Capability parity with the external BigVGAN the reference loads as its second
vocoder backend (`infer/utils_infer.py:136-153`; its optional CUDA kernel is
explicitly disabled there — here anti-aliasing runs as plain XLA convs).

Architecture (NVIDIA BigVGAN v2, e.g. bigvgan_v2_24khz_100band_256x):
  conv_pre k=7 -> [ConvTranspose upsample (rates 4,4,4,2,2) ->
  AMP resblocks (kernels 3/7/11, dilations 1/3/5) with snake-beta activation
  wrapped in anti-aliased 2x up/down resampling] -> snake -> conv_post k=7 -> tanh.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from korean_f5_tts_tpu.models.modules import conv1d, conv1d_init


@dataclasses.dataclass(frozen=True)
class BigVGANConfig:
    num_mels: int = 100
    upsample_initial_channel: int = 1536
    upsample_rates: tuple = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: tuple = (8, 8, 4, 4, 4, 4)
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    snake_logscale: bool = True
    use_anti_aliasing: bool = True


# -- snake activation with anti-aliased resampling ---------------------------


def snake_beta(x: jax.Array, alpha: jax.Array, beta: jax.Array,
               logscale: bool = True) -> jax.Array:
    """x + 1/β · sin²(αx), per-channel α/β (BigVGAN 'snakebeta')."""
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    return x + (1.0 / (beta + 1e-9)) * jnp.sin(alpha * x) ** 2


def _kaiser_sinc_filter(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """Low-pass kaiser-windowed sinc (BigVGAN alias_free_activation filter)."""
    even = kernel_size % 2 == 0
    delta_f = 4 * half_width
    a = 2.285 * (kernel_size / 2 - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        t = np.arange(-kernel_size // 2, kernel_size // 2) + 0.5
    else:
        t = np.arange(kernel_size) - (kernel_size - 1) / 2
    f = 2 * cutoff * window * np.sinc(2 * cutoff * t)
    f = f / np.sum(f)
    return f.astype(np.float32)


def _upsample2(x: jax.Array, filt: np.ndarray) -> jax.Array:
    """2x anti-aliased upsampling of [b, n, c] via zero-stuff + low-pass."""
    b, n, c = x.shape
    stuffed = jnp.zeros((b, n * 2, c), x.dtype).at[:, ::2, :].set(x)
    k = jnp.asarray(filt * 2.0, x.dtype)[:, None, None]
    k = jnp.tile(k, (1, 1, c))
    pad = len(filt) // 2
    return jax.lax.conv_general_dilated(
        stuffed, k, window_strides=(1,), padding=[(pad, pad - 1 + len(filt) % 2)],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=c,
    )


def _downsample2(x: jax.Array, filt: np.ndarray) -> jax.Array:
    """2x anti-aliased downsampling of [b, n, c]."""
    c = x.shape[-1]
    k = jnp.asarray(filt, x.dtype)[:, None, None]
    k = jnp.tile(k, (1, 1, c))
    pad = len(filt) // 2
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(2,), padding=[(pad, pad - 1 + len(filt) % 2)],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=c,
    )


_UP_FILTER = _kaiser_sinc_filter(0.5 / 2, 0.6 / 2, 12)
_DOWN_FILTER = _kaiser_sinc_filter(0.5 / 2, 0.6 / 2, 12)


def aa_snake(x: jax.Array, alpha, beta, cfg: BigVGANConfig) -> jax.Array:
    """Anti-aliased activation: up2 -> snake -> down2 (Activation1d role)."""
    if not cfg.use_anti_aliasing:
        return snake_beta(x, alpha, beta, cfg.snake_logscale)
    h = _upsample2(x, _UP_FILTER)
    h = snake_beta(h, alpha, beta, cfg.snake_logscale)
    return _downsample2(h, _DOWN_FILTER)


# -- blocks ------------------------------------------------------------------


def _amp_block_init(key, channels: int, kernel: int, dilations: tuple) -> dict:
    keys = jax.random.split(key, 2 * len(dilations))
    return {
        "convs1": [conv1d_init(keys[2 * i], channels, channels, kernel)
                   for i in range(len(dilations))],
        "convs2": [conv1d_init(keys[2 * i + 1], channels, channels, kernel)
                   for i in range(len(dilations))],
        "alpha1": [jnp.zeros((channels,)) for _ in dilations],
        "beta1": [jnp.zeros((channels,)) for _ in dilations],
        "alpha2": [jnp.zeros((channels,)) for _ in dilations],
        "beta2": [jnp.zeros((channels,)) for _ in dilations],
    }


def _amp_block(p: dict, x: jax.Array, kernel: int, dilations: tuple,
               cfg: BigVGANConfig) -> jax.Array:
    for i, d in enumerate(dilations):
        h = aa_snake(x, p["alpha1"][i], p["beta1"][i], cfg)
        h = conv1d(p["convs1"][i], h, padding=(kernel * d - d) // 2, dilation=d)
        h = aa_snake(h, p["alpha2"][i], p["beta2"][i], cfg)
        h = conv1d(p["convs2"][i], h, padding=kernel // 2)
        x = x + h
    return x


def conv_transpose1d_init(key, c_in: int, c_out: int, kernel: int) -> dict:
    """Kernel stored [k, c_out, c_in] (conv_transpose transpose_kernel layout);
    torch ConvTranspose1d init bounds (fan_in = c_in * k)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(c_in * kernel)
    return {
        "w": jax.random.uniform(kw, (kernel, c_out, c_in), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (c_out,), jnp.float32, -bound, bound),
    }


def init_bigvgan(key, cfg: BigVGANConfig = BigVGANConfig()) -> dict:
    keys = jax.random.split(key, 64)
    ki = iter(range(64))
    ch = cfg.upsample_initial_channel
    p: dict = {"conv_pre": conv1d_init(keys[next(ki)], cfg.num_mels, ch, 7)}
    ups, blocks = [], []
    for i, (rate, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        out_ch = ch // (2 ** (i + 1))
        in_ch = ch // (2 ** i)
        ups.append(conv_transpose1d_init(keys[next(ki)], in_ch, out_ch, k))
        blocks.append([
            _amp_block_init(keys[next(ki)], out_ch, kk, dd)
            for kk, dd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ])
    p["ups"] = ups
    p["blocks"] = blocks
    final_ch = ch // (2 ** len(cfg.upsample_rates))
    p["alpha_post"] = jnp.zeros((final_ch,))
    p["beta_post"] = jnp.zeros((final_ch,))
    p["conv_post"] = conv1d_init(keys[next(ki)], final_ch, 1, 7)
    return p


def _conv_transpose1d(p: dict, x: jax.Array, stride: int, kernel: int) -> jax.Array:
    """[b, n, c_in] -> [b, n*stride, c_out], torch ConvTranspose1d semantics
    with padding=(k-stride)//2, expressed as an lhs-dilated conv with the
    spatially-flipped kernel (out_len = (n-1)*s + k - 2p)."""
    pad_t = (kernel - stride) // 2
    w = jnp.flip(p["w"].astype(x.dtype), axis=0).transpose(0, 2, 1)  # [k, c_in, c_out]
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,),
        padding=[(kernel - 1 - pad_t, kernel - 1 - pad_t)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def bigvgan_decode(p: dict, mel: jax.Array,
                   cfg: BigVGANConfig = BigVGANConfig()) -> jax.Array:
    """[b, n_mels, T] log-mel -> [b, T * prod(rates)] waveform."""
    x = jnp.swapaxes(mel, 1, 2)
    x = conv1d(p["conv_pre"], x, padding=3)
    for i, (rate, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = _conv_transpose1d(p["ups"][i], x, rate, k)
        acc = None
        for j, (kk, dd) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ):
            h = _amp_block(p["blocks"][i][j], x, kk, dd, cfg)
            acc = h if acc is None else acc + h
        x = acc / len(cfg.resblock_kernel_sizes)
    x = snake_beta(x, p["alpha_post"], p["beta_post"], cfg.snake_logscale)
    x = conv1d(p["conv_post"], x, padding=3)
    return jnp.tanh(x)[..., 0]
