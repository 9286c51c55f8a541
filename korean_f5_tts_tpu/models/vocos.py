"""Vocos vocoder: mel -> waveform, fully in-graph (ConvNeXt stack + ISTFT).

Capability parity with the external Vocos model the reference loads at
`src/f5_tts/infer/utils_infer.py:114-143` and exports to TensorRT via a
conv-based ISTFT (`runtime/triton_trtllm/scripts/export_vocoder_to_onnx.py:45-77`,
`conv_stft.py`). Here the head is the jnp ISTFT from `ops/mel.py`, so the
vocoder fuses into the same XLA program as the sampler — no separate engine.

Architecture (charactr/vocos-mel-24khz):
  embed Conv1d(n_mels -> dim, k=7) -> LayerNorm ->
  num_layers x ConvNeXt-v1 block (dwconv k7, LN, pw -> intermediate, GELU,
  pw -> dim, layer-scale gamma, residual) -> final LayerNorm ->
  ISTFTHead: Linear(dim -> n_fft + 2) -> exp-clipped magnitude + phase ->
  complex spectrum -> ISTFT.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.models.modules import (
    conv1d,
    conv1d_init,
    gelu_exact,
    layernorm,
    layernorm_init,
    linear,
    linear_init,
)
from korean_f5_tts_tpu.ops.mel import istft


@dataclasses.dataclass(frozen=True)
class VocosConfig:
    input_channels: int = 100
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    n_fft: int = 1024
    hop_length: int = 256
    padding: str = "center"  # "center" | "same"


def init_convnext_v1_block(key, dim: int, intermediate_dim: int,
                           layer_scale_init_value: float) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "dwconv": conv1d_init(k1, dim, dim, 7, groups=dim),
        "norm": layernorm_init(dim),
        "pw1": linear_init(k2, dim, intermediate_dim),
        "pw2": linear_init(k3, intermediate_dim, dim),
        "gamma": jnp.full((dim,), layer_scale_init_value, jnp.float32),
    }


def convnext_v1_block(p: dict, x: jax.Array) -> jax.Array:
    residual = x
    h = conv1d(p["dwconv"], x, groups=x.shape[-1], padding=3)
    h = layernorm(p["norm"], h, eps=1e-6)
    h = gelu_exact(linear(p["pw1"], h))
    h = linear(p["pw2"], h)
    return residual + p["gamma"].astype(h.dtype) * h


def init_vocos(key, cfg: VocosConfig = VocosConfig()) -> dict:
    keys = jax.random.split(key, cfg.num_layers + 3)
    return {
        "embed": conv1d_init(keys[0], cfg.input_channels, cfg.dim, 7),
        "norm": layernorm_init(cfg.dim),
        "blocks": [
            init_convnext_v1_block(keys[2 + i], cfg.dim, cfg.intermediate_dim,
                                   1.0 / cfg.num_layers)
            for i in range(cfg.num_layers)
        ],
        "final_norm": layernorm_init(cfg.dim),
        "head": linear_init(keys[1], cfg.dim, cfg.n_fft + 2),
    }


def vocos_decode(p: dict, mel: jax.Array, cfg: VocosConfig = VocosConfig()) -> jax.Array:
    """[b, n_mels, T] log-mel -> [b, nw] waveform."""
    x = jnp.swapaxes(mel, 1, 2)  # NHC
    x = conv1d(p["embed"], x, padding=3)
    x = layernorm(p["norm"], x, eps=1e-6)
    for blk in p["blocks"]:
        x = convnext_v1_block(blk, x)
    x = layernorm(p["final_norm"], x, eps=1e-6)
    h = linear(p["head"], x)  # [b, T, n_fft + 2]
    n_half = cfg.n_fft // 2 + 1
    mag = jnp.exp(jnp.clip(h[..., :n_half], None, 1e2))
    phase = h[..., n_half:]
    real = mag * jnp.cos(phase)
    imag = mag * jnp.sin(phase)
    # [b, T, f] -> [b, f, T]
    real = jnp.swapaxes(real, 1, 2)
    imag = jnp.swapaxes(imag, 1, 2)
    if cfg.padding == "center":
        return istft(real, imag, cfg.n_fft, cfg.hop_length, cfg.n_fft, center=True)
    # "same": trim (n_fft - hop)//2 from both ends
    wav = istft(real, imag, cfg.n_fft, cfg.hop_length, cfg.n_fft, center=False)
    pad = (cfg.n_fft - cfg.hop_length) // 2
    return wav[..., pad:-pad]
