"""ECAPA-TDNN speaker encoder (JAX) for speaker-similarity evaluation.

Capability parity with reference `src/f5_tts/eval/ecapa_tdnn.py` (torch
ECAPA-TDNN with a WavLM feature front-end used by `run_sim`,
utils_eval.py:380-426). This implementation runs over log-mel features from
`ops/mel.py` (the WavLM front-end requires downloadable weights); with a
trained checkpoint it plugs into `run_sim` as `embed_fn` via
`make_embed_fn`.

Architecture: conv stem -> 3 SE-Res2-TDNN blocks (dilations 2/3/4) ->
MFA concat conv -> attentive statistics pooling -> linear embedding.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from korean_f5_tts_tpu.models.modules import conv1d, conv1d_init, linear, linear_init
from korean_f5_tts_tpu.ops.mel import MelConfig, log_mel_spectrogram


@dataclasses.dataclass(frozen=True)
class EcapaConfig:
    feat_dim: int = 80
    channels: int = 512
    emb_dim: int = 192
    res2_scale: int = 8
    se_bottleneck: int = 128
    attn_bottleneck: int = 128


def _se_block_init(key, ch: int, bottleneck: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {"down": linear_init(k1, ch, bottleneck), "up": linear_init(k2, bottleneck, ch)}


def _se_block(p: dict, x: jax.Array) -> jax.Array:
    s = x.mean(axis=1)  # [b, ch]
    s = jax.nn.relu(linear(p["down"], s))
    s = jax.nn.sigmoid(linear(p["up"], s))
    return x * s[:, None, :]


def _res2_init(key, ch: int, scale: int, kernel: int) -> dict:
    keys = jax.random.split(key, scale - 1)
    w = ch // scale
    return {"convs": [conv1d_init(keys[i], w, w, kernel) for i in range(scale - 1)]}


def _res2_block(p: dict, x: jax.Array, scale: int, kernel: int, dilation: int) -> jax.Array:
    parts = jnp.split(x, scale, axis=-1)
    out = [parts[0]]
    prev = None
    pad = (kernel - 1) * dilation // 2
    for i in range(1, scale):
        h = parts[i] if prev is None else parts[i] + prev
        h = jax.nn.relu(conv1d(p["convs"][i - 1], h, padding=pad, dilation=dilation))
        out.append(h)
        prev = h
    return jnp.concatenate(out, axis=-1)


def _block_init(key, ch: int, cfg: EcapaConfig, kernel: int) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "conv1": conv1d_init(k1, ch, ch, 1),
        "res2": _res2_init(k2, ch, cfg.res2_scale, kernel),
        "conv2": conv1d_init(k3, ch, ch, 1),
        "se": _se_block_init(k4, ch, cfg.se_bottleneck),
    }


def _block(p: dict, x: jax.Array, cfg: EcapaConfig, kernel: int, dilation: int) -> jax.Array:
    h = jax.nn.relu(conv1d(p["conv1"], x, padding=0))
    h = _res2_block(p["res2"], h, cfg.res2_scale, kernel, dilation)
    h = jax.nn.relu(conv1d(p["conv2"], h, padding=0))
    h = _se_block(p["se"], h)
    return x + h


def init_ecapa(key, cfg: EcapaConfig = EcapaConfig()) -> dict:
    keys = jax.random.split(key, 8)
    ch = cfg.channels
    return {
        "stem": conv1d_init(keys[0], cfg.feat_dim, ch, 5),
        "blocks": [_block_init(keys[1 + i], ch, cfg, 3) for i in range(3)],
        "mfa": conv1d_init(keys[4], 3 * ch, 3 * ch, 1),
        "attn_down": conv1d_init(keys[5], 3 * ch, cfg.attn_bottleneck, 1),
        "attn_up": conv1d_init(keys[6], cfg.attn_bottleneck, 3 * ch, 1),
        "emb": linear_init(keys[7], 6 * ch, cfg.emb_dim),
    }


def ecapa_embed(p: dict, feats: jax.Array, cfg: EcapaConfig = EcapaConfig()) -> jax.Array:
    """[b, T, feat_dim] features -> [b, emb_dim] l2-normalised embedding."""
    x = jax.nn.relu(conv1d(p["stem"], feats, padding=2))
    outs = []
    for i, blk in enumerate(p["blocks"]):
        x = _block(blk, x, cfg, kernel=3, dilation=i + 2)
        outs.append(x)
    h = jax.nn.relu(conv1d(p["mfa"], jnp.concatenate(outs, axis=-1), padding=0))
    # attentive statistics pooling
    a = jnp.tanh(conv1d(p["attn_down"], h, padding=0))
    a = jax.nn.softmax(conv1d(p["attn_up"], a, padding=0), axis=1)
    mean = (a * h).sum(axis=1)
    var = (a * h * h).sum(axis=1) - mean**2
    std = jnp.sqrt(jnp.clip(var, 1e-7, None))
    emb = linear(p["emb"], jnp.concatenate([mean, std], axis=-1))
    return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)


def make_embed_fn(params: dict, cfg: EcapaConfig = EcapaConfig(),
                  sample_rate: int = 16_000):
    """Build `embed_fn(wav, sr)` for eval.utils_eval.run_sim."""
    mel_cfg = MelConfig(n_mel_channels=cfg.feat_dim, target_sample_rate=sample_rate,
                        n_fft=512, win_length=400, hop_length=160)
    fn = jax.jit(lambda feats: ecapa_embed(params, feats, cfg))

    def embed(wav: np.ndarray, sr: int) -> np.ndarray:
        from korean_f5_tts_tpu.utils.audio import resample

        if sr != sample_rate:
            wav = resample(np.asarray(wav, np.float32), sr, sample_rate)
        mel = log_mel_spectrogram(jnp.asarray(wav, jnp.float32)[None], mel_cfg)
        feats = jnp.swapaxes(mel, 1, 2)  # [1, T, feat]
        return np.asarray(fn(feats))[0]

    return embed
