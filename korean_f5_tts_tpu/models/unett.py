"""UNetT backbone (E2-TTS): flat UNet transformer with time-token prefix.

Capability parity with reference `src/f5_tts/model/backbones/unett.py`:
time embedding prepended as a sequence token (unett.py:244-247), first-half
layer outputs pushed and popped as skip connections into the second half with
concat+proj or add (unett.py:151-183, 254-270), RMSNorm pre-norm blocks,
rope over seq_len+1.

Same TPU-first conventions as dit.py: pure pytree functions, text embedding
hoisted out of the sampling loop, host-precomputed rope tables.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.config import UNetTConfig
from korean_f5_tts_tpu.models import dit as dit_mod
from korean_f5_tts_tpu.models.dit import _rope_table, init_text_embedding
from korean_f5_tts_tpu.models.modules import (
    attention,
    attention_init,
    conv_position_embedding,
    conv_position_embedding_init,
    feedforward,
    feedforward_init,
    linear,
    linear_init,
    rmsnorm,
    rmsnorm_init,
    timestep_embedding,
    timestep_embedding_init,
)

UNETT_PRECOMPUTE_MAX_POS = 4096  # unett.py:45


def init_unett(key, cfg: UNetTConfig) -> dict:
    assert cfg.depth % 2 == 0, "UNet-Transformer's depth should be even."
    keys = jax.random.split(key, cfg.depth + 5)
    layers = []
    for idx in range(cfg.depth):
        k = jax.random.split(keys[4 + idx], 4)
        layer = {
            "attn_norm": rmsnorm_init(cfg.dim),
            "attn": attention_init(k[0], cfg.dim, cfg.heads, cfg.dim_head,
                                   qk_norm=cfg.qk_norm),
            "ff_norm": rmsnorm_init(cfg.dim),
            "ff": feedforward_init(k[1], cfg.dim, mult=cfg.ff_mult),
        }
        if cfg.skip_connect_type == "concat" and idx >= cfg.depth // 2:
            layer["skip_proj"] = linear_init(k[2], cfg.dim * 2, cfg.dim, bias=False)
        layers.append(layer)
    return {
        "time_embed": timestep_embedding_init(keys[0], cfg.dim),
        "text_embed": init_text_embedding(keys[1], cfg),
        "input_proj": linear_init(keys[2], cfg.mel_dim * 2 + cfg.text_dim_, cfg.dim),
        "conv_pos_embed": conv_position_embedding_init(keys[3], cfg.dim),
        "layers": layers,
        "norm_out": rmsnorm_init(cfg.dim),
        "proj_out": linear_init(jax.random.fold_in(keys[2], 1), cfg.dim, cfg.mel_dim),
    }


def unett_text_embedding(p: dict, cfg: UNetTConfig, text: jax.Array, seq_len: int,
                         drop_text=False, pad_mask=None) -> jax.Array:
    # identical text-embedding semantics, pos table capped at 4096 (unett.py:45)
    return dit_mod.text_embedding(p, cfg, text, seq_len, drop_text=drop_text,
                                  pad_mask=pad_mask)


def _unett_input(p: dict, x, cond, text_emb, drop_audio_cond=False):
    if isinstance(drop_audio_cond, bool):
        if drop_audio_cond:
            cond = jnp.zeros_like(cond)
    else:
        cond = cond * (1.0 - drop_audio_cond).astype(cond.dtype)
    h = linear(p["input_proj"], jnp.concatenate([x, cond, text_emb], axis=-1))
    # NB: reference UNetT InputEmbedding never passes a mask to the conv
    # (unett.py:95-101), unlike DiT's
    return conv_position_embedding(p["conv_pos_embed"], h) + h


def unett_backbone(p: dict, cfg: UNetTConfig, h: jax.Array, t_emb: jax.Array,
                   mask: jax.Array | None = None,
                   dropout_key: jax.Array | None = None,
                   pad_mask: jax.Array | None = None) -> jax.Array:
    """Embedded [b, n, dim] + time emb -> flow pred [b, n, mel]."""
    # prepend time token (unett.py:244-247)
    h = jnp.concatenate([t_emb[:, None, :], h], axis=1)
    if mask is not None:
        mask = jnp.pad(mask, ((0, 0), (1, 0)), constant_values=True)
    if pad_mask is not None:
        pad_mask = jnp.pad(pad_mask, ((0, 0), (1, 0)), constant_values=True)

    seq_len = h.shape[1]
    cos, sin = _rope_table(seq_len, cfg.dim_head)
    rope = (jnp.asarray(cos), jnp.asarray(sin))

    skips = []
    for idx, layer in enumerate(p["layers"]):
        if idx < cfg.depth // 2:
            skips.append(h)
        else:
            skip = skips.pop()
            if cfg.skip_connect_type == "concat":
                h = linear(layer["skip_proj"], jnp.concatenate([h, skip], axis=-1))
            elif cfg.skip_connect_type == "add":
                h = h + skip
        key_i = jax.random.fold_in(dropout_key, idx) if dropout_key is not None else None
        h = attention(
            layer["attn"], rmsnorm(layer["attn_norm"], h), cfg.heads,
            mask=mask, rope=rope, pe_attn_head=cfg.pe_attn_head,
            attn_mask_enabled=getattr(cfg, 'attn_mask_enabled', False),
            pad_mask=pad_mask,
        ) + h
        h = feedforward(
            layer["ff"], rmsnorm(layer["ff_norm"], h),
            dropout_rate=cfg.dropout if key_i is not None else 0.0, key=key_i,
        ) + h
    assert not skips

    h = rmsnorm(p["norm_out"], h)[:, 1:, :]  # strip time token
    return linear(p["proj_out"], h)


def unett_forward(p: dict, cfg: UNetTConfig, x, cond, text, time,
                  mask=None, drop_audio_cond=False, drop_text=False,
                  dropout_key=None, pad_mask=None) -> jax.Array:
    """Training-path forward (unett.py:217-280, cfg_infer=False)."""
    if time.ndim == 0:
        time = jnp.repeat(time[None], x.shape[0])
    t_emb = timestep_embedding(p["time_embed"], time)
    text_emb = unett_text_embedding(p["text_embed"], cfg, text, x.shape[1],
                                    drop_text=drop_text, pad_mask=pad_mask)
    h = _unett_input(p, x, cond, text_emb, drop_audio_cond=drop_audio_cond)
    return unett_backbone(p, cfg, h, t_emb, mask=mask, dropout_key=dropout_key,
                          pad_mask=pad_mask)


def unett_forward_cfg(p: dict, cfg: UNetTConfig, x, cond,
                      text_emb_cond, text_emb_uncond, time, cfg_strength,
                      mask=None, pad_mask=None) -> jax.Array:
    """CFG-packed 2B sampling step (unett.py:235-240 + cfm.py:180-191)."""
    if time.ndim == 0:
        time = jnp.repeat(time[None], x.shape[0])
    t_emb = timestep_embedding(p["time_embed"], time)
    h_cond = _unett_input(p, x, cond, text_emb_cond, drop_audio_cond=False)
    h_uncond = _unett_input(p, x, cond, text_emb_uncond, drop_audio_cond=True)
    h = jnp.concatenate([h_cond, h_uncond], axis=0)
    t2 = jnp.concatenate([t_emb, t_emb], axis=0)
    mask2 = dit_mod._double_mask(mask)
    out = unett_backbone(p, cfg, h, t2, mask=mask2, pad_mask=pad_mask)
    pred, null_pred = jnp.split(out, 2, axis=0)
    return pred + (pred - null_pred) * cfg_strength
