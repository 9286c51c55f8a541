"""MMDiT backbone: SD3-style dual-stream (text ⊥ audio) joint-attention model.

Capability parity with reference `src/f5_tts/model/backbones/mmdit.py`:
TextEmbedding over the raw text length (abs sinus pos, max 1024,
mmdit.py:30-61), AudioEmbedding of (noise, cond) (mmdit.py:67-79), joint
blocks with `context_pre_only` on the last layer, AdaLN-zero init
(mmdit.py:131-143), separate rope for audio and text streams.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from korean_f5_tts_tpu.config import MMDiTConfig
from korean_f5_tts_tpu.models.modules import (
    ada_layernorm_final,
    ada_layernorm_final_init,
    conv_position_embedding,
    conv_position_embedding_init,
    embedding,
    embedding_init,
    linear,
    linear_init,
    mmdit_block,
    mmdit_block_init,
    precompute_freqs_cis,
    rope_cos_sin,
    timestep_embedding,
    timestep_embedding_init,
)

MMDIT_PRECOMPUTE_MAX_POS = 1024  # mmdit.py:37


@functools.lru_cache(maxsize=4)
def _pos_table(dim: int) -> np.ndarray:
    return precompute_freqs_cis(dim, MMDIT_PRECOMPUTE_MAX_POS)


@functools.lru_cache(maxsize=32)
def _rope(seq_len: int, dim_head: int):
    return rope_cos_sin(seq_len, dim_head)


def init_mmdit(key, cfg: MMDiTConfig) -> dict:
    keys = jax.random.split(key, cfg.depth + 4)
    p = {
        "time_embed": timestep_embedding_init(keys[0], cfg.dim),
        "text_embed": {"embed": embedding_init(keys[1], cfg.text_num_embeds + 1, cfg.dim)},
        "audio_proj": linear_init(keys[2], cfg.mel_dim * 2, cfg.dim),
        "conv_pos_embed": conv_position_embedding_init(keys[3], cfg.dim),
        "blocks": [
            mmdit_block_init(keys[4 + i], cfg.dim, cfg.heads, cfg.dim_head,
                             ff_mult=cfg.ff_mult,
                             context_pre_only=(i == cfg.depth - 1),
                             qk_norm=cfg.qk_norm)
            for i in range(cfg.depth)
        ],
        "norm_out": ada_layernorm_final_init(jax.random.fold_in(keys[0], 1), cfg.dim),
        "proj_out": linear_init(jax.random.fold_in(keys[0], 2), cfg.dim, cfg.mel_dim),
    }
    # AdaLN-zero init (mmdit.py:131-143)
    for blk in p["blocks"]:
        for norm_name in ("attn_norm_x", "attn_norm_c"):
            blk[norm_name]["linear"]["w"] = jnp.zeros_like(blk[norm_name]["linear"]["w"])
            blk[norm_name]["linear"]["b"] = jnp.zeros_like(blk[norm_name]["linear"]["b"])
    p["norm_out"]["linear"]["w"] = jnp.zeros_like(p["norm_out"]["linear"]["w"])
    p["norm_out"]["linear"]["b"] = jnp.zeros_like(p["norm_out"]["linear"]["b"])
    p["proj_out"]["w"] = jnp.zeros_like(p["proj_out"]["w"])
    p["proj_out"]["b"] = jnp.zeros_like(p["proj_out"]["b"])
    return p


def mmdit_text_embedding(p: dict, cfg: MMDiTConfig, text: jax.Array,
                         drop_text=False) -> jax.Array:
    """[b, nt] ids -> [b, nt, dim] with abs pos; padding masked (mmdit.py:40-61)."""
    text = text + 1
    text_mask = text != 0
    if isinstance(drop_text, bool):
        if drop_text:
            text = jnp.zeros_like(text)
    else:
        text = jnp.where(drop_text.astype(bool), jnp.zeros_like(text), text)
    h = embedding(p["embed"], text)
    nt = min(text.shape[1], MMDIT_PRECOMPUTE_MAX_POS)
    table = jnp.asarray(_pos_table(h.shape[-1])[:nt])
    if text.shape[1] > nt:  # clamp overflow positions to the last table row
        table = jnp.concatenate(
            [table, jnp.tile(table[-1:], (text.shape[1] - nt, 1))], axis=0
        )
    h = h + table[None].astype(h.dtype)
    if cfg.text_mask_padding:
        h = jnp.where(text_mask[..., None], h, 0.0)
    return h


def _audio_embed(p: dict, x, cond, drop_audio_cond=False, pad_mask=None):
    if isinstance(drop_audio_cond, bool):
        if drop_audio_cond:
            cond = jnp.zeros_like(cond)
    else:
        cond = cond * (1.0 - drop_audio_cond).astype(cond.dtype)
    h = linear(p["audio_proj"], jnp.concatenate([x, cond], axis=-1))
    # reference AudioEmbedding has no conv mask (mmdit.py:67-79); bucket-tail
    # rows (absent in the reference run) are zeroed so the conv sees the same
    # zero boundary an exact-length sequence would
    return conv_position_embedding(p["conv_pos_embed"], h, mask=pad_mask) + h


def mmdit_backbone(p: dict, cfg: MMDiTConfig, h: jax.Array, c: jax.Array,
                   t_emb: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    rope_audio = tuple(jnp.asarray(a) for a in _rope(h.shape[1], cfg.dim_head))
    rope_text = tuple(jnp.asarray(a) for a in _rope(c.shape[1], cfg.dim_head))
    for i, blk in enumerate(p["blocks"]):
        c, h = mmdit_block(blk, h, c, t_emb, cfg.heads,
                           context_pre_only=(i == cfg.depth - 1),
                           mask=mask, rope=rope_audio, c_rope=rope_text)
    h = ada_layernorm_final(p["norm_out"], h, t_emb)
    return linear(p["proj_out"], h)


def mmdit_forward(p: dict, cfg: MMDiTConfig, x, cond, text, time,
                  mask=None, drop_audio_cond=False, drop_text=False,
                  dropout_key=None, pad_mask=None) -> jax.Array:
    if time.ndim == 0:
        time = jnp.repeat(time[None], x.shape[0])
    t_emb = timestep_embedding(p["time_embed"], time)
    c = mmdit_text_embedding(p["text_embed"], cfg, text, drop_text=drop_text)
    h = _audio_embed(p, x, cond, drop_audio_cond=drop_audio_cond, pad_mask=pad_mask)
    # joint attention masks whenever a mask is present (modules.py:615-621),
    # so bucket-tail padding rides the mask argument directly
    eff_mask = mask if mask is not None else pad_mask
    return mmdit_backbone(p, cfg, h, c, t_emb, mask=eff_mask)


def mmdit_forward_cfg(p: dict, cfg: MMDiTConfig, x, cond,
                      text_emb_cond, text_emb_uncond, time, cfg_strength,
                      mask=None, pad_mask=None) -> jax.Array:
    """CFG-packed 2B step (mmdit.py:190-196). text_embs precomputed outside."""
    if time.ndim == 0:
        time = jnp.repeat(time[None], x.shape[0])
    t_emb = timestep_embedding(p["time_embed"], time)
    h_cond = _audio_embed(p, x, cond, drop_audio_cond=False, pad_mask=pad_mask)
    h_uncond = _audio_embed(p, x, cond, drop_audio_cond=True, pad_mask=pad_mask)
    h = jnp.concatenate([h_cond, h_uncond], axis=0)
    c = jnp.concatenate([text_emb_cond, text_emb_uncond], axis=0)
    t2 = jnp.concatenate([t_emb, t_emb], axis=0)
    eff_mask = mask if mask is not None else pad_mask
    if eff_mask is not None and eff_mask.shape[0] > 1:
        eff_mask = jnp.concatenate([eff_mask, eff_mask], axis=0)
    out = mmdit_backbone(p, cfg, h, c, t2, mask=eff_mask)
    pred, null_pred = jnp.split(out, 2, axis=0)
    return pred + (pred - null_pred) * cfg_strength
