"""DiT backbone: AdaLN-zero diffusion transformer for flow matching.

Capability parity with reference `src/f5_tts/model/backbones/dit.py` —
TextEmbedding (+ConvNeXtV2 stack + absolute sinusoidal pos, optional
zipvoice-style average upsampling, dit.py:32-115), InputEmbedding (concat
noise/cond/text -> proj + conv pos embed, dit.py:121-140), rotary DiT blocks,
optional long-skip, CFG-packed 2B forward (dit.py:296-305), zero-init output
layers (dit.py:214-224).

TPU-first design: pure functions over a param pytree; the text embedding is
computed once per sampling run outside the ODE scan and passed in as a
constant (replacing the reference's mutable text_cond/text_uncond cache,
dit.py:244-276); rope tables are host-precomputed per static seq_len.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from korean_f5_tts_tpu.config import DiTConfig
from korean_f5_tts_tpu.models.modules import (
    ada_layernorm_final,
    ada_layernorm_final_init,
    conv_position_embedding,
    conv_position_embedding_init,
    convnext_v2_block,
    convnext_v2_block_init,
    dit_block,
    dit_block_init,
    embedding,
    embedding_init,
    linear,
    linear_init,
    precompute_freqs_cis,
    rope_cos_sin,
    timestep_embedding,
    timestep_embedding_init,
)

PRECOMPUTE_MAX_POS = 8192  # ~87 s of 24 kHz audio at hop 256 (dit.py:46)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_text_embedding(key, cfg: DiTConfig) -> dict:
    keys = jax.random.split(key, cfg.conv_layers + 1)
    p = {"embed": embedding_init(keys[0], cfg.text_num_embeds + 1, cfg.text_dim_)}
    if cfg.conv_layers > 0:
        p["blocks"] = [
            convnext_v2_block_init(keys[i + 1], cfg.text_dim_, cfg.text_dim_ * cfg.conv_mult)
            for i in range(cfg.conv_layers)
        ]
    return p


def init_dit(key, cfg: DiTConfig) -> dict:
    keys = jax.random.split(key, cfg.depth + 6)
    p = {
        "time_embed": timestep_embedding_init(keys[0], cfg.dim),
        "text_embed": init_text_embedding(keys[1], cfg),
        "input_proj": linear_init(keys[2], cfg.mel_dim * 2 + cfg.text_dim_, cfg.dim),
        "conv_pos_embed": conv_position_embedding_init(keys[3], cfg.dim),
        "blocks": [
            dit_block_init(keys[5 + i], cfg.dim, cfg.heads, cfg.dim_head,
                           ff_mult=cfg.ff_mult, qk_norm=cfg.qk_norm)
            for i in range(cfg.depth)
        ],
        "norm_out": ada_layernorm_final_init(keys[4], cfg.dim),
        "proj_out": linear_init(jax.random.fold_in(keys[4], 1), cfg.dim, cfg.mel_dim),
    }
    if cfg.long_skip_connection:
        p["long_skip"] = linear_init(jax.random.fold_in(keys[4], 2), cfg.dim * 2, cfg.dim,
                                     bias=False)
    # zero-init final modulation + output projection (dit.py:220-224)
    p["norm_out"]["linear"]["w"] = jnp.zeros_like(p["norm_out"]["linear"]["w"])
    p["norm_out"]["linear"]["b"] = jnp.zeros_like(p["norm_out"]["linear"]["b"])
    p["proj_out"]["w"] = jnp.zeros_like(p["proj_out"]["w"])
    p["proj_out"]["b"] = jnp.zeros_like(p["proj_out"]["b"])
    return p


# ---------------------------------------------------------------------------
# text embedding
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _freqs_cis_table(dim: int) -> np.ndarray:
    return precompute_freqs_cis(dim, PRECOMPUTE_MAX_POS)


def _average_upsample(text: jax.Array, text_mask: jax.Array) -> jax.Array:
    """Zipvoice-style late average upsampling (dit.py:54-84), vectorised.

    Each of the text_len valid tokens is repeated to fill audio_len slots;
    the last `audio_len % text_len` tokens get one extra repeat.
    """
    b, n, d = text.shape
    text_lens = text_mask.sum(axis=1)  # [b]
    audio_len = n

    def one(row_text, row_mask, tl):
        tl = jnp.maximum(tl, 1)
        base = audio_len // tl
        rem = audio_len % tl
        pivot = tl - rem  # tokens < pivot repeat `base`, >= pivot repeat base+1
        o = jnp.arange(audio_len)
        tok = jnp.where(
            o < pivot * base,
            o // jnp.maximum(base, 1),
            pivot + (o - pivot * base) // jnp.maximum(base + 1, 1),
        )
        tok = jnp.clip(tok, 0, tl - 1)
        # map token ordinal -> position among valid indices
        valid_pos = jnp.cumsum(row_mask.astype(jnp.int32)) - 1  # position ordinal per index
        # gather: index of the tok-th valid element
        idx_of_ord = jnp.argsort(jnp.where(row_mask, valid_pos, n + jnp.arange(n)))
        src = idx_of_ord[tok]
        return row_text[src]

    out = jax.vmap(one)(text, text_mask, text_lens)
    return jnp.where((text_lens > 0)[:, None, None], out, jnp.zeros_like(out))


def text_embedding(p: dict, cfg: DiTConfig, text: jax.Array, seq_len: int,
                   drop_text=False, pad_mask: jax.Array | None = None) -> jax.Array:
    """[b, nt] token ids (pad=-1) -> [b, seq_len, text_dim].

    Parity with reference TextEmbedding.forward (dit.py:86-115): ids shifted
    +1 (0 = filler), truncated/padded to the mel length, optional ConvNeXt
    stack with padding re-masking, absolute sinusoidal position.
    drop_text may be a Python bool or traced 0/1 scalar (training CFG drop);
    the padding mask is derived from the pre-drop ids, as in the reference.
    pad_mask ([1, seq_len]): bucket-tail rows (absent in the reference run)
    that must be invisible to the ConvNeXt dwconv/GRN sequence stats; the
    within-seq filler rows keep reference semantics (text_mask_padding flag).
    """
    text = text + 1
    if text.shape[1] >= seq_len:
        text = text[:, :seq_len]
    else:
        text = jnp.pad(text, ((0, 0), (0, seq_len - text.shape[1])))
    text_mask = text != 0  # True where real token
    if isinstance(drop_text, bool):
        if drop_text:
            text = jnp.zeros_like(text)
    else:
        text = jnp.where(drop_text.astype(bool), jnp.zeros_like(text), text)
    h = embedding(p["embed"], text)

    if cfg.conv_layers > 0:
        valid = pad_mask[..., None] if pad_mask is not None else None
        table = jnp.asarray(_freqs_cis_table(cfg.text_dim_)[:seq_len])
        h = h + table[None, :, :].astype(h.dtype)
        if cfg.text_mask_padding:
            h = jnp.where(text_mask[..., None], h, 0.0)
            for blk in p["blocks"]:
                h = convnext_v2_block(blk, h, valid_mask=valid)
                h = jnp.where(text_mask[..., None], h, 0.0)
        else:
            for blk in p["blocks"]:
                h = convnext_v2_block(blk, h, valid_mask=valid)

    if getattr(cfg, "text_embedding_average_upsampling", False):
        h = _average_upsample(h, text_mask)
    return h


# ---------------------------------------------------------------------------
# input embedding + backbone
# ---------------------------------------------------------------------------


def input_embedding(p: dict, x: jax.Array, cond: jax.Array, text_embed: jax.Array,
                    drop_audio_cond=False, audio_mask: jax.Array | None = None) -> jax.Array:
    """concat(noise, cond, text) -> proj -> +conv pos embed (dit.py:121-140).

    drop_audio_cond may be a Python bool or a traced 0/1 scalar (training CFG).
    """
    if isinstance(drop_audio_cond, bool):
        if drop_audio_cond:
            cond = jnp.zeros_like(cond)
    else:
        cond = cond * (1.0 - drop_audio_cond).astype(cond.dtype)
    h = linear(p["input_proj"], jnp.concatenate([x, cond, text_embed], axis=-1))
    return conv_position_embedding(p["conv_pos_embed"], h, mask=audio_mask) + h


@functools.lru_cache(maxsize=32)
def _rope_table(seq_len: int, dim_head: int) -> tuple[np.ndarray, np.ndarray]:
    return rope_cos_sin(seq_len, dim_head)


def precompute_input_static(p: dict, cfg: DiTConfig, cond: jax.Array,
                            text_emb_cond: jax.Array,
                            text_emb_uncond: jax.Array) -> jax.Array:
    """Loop-invariant part of the CFG input projection, computed ONCE.

    input_proj(concat([x, cond, text])) decomposes over the feature axis as
    x @ Wx + (cond @ Wc + text @ Wt + b); only x changes across ODE steps, so
    the cond/text term (612 of 712 input features) is hoisted out of the
    sampling scan. For the uncond half the audio cond is dropped (zeros), so
    its static term is text-only. Returns [2b, n, dim].
    """
    w = p["input_proj"]["w"]
    m = cfg.mel_dim
    wc = w[m:2 * m]
    wt = w[2 * m:]
    b_ = p["input_proj"]["b"]
    dt = cond.dtype
    top = cond @ wc.astype(dt) + text_emb_cond @ wt.astype(dt) + b_.astype(dt)
    bottom = text_emb_uncond @ wt.astype(dt) + b_.astype(dt)
    return jnp.concatenate([top, bottom], axis=0)


def input_embedding_premix(p: dict, cfg: DiTConfig, x2: jax.Array,
                           static_inp: jax.Array,
                           audio_mask: jax.Array | None = None) -> jax.Array:
    """Per-step half of the decomposed input embedding (scan body)."""
    w = p["input_proj"]["w"]
    m = cfg.mel_dim
    h = x2 @ w[:m].astype(x2.dtype) + static_inp
    return conv_position_embedding(p["conv_pos_embed"], h, mask=audio_mask) + h


def dit_backbone(p: dict, cfg: DiTConfig, h: jax.Array, t_emb: jax.Array,
                 mask: jax.Array | None = None,
                 dropout_key: jax.Array | None = None,
                 pad_mask: jax.Array | None = None) -> jax.Array:
    """Embedded input [b, n, dim] + time emb [b, dim] -> flow pred [b, n, mel]."""
    seq_len = h.shape[1]
    cos, sin = _rope_table(seq_len, cfg.dim_head)
    rope = (jnp.asarray(cos), jnp.asarray(sin))

    residual = h if cfg.long_skip_connection else None

    block_fn = functools.partial(
        dit_block, heads=cfg.heads, mask=mask, rope=rope,
        pe_attn_head=cfg.pe_attn_head,
        attn_mask_enabled=cfg.attn_mask_enabled,
        pad_mask=pad_mask,
        dropout_rate=cfg.dropout if dropout_key is not None else 0.0,
    )
    remat_policy = None
    if cfg.checkpoint_activations and cfg.remat_policy == "dots":
        # selective remat: keep every matmul output resident (qkv/out/FF dots
        # dominate recompute cost at production dims), recompute only the
        # cheap elementwise ops (LN/modulation/gelu) on the backward pass —
        # the full-remat policy re-runs the whole block forward (~1 extra fwd
        # per step, the bwd-wall found in round 2)
        remat_policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        import os

        if os.environ.get("F5_TTS_REMAT_SAVE_ATTN", "1") != "0":
            # also keep the (non-dot) flash-attention kernel output resident
            # so the backward pass skips the flash fwd recompute — ~21 MB x
            # depth at b=8/n=1280, well within HBM next to the dot residuals
            remat_policy = jax.checkpoint_policies.save_from_both_policies(
                remat_policy,
                jax.checkpoint_policies.save_only_these_names("attn_out"),
            )
    for i, blk in enumerate(p["blocks"]):
        key_i = jax.random.fold_in(dropout_key, i) if dropout_key is not None else None
        if cfg.checkpoint_activations:
            h = jax.checkpoint(
                lambda hh, bb=blk, kk=key_i: block_fn(bb, hh, t_emb, key=kk),
                policy=remat_policy,
            )(h)
        else:
            h = block_fn(blk, h, t_emb, key=key_i)

    if residual is not None:
        h = linear(p["long_skip"], jnp.concatenate([h, residual], axis=-1))

    h = ada_layernorm_final(p["norm_out"], h, t_emb)
    return linear(p["proj_out"], h)


def dit_forward(p: dict, cfg: DiTConfig, x: jax.Array, cond: jax.Array,
                text: jax.Array, time: jax.Array,
                mask: jax.Array | None = None,
                drop_audio_cond=False, drop_text: bool = False,
                dropout_key: jax.Array | None = None,
                pad_mask: jax.Array | None = None) -> jax.Array:
    """Training-path forward (dit.py:278-329, cfg_infer=False)."""
    if time.ndim == 0:
        time = jnp.repeat(time[None], x.shape[0])
    t_emb = timestep_embedding(p["time_embed"], time)
    text_emb = text_embedding(p["text_embed"], cfg, text, x.shape[1],
                              drop_text=drop_text, pad_mask=pad_mask)
    h = input_embedding(p, x, cond, text_emb, drop_audio_cond=drop_audio_cond,
                        audio_mask=mask if mask is not None else pad_mask)
    return dit_backbone(p, cfg, h, t_emb, mask=mask, dropout_key=dropout_key,
                        pad_mask=pad_mask)


def precompute_step_modulations(p: dict, cfg: DiTConfig, ts: jax.Array):
    """AdaLN modulations for a static timestep schedule, computed once.

    The modulation vectors depend only on t (broadcast over batch), so for the
    sampling scan they can be batched into one matmul per projection instead
    of 23 tiny latency-bound [b, dim] x [dim, 6*dim] matmuls per step.
    Returns (mods [S, depth, 6*dim], mod_final [S, 2*dim], t_embs [S, dim]).
    """
    from korean_f5_tts_tpu.models.modules import linear, timestep_embedding

    t_embs = timestep_embedding(p["time_embed"], ts)  # [S, dim]
    silu_t = jax.nn.silu(t_embs)
    mods = jnp.stack(
        [linear(blk["attn_norm"]["linear"], silu_t) for blk in p["blocks"]], axis=1
    )  # [S, depth, 6*dim]
    mod_final = linear(p["norm_out"]["linear"], silu_t)  # [S, 2*dim]
    return mods, mod_final, t_embs


def dit_backbone_premod(p: dict, cfg: DiTConfig, h: jax.Array,
                        mods: jax.Array, mod_final: jax.Array,
                        mask: jax.Array | None = None,
                        pad_mask: jax.Array | None = None) -> jax.Array:
    """Backbone with precomputed per-block modulations (one sampling step).

    mods: [depth, 6*dim] (shared across the batch), mod_final: [2*dim].
    """
    from korean_f5_tts_tpu.models.modules import (
        attention as attn_fn,
        feedforward,
        layernorm,
    )

    seq_len = h.shape[1]
    cos, sin = _rope_table(seq_len, cfg.dim_head)
    rope = (jnp.asarray(cos), jnp.asarray(sin))
    residual = h if cfg.long_skip_connection else None

    import os as _os

    # fused half-block kernels (in-model RTF on v5e, headline protocol):
    #   FF half (ops/ff_block.py): 0.02235 vs 0.02261 unfused — the
    #     modulated-norm and GELU intermediates never round-trip HBM.
    #   attention linears (ops/fused_linears.py): AdaLN-norm+qkv projection
    #     in one program, output projection folded into the gated residual.
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    from korean_f5_tts_tpu.ops.attention import pallas_interpret_forced
    from korean_f5_tts_tpu.parallel.tp_kernels import ambient_tp_mesh

    kernels_ok = on_tpu or pallas_interpret_forced()
    # ambient ("data","model") mesh with model-parallelism active: the fused
    # half-block kernels run per-shard under shard_map (parallel/tp_kernels),
    # mirroring the reference's TRT-LLM TP split + all-reduce
    tp_mesh = ambient_tp_mesh()
    m_rows = h.shape[0] * seq_len
    use_ff_fused = (
        _os.environ.get("F5_TTS_FF_FUSED", "1") != "0"
        and kernels_ok and m_rows % 256 == 0
    )
    if use_ff_fused:
        from korean_f5_tts_tpu.ops.ff_block import ff_block_fused
    # the fused attention-linear path inlines qkv/rope/sdpa/out-proj, so it
    # is restricted to the shapes it reproduces exactly: fused-qkv weights,
    # no qk-norm, and reference-semantics masks handled via prefix lens.
    # Default OFF: in-model it measured 0.02327 vs 0.02235 — XLA already
    # fuses the LN/modulate into the qkv matmul and the pallas boundary
    # blocks that; the FF half (above) wins because XLA does NOT fuse
    # across the two FF matmuls. Kept for the int8 path where the in-kernel
    # quantize changes the tradeoff.
    use_attn_fused_ok = (
        kernels_ok and m_rows % 256 == 0 and mask is None and cfg.qk_norm is None
    )
    use_attn_fused = (
        _os.environ.get("F5_TTS_ATTN_LINEAR_FUSED", "0") != "0"
        and use_attn_fused_ok
    )
    if use_attn_fused_ok:
        from korean_f5_tts_tpu.models.modules import (
            _merge_heads,
            _split_heads,
            apply_rope,
        )
        from korean_f5_tts_tpu.ops.fused_linears import (
            ln_mod_matmul,
            proj_gated_residual,
        )

        prefix_lens = (pad_mask.sum(axis=-1, dtype=jnp.int32)
                       if pad_mask is not None else None)

    for i, blk in enumerate(p["blocks"]):
        e = mods[i][None, :].astype(h.dtype)  # [1, 6*dim]
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(
            e, 6, axis=-1
        )
        ap = blk["attn"]
        attn_int8 = (use_attn_fused_ok and all(
            "w_int8" in ap[k_] for k_ in ("to_q", "to_k", "to_v", "to_out")))
        attn_fusable = attn_int8 or (use_attn_fused and all(
            "w" in ap[k_] and "b" in ap[k_] for k_ in ("to_q", "to_k", "to_v", "to_out")))
        attn_tp_done = False
        if attn_fusable and tp_mesh is not None:
            # TP: the whole fused attention half-block under one shard_map
            # (heads split on "model"; see parallel/tp_kernels.py)
            from korean_f5_tts_tpu.ops.attention import _block as _blk
            from korean_f5_tts_tpu.parallel.tp_kernels import attn_half_block_tp

            uniform = pad_mask is not None and pad_mask.shape[0] == 1
            out_tp = attn_half_block_tp(
                h, scale_msa, shift_msa, gate_msa, ap, cfg.heads, rope,
                cfg.pe_attn_head, prefix_lens, uniform, tp_mesh,
                bq=_blk(seq_len, 256), bkv=512)
            if out_tp is not None:
                from korean_f5_tts_tpu.ops.attention import _record

                _record(f"attn-half-block{'-int8' if attn_int8 else ''}-tp"
                        f"[shard_map model={tp_mesh.shape['model']}]")
                h = out_tp
                attn_tp_done = True
        if attn_fusable and not attn_tp_done:
            if attn_int8:
                # int8 attention linears: per-projection scales concat into
                # one per-channel vector; LN prologue + quantize in-kernel
                from korean_f5_tts_tpu.ops.fused_linears import ln_mod_matmul_int8

                qp_qkv = {
                    "w_int8": jnp.concatenate(
                        [ap["to_q"]["w_int8"], ap["to_k"]["w_int8"],
                         ap["to_v"]["w_int8"]], axis=1),
                    "w_scale": jnp.concatenate(
                        [ap["to_q"]["w_scale"], ap["to_k"]["w_scale"],
                         ap["to_v"]["w_scale"]]),
                    "b": jnp.concatenate(
                        [ap["to_q"]["b"], ap["to_k"]["b"], ap["to_v"]["b"]]),
                }
                qkv = ln_mod_matmul_int8(h, scale_msa, shift_msa, qp_qkv)
            else:
                wqkv = jnp.concatenate(
                    [ap["to_q"]["w"], ap["to_k"]["w"], ap["to_v"]["w"]], axis=1
                ).astype(h.dtype)
                bqkv = jnp.concatenate(
                    [ap["to_q"]["b"], ap["to_k"]["b"], ap["to_v"]["b"]]
                ).astype(h.dtype)
                qkv = ln_mod_matmul(h, scale_msa, shift_msa, wqkv, bqkv)
            inner = (ap["to_q"]["w_int8"] if attn_int8
                     else ap["to_q"]["w"]).shape[1]
            q = _split_heads(qkv[..., :inner], cfg.heads)
            k = _split_heads(qkv[..., inner:2 * inner], cfg.heads)
            v = _split_heads(qkv[..., 2 * inner:], cfg.heads)
            q = apply_rope(q, rope[0], rope[1], cfg.pe_attn_head)
            k = apply_rope(k, rope[0], rope[1], cfg.pe_attn_head)
            from korean_f5_tts_tpu.ops.attention import sdpa

            a = _merge_heads(sdpa(q, k, v, pad_mask, prefix_lens=prefix_lens))
            if attn_int8:
                from korean_f5_tts_tpu.ops.fused_linears import (
                    proj_gated_residual_int8,
                )

                h = proj_gated_residual_int8(a, h, gate_msa, ap["to_out"])
            else:
                h = proj_gated_residual(a, h, gate_msa,
                                        ap["to_out"]["w"].astype(h.dtype),
                                        ap["to_out"]["b"].astype(h.dtype))
        elif not attn_tp_done:
            norm = layernorm({}, h, eps=1e-6) * (1 + scale_msa[:, None]) + shift_msa[:, None]
            attn_out = attn_fn(blk["attn"], norm, cfg.heads, mask=mask, rope=rope,
                               pe_attn_head=cfg.pe_attn_head,
                               attn_mask_enabled=cfg.attn_mask_enabled,
                               pad_mask=pad_mask)
            h = h + gate_msa[:, None] * attn_out
        ff_tp_done = False
        if use_ff_fused and tp_mesh is not None and "in" in blk["ff"]:
            # TP: fused FF half-block per shard + psum (parallel/tp_kernels)
            if "w_int8" in blk["ff"]["in"]:
                from korean_f5_tts_tpu.parallel.tp_kernels import ff_block_int8_tp

                out_tp = ff_block_int8_tp(h, scale_mlp, shift_mlp, gate_mlp,
                                          blk["ff"]["in"], blk["ff"]["out"],
                                          tp_mesh)
            elif "w" in blk["ff"]["in"]:
                from korean_f5_tts_tpu.parallel.tp_kernels import ff_block_tp

                out_tp = ff_block_tp(h, scale_mlp, shift_mlp, gate_mlp,
                                     blk["ff"]["in"]["w"], blk["ff"]["in"]["b"],
                                     blk["ff"]["out"]["w"], blk["ff"]["out"]["b"],
                                     tp_mesh)
            else:
                out_tp = None
            if out_tp is not None:
                from korean_f5_tts_tpu.ops.attention import _record

                _record(
                    f"ff-fused{'-int8' if 'w_int8' in blk['ff']['in'] else ''}"
                    f"-tp[shard_map model={tp_mesh.shape['model']}]")
                h = out_tp
                ff_tp_done = True
        if ff_tp_done:
            pass
        elif use_ff_fused and "in" in blk["ff"] and "w_int8" in blk["ff"]["in"]:
            # int8-weight FF half-block: LN prologue + both dynamic
            # activation quantizations in-kernel (models/quant.py layout)
            from korean_f5_tts_tpu.ops.ff_block import ff_block_fused_int8

            h = ff_block_fused_int8(h, scale_mlp, shift_mlp, gate_mlp,
                                    blk["ff"]["in"], blk["ff"]["out"])
        elif use_ff_fused and "in" in blk["ff"] and "w" in blk["ff"]["in"]:
            # whole FF half-block in ONE pallas program (ops/ff_block.py):
            # the modulated-norm and GELU intermediates never touch HBM
            h = ff_block_fused(
                h, scale_mlp, shift_mlp, gate_mlp,
                blk["ff"]["in"]["w"].astype(h.dtype), blk["ff"]["in"]["b"].astype(h.dtype),
                blk["ff"]["out"]["w"].astype(h.dtype), blk["ff"]["out"]["b"].astype(h.dtype),
            )
        else:
            norm = layernorm({}, h, eps=1e-6) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
            h = h + gate_mlp[:, None] * feedforward(blk["ff"], norm)

    if residual is not None:
        h = linear(p["long_skip"], jnp.concatenate([h, residual], axis=-1))

    ef = mod_final[None, :].astype(h.dtype)
    scale, shift = jnp.split(ef, 2, axis=-1)
    h = layernorm({}, h, eps=1e-6) * (1 + scale)[:, None, :] + shift[:, None, :]
    return linear(p["proj_out"], h)


def _double_mask(mask: jax.Array | None) -> jax.Array | None:
    """Duplicate a [b, n] mask for the CFG-packed 2B batch; [1, n] masks
    broadcast as-is (keeps the batch-uniform fast attention path)."""
    if mask is None or mask.shape[0] == 1:
        return mask
    return jnp.concatenate([mask, mask], axis=0)


def dit_forward_cfg_premod(p: dict, cfg: DiTConfig, x: jax.Array, cond: jax.Array,
                           text_emb_cond: jax.Array, text_emb_uncond: jax.Array,
                           mods: jax.Array, mod_final: jax.Array,
                           cfg_strength: float,
                           mask: jax.Array | None = None,
                           pad_mask: jax.Array | None = None,
                           static_inp: jax.Array | None = None) -> jax.Array:
    """CFG step with precomputed modulations (sampling-scan body).

    static_inp: loop-invariant input-projection term from
    precompute_input_static — when given, only the x part of the input
    projection (mel_dim of the 712 input features) runs per step.
    """
    x2 = jnp.concatenate([x, x], axis=0)
    mask2 = _double_mask(mask)
    audio_mask = mask2 if mask2 is not None else pad_mask
    if static_inp is not None:
        h = input_embedding_premix(p, cfg, x2, static_inp, audio_mask=audio_mask)
    else:
        cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
        te2 = jnp.concatenate([text_emb_cond, text_emb_uncond], axis=0)
        h = input_embedding(p, x2, cond2, te2, drop_audio_cond=False,
                            audio_mask=audio_mask)
    out = dit_backbone_premod(p, cfg, h, mods, mod_final, mask=mask2,
                              pad_mask=pad_mask)
    pred, null_pred = jnp.split(out, 2, axis=0)
    return pred + (pred - null_pred) * cfg_strength


def dit_forward_cfg(p: dict, cfg: DiTConfig, x: jax.Array, cond: jax.Array,
                    text_emb_cond: jax.Array, text_emb_uncond: jax.Array,
                    time: jax.Array, cfg_strength: float,
                    mask: jax.Array | None = None,
                    pad_mask: jax.Array | None = None) -> jax.Array:
    """Classifier-free-guided sampling step: packed 2B forward + guidance.

    Parity with dit.py:296-305 + cfm.py:180-191, with text embeddings hoisted
    out of the ODE loop (they are time-independent).
    """
    if time.ndim == 0:
        time = jnp.repeat(time[None], x.shape[0])
    t_emb = timestep_embedding(p["time_embed"], time)
    # pack cond/uncond BEFORE the input embedding so the projection and the
    # grouped position convs run once at batch 2b (better MXU occupancy than
    # two b-sized dispatches)
    x2 = jnp.concatenate([x, x], axis=0)
    cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
    te2 = jnp.concatenate([text_emb_cond, text_emb_uncond], axis=0)
    mask2 = _double_mask(mask)
    h = input_embedding(p, x2, cond2, te2, drop_audio_cond=False,
                        audio_mask=mask2 if mask2 is not None else pad_mask)
    t2 = jnp.concatenate([t_emb, t_emb], axis=0)
    out = dit_backbone(p, cfg, h, t2, mask=mask2, pad_mask=pad_mask)
    pred, null_pred = jnp.split(out, 2, axis=0)
    return pred + (pred - null_pred) * cfg_strength


def count_params(p) -> int:
    return sum(int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(p))
