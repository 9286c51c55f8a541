"""Decompose the DiT sampling step on the real TPU: which part of the
~15.5 ms step is matmul, attention, elementwise/LN, conv-pos, vocoder.

Timings use host-scalar readback fences (the axon relay ignores
block_until_ready). Each variant is one jit; distinct shapes kept minimal.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

from korean_f5_tts_tpu.config import DiTConfig
from korean_f5_tts_tpu.models.dit import init_dit, precompute_step_modulations, _rope_table
from korean_f5_tts_tpu.models.modules import attention as attn_fn, feedforward, layernorm, linear
from korean_f5_tts_tpu.models import dit as dit_mod

DT = jnp.bfloat16
arch = DiTConfig(dim=1024, depth=22, heads=16, ff_mult=2, text_dim=512,
                 conv_layers=4, text_num_embeds=2545)
B, N = 2, 1536  # CFG-packed batch at the 512-frame bucket

key = jax.random.PRNGKey(0)
params = jax.tree_util.tree_map(
    lambda x: x.astype(DT) if x.dtype == jnp.float32 else x, init_dit(key, arch))
rng = np.random.default_rng(0)
h0 = jnp.asarray(rng.standard_normal((B, N, 1024)).astype(np.float32)).astype(DT)
mods0 = jnp.asarray(rng.standard_normal((22, 6 * 1024)).astype(np.float32)).astype(DT)
pad_mask = jnp.asarray(np.arange(N)[None, :] < 1376)


def bench(fn, args, iters=30, name=""):
    # params must be jit ARGUMENTS: closed-over arrays become HLO constants
    # and blow the relay's request-size limit (HTTP 413)
    f = jax.jit(fn)
    out = f(*args)
    float(jnp.abs(out).sum())  # compile+fence
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(iters)]
    for o in outs:
        float(jnp.abs(o).sum())
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({"name": name, "ms": round(dt, 3)}), flush=True)
    return dt


def full_blocks(params, h, mods):
    cos, sin = _rope_table(N, arch.dim_head)
    rope = (jnp.asarray(cos), jnp.asarray(sin))
    for i, blk in enumerate(params["blocks"]):
        e = mods[i][None, :].astype(h.dtype)
        s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = jnp.split(e, 6, axis=-1)
        norm = layernorm({}, h, eps=1e-6) * (1 + sc_msa[:, None]) + s_msa[:, None]
        a = attn_fn(blk["attn"], norm, arch.heads, mask=None, rope=rope,
                    pe_attn_head=arch.pe_attn_head, attn_mask_enabled=False,
                    pad_mask=pad_mask)
        h = h + g_msa[:, None] * a
        norm = layernorm({}, h, eps=1e-6) * (1 + sc_mlp[:, None]) + s_mlp[:, None]
        h = h + g_mlp[:, None] * feedforward(blk["ff"], norm)
    return h


def blocks_no_attn(params, h, mods):
    # attention replaced by identity: isolates matmuls + LN/elementwise
    for i, blk in enumerate(params["blocks"]):
        e = mods[i][None, :].astype(h.dtype)
        s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = jnp.split(e, 6, axis=-1)
        norm = layernorm({}, h, eps=1e-6) * (1 + sc_msa[:, None]) + s_msa[:, None]
        # qkv + to_out matmuls still run; only the attention core is skipped
        wqkv = jnp.concatenate([blk["attn"]["to_q"]["w"], blk["attn"]["to_k"]["w"],
                                blk["attn"]["to_v"]["w"]], axis=1).astype(h.dtype)
        qkv = norm @ wqkv
        a = linear(blk["attn"]["to_out"], qkv[..., :1024])
        h = h + g_msa[:, None] * a
        norm = layernorm({}, h, eps=1e-6) * (1 + sc_mlp[:, None]) + s_mlp[:, None]
        h = h + g_mlp[:, None] * feedforward(blk["ff"], norm)
    return h


def matmuls_only(params, h):
    # raw matmul chain, no LN / modulation / gates / residuals
    for blk in params["blocks"]:
        wqkv = jnp.concatenate([blk["attn"]["to_q"]["w"], blk["attn"]["to_k"]["w"],
                                blk["attn"]["to_v"]["w"]], axis=1).astype(h.dtype)
        qkv = h @ wqkv
        a = qkv[..., :1024] @ blk["attn"]["to_out"]["w"].astype(h.dtype)
        f = a @ blk["ff"]["in"]["w"].astype(h.dtype)
        h = jax.nn.gelu(f, approximate=True) @ blk["ff"]["out"]["w"].astype(h.dtype)
    return h


def attn_only(params, h):
    cos, sin = _rope_table(N, arch.dim_head)
    rope = (jnp.asarray(cos), jnp.asarray(sin))
    for blk in params["blocks"]:
        h = attn_fn(blk["attn"], h, arch.heads, mask=None, rope=rope,
                    pe_attn_head=arch.pe_attn_head, attn_mask_enabled=False,
                    pad_mask=pad_mask) * 0.01 + h
    return h


def ln_only(h):
    for blk in params["blocks"]:
        h = layernorm({}, h, eps=1e-6) * 1.0001
        h = layernorm({}, h, eps=1e-6) * 1.0001
    return h


def conv_pos_only(params, h):
    from korean_f5_tts_tpu.models.modules import conv_position_embedding

    for _ in range(8):
        h = conv_position_embedding(params["conv_pos_embed"], h, mask=pad_mask) * 0.1 + h
    return h


def vocoder_decode(vp, mel):
    from korean_f5_tts_tpu.models.vocos import VocosConfig, vocos_decode

    return vocos_decode(vp, mel, VocosConfig())


if __name__ == "__main__":
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    bench(full_blocks, (params, h0, mods0), name="22_blocks_full")
    bench(blocks_no_attn, (params, h0, mods0), name="22_blocks_attn_as_matmul")
    bench(matmuls_only, (params, h0), name="22_blocks_matmuls_only")
    bench(attn_only, (params, h0), name="22_attn_only(padmask)")
    bench(ln_only, (h0,), name="44_layernorms")
    bench(conv_pos_only, (params, h0), name="8x_conv_pos(pallas)")
    from korean_f5_tts_tpu.models.vocos import VocosConfig, init_vocos

    vp = jax.tree_util.tree_map(
        lambda x: x.astype(DT) if x.dtype == jnp.float32 else x,
        init_vocos(jax.random.PRNGKey(1), VocosConfig()))
    mel = jnp.asarray(rng.standard_normal((1, 100, 1024)).astype(np.float32)).astype(DT)
    bench(vocoder_decode, (vp, mel), iters=10, name="vocos_decode_1024f")
