"""Functional NN building blocks (param pytrees + pure apply fns).

Capability parity with reference `src/f5_tts/model/modules.py:149-787`
(SinusPositionEmbedding, ConvPositionEmbedding, GRN, ConvNeXtV2Block, RMSNorm,
AdaLayerNorm ×2, FeedForward, Attention + rope, DiTBlock, MMDiTBlock,
TimestepEmbedding) — re-designed as pure functions over nested-dict pytrees so
the whole model jits/pjits cleanly and checkpoints are plain pytrees.

Conventions:
  - Linear params {"w": [in, out], "b": [out]}; torch converters transpose.
  - Conv1d params {"w": [k, in/groups, out], "b": [out]} (HIO layout, NHC
    convs — channels-last is the TPU-friendly layout).
  - Rotary uses half-split (NeoX) form natively; torch checkpoints using
    interleaved x_transformers rope are converted by permuting to_q/to_k
    columns (attention logits are invariant to a shared q/k dim permutation).
  - Inits mirror torch defaults (kaiming-uniform linear/conv, N(0,1) embed)
    so from-scratch training matches reference behaviour.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name

from korean_f5_tts_tpu.ops import grouped_conv as _gconv


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def linear_init(key, d_in: int, d_out: int, bias: bool = True) -> dict:
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    p = {"w": jax.random.uniform(kw, (d_in, d_out), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound)
    return p


def linear(p: dict, x: jax.Array) -> jax.Array:
    if "w_int8" in p:  # opt-in quantized layout (models/quant.py)
        from korean_f5_tts_tpu.models.quant import qlinear

        return qlinear(p, x)
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def embedding_init(key, num: int, dim: int) -> dict:
    return {"w": jax.random.normal(key, (num, dim), jnp.float32)}


def embedding(p: dict, ids: jax.Array) -> jax.Array:
    return jnp.take(p["w"], ids, axis=0)


def layernorm_init(dim: int, affine: bool = True) -> dict:
    if not affine:
        return {}
    return {"g": jnp.ones((dim,), jnp.float32), "b": jnp.zeros((dim,), jnp.float32)}


def layernorm(p: dict, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if "g" in p:
        y = y * p["g"] + p["b"]
    return y.astype(x.dtype)


def rmsnorm_init(dim: int) -> dict:
    return {"g": jnp.ones((dim,), jnp.float32)}


def rmsnorm(p: dict, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt((xf * xf).mean(axis=-1, keepdims=True) + eps)
    return (y * p["g"]).astype(x.dtype)


def conv1d_init(key, c_in: int, c_out: int, kernel: int, groups: int = 1, bias: bool = True) -> dict:
    kw, kb = jax.random.split(key)
    fan_in = (c_in // groups) * kernel
    bound = 1.0 / math.sqrt(fan_in)
    p = {"w": jax.random.uniform(kw, (kernel, c_in // groups, c_out), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (c_out,), jnp.float32, -bound, bound)
    return p


def _depthwise_conv1d_shifts(p: dict, x: jax.Array, dilation: int = 1) -> jax.Array:
    """Depthwise conv1d (groups == channels) as k shifted elementwise FMAs.

    XLA's grouped-conv lowering degenerates for feature_group_count == C on
    TPU (scalar-ish MXU tiles); a 7-tap depthwise filter is just 7 broadcast
    multiplies over [b, n, c], which XLA fuses into ONE VPU pass. Exact same
    math ('SAME' zero padding), ~2 orders of magnitude faster for the Vocos
    ConvNeXt stack."""
    w = p["w"].astype(x.dtype)  # [k, 1, c]
    k = w.shape[0]
    pad = (dilation * (k - 1)) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    n = x.shape[1]
    y = None
    for t in range(k):
        term = jax.lax.slice_in_dim(xp, t * dilation, t * dilation + n, axis=1) * w[t, 0]
        y = term if y is None else y + term
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv1d(p: dict, x: jax.Array, groups: int = 1, padding: str | int = "SAME",
           dilation: int = 1) -> jax.Array:
    """x: [b, n, c_in] channels-last; kernel [k, c_in/groups, c_out]."""
    k = p["w"].shape[0]
    if (groups == x.shape[-1] and p["w"].shape[1] == 1 and k <= 16 and k % 2 == 1
            and (padding == "SAME" or padding == (dilation * (k - 1)) // 2)):
        return _depthwise_conv1d_shifts(p, x, dilation=dilation)
    if isinstance(padding, int):
        pad = [(padding, padding)]
    else:
        pad = padding
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(1,),
        padding=pad if isinstance(pad, list) else pad,
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def gelu_tanh(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=True)


def gelu_exact(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


def mish(x: jax.Array) -> jax.Array:
    return x * jnp.tanh(jax.nn.softplus(x))


def dropout(x: jax.Array, rate: float, key: jax.Array | None) -> jax.Array:
    if key is None or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


# ---------------------------------------------------------------------------
# positional embeddings
# ---------------------------------------------------------------------------


def sinus_position_embedding(x: jax.Array, dim: int, scale: float = 1000.0) -> jax.Array:
    """[b] positions -> [b, dim]; parity with modules.py:152-164."""
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    ang = scale * x.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def precompute_freqs_cis(dim: int, end: int, theta: float = 10000.0,
                         theta_rescale_factor: float = 1.0) -> np.ndarray:
    """Absolute sinusoidal table [end, dim] = cat(cos, sin) (modules.py:202-213).

    Used as the text-embedding absolute position signal in DiT.
    """
    theta = theta * theta_rescale_factor ** (dim / (dim - 2))
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2].astype(np.float64) / dim))
    t = np.arange(end, dtype=np.float64)
    ang = np.outer(t, freqs)
    return np.concatenate([np.cos(ang), np.sin(ang)], axis=-1).astype(np.float32)


def get_pos_embed_indices(start: jax.Array, length: int, max_pos: int,
                          scale: float | jax.Array = 1.0) -> jax.Array:
    """Parity with modules.py:216-225."""
    scale = scale * jnp.ones_like(start, dtype=jnp.float32)
    pos = start[:, None] + (
        jnp.arange(length, dtype=jnp.float32)[None, :] * scale[:, None]
    ).astype(start.dtype)
    return jnp.where(pos < max_pos, pos, max_pos - 1)


def rope_cos_sin(seq_len: int, dim_head: int, theta: float = 10000.0) -> tuple[np.ndarray, np.ndarray]:
    """Half-split rope tables cos/sin of shape [seq_len, dim_head // 2]."""
    inv_freq = 1.0 / (theta ** (np.arange(0, dim_head, 2).astype(np.float64) / dim_head))
    ang = np.outer(np.arange(seq_len, dtype=np.float64), inv_freq)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array,
               pe_attn_head: int | None = None) -> jax.Array:
    """Apply half-split rotary embedding to [b, h, n, d].

    pe_attn_head: only the first N heads get rope (F5TTS_Base uses 1,
    reference modules.py:491-494).
    """
    d2 = x.shape[-1] // 2
    cos = cos.astype(x.dtype)[None, None, : x.shape[2], :]
    sin = sin.astype(x.dtype)[None, None, : x.shape[2], :]
    x1, x2 = x[..., :d2], x[..., d2:]
    rx = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    if pe_attn_head is None:
        return rx
    head_sel = (jnp.arange(x.shape[1]) < pe_attn_head)[None, :, None, None]
    return jnp.where(head_sel, rx, x)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


def timestep_embedding_init(key, dim: int, freq_embed_dim: int = 256) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "mlp1": linear_init(k1, freq_embed_dim, dim),
        "mlp2": linear_init(k2, dim, dim),
    }


def timestep_embedding(p: dict, t: jax.Array) -> jax.Array:
    """[b] diffusion times -> [b, dim]; parity with modules.py:777-787."""
    freq_embed_dim = p["mlp1"]["w"].shape[0]
    h = sinus_position_embedding(t, freq_embed_dim)
    h = h.astype(t.dtype) if t.dtype != jnp.int32 else h
    return linear(p["mlp2"], jax.nn.silu(linear(p["mlp1"], h)))


def conv_position_embedding_init(key, dim: int, kernel_size: int = 31, groups: int = 16) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "conv1": conv1d_init(k1, dim, dim, kernel_size, groups=groups),
        "conv2": conv1d_init(k2, dim, dim, kernel_size, groups=groups),
    }


def _grouped_conv_as_batched(p: dict, x: jax.Array, groups: int, pad: int) -> jax.Array:
    """Grouped conv1d lowered as a vmapped dense conv (group -> batch).

    Identical math to feature_group_count=groups; measured ~25% faster on v5e
    where XLA's grouped-conv lowering underutilises the MXU.
    """
    b, n, c = x.shape
    cg = c // groups
    k = p["w"].shape[0]
    xg = x.reshape(b, n, groups, cg).transpose(2, 0, 1, 3)  # [g, b, n, cg]
    wg = p["w"].astype(x.dtype).reshape(k, cg, groups, cg).transpose(2, 0, 1, 3)

    def one(xx, ww):
        return jax.lax.conv_general_dilated(
            xx, ww, (1,), [(pad, pad)], dimension_numbers=("NHC", "HIO", "NHC")
        )

    y = jax.vmap(one)(xg, wg)  # [g, b, n, cg]
    y = y.transpose(1, 2, 0, 3).reshape(b, n, c)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv_position_embedding(p: dict, x: jax.Array, mask: jax.Array | None = None,
                            groups: int = 16, kernel_size: int = 31) -> jax.Array:
    """[b, n, d] -> [b, n, d]; masked grouped convs + Mish (modules.py:170-196).

    On TPU with lane-friendly shapes this runs the fused Pallas kernel
    (ops/grouped_conv.py: conv + bias + Mish in one pass, ~1.6x the XLA
    grouped-conv on v5e); masking commutes with the fused Mish because
    mish(0) == 0. Set F5_TTS_PALLAS_CONVPOS=0 to force the XLA path.
    """
    pad = kernel_size // 2
    if mask is not None:
        m = mask[..., None]
        x = jnp.where(m, x, 0.0)
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    from korean_f5_tts_tpu.ops.attention import pallas_interpret_forced

    interp = not on_tpu and pallas_interpret_forced()
    if ((on_tpu or interp) and _gconv.use_pallas_conv_pos()
            and _gconv.pallas_conv_supported(x.shape[-1], groups, kernel_size)):
        try:
            y = _gconv.grouped_conv1d_mish(x, p["conv1"]["w"], p["conv1"].get("b"),
                                           groups=groups, interpret=interp)
            if mask is not None:
                y = jnp.where(m, y, 0.0)
            y = _gconv.grouped_conv1d_mish(y, p["conv2"]["w"], p["conv2"].get("b"),
                                           groups=groups, interpret=interp)
            if mask is not None:
                y = jnp.where(m, y, 0.0)
            return y
        except Exception:
            pass
    y = _grouped_conv_as_batched(p["conv1"], x, groups, pad)
    if mask is not None:
        y = jnp.where(m, y, 0.0)
    y = mish(y)
    y = _grouped_conv_as_batched(p["conv2"], y, groups, pad)
    if mask is not None:
        y = jnp.where(m, y, 0.0)
    return mish(y)


def grn_init(dim: int) -> dict:
    return {"gamma": jnp.zeros((1, 1, dim), jnp.float32),
            "beta": jnp.zeros((1, 1, dim), jnp.float32)}


def grn(p: dict, x: jax.Array) -> jax.Array:
    """Global response norm over the sequence dim (modules.py:231-240)."""
    gx = jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2, axis=1, keepdims=True))
    nx = gx / (gx.mean(axis=-1, keepdims=True) + 1e-6)
    return (p["gamma"] * (x * nx.astype(x.dtype)) + p["beta"] + x).astype(x.dtype)


def convnext_v2_block_init(key, dim: int, intermediate_dim: int, dilation: int = 1) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "dwconv": conv1d_init(k1, dim, dim, 7, groups=dim),
        "norm": layernorm_init(dim),
        "pw1": linear_init(k2, dim, intermediate_dim),
        "grn": grn_init(intermediate_dim),
        "pw2": linear_init(k3, intermediate_dim, dim),
    }


def convnext_v2_block(p: dict, x: jax.Array, dilation: int = 1,
                      valid_mask: jax.Array | None = None) -> jax.Array:
    """ConvNeXt-V2 block on [b, n, d] (modules.py:247-275).

    valid_mask ([1, n, 1] bool): rows past it are shape-bucketing padding that
    does not exist in the reference run. They are zeroed at the two
    sequence-mixing ops — the dwconv input (so valid rows see the same
    zero boundary a shorter unpadded sequence would) and the GRN input (whose
    global L2 stats would otherwise absorb the padded tail) — which makes the
    valid region bit-compatible with an exact-length run.
    """
    residual = x
    pad = (dilation * (7 - 1)) // 2
    if valid_mask is not None:
        x = jnp.where(valid_mask, x, 0.0)
    h = conv1d(p["dwconv"], x, groups=x.shape[-1], padding=pad, dilation=dilation)
    h = layernorm(p["norm"], h, eps=1e-6)
    h = gelu_exact(linear(p["pw1"], h))
    if valid_mask is not None:
        h = jnp.where(valid_mask, h, 0.0)
    h = grn(p["grn"], h)
    return residual + linear(p["pw2"], h)


def ada_layernorm_init(key, dim: int) -> dict:
    return {"linear": linear_init(key, dim, dim * 6)}


def ada_layernorm(p: dict, x: jax.Array, emb: jax.Array):
    """AdaLN-zero: returns modulated x + (gate_msa, shift_mlp, scale_mlp, gate_mlp)."""
    e = linear(p["linear"], jax.nn.silu(emb))
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(e, 6, axis=-1)
    xn = layernorm({}, x, eps=1e-6)
    xn = xn * (1 + scale_msa[:, None]) + shift_msa[:, None]
    return xn, gate_msa, shift_mlp, scale_mlp, gate_mlp


def ada_layernorm_final_init(key, dim: int) -> dict:
    return {"linear": linear_init(key, dim, dim * 2)}


def ada_layernorm_final(p: dict, x: jax.Array, emb: jax.Array) -> jax.Array:
    e = linear(p["linear"], jax.nn.silu(emb))
    scale, shift = jnp.split(e, 2, axis=-1)
    return layernorm({}, x, eps=1e-6) * (1 + scale)[:, None, :] + shift[:, None, :]


def feedforward_init(key, dim: int, mult: int = 4, dim_out: int | None = None) -> dict:
    k1, k2 = jax.random.split(key)
    inner = int(dim * mult)
    return {"in": linear_init(k1, dim, inner), "out": linear_init(k2, inner, dim_out or dim)}


def feedforward(p: dict, x: jax.Array, dropout_rate: float = 0.0,
                key: jax.Array | None = None, approximate: bool = True) -> jax.Array:
    act = gelu_tanh if approximate else gelu_exact
    h = act(linear(p["in"], x))
    h = dropout(h, dropout_rate, key)
    return linear(p["out"], h)


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------


def attention_init(key, dim: int, heads: int, dim_head: int,
                   qk_norm: str | None = None,
                   context_dim: int | None = None,
                   context_pre_only: bool = False) -> dict:
    keys = jax.random.split(key, 8)
    inner = heads * dim_head
    p = {
        "to_q": linear_init(keys[0], dim, inner),
        "to_k": linear_init(keys[1], dim, inner),
        "to_v": linear_init(keys[2], dim, inner),
        "to_out": linear_init(keys[3], inner, dim),
    }
    if qk_norm == "rms_norm":
        p["q_norm"] = rmsnorm_init(dim_head)
        p["k_norm"] = rmsnorm_init(dim_head)
    if context_dim is not None:
        p["to_q_c"] = linear_init(keys[4], context_dim, inner)
        p["to_k_c"] = linear_init(keys[5], context_dim, inner)
        p["to_v_c"] = linear_init(keys[6], context_dim, inner)
        if qk_norm == "rms_norm":
            p["c_q_norm"] = rmsnorm_init(dim_head)
            p["c_k_norm"] = rmsnorm_init(dim_head)
        if not context_pre_only:
            p["to_out_c"] = linear_init(keys[7], inner, context_dim)
    return p


def scaled_dot_product_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                                 mask: jax.Array | None = None,
                                 prefix_lens: jax.Array | None = None) -> jax.Array:
    """[b, h, n, d] SDPA with optional [b, n] key-padding mask.

    prefix_lens: per-item valid-prefix lengths when `mask` is a prefix mask
    (all duration/bucket masks are) — enables the Pallas prefix-flash kernel.
    Dispatches to the Pallas TPU kernels when profitable (ops/attention.py);
    XLA fp32-softmax path otherwise.
    """
    from korean_f5_tts_tpu.ops.attention import sdpa

    return sdpa(q, k, v, mask, prefix_lens=prefix_lens)


def _split_heads(x: jax.Array, heads: int) -> jax.Array:
    b, n, _ = x.shape
    return x.reshape(b, n, heads, -1).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def attention(p: dict, x: jax.Array, heads: int,
              mask: jax.Array | None = None,
              rope: tuple[jax.Array, jax.Array] | None = None,
              pe_attn_head: int | None = None,
              attn_mask_enabled: bool = True,
              pad_mask: jax.Array | None = None) -> jax.Array:
    """Self-attention used by DiTBlock (modules.py:445-544).

    mask: the reference-semantics duration mask — applied to attention logits
    only when attn_mask_enabled (modules.py:500-506); always applied to the
    output rows (modules.py:540-543). CONTRACT: any [b, n] mask passed here
    must be a PREFIX mask (mask[i] == arange(n) < lens[i]) — every mask the
    framework produces is one (lens_to_mask / bucket tails), and the TPU
    path compresses it to one length per item for the prefix-flash kernel,
    which would silently mis-attend on a non-prefix (holey) mask. Set
    F5_TTS_CHECK_PREFIX_MASK=1 to assert the contract at trace time.
    pad_mask ([1, n]): bucket-tail padding introduced by this framework's
    shape bucketing. The reference never pads these rows, so they must be
    invisible to attention logits REGARDLESS of attn_mask_enabled; being
    batch-uniform it rides the fast shared-segment splash path on TPU.
    """
    if attn_mask_enabled and mask is not None:
        attn_mask = mask
    else:
        attn_mask = pad_mask
    # duration masks and bucket-tail masks are prefix masks by construction
    # (lens_to_mask / arange < total_len), so one length per item fully
    # describes them — the TPU prefix-flash kernels run masked attention at
    # unmasked speed instead of falling back to materialised [n, n] logits
    prefix_lens = attn_mask.sum(axis=-1, dtype=jnp.int32) if attn_mask is not None else None
    if (prefix_lens is not None and os.environ.get("F5_TTS_CHECK_PREFIX_MASK") == "1"
            and not isinstance(attn_mask, jax.core.Tracer)):
        # debug guard for the prefix-mask contract (see docstring): a holey
        # mask has the same sum as a prefix mask but differs from
        # arange(n) < lens. Eager-only — under jit the mask is a tracer and
        # can't be validated without a host callback.
        import numpy as _np
        m = _np.asarray(attn_mask, dtype=bool)
        lens = m.sum(axis=-1)
        expect = _np.arange(m.shape[-1])[None, :] < lens[:, None]
        if not _np.array_equal(expect, m):
            raise ValueError("attention(): non-prefix [b,n] mask passed; the TPU "
                             "prefix-flash path would silently mis-attend")
    fused_qkv = all("w" in p[k] and "b" in p[k] for k in ("to_q", "to_k", "to_v"))
    qkv = None
    if fused_qkv:
        # fuse qkv into one matmul; the weight concat is loop-invariant and
        # hoisted out of the sampling scan by XLA
        wqkv = jnp.concatenate(
            [p["to_q"]["w"], p["to_k"]["w"], p["to_v"]["w"]], axis=1
        ).astype(x.dtype)
        bqkv = jnp.concatenate(
            [p["to_q"]["b"], p["to_k"]["b"], p["to_v"]["b"]]
        ).astype(x.dtype)
        qkv = x @ wqkv + bqkv
        if "q_norm" not in p:
            # TPU fused-layout kernel: rope + attention straight from the qkv
            # matmul output — the head split/merge transposes and rope passes
            # never materialise in HBM (ops/flash_prefix.py)
            from korean_f5_tts_tpu.ops.attention import qkv_fused_sdpa

            fused_out = qkv_fused_sdpa(qkv, heads, rope, pe_attn_head, prefix_lens)
            if fused_out is not None:
                fused_out = _checkpoint_name(fused_out, "attn_out")
                out = linear(p["to_out"], fused_out)
                if mask is not None:
                    out = jnp.where(mask[..., None], out, 0.0)
                return out
        inner = p["to_q"]["w"].shape[1]
        q = _split_heads(qkv[..., :inner], heads)
        k = _split_heads(qkv[..., inner: 2 * inner], heads)
        v = _split_heads(qkv[..., 2 * inner:], heads)
    else:  # quantized or bias-less layouts use the per-projection path
        q = _split_heads(linear(p["to_q"], x), heads)
        k = _split_heads(linear(p["to_k"], x), heads)
        v = _split_heads(linear(p["to_v"], x), heads)
    if "q_norm" in p:
        q = rmsnorm(p["q_norm"], q)
        k = rmsnorm(p["k_norm"], k)
    attn_core = None
    if rope is not None and "q_norm" not in p:
        # opt-in TPU path: rope applied in-register inside the prefix-flash
        # kernel (q/k passed pre-rope; saves the separate rope HBM passes)
        from korean_f5_tts_tpu.ops.attention import rope_prefix_sdpa

        uniform = attn_mask is not None and attn_mask.shape[0] == 1
        attn_core = rope_prefix_sdpa(q, k, v, prefix_lens, rope, pe_attn_head,
                                     uniform)
    if attn_core is None:
        if rope is not None:
            cos, sin = rope
            q = apply_rope(q, cos, sin, pe_attn_head)
            k = apply_rope(k, cos, sin, pe_attn_head)
        attn_core = scaled_dot_product_attention(q, k, v, attn_mask,
                                                 prefix_lens=prefix_lens)
    # named so the "dots" remat policy can keep it resident: the flash
    # kernel's output is not a dot_general, so the policy would otherwise
    # recompute the whole flash forward during the backward pass
    attn_core = _checkpoint_name(attn_core, "attn_out")
    out = _merge_heads(attn_core)
    out = linear(p["to_out"], out)
    if mask is not None:
        out = jnp.where(mask[..., None], out, 0.0)
    # NB: bucket-tail (pad_mask-only) rows are NOT zeroed here: they are
    # already invisible to valid rows (prefix-masked attention keys), nothing
    # downstream mixes positions, and the host wrapper slices them off — so
    # the per-block [b, n, d] select would be 22 wasted HBM passes per step.
    return out


def joint_attention(p: dict, x: jax.Array, c: jax.Array, heads: int,
                    mask: jax.Array | None = None,
                    rope: tuple[jax.Array, jax.Array] | None = None,
                    c_rope: tuple[jax.Array, jax.Array] | None = None,
                    context_pre_only: bool = False):
    """MM-DiT joint attention over [x; c] streams (modules.py:551-645)."""
    n_x = x.shape[1]
    q = _split_heads(linear(p["to_q"], x), heads)
    k = _split_heads(linear(p["to_k"], x), heads)
    v = _split_heads(linear(p["to_v"], x), heads)
    cq = _split_heads(linear(p["to_q_c"], c), heads)
    ck = _split_heads(linear(p["to_k_c"], c), heads)
    cv = _split_heads(linear(p["to_v_c"], c), heads)
    if "q_norm" in p:
        q, k = rmsnorm(p["q_norm"], q), rmsnorm(p["k_norm"], k)
    if "c_q_norm" in p:
        cq, ck = rmsnorm(p["c_q_norm"], cq), rmsnorm(p["c_k_norm"], ck)
    if rope is not None:
        q = apply_rope(q, *rope)
        k = apply_rope(k, *rope)
    if c_rope is not None:
        cq = apply_rope(cq, *c_rope)
        ck = apply_rope(ck, *c_rope)
    q = jnp.concatenate([q, cq], axis=2)
    k = jnp.concatenate([k, ck], axis=2)
    v = jnp.concatenate([v, cv], axis=2)
    attn_mask = None
    if mask is not None:
        attn_mask = jnp.pad(mask, ((0, 0), (0, c.shape[1])), constant_values=True)
    out = _merge_heads(scaled_dot_product_attention(q, k, v, attn_mask))
    x_out, c_out = out[:, :n_x], out[:, n_x:]
    x_out = linear(p["to_out"], x_out)
    if not context_pre_only:
        c_out = linear(p["to_out_c"], c_out)
    if mask is not None:
        x_out = jnp.where(mask[..., None], x_out, 0.0)
    return x_out, c_out


# ---------------------------------------------------------------------------
# DiT / MMDiT blocks
# ---------------------------------------------------------------------------


def dit_block_init(key, dim: int, heads: int, dim_head: int, ff_mult: int = 4,
                   qk_norm: str | None = None) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "attn_norm": ada_layernorm_init(k1, dim),
        "attn": attention_init(k2, dim, heads, dim_head, qk_norm=qk_norm),
        "ff": feedforward_init(k3, dim, mult=ff_mult),
    }
    # AdaLN-zero init (dit.py:216-218)
    p["attn_norm"]["linear"]["w"] = jnp.zeros_like(p["attn_norm"]["linear"]["w"])
    p["attn_norm"]["linear"]["b"] = jnp.zeros_like(p["attn_norm"]["linear"]["b"])
    return p


def dit_block(p: dict, x: jax.Array, t: jax.Array, heads: int,
              mask: jax.Array | None = None,
              rope: tuple[jax.Array, jax.Array] | None = None,
              pe_attn_head: int | None = None,
              attn_mask_enabled: bool = True,
              pad_mask: jax.Array | None = None,
              dropout_rate: float = 0.0,
              key: jax.Array | None = None) -> jax.Array:
    """AdaLN-zero DiT block (modules.py:651-697)."""
    norm, gate_msa, shift_mlp, scale_mlp, gate_mlp = ada_layernorm(p["attn_norm"], x, t)
    attn_out = attention(
        p["attn"], norm, heads, mask=mask, rope=rope,
        pe_attn_head=pe_attn_head, attn_mask_enabled=attn_mask_enabled,
        pad_mask=pad_mask,
    )
    x = x + gate_msa[:, None] * attn_out
    norm = layernorm({}, x, eps=1e-6) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
    ff_out = feedforward(p["ff"], norm, dropout_rate=dropout_rate, key=key)
    return x + gate_mlp[:, None] * ff_out


def mmdit_block_init(key, dim: int, heads: int, dim_head: int, ff_mult: int = 4,
                     context_dim: int | None = None, context_pre_only: bool = False,
                     qk_norm: str | None = None) -> dict:
    context_dim = context_dim if context_dim is not None else dim
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    p = {
        "attn_norm_x": ada_layernorm_init(k2, dim),
        "attn": attention_init(k3, dim, heads, dim_head, qk_norm=qk_norm,
                               context_dim=context_dim, context_pre_only=context_pre_only),
        "ff_x": feedforward_init(k4, dim, mult=ff_mult),
    }
    if context_pre_only:
        p["attn_norm_c"] = ada_layernorm_final_init(k1, context_dim)
    else:
        p["attn_norm_c"] = ada_layernorm_init(k1, context_dim)
        p["ff_c"] = feedforward_init(k5, context_dim, mult=ff_mult)
    return p


def mmdit_block(p: dict, x: jax.Array, c: jax.Array, t: jax.Array, heads: int,
                context_pre_only: bool = False,
                mask: jax.Array | None = None,
                rope=None, c_rope=None,
                dropout_rate: float = 0.0, key: jax.Array | None = None):
    """SD3-style dual-stream block (modules.py:703-771). Returns (c, x)."""
    if context_pre_only:
        norm_c = ada_layernorm_final(p["attn_norm_c"], c, t)
    else:
        norm_c, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = ada_layernorm(
            p["attn_norm_c"], c, t
        )
    norm_x, x_gate_msa, x_shift_mlp, x_scale_mlp, x_gate_mlp = ada_layernorm(
        p["attn_norm_x"], x, t
    )
    x_attn, c_attn = joint_attention(
        p["attn"], norm_x, norm_c, heads, mask=mask, rope=rope, c_rope=c_rope,
        context_pre_only=context_pre_only,
    )
    if context_pre_only:
        c_out = None
    else:
        c = c + c_gate_msa[:, None] * c_attn
        norm_c = layernorm({}, c, eps=1e-6) * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        c_out = c + c_gate_mlp[:, None] * feedforward(p["ff_c"], norm_c, dropout_rate, key)
    x = x + x_gate_msa[:, None] * x_attn
    norm_x = layernorm({}, x, eps=1e-6) * (1 + x_scale_mlp[:, None]) + x_shift_mlp[:, None]
    x = x + x_gate_mlp[:, None] * feedforward(p["ff_x"], norm_x, dropout_rate, key)
    return c_out, x
