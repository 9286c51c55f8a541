"""Pallas TPU flash attention with per-item PREFIX key-padding.

Every attention mask in this framework is a prefix mask: the reference's
duration mask is `arange(n) < duration[i]` (`src/f5_tts/model/utils.py`
lens_to_mask) and this framework's bucket-tail padding is `arange(n) <
total_len`. A prefix mask is fully described by one integer per batch item,
so instead of materialising an [n, n] bias (XLA path) or paying the splash
kernel's dynamic-segment slow path, these kernels take `kv_lens` as a
scalar-prefetch operand and

  - mask the partial KV chunk with an in-register iota compare, and
  - bound the KV chunk loop by ceil(kv_len / chunk) — padded chunks are
    never computed, so short prefixes run FASTER than unmasked attention.

Layout (mirrors the tuned splash config that measured ~0.1 ms/layer on v5e):
batch folds into the head grid dimension (one kernel launch; vmapping a
pallas call serialises); the whole K/V for one head is a single block whose
index map is constant across q blocks, so Mosaic fetches it ONCE per head
and the inner loop reads 512-row chunks from VMEM. Online softmax state
lives in registers (loop carry) — no scratch, no cross-grid-step traffic.

The `flash_prefix_qkv_attention` variant additionally reads q/k/v tiles as
strided views straight out of the ONE fused-qkv matmul output and applies
half-split rope in-register, so the [b,n,3hd] -> 3x[b,h,n,d] head
split/merge transposes and rope passes never materialise in HBM.

Numerics: fp32 running max / denominator, deferred normalisation. Backward
passes differentiate the XLA reference formulation via custom_vjp (sampling
is the hot path and runs forward-only; training keeps exact grads).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
MASK_VALUE = -1e37
_INTERPRET = False  # tests flip this to run the kernels on CPU (interpret mode)


def _online_softmax_loop(q, k_ref, v_ref, kvlen, sm_scale, ck):
    """Shared inner loop: chunked online softmax over the KV prefix.

    q: [bq, dh] (already roped/scaled as needed); k_ref/v_ref: refs holding
    [n, dh] for this head in VMEM. Returns the normalised [bq, dh] output.
    """
    bq, dh = q.shape
    init = (
        jnp.full((bq, LANES), MASK_VALUE, jnp.float32),
        jnp.zeros((bq, LANES), jnp.float32),
        jnp.zeros((bq, dh), jnp.float32),
    )
    nb = (kvlen + ck - 1) // ck  # dynamic trip count: padded chunks skipped

    def body(c, carry):
        m_prev, l_prev, acc = carry
        start = pl.multiple_of(c * ck, ck)
        k = k_ref[0, pl.ds(start, ck), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale  # [bq, ck]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + start
        s = jnp.where(col < kvlen, s, MASK_VALUE)
        m_curr = jnp.max(s, axis=1)[:, None]          # [bq, 1]
        m_next = jnp.maximum(m_prev, m_curr)          # [bq, LANES]
        p = jnp.exp(s - jnp.tile(m_next, (1, ck // LANES)))
        alpha = jnp.exp(m_prev - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
        v = v_ref[0, pl.ds(start, ck), :]
        acc = acc * alpha[:, :dh] + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        return m_next, l_next, acc

    _, l, acc = jax.lax.fori_loop(0, nb, body, init)
    l = l[:, :dh]
    return acc * jnp.where(l == 0.0, 1.0, 1.0 / l)


def _kernel(kvlen_ref, q_ref, k_ref, v_ref, o_ref, *, sm_scale: float, ck: int):
    h = pl.program_id(0)
    kvlen = kvlen_ref[h]
    out = _online_softmax_loop(q_ref[0], k_ref, v_ref, kvlen, sm_scale, ck)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "bq", "ck"))
def _flash_prefix_folded(q, k, v, kv_lens, sm_scale: float,
                         bq: int = 256, ck: int = 512):
    """q, k, v: [H, n, d] (batch already folded into heads); kv_lens: [H]."""
    H, n, d = q.shape
    assert n % bq == 0 and n % ck == 0 and ck % LANES == 0, (n, bq, ck)
    assert d <= LANES, "head_dim > 128 needs lane tiling in the kernel"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H, n // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, i, *_: (h, i, 0)),
            # whole-head K/V: index constant across i -> fetched once per head
            pl.BlockSpec((1, n, d), lambda h, i, *_: (h, 0, 0)),
            pl.BlockSpec((1, n, d), lambda h, i, *_: (h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda h, i, *_: (h, i, 0)),
    )
    kernel = functools.partial(_kernel, sm_scale=sm_scale, ck=ck)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, n, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(kv_lens.astype(jnp.int32), q, k, v)


def _xla_prefix_attention(q, k, v, kv_lens):
    """XLA reference path used for the backward pass (and CPU tests)."""
    n = q.shape[2]
    scale = 1.0 / math.sqrt(q.shape[-1])
    mask = jnp.arange(n)[None, :] < kv_lens[:, None]  # [b, n]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = jnp.where(mask[:, None, None, :], logits, MASK_VALUE)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_prefix_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                           kv_lens: jax.Array,
                           bq: int = 256, bkv: int = 512) -> jax.Array:
    """[b, h, n, d] attention where item i attends only keys [0, kv_lens[i]).

    kv_lens: [b] (or [1], broadcast) int32 valid-prefix lengths. Query rows
    past the prefix produce well-defined output over the valid keys (the
    caller zeroes them; reference parity keeps them invisible either way).
    bkv is the compute-chunk width (KV stays resident per head).
    """
    b, h, n, d = q.shape
    scale = 1.0 / math.sqrt(d)
    lens = kv_lens.astype(jnp.int32)
    if lens.shape[0] == 1 and b > 1:
        lens = jnp.broadcast_to(lens, (b,))
    lens_h = jnp.repeat(lens, h)  # [b*h]
    out = _flash_prefix_folded(
        q.reshape(b * h, n, d), k.reshape(b * h, n, d), v.reshape(b * h, n, d),
        lens_h, scale, bq=bq, ck=bkv)
    return out.reshape(b, h, n, d)


def _fp_fwd(q, k, v, kv_lens, bq, bkv):
    return flash_prefix_attention(q, k, v, kv_lens, bq, bkv), (q, k, v, kv_lens)


def _fp_bwd(bq, bkv, res, g):
    q, k, v, kv_lens = res
    lens = kv_lens.astype(jnp.int32)
    if lens.shape[0] == 1 and q.shape[0] > 1:
        lens = jnp.broadcast_to(lens, (q.shape[0],))
    _, vjp = jax.vjp(lambda a, b_, c: _xla_prefix_attention(a, b_, c, lens),
                     q, k, v)
    dq, dk, dv = vjp(g)
    import numpy as np

    return dq, dk, dv, np.zeros(kv_lens.shape, jax.dtypes.float0)


flash_prefix_attention.defvjp(_fp_fwd, _fp_bwd)


# ---------------------------------------------------------------------------
# fused-layout variant: attention straight from the qkv projection output
# ---------------------------------------------------------------------------


def _kernel_qkv(lens_ref, ropemask_ref, q_ref, k_ref, v_ref,
                csq_ref, snq_ref, csk_ref, snk_ref, o_ref,
                kr_scr, *, sm_scale: float, ck: int, heads: int):
    """q/k/v tiles are strided views into the ONE [B, n, 3*h*dh] fused-qkv
    matmul output (no split/merge transposes ever materialise in HBM), with
    half-split rope applied in-register.

    rope identity: out = x * cs + swap_halves(x) * sn where cs = [cos||cos],
    sn = [-sin||sin] — swap_halves is a lane roll by dh/2. K is roped once
    into VMEM scratch at the first q block of each head.
    """
    g = pl.program_id(0)   # folded (batch, head)
    i = pl.program_id(1)
    kvlen = lens_ref[g]
    rope_on = ropemask_ref[g % heads]

    def _rope(x, cs, sn):
        d = x.shape[-1]
        rot = pltpu.roll(x, d // 2, 1)
        return jnp.where(rope_on > 0, x * cs + rot * sn, x)

    @pl.when(i == 0)
    def _rope_k_once():
        kr_scr[...] = _rope(k_ref[0], csk_ref[...], snk_ref[...])

    q = _rope(q_ref[0], csq_ref[...], snq_ref[...])

    def k_read(start, size):
        return kr_scr[pl.ds(start, size), :]

    def v_read(start, size):
        return v_ref[0, pl.ds(start, size), :]

    bq, dh = q.shape
    init = (
        jnp.full((bq, LANES), MASK_VALUE, jnp.float32),
        jnp.zeros((bq, LANES), jnp.float32),
        jnp.zeros((bq, dh), jnp.float32),
    )
    nb = (kvlen + ck - 1) // ck

    def body(c, carry):
        m_prev, l_prev, acc = carry
        start = pl.multiple_of(c * ck, ck)
        k = k_read(start, ck)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + start
        s = jnp.where(col < kvlen, s, MASK_VALUE)
        m_curr = jnp.max(s, axis=1)[:, None]
        m_next = jnp.maximum(m_prev, m_curr)
        p = jnp.exp(s - jnp.tile(m_next, (1, ck // LANES)))
        alpha = jnp.exp(m_prev - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
        v = v_read(start, ck)
        acc = acc * alpha[:, :dh] + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        return m_next, l_next, acc

    _, l, acc = jax.lax.fori_loop(0, nb, body, init)
    l = l[:, :dh]
    out = acc * jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("heads", "sm_scale", "bq", "ck"))
def _flash_prefix_qkv_call(qkv, lens_g, ropemask, cs, sn, heads: int,
                           sm_scale: float, bq: int, ck: int):
    B, n, three_inner = qkv.shape
    dh = three_inner // (3 * heads)
    assert n % bq == 0 and n % ck == 0 and ck % LANES == 0, (n, bq, ck)
    assert dh <= LANES and dh % 2 == 0, dh
    G = B * heads
    h_ = heads
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G, n // bq),
        in_specs=[
            # strided head-views into the one fused qkv array
            pl.BlockSpec((1, bq, dh), lambda g, i, *_: (g // h_, i, g % h_)),
            pl.BlockSpec((1, n, dh), lambda g, i, *_: (g // h_, 0, h_ + g % h_)),
            pl.BlockSpec((1, n, dh), lambda g, i, *_: (g // h_, 0, 2 * h_ + g % h_)),
            pl.BlockSpec((bq, dh), lambda g, i, *_: (i, 0)),  # cs for q rows
            pl.BlockSpec((bq, dh), lambda g, i, *_: (i, 0)),  # sn for q rows
            pl.BlockSpec((n, dh), lambda g, i, *_: (0, 0)),   # cs, all rows (K)
            pl.BlockSpec((n, dh), lambda g, i, *_: (0, 0)),   # sn, all rows (K)
        ],
        out_specs=pl.BlockSpec((1, bq, dh), lambda g, i, *_: (g // h_, i, g % h_)),
        scratch_shapes=[
            pltpu.VMEM((n, dh), qkv.dtype),  # roped K, computed once per head
        ],
    )
    kernel = functools.partial(_kernel_qkv, sm_scale=sm_scale, ck=ck, heads=heads)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n, heads * dh), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(lens_g, ropemask, qkv, qkv, qkv, cs, sn, cs, sn)


def _qkv_unpack(qkv, heads):
    B, n, three_inner = qkv.shape
    dh = three_inner // (3 * heads)
    inner = heads * dh

    def split_heads(t):
        return t.reshape(B, n, heads, dh).transpose(0, 2, 1, 3)

    return (split_heads(qkv[..., :inner]), split_heads(qkv[..., inner:2 * inner]),
            split_heads(qkv[..., 2 * inner:]))


def _xla_qkv_reference(qkv, kv_lens, heads, cos, sin, pe_attn_head):
    """Unfused reference for the qkv kernel: split + rope + masked SDPA."""
    from korean_f5_tts_tpu.models.modules import apply_rope

    q, k, v = _qkv_unpack(qkv, heads)
    n = q.shape[2]
    q = apply_rope(q, cos[:n], sin[:n], pe_attn_head)
    k = apply_rope(k, cos[:n], sin[:n], pe_attn_head)
    lens = kv_lens.astype(jnp.int32)
    if lens.shape[0] == 1 and q.shape[0] > 1:
        lens = jnp.broadcast_to(lens, (q.shape[0],))
    out = _xla_prefix_attention(q, k, v, lens)
    b, h, nn, d = out.shape
    return out.transpose(0, 2, 1, 3).reshape(b, nn, h * d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 5, 6, 7))
def flash_prefix_qkv_attention(qkv: jax.Array, kv_lens: jax.Array, heads: int,
                               cos: jax.Array, sin: jax.Array,
                               pe_attn_head: int | None = None,
                               bq: int = 256, bkv: int = 512) -> jax.Array:
    """Attention straight from the fused qkv projection output.

    qkv: [B, n, 3*heads*dh] (q | k | v along features, heads-major inside
    each); kv_lens: [B] or [1] prefix lengths (pass n for unmasked);
    cos/sin: [>=n, dh/2] half-split rope tables; pe_attn_head: rope only the
    first N heads (None = all). Returns [B, n, heads*dh] — already merged,
    ready for the output projection. Backward differentiates the XLA
    reference formulation.
    """
    B, n, three_inner = qkv.shape
    dh = three_inner // (3 * heads)
    sm_scale = 1.0 / math.sqrt(dh)
    lens = kv_lens.astype(jnp.int32)
    if lens.shape[0] == 1 and B > 1:
        lens = jnp.broadcast_to(lens, (B,))
    lens_g = jnp.repeat(lens, heads)
    n_rope = heads if pe_attn_head is None else pe_attn_head
    ropemask = (jnp.arange(heads) < n_rope).astype(jnp.int32)
    cs = jnp.concatenate([cos[:n], cos[:n]], axis=-1).astype(qkv.dtype)
    sn = jnp.concatenate([-sin[:n], sin[:n]], axis=-1).astype(qkv.dtype)
    return _flash_prefix_qkv_call(qkv, lens_g, ropemask, cs, sn, heads,
                                  sm_scale, bq, bkv)


def _fpq_fwd(qkv, kv_lens, heads, cos, sin, pe_attn_head, bq, bkv):
    out = flash_prefix_qkv_attention(qkv, kv_lens, heads, cos, sin,
                                     pe_attn_head, bq, bkv)
    return out, (qkv, kv_lens, cos, sin)


def _fpq_bwd(heads, pe_attn_head, bq, bkv, res, g):
    qkv, kv_lens, cos, sin = res
    _, vjp = jax.vjp(
        lambda a: _xla_qkv_reference(a, kv_lens, heads, cos, sin, pe_attn_head),
        qkv)
    (dqkv,) = vjp(g)
    import numpy as np

    f0 = jax.dtypes.float0
    return (dqkv, np.zeros(kv_lens.shape, f0),
            jnp.zeros_like(cos), jnp.zeros_like(sin))


flash_prefix_qkv_attention.defvjp(_fpq_fwd, _fpq_bwd)
