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
# tests flip this to run the kernels on CPU (interpret mode); the env seed
# lets multi-chip CPU dryruns exercise the real kernel dispatch
import os as _os

_INTERPRET = _os.environ.get("F5_TTS_PALLAS_INTERPRET", "0") != "0"


LOG2E = 1.4426950408889634  # softmax via exp2: exp(x) == exp2(x * log2 e);
# the factor folds into sm_scale, so max/subtract run in the scaled domain
# and the p/l ratio is unchanged. exp2 maps directly onto the VPU's
# base-2 transcendental (exp lowers to exp2 + an extra multiply per element,
# and at n^2 logits per layer the multiply is measurable).


def _chunk_plan(n: int, pref: int) -> list[tuple[int, int]]:
    """Static (start, size) chunks covering n; sizes are LANES-multiples."""
    chunks, start = [], 0
    while start < n:
        size = min(pref, n - start)
        assert size % LANES == 0, (n, pref)
        chunks.append((start, size))
        start += size
    return chunks


def _pv_cast_dtype(v_dtype):
    """Dtype to cast p to before the PV dot, or None to keep f32 @ f32.

    Read at TRACE time (set F5_TTS_PV_BF16 per process): bf16 K/V inputs
    run the PV accumulate as bf16 p @ bf16 v with an f32
    preferred_element_type — the MXU's native rate — instead of the
    multi-pass f32-operand dot. fp32 inputs always keep the exact f32 dot
    (parity-path invariant).
    """
    if v_dtype == jnp.bfloat16 and _os.environ.get(
            "F5_TTS_PV_BF16", "0") != "0":
        return jnp.bfloat16
    return None


def _softmax_over_chunks(q, k_read, v_read, kvlen, sm_scale,
                         chunks, m_scr, l_scr, acc_scr, prune: bool = True):
    """Online softmax over the KV prefix, statically unrolled.

    The chunk loop is a python unroll — a dynamic-trip fori_loop defeats
    Mosaic's software pipelining of the two dots (measured ~30% slower).
    State lives in VMEM scratch (register carries cannot cross pl.when).

    prune: wrap each chunk in @pl.when(start < kvlen) so chunks entirely
    beyond the prefix skip — pays a predication cost per chunk, so set it
    only when prefixes are typically much shorter than n (per-item serving
    batches). With prune=False a fully-masked chunk is still exact: its
    scores are all MASK_VALUE, so p == 0 and m/l/acc are unchanged
    (requires kvlen >= 1, which every duration/bucket prefix satisfies).
    """
    dh = q.shape[-1]
    # scale q ONCE ([bq, dh]) instead of every s chunk ([bq, ck] x chunks);
    # log2e folded in so softmax runs in base 2 (splash-crib: q pre-scaled)
    q = q * jnp.asarray(sm_scale * LOG2E, q.dtype)
    m_scr[...] = jnp.full(m_scr.shape, MASK_VALUE, jnp.float32)
    l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
    acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    def _chunk(start, size):
        k = k_read(start, size)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # base-2 domain
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + start
        s = jnp.where(col < kvlen, s, MASK_VALUE)
        m_prev = m_scr[...]                           # [bq, LANES]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1)[:, None]          # [bq, 1]
        m_next = jnp.maximum(m_prev, m_curr)          # [bq, LANES]
        p = jnp.exp2(s - jnp.tile(m_next, (1, size // LANES)))
        alpha = jnp.exp2(m_prev - m_next)
        l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
        m_scr[...] = m_next
        v = v_read(start, size)
        # PV dot precision: the splash-crib f32 p @ f32 v "skips the
        # p->bf16 convert pass", but an f32-operand MXU dot costs a
        # multi-pass decomposition — casting p to the (bf16) v dtype trades
        # one [bq, ck] VPU convert for a full-rate bf16 dot
        # (F5_TTS_PV_BF16; engages only when v is bf16 so the fp32 parity
        # path stays exact). Mirrors the measured F5_TTS_BWD_CAST win.
        if _pv_cast_dtype(v.dtype) is not None:
            pv = jax.lax.dot(p.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
        else:
            pv = jax.lax.dot(p, v.astype(jnp.float32),
                             preferred_element_type=jnp.float32)
        acc_scr[...] = acc_scr[...] * alpha[:, :dh] + pv

    for start, size in chunks:
        if prune:
            pl.when(start < kvlen)(functools.partial(_chunk, start, size))
        else:
            _chunk(start, size)

    l = l_scr[...][:, :dh]
    return acc_scr[...] * jnp.where(l == 0.0, 1.0, 1.0 / l)


STATIC_MAX_C = 16.0  # base-2 logit offset for the no-running-max softmax


def _softmax_over_chunks_nomax(q, k_read, v_read, kvlen, sm_scale,
                               chunks, l_scr, acc_scr, prune: bool = True):
    """Single-pass softmax with a STATIC max: p = exp2(s - C), no per-chunk
    max reduce, no m bookkeeping, no accumulator rescales.

    Why exact-enough: softmax(x) == exp2(x-C)/sum(exp2(x-C)) for ANY constant
    C — the running max only exists to keep exp in floating-point range. In
    f32 the representable base-2 domain is ±126, so with C=16 any row whose
    max BASE-2 logit lies in (-110, +133) (raw logit/sm_scale roughly
    (-76, +92)) computes to full f32 precision; keys further than ~110
    octaves below C underflow to an EXACT 0 — weights < 2^-110 are zero for
    every practical purpose. Trained attention logits live within ±50.
    INFERENCE-ONLY fast path (the lse-emitting training forward keeps the
    online max); a row whose every key underflows (max raw logit < -76)
    would return zeros instead of a uniform distribution — outside the
    contract, checked against trained weights in scripts/staticmax_quality.

    VPU work removed per [bq, ck] chunk vs the online version: the lane-dim
    max reduce, the m compare/select, exp2(alpha), and the [bq, dh]
    accumulator rescale — the sum reduce and the fused mask/sub/exp2 pass
    remain.
    """
    dh = q.shape[-1]
    q = q * jnp.asarray(sm_scale * LOG2E, q.dtype)
    l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
    acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)
    neg = jnp.float32(STATIC_MAX_C - 200.0)  # exp2 -> exact 0 under the mask

    def _chunk(start, size):
        k = k_read(start, size)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + start
        s = jnp.where(col < kvlen, s, neg)
        # overflow clamp: rows beyond the contract saturate (near-max keys
        # become uniform) instead of NaN; fuses into the mask/exp2 chain.
        # +100 (not +126): the f32 denominator sums up to n per-key terms of
        # 2^(clamp-C), so n*2^100 must stay < 2^128 — finite for n < 2^28.
        s = jnp.minimum(s, jnp.float32(STATIC_MAX_C + 100.0))
        p = jnp.exp2(s - jnp.float32(STATIC_MAX_C))
        l_scr[...] = l_scr[...] + jnp.sum(p, axis=1)[:, None]
        v = v_read(start, size)
        if _pv_cast_dtype(v.dtype) is not None:
            pv = jax.lax.dot(p.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
        else:
            pv = jax.lax.dot(p, v.astype(jnp.float32),
                             preferred_element_type=jnp.float32)
        acc_scr[...] = acc_scr[...] + pv

    for start, size in chunks:
        if prune:
            pl.when(start < kvlen)(functools.partial(_chunk, start, size))
        else:
            _chunk(start, size)

    l = l_scr[...][:, :dh]
    return acc_scr[...] * jnp.where(l == 0.0, 1.0, 1.0 / l)


def _softmax_over_chunks_T(q, k_read, v_read, kvlen, sm_scale,
                           chunks, m_scr, l_scr, acc_scr, prune: bool = True):
    """Transposed-compute online softmax: scores and accumulator live as
    s_T[ck, bq] / acc_T[dh, bq] instead of s[bq, ck] / acc[bq, dh].

    Why: with dh=64 the PV dot p[bq,ck] @ v[ck,dh] leaves half the MXU's
    128 output lanes idle. Transposing the COMPUTE (not the data) makes the
    accumulate dot_general(v[ck,dh], p_T[ck,bq]) contract over ck — output
    lanes become bq (>=128, full) and dh moves to the freely-streaming m
    dim. The QK dot keeps its inherent dh=64 contraction either way, so
    only PV gains; all transposition is in dimension_numbers (nothing is
    materialised in HBM), and the [dh, bq] result is flipped back once per
    q-block.

    Softmax state is row-vectors [1, bq] (max/denominator per QUERY, which
    is now the lane dim); reductions run over sublanes (axis 0).
    """
    q = q * jnp.asarray(sm_scale * LOG2E, q.dtype)
    m_scr[...] = jnp.full(m_scr.shape, MASK_VALUE, jnp.float32)
    l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
    acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    def _chunk(start, size):
        k = k_read(start, size)                        # [ck, dh]
        s = jax.lax.dot_general(                       # [ck, bq] = k @ q^T
            k, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + start
        s = jnp.where(row < kvlen, s, MASK_VALUE)
        m_prev = m_scr[...]                            # [1, bq]
        m_curr = jnp.max(s, axis=0, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        p = jnp.exp2(s - m_next)                       # [ck, bq]
        alpha = jnp.exp2(m_prev - m_next)              # [1, bq]
        l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=0, keepdims=True)
        m_scr[...] = m_next
        v = v_read(start, size)                        # [ck, dh]
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
            v.astype(jnp.float32), p, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [dh, bq]

    for start, size in chunks:
        if prune:
            pl.when(start < kvlen)(functools.partial(_chunk, start, size))
        else:
            _chunk(start, size)

    l = l_scr[...]
    return acc_scr[...] * jnp.where(l == 0.0, 1.0, 1.0 / l)  # [dh, bq]


def _kernel_v2(kvlen_ref, q_ref, k_ref, v_ref, o_ref,
               ve_scr, m_scr, l_scr, acc_scr,
               *, sm_scale: float, ck: int, prune: bool, fold_denom: bool,
               bias_mask: bool = True):
    """Reduced-VPU softmax kernel.

    Two measured replacements for the baseline kernel's per-chunk VPU work
    (~7 full [bq, ck] passes -> ~4):
      - mask as a [1, ck] bias ROW broadcast-added to the scores (one full
        pass) instead of full-size iota + compare + select (three);
      - the softmax denominator rides the PV dot: ve_scr [n, 128] =
        [v_f32 | 1...] is built ONCE per head from the resident V block, so
        acc lanes d..2d carry l and the per-chunk sum(p) reduction AND the
        per-chunk v->f32 convert both vanish. The dot's output widens
        64 -> 128 lanes, which the MXU streams at the same rate (unlike the
        CONTRACTION dim: an earlier variant that widened the QK contraction
        to fold the mask into the dot measured 0.02327 vs 0.02256 in-model
        — contraction rows cost real pump time, output lanes don't).
    fold_denom=False keeps the baseline PV dot ([bq, d] acc + sum pass)
    for A/B isolation (F5_TTS_FLASH_V2=1 env)."""
    h = pl.program_id(0)
    i = pl.program_id(1)
    kvlen = kvlen_ref[h]
    n = k_ref.shape[1]
    d = q_ref.shape[-1]

    if fold_denom:
        @pl.when(i == 0)
        def _fill():
            v = v_ref[0].astype(jnp.float32)
            ve_scr[...] = jnp.concatenate(
                [v, jnp.ones((n, d), jnp.float32)], axis=1)

    q = q_ref[0]
    qs = q * jnp.asarray(sm_scale * LOG2E, q.dtype)
    m_scr[...] = jnp.full(m_scr.shape, MASK_VALUE, jnp.float32)
    acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)
    if not fold_denom:
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)

    def _chunk(start, size):
        k = k_ref[0, pl.ds(start, size), :]
        s = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [bq, ck]
        if bias_mask:
            col = jax.lax.broadcasted_iota(jnp.int32, (1, size), 1) + start
            s = s + jnp.where(col < kvlen, 0.0, MASK_VALUE)  # [1, ck] row
        else:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + start
            s = jnp.where(col < kvlen, s, MASK_VALUE)
        m_prev = m_scr[...]                            # [bq, LANES]
        m_curr = jnp.max(s, axis=1)[:, None]
        m_next = jnp.maximum(m_prev, m_curr)
        p = jnp.exp2(s - jnp.tile(m_next, (1, size // LANES)))
        alpha = jnp.exp2(m_prev - m_next)
        m_scr[...] = m_next
        if fold_denom:
            ve = ve_scr[pl.ds(start, size), :]         # [ck, 128] f32
            acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
                p, ve, preferred_element_type=jnp.float32)
        else:
            l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1)[:, None]
            v = v_ref[0, pl.ds(start, size), :]
            acc_scr[...] = acc_scr[...] * alpha[:, :d] + jax.lax.dot(
                p, v.astype(jnp.float32), preferred_element_type=jnp.float32)

    for start, size in _chunk_plan(n, ck):
        if prune:
            pl.when(start < kvlen)(functools.partial(_chunk, start, size))
        else:
            _chunk(start, size)

    acc = acc_scr[...]
    l = acc[:, d:d + 1] if fold_denom else l_scr[...][:, :1]
    o_ref[0] = (acc[:, :d]
                * jnp.where(l == 0.0, 1.0, 1.0 / l)).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("sm_scale", "bq", "ck", "prune",
                                    "fold_denom", "bias_mask"))
def _flash_prefix_folded_v2(q, k, v, kv_lens, sm_scale: float,
                            bq: int = 256, ck: int = 512,
                            prune: bool = False, fold_denom: bool = True,
                            bias_mask: bool = True):
    """Reduced-VPU twin of _flash_prefix_folded (same signature);
    fold_denom requires head_dim == 64 (the ones-lanes pack the idle
    output half of the PV dot)."""
    H, n, d = q.shape
    assert n % bq == 0 and n % LANES == 0, (n, bq)
    fold_denom = fold_denom and 2 * d == LANES
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H, n // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, i, *_: (h, i, 0)),
            pl.BlockSpec((1, n, d), lambda h, i, *_: (h, 0, 0)),
            pl.BlockSpec((1, n, d), lambda h, i, *_: (h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda h, i, *_: (h, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((n, LANES) if fold_denom else (8, LANES),
                       jnp.float32),                   # v | ones
            pltpu.VMEM((bq, LANES), jnp.float32),      # running max
            pltpu.VMEM((bq, LANES), jnp.float32),      # l (no-fold arm)
            pltpu.VMEM((bq, LANES if fold_denom else d),
                       jnp.float32),                   # acc (| denominator)
        ],
    )
    kernel = functools.partial(_kernel_v2, sm_scale=sm_scale, ck=ck,
                               prune=prune, fold_denom=fold_denom,
                               bias_mask=bias_mask)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, n, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            # ve_scr carries head state across i steps: keep order defined
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(kv_lens.astype(jnp.int32), q, k, v)


def _kernel_v2_lse(kvlen_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                   ve_scr, m_scr, acc_scr,
                   *, sm_scale: float, ck: int, prune: bool):
    """Reduced-VPU forward emitting base-2 logsumexp (training fwd twin of
    _kernel_v2 with fold_denom; see that kernel for the scheme)."""
    h = pl.program_id(0)
    i = pl.program_id(1)
    kvlen = kvlen_ref[h]
    n = k_ref.shape[1]
    d = q_ref.shape[-1]

    @pl.when(i == 0)
    def _fill():
        v = v_ref[0].astype(jnp.float32)
        ve_scr[...] = jnp.concatenate(
            [v, jnp.ones((n, d), jnp.float32)], axis=1)

    q = q_ref[0]
    qs = q * jnp.asarray(sm_scale * LOG2E, q.dtype)
    m_scr[...] = jnp.full(m_scr.shape, MASK_VALUE, jnp.float32)
    acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    def _chunk(start, size):
        k = k_ref[0, pl.ds(start, size), :]
        s = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, size), 1) + start
        s = s + jnp.where(col < kvlen, 0.0, MASK_VALUE)
        m_prev = m_scr[...]
        m_curr = jnp.max(s, axis=1)[:, None]
        m_next = jnp.maximum(m_prev, m_curr)
        p = jnp.exp2(s - jnp.tile(m_next, (1, size // LANES)))
        alpha = jnp.exp2(m_prev - m_next)
        m_scr[...] = m_next
        ve = ve_scr[pl.ds(start, size), :]
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            p, ve, preferred_element_type=jnp.float32)

    for start, size in _chunk_plan(n, ck):
        if prune:
            pl.when(start < kvlen)(functools.partial(_chunk, start, size))
        else:
            _chunk(start, size)

    acc = acc_scr[...]
    l = acc[:, d:d + 1]
    o_ref[0] = (acc[:, :d]
                * jnp.where(l == 0.0, 1.0, 1.0 / l)).astype(o_ref.dtype)
    lse_ref[0] = (m_scr[...][:, :1]
                  + jnp.log2(jnp.where(l == 0.0, 1.0, l)))


@functools.partial(jax.jit, static_argnames=("sm_scale", "bq", "ck", "prune"))
def _flash_prefix_folded_v2_lse(q, k, v, kv_lens, sm_scale: float,
                                bq: int = 256, ck: int = 512,
                                prune: bool = False):
    """Reduced-VPU twin of _flash_prefix_folded_lse (same signature)."""
    H, n, d = q.shape
    assert n % bq == 0 and n % LANES == 0, (n, bq)
    assert 2 * d == LANES, "v2 kernel packs d=64 halves into 128 lanes"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H, n // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, i, *_: (h, i, 0)),
            pl.BlockSpec((1, n, d), lambda h, i, *_: (h, 0, 0)),
            pl.BlockSpec((1, n, d), lambda h, i, *_: (h, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda h, i, *_: (h, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda h, i, *_: (h, i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
        ],
    )
    kernel = functools.partial(_kernel_v2_lse, sm_scale=sm_scale, ck=ck,
                               prune=prune)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((H, n, d), q.dtype),
                   jax.ShapeDtypeStruct((H, n, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(kv_lens.astype(jnp.int32), q, k, v)


def _kernel_T(kvlen_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
              *, sm_scale: float, ck: int, prune: bool):
    h = pl.program_id(0)
    kvlen = kvlen_ref[h]
    n = k_ref.shape[1]
    out_t = _softmax_over_chunks_T(
        q_ref[0],
        lambda s, z: k_ref[0, pl.ds(s, z), :],
        lambda s, z: v_ref[0, pl.ds(s, z), :],
        kvlen, sm_scale, _chunk_plan(n, ck), m_scr, l_scr, acc_scr,
        prune=prune)
    o_ref[0] = out_t.T.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "bq", "ck", "prune"))
def _flash_prefix_folded_T(q, k, v, kv_lens, sm_scale: float,
                           bq: int = 256, ck: int = 512, prune: bool = True):
    """Transposed-compute twin of _flash_prefix_folded (same signature)."""
    H, n, d = q.shape
    assert n % bq == 0 and n % LANES == 0, (n, bq)
    assert d <= LANES, "head_dim > 128 needs lane tiling in the kernel"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H, n // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, i, *_: (h, i, 0)),
            pl.BlockSpec((1, n, d), lambda h, i, *_: (h, 0, 0)),
            pl.BlockSpec((1, n, d), lambda h, i, *_: (h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda h, i, *_: (h, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, bq), jnp.float32),
            pltpu.VMEM((1, bq), jnp.float32),
            pltpu.VMEM((d, bq), jnp.float32),
        ],
    )
    kernel = functools.partial(_kernel_T, sm_scale=sm_scale, ck=ck, prune=prune)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, n, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(kv_lens.astype(jnp.int32), q, k, v)


def _kernel(kvlen_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
            *, sm_scale: float, ck: int, prune: bool):
    h = pl.program_id(0)
    kvlen = kvlen_ref[h]
    n = k_ref.shape[1]
    out = _softmax_over_chunks(
        q_ref[0],
        lambda s, z: k_ref[0, pl.ds(s, z), :],
        lambda s, z: v_ref[0, pl.ds(s, z), :],
        kvlen, sm_scale, _chunk_plan(n, ck), m_scr, l_scr, acc_scr,
        prune=prune)
    o_ref[0] = out.astype(o_ref.dtype)


def _kernel_nomax(kvlen_ref, q_ref, k_ref, v_ref, o_ref, l_scr, acc_scr,
                  *, sm_scale: float, ck: int, prune: bool):
    """Static-max single-pass variant (F5_TTS_FLASH_STATICMAX=1): drops the
    online-max VPU chain; inference-only (see _softmax_over_chunks_nomax)."""
    h = pl.program_id(0)
    kvlen = kvlen_ref[h]
    n = k_ref.shape[1]
    out = _softmax_over_chunks_nomax(
        q_ref[0],
        lambda s, z: k_ref[0, pl.ds(s, z), :],
        lambda s, z: v_ref[0, pl.ds(s, z), :],
        kvlen, sm_scale, _chunk_plan(n, ck), l_scr, acc_scr,
        prune=prune)
    o_ref[0] = out.astype(o_ref.dtype)


def _kernel_nomax_hn(kvlen_ref, q_ref, k_ref, v_ref, o_ref, l_scr, acc_scr,
                     *, sm_scale: float, ck: int, prune: bool, nh: int):
    """nh heads per instance (resolve_flash_heads; default 8, VMEM-capped
    by n), static-max softmax.

    The round-3 sweep closed every single-head direction; this is the last
    decomposition CLAUDE.md listed: nh independent per-head chains
    interleaved chunk-by-chunk, so head B's QK dot (MXU) can issue while
    head A's mask/exp2/sum pass (VPU) drains, instead of the units
    alternating within one serial chain. Round-5 measured sweep lives in
    resolve_flash_heads's docstring. Inference-only, like _kernel_nomax.
    """
    h = pl.program_id(0)
    dh = q_ref.shape[-1]
    kvlens = tuple(kvlen_ref[nh * h + s] for s in range(nh))
    n = k_ref.shape[1]
    scale = jnp.asarray(sm_scale * LOG2E, q_ref.dtype)
    qs = tuple(q_ref[s] * scale for s in range(nh))
    l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
    acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)
    neg = jnp.float32(STATIC_MAX_C - 200.0)
    clamp = jnp.float32(STATIC_MAX_C + 100.0)  # n*2^100 < f32 max for n < 2^28

    def _one(sub, start, size):
        k = k_ref[sub, pl.ds(start, size), :]
        s = jax.lax.dot_general(qs[sub], k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + start
        s = jnp.minimum(jnp.where(col < kvlens[sub], s, neg), clamp)
        p = jnp.exp2(s - jnp.float32(STATIC_MAX_C))
        l_scr[sub] = l_scr[sub] + jnp.sum(p, axis=1)[:, None]
        v = v_ref[sub, pl.ds(start, size), :]
        if _pv_cast_dtype(v.dtype) is not None:
            pv = jax.lax.dot(p.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
        else:
            pv = jax.lax.dot(p, v.astype(jnp.float32),
                             preferred_element_type=jnp.float32)
        acc_scr[sub] = acc_scr[sub] + pv

    for start, size in _chunk_plan(n, ck):
        for sub in range(nh):
            if prune:
                pl.when(start < kvlens[sub])(
                    functools.partial(_one, sub, start, size))
            else:
                _one(sub, start, size)

    for sub in range(nh):
        l = l_scr[sub][:, :dh]
        out = acc_scr[sub] * jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[sub] = out.astype(o_ref.dtype)


def _kernel_lse(kvlen_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, sm_scale: float, ck: int,
                prune: bool):
    """Forward + logsumexp output (training fwd: the bwd kernels reuse lse,
    so the dq sweep skips the online-softmax rescan entirely)."""
    h = pl.program_id(0)
    kvlen = kvlen_ref[h]
    n = k_ref.shape[1]
    out = _softmax_over_chunks(
        q_ref[0],
        lambda s, z: k_ref[0, pl.ds(s, z), :],
        lambda s, z: v_ref[0, pl.ds(s, z), :],
        kvlen, sm_scale, _chunk_plan(n, ck), m_scr, l_scr, acc_scr,
        prune=prune)
    o_ref[0] = out.astype(o_ref.dtype)
    l = l_scr[...][:, :1]
    lse_ref[0] = m_scr[...][:, :1] + jnp.log2(jnp.where(l == 0.0, 1.0, l))


@functools.partial(jax.jit, static_argnames=("sm_scale", "bq", "ck", "prune"))
def _flash_prefix_folded_lse(q, k, v, kv_lens, sm_scale: float,
                             bq: int = 256, ck: int = 512,
                             prune: bool = False):
    """Forward returning (o, lse2 [H, n, 1]) — base-2-domain logsumexp of
    the pre-scaled scores, consumed by both backward kernels."""
    H, n, d = q.shape
    assert n % bq == 0 and n % LANES == 0, (n, bq)
    assert d <= LANES, "head_dim > 128 needs lane tiling in the kernel"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H, n // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, i, *_: (h, i, 0)),
            pl.BlockSpec((1, n, d), lambda h, i, *_: (h, 0, 0)),
            pl.BlockSpec((1, n, d), lambda h, i, *_: (h, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda h, i, *_: (h, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda h, i, *_: (h, i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )
    kernel = functools.partial(_kernel_lse, sm_scale=sm_scale, ck=ck,
                               prune=prune)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((H, n, d), q.dtype),
                   jax.ShapeDtypeStruct((H, n, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(kv_lens.astype(jnp.int32), q, k, v)


def resolve_flash_heads(n: int) -> int:
    """Heads per kernel instance for the static-max inference kernel.

    Interleaved per-head chains let one head's QK/PV dots (MXU) issue while
    another head's mask/exp2/sum pass (VPU) drains, instead of the units
    alternating within a single serial chain. Round-5 sweep, same-run
    headline-protocol in-model A/Bs at n=1536 (per-head math is identical
    to the single-head kernel — same chunk plan, independent accumulators —
    so the staticmax parity/quality claims carry over unchanged at any nh):

      int8 weights: nh=1 0.01901 | nh=2 0.01871 | nh=4 0.01852 | nh=8 0.01836
      bf16:         nh=1 0.02216 | nh=2 0.02185 | nh=4 0.02169 | nh=8 0.02154

    nh=8 wins both modes -> default. The whole-head K/V blocks are
    (nh, n, d) each and Mosaic double-buffers them, so the default is
    capped to keep that footprint (nh*n*128*4 bytes at d=64 bf16) strictly
    under 12 MB of the 16 MB VMEM scope (q/out/scratch ride on top): nh=8
    up to n=2048, nh=4 to n=4096, nh=2 beyond (the headline n=1536 runs
    nh=8 at ~6.3 MB).

    F5_TTS_FLASH_HEADS overrides (1 disables, no VMEM cap applied — the
    compile error names the exact footprint if you blow it);
    F5_TTS_FLASH_HEADS2=0 is the legacy round-5 disable switch.
    """
    if "F5_TTS_FLASH_HEADS" in _os.environ:
        return max(1, int(_os.environ["F5_TTS_FLASH_HEADS"]))
    if _os.environ.get("F5_TTS_FLASH_HEADS2", "1") == "0":
        return 1
    nh = 8
    while nh > 2 and nh * n * 128 * 4 >= 12 * 2**20:
        nh //= 2
    return nh


@functools.partial(jax.jit, static_argnames=("sm_scale", "bq", "ck", "prune"))
def _flash_prefix_folded(q, k, v, kv_lens, sm_scale: float,
                         bq: int = 256, ck: int = 512, prune: bool = True):
    """q, k, v: [H, n, d] (batch already folded into heads); kv_lens: [H].

    F5_TTS_FLASH_STATICMAX (default 1) selects the single-pass static-max
    softmax for this inference-only forward; 0 reverts to the online-max
    kernel (read at trace time — set it per process, not mid-run)."""
    H, n, d = q.shape
    assert n % bq == 0 and n % LANES == 0, (n, bq)
    assert d <= LANES, "head_dim > 128 needs lane tiling in the kernel"
    # Default ON since round 4: in-model A/B 0.02221 vs 0.02236 bf16 and
    # 0.01900 vs 0.01921 int8 headline; trained-weight mel deviation 0.3%
    # relative (PARITY_FLAGSHIP.json staticmax_vs_onlinemax_bf16 — same
    # softmax math, different f32 rounding). Grad contexts are unaffected
    # (the custom_vjp fwd routes through the lse-emitting online-max kernel).
    staticmax = _os.environ.get("F5_TTS_FLASH_STATICMAX", "1") != "0"
    nh = resolve_flash_heads(n)
    if staticmax and nh > 1 and H % nh == 0:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(H // nh, n // bq),
            in_specs=[
                pl.BlockSpec((nh, bq, d), lambda h, i, *_: (h, i, 0)),
                pl.BlockSpec((nh, n, d), lambda h, i, *_: (h, 0, 0)),
                pl.BlockSpec((nh, n, d), lambda h, i, *_: (h, 0, 0)),
            ],
            out_specs=pl.BlockSpec((nh, bq, d), lambda h, i, *_: (h, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((nh, bq, LANES), jnp.float32),
                pltpu.VMEM((nh, bq, d), jnp.float32),
            ],
        )
        kernel = functools.partial(_kernel_nomax_hn, sm_scale=sm_scale,
                                   ck=ck, prune=prune, nh=nh)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((H, n, d), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=_INTERPRET,
        )(kv_lens.astype(jnp.int32), q, k, v)
    scratch = [
        pltpu.VMEM((bq, LANES), jnp.float32),
        pltpu.VMEM((bq, d), jnp.float32),
    ]
    if not staticmax:
        scratch = [pltpu.VMEM((bq, LANES), jnp.float32)] + scratch
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
        scratch_shapes=scratch,
    )
    kernel = functools.partial(_kernel_nomax if staticmax else _kernel,
                               sm_scale=sm_scale, ck=ck, prune=prune)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, n, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(kv_lens.astype(jnp.int32), q, k, v)


# ---------------------------------------------------------------------------
# int8 attention: quantized QK (and optionally PV) dots at 2x the MXU rate
# ---------------------------------------------------------------------------
#
# Sage-attention-style inference path for the int8 serving mode: q/k (and
# optionally v) are quantized per (batch*head) OUTSIDE the kernel (one
# XLA-fused amax + rint pass, and the int8 HBM reads are half the bytes);
# the kernel runs the same online softmax as _kernel (the measured-best v1
# form) but the n^2 dots contract int8xint8->int32, which the v5e MXU pumps
# at twice the bf16 rate (precedent: ops/qmatmul.py, 286 TOPS standalone).
# The combined dequant scale (aq*ak/127^2 * sm_scale * log2e) rides as one
# f32 scalar-prefetch value per head and folds into the existing
# convert+mask+exp2 elementwise chain. The PV dot quantizes p with the
# FIXED scale 127 (p = exp2(s - m) is in (0, 1] by construction), so only
# v's per-head scale enters the rescale. Forward-only: sampling never
# differentiates, and training keeps the bf16 kernels.


def _kernel_i8(kvlen_ref, c_ref, sv_ref, q_ref, k_ref, v_ref, o_ref,
               m_scr, l_scr, acc_scr,
               *, ck: int, prune: bool, pv_i8: bool, nn_qk: bool):
    h = pl.program_id(0)
    kvlen = kvlen_ref[h]
    c = c_ref[h]                                       # dequant * sm * log2e
    sv = sv_ref[h]                                     # v scale / 127 (p)
    n = v_ref.shape[1]
    d = q_ref.shape[-1]
    q = q_ref[0]                                       # [bq, d] int8
    m_scr[...] = jnp.full(m_scr.shape, MASK_VALUE, jnp.float32)
    l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
    acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    def _chunk(start, size):
        if nn_qk:
            # k arrives pre-transposed [d, n]: the contraction hits dim 0
            # of the right operand (NN form) — Mosaic has no native int8
            # operand transpose, so the NT form pays a relayout per chunk
            kt = k_ref[0, :, pl.ds(start, size)]       # [d, ck] int8
            s32 = jax.lax.dot_general(
                q, kt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)      # [bq, ck]
        else:
            k = k_ref[0, pl.ds(start, size), :]        # [ck, d] int8
            s32 = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)      # [bq, ck]
        s = s32.astype(jnp.float32) * c                # base-2 domain
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + start
        s = jnp.where(col < kvlen, s, MASK_VALUE)
        m_prev = m_scr[...]
        m_curr = jnp.max(s, axis=1)[:, None]
        m_next = jnp.maximum(m_prev, m_curr)
        p = jnp.exp2(s - jnp.tile(m_next, (1, size // LANES)))
        alpha = jnp.exp2(m_prev - m_next)
        l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1)[:, None]
        m_scr[...] = m_next
        v = v_ref[0, pl.ds(start, size), :]
        if pv_i8:
            p8 = jnp.rint(p * 127.0).astype(jnp.int8)  # p in [0, 1]
            pv = jax.lax.dot_general(
                p8, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)      # [bq, d]
            acc_scr[...] = (acc_scr[...] * alpha[:, :d]
                            + pv.astype(jnp.float32) * sv)
        else:
            acc_scr[...] = acc_scr[...] * alpha[:, :d] + jax.lax.dot(
                p, v.astype(jnp.float32), preferred_element_type=jnp.float32)

    for start, size in _chunk_plan(n, ck):
        if prune:
            pl.when(start < kvlen)(functools.partial(_chunk, start, size))
        else:
            _chunk(start, size)

    l = l_scr[...][:, :d]
    out = acc_scr[...] * jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("bq", "ck", "prune", "pv_i8", "nn_qk",
                                    "out_dtype"))
def _flash_prefix_folded_i8(q8, k8, v, c, sv, kv_lens,
                            bq: int = 256, ck: int = 512,
                            prune: bool = False, pv_i8: bool = True,
                            nn_qk: bool = True, out_dtype=jnp.bfloat16):
    """q8: [H, n, d] int8; k8: [H, d, n] (nn_qk) or [H, n, d] int8;
    v: int8 (pv_i8) or bf16 [H, n, d]; c, sv: [H] f32."""
    H, n, d = q8.shape
    assert n % bq == 0 and n % LANES == 0, (n, bq)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(H, n // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, i, *_: (h, i, 0)),
            (pl.BlockSpec((1, d, n), lambda h, i, *_: (h, 0, 0)) if nn_qk
             else pl.BlockSpec((1, n, d), lambda h, i, *_: (h, 0, 0))),
            pl.BlockSpec((1, n, d), lambda h, i, *_: (h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda h, i, *_: (h, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )
    kernel = functools.partial(_kernel_i8, ck=ck, prune=prune, pv_i8=pv_i8,
                               nn_qk=nn_qk)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, n, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(kv_lens.astype(jnp.int32), c.astype(jnp.float32),
      sv.astype(jnp.float32), q8, k8, v)


def _quant_head(x):
    """Per-(batch*head) symmetric int8: [H, n, d] -> (int8, amax[H] f32)."""
    a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(1, 2))
    a = jnp.maximum(a, 1e-8)
    x8 = jnp.clip(jnp.rint(x.astype(jnp.float32)
                           * (127.0 / a)[:, None, None]), -127, 127)
    return x8.astype(jnp.int8), a


def flash_prefix_attention_i8(q: jax.Array, k: jax.Array, v: jax.Array,
                              kv_lens: jax.Array,
                              bq: int = 256, bkv: int = 512,
                              prune: bool = False,
                              pv_i8: bool = True) -> jax.Array:
    """[b, h, n, d] prefix attention with int8 QK (and optionally PV) dots.

    Inference-only (no vjp): per-head dynamic symmetric quantization of
    q/k/v, int8 contractions on the MXU at 2x bf16 rate. Accuracy is
    bounded by 127-level per-head quantization (~1e-2 relative on the
    attention output; measure end-to-end mel deviation before enabling —
    scripts/int8_quality.py protocol).
    """
    b, h, n, d = q.shape
    lens = kv_lens.astype(jnp.int32)
    if lens.shape[0] == 1 and b > 1:
        lens = jnp.broadcast_to(lens, (b,))
    lens_h = jnp.repeat(lens, h)
    q8, aq = _quant_head(q.reshape(b * h, n, d))
    k8, ak = _quant_head(k.reshape(b * h, n, d))
    # k pre-transposed in HBM so the kernel's QK dot is NN form (int8 has
    # no native MXU operand transpose; the XLA relayout here is one pass)
    k8 = jnp.swapaxes(k8, 1, 2)
    c = aq * ak * ((1.0 / 127.0 ** 2) * LOG2E / math.sqrt(d))
    if pv_i8:
        v8, av = _quant_head(v.reshape(b * h, n, d))
        sv = av * (1.0 / (127.0 * 127.0))
        out = _flash_prefix_folded_i8(q8, k8, v8, c, sv, lens_h,
                                      bq=bq, ck=bkv, prune=prune,
                                      pv_i8=True, out_dtype=v.dtype)
    else:
        sv = jnp.zeros_like(c)
        out = _flash_prefix_folded_i8(q8, k8, v.reshape(b * h, n, d), c, sv,
                                      lens_h, bq=bq, ck=bkv, prune=prune,
                                      pv_i8=False, out_dtype=v.dtype)
    return out.reshape(b, h, n, d)


# ---------------------------------------------------------------------------
# flash backward: dq (+lse) kernel and dk/dv kernel
# ---------------------------------------------------------------------------
#
# The round-2 custom_vjp differentiated the XLA formulation, which
# materialises [n, n] fp32 logits/probs in HBM several times per layer —
# measured at 48% of the whole training step (163 of 336 ms at b=8, n=1200).
# These kernels recompute p in VMEM instead (classic flash backward,
# FlashAttention-2 split: one kernel for dq, one for dk/dv).
#
# Dot orientation is the decisive constraint on TPU: an in-model A/B of the
# transposed-compute FWD kernel (F5_TTS_FLASH_T=1, scores [keys, queries])
# measured 24% SLOWER — Mosaic lowers dots that contract dim 0 of both
# operands ("TN" form) very badly. So each backward kernel runs in the
# orientation that makes EVERY dot NT (contract (1,),(1,)) or NN (contract
# (1,),(0,)) form:
#   - dq kernel: q-major, exactly the fwd orientation. s = q@k^T (NT),
#     dp = dO@v^T (NT), dq += t@k (NN). The sweep needs no saved lse:
#     ds = p*(dp - D) is LINEAR in the unnormalised p~, so the fwd-style
#     online rescale (alpha on max updates, divide by l at the end) applies
#     verbatim — and the final m/l give lse2 = m + log2(l) for free,
#     emitted as an [H, n, 1] column output.
#   - dk/dv kernel: key-major (one resident [bkv, d] key block, q streamed
#     in chunks). s^T = k@q^T (NT), dp^T = v@dO^T (NT), dv += p^T@dO (NN),
#     dk += ds^T@q (NN) — accumulators are natively [bkv, d], no final
#     transpose. Per-query lse/D arrive as [1, cq] row slices of [H, n]
#     arrays (XLA does the tiny [H,n] relayout between the two calls).
# Nothing [n, n]-sized ever touches HBM.


def _kernel_dq(kvlen_ref, q_ref, k_ref, v_ref, do_ref, dvec_ref,
               dq_ref, lse_ref, m_scr, l_scr, acc_scr,
               *, sm_scale: float, ck: int, prune: bool, cast: bool = False):
    h = pl.program_id(0)
    kvlen = kvlen_ref[h]
    n = k_ref.shape[1]
    d = q_ref.shape[-1]
    do = do_ref[0]                                     # [bq, d]
    dvec = dvec_ref[0]                                 # [bq, 1]
    qs = q_ref[0] * jnp.asarray(sm_scale * LOG2E, q_ref.dtype)
    m_scr[...] = jnp.full(m_scr.shape, MASK_VALUE, jnp.float32)
    l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
    acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    def _chunk(start, size):
        k = k_ref[0, pl.ds(start, size), :]            # [ck, d]
        v = v_ref[0, pl.ds(start, size), :]
        s = jax.lax.dot_general(                       # [bq, ck] = qs @ k^T
            qs, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, size), 1) + start
        s = s + jnp.where(col < kvlen, 0.0, MASK_VALUE)
        m_prev = m_scr[...]                            # [bq, LANES]
        m_curr = jnp.max(s, axis=1)[:, None]
        m_next = jnp.maximum(m_prev, m_curr)
        p = jnp.exp2(s - jnp.tile(m_next, (1, size // LANES)))
        alpha = jnp.exp2(m_prev - m_next)
        l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1)[:, None]
        m_scr[...] = m_next
        dp = jax.lax.dot_general(                      # [bq, ck] = dO @ v^T
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        t = p * (dp - dvec)                            # [bq, ck]
        # cast=True: accumulate dot in bf16 (one convert pass per chunk,
        # buys the MXU's native-rate path if f32 operands are penalised)
        tk = (t.astype(k.dtype), k) if cast else (t, k.astype(jnp.float32))
        acc_scr[...] = acc_scr[...] * alpha[:, :d] + jax.lax.dot_general(
            tk[0], tk[1], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [bq, d] += t @ k

    for start, size in _chunk_plan(n, ck):
        if prune:
            pl.when(start < kvlen)(functools.partial(_chunk, start, size))
        else:
            _chunk(start, size)

    l = l_scr[...][:, :1]
    inv_l = jnp.where(l == 0.0, 1.0, 1.0 / l)
    dq_ref[0] = (acc_scr[...] * inv_l
                 * jnp.asarray(sm_scale, jnp.float32)).astype(dq_ref.dtype)
    # base-2-domain logsumexp of the PRE-scaled scores; log2(0) guarded for
    # all-masked rows (kvlen >= 1 everywhere in practice)
    lse_ref[0] = m_scr[...][:, :1] + jnp.log2(jnp.where(l == 0.0, 1.0, l))


def _kernel_dq_lsein(kvlen_ref, q_ref, k_ref, v_ref, do_ref, dvec_ref,
                     lse_ref, dq_ref, acc_scr,
                     *, sm_scale: float, ck: int, cast: bool):
    """dq sweep with the forward's lse given: p is exactly normalised per
    chunk (no running max/denominator, no alpha rescales of the
    accumulator) — ~5 fewer VPU passes per [bq, ck] chunk than the
    rescan form, and dq needs no final 1/l scale. The prefix mask is a
    [1, ck] bias row broadcast-added to s (one pass, not iota+cmp+select)."""
    h = pl.program_id(0)
    kvlen = kvlen_ref[h]
    n = k_ref.shape[1]
    do = do_ref[0]                                     # [bq, d]
    dvec = dvec_ref[0]                                 # [bq, 1]
    lse = lse_ref[0]                                   # [bq, 1]
    qs = q_ref[0] * jnp.asarray(sm_scale * LOG2E, q_ref.dtype)
    acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    def _chunk(start, size):
        k = k_ref[0, pl.ds(start, size), :]            # [ck, d]
        v = v_ref[0, pl.ds(start, size), :]
        s = jax.lax.dot_general(                       # [bq, ck] = qs @ k^T
            qs, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, size), 1) + start
        s = s + jnp.where(col < kvlen, 0.0, MASK_VALUE)
        p = jnp.exp2(s - lse)                          # normalised [bq, ck]
        dp = jax.lax.dot_general(                      # [bq, ck] = dO @ v^T
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        t = p * (dp - dvec)                            # [bq, ck]
        tk = (t.astype(k.dtype), k) if cast else (t, k.astype(jnp.float32))
        acc_scr[...] += jax.lax.dot_general(
            tk[0], tk[1], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [bq, d] += t @ k

    for start, size in _chunk_plan(n, ck):
        _chunk(start, size)

    dq_ref[0] = (acc_scr[...]
                 * jnp.asarray(sm_scale, jnp.float32)).astype(dq_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("sm_scale", "bq", "ck", "cast"))
def _flash_prefix_dq_lsein(q, k, v, do, dvec, lse, kv_lens, sm_scale: float,
                           bq: int = 256, ck: int = 512, cast: bool = True):
    """dq for [H, n, d] folded heads, consuming the fwd's lse2 [H, n, 1]."""
    H, n, d = q.shape
    assert n % bq == 0 and n % LANES == 0, (n, bq)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H, n // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, i, *_: (h, i, 0)),
            pl.BlockSpec((1, n, d), lambda h, i, *_: (h, 0, 0)),
            pl.BlockSpec((1, n, d), lambda h, i, *_: (h, 0, 0)),
            pl.BlockSpec((1, bq, d), lambda h, i, *_: (h, i, 0)),   # dO
            pl.BlockSpec((1, bq, 1), lambda h, i, *_: (h, i, 0)),   # D col
            pl.BlockSpec((1, bq, 1), lambda h, i, *_: (h, i, 0)),   # lse col
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda h, i, *_: (h, i, 0)),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
    )
    kernel = functools.partial(_kernel_dq_lsein, sm_scale=sm_scale, ck=ck,
                               cast=cast)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, n, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(kv_lens.astype(jnp.int32), q, k, v, do, dvec, lse)


@functools.partial(jax.jit,
                   static_argnames=("sm_scale", "bq", "ck", "prune", "cast"))
def _flash_prefix_dq(q, k, v, do, dvec, kv_lens, sm_scale: float,
                     bq: int = 256, ck: int = 512, prune: bool = False,
                     cast: bool = False):
    """dq + lse2 for [H, n, d] folded heads. dvec: [H, n, 1] rowsum(dO*O)."""
    H, n, d = q.shape
    assert n % bq == 0 and n % LANES == 0, (n, bq)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H, n // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, i, *_: (h, i, 0)),
            pl.BlockSpec((1, n, d), lambda h, i, *_: (h, 0, 0)),
            pl.BlockSpec((1, n, d), lambda h, i, *_: (h, 0, 0)),
            pl.BlockSpec((1, bq, d), lambda h, i, *_: (h, i, 0)),   # dO
            pl.BlockSpec((1, bq, 1), lambda h, i, *_: (h, i, 0)),   # D col
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda h, i, *_: (h, i, 0)),
            pl.BlockSpec((1, bq, 1), lambda h, i, *_: (h, i, 0)),   # lse2 col
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )
    kernel = functools.partial(_kernel_dq, sm_scale=sm_scale, ck=ck,
                               prune=prune, cast=cast)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((H, n, d), q.dtype),
                   jax.ShapeDtypeStruct((H, n, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(kv_lens.astype(jnp.int32), q, k, v, do, dvec)


def _kernel_dkv(kvlen_ref, k_ref, v_ref, q_ref, do_ref, dvec_ref, lse_ref,
                dk_ref, dv_ref, dk_scr, dv_scr,
                *, sm_scale: float, cq: int, cast: bool = False):
    h = pl.program_id(0)
    j = pl.program_id(1)
    kvlen = kvlen_ref[h]
    n = q_ref.shape[1]
    bkv = k_ref.shape[1]
    k = k_ref[0]                                       # [bkv, d]
    v = v_ref[0]
    key0 = j * bkv
    dk_scr[...] = jnp.zeros(dk_scr.shape, jnp.float32)
    dv_scr[...] = jnp.zeros(dv_scr.shape, jnp.float32)
    scale2 = jnp.asarray(sm_scale * LOG2E, jnp.float32)

    def _chunk(start, size):
        q = q_ref[0, pl.ds(start, size), :]            # [cq, d]
        do = do_ref[0, pl.ds(start, size), :]
        lse = lse_ref[0, :, pl.ds(start, size)]        # [1, cq]
        dvec = dvec_ref[0, :, pl.ds(start, size)]
        s = jax.lax.dot_general(                       # [bkv, cq] = k @ q^T
            k, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale2
        # prefix mask as a [bkv, 1] bias COLUMN (keys ride the sublane dim
        # here): one broadcast-add pass instead of iota + compare + select
        row = jax.lax.broadcasted_iota(jnp.int32, (bkv, 1), 0) + key0
        s = s + jnp.where(row < kvlen, 0.0, MASK_VALUE)
        p = jnp.exp2(s - lse)                          # normalised [bkv, cq]
        pd = (p.astype(do.dtype), do) if cast else (p, do.astype(jnp.float32))
        dv_scr[...] += jax.lax.dot_general(            # [bkv, d] = p^T' @ dO
            pd[0], pd[1], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(                      # [bkv, cq] = v @ dO^T
            v, do, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - dvec)
        dsq = (ds.astype(q.dtype), q) if cast else (ds, q.astype(jnp.float32))
        dk_scr[...] += jax.lax.dot_general(            # [bkv, d] = ds @ q
            dsq[0], dsq[1], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    for start, size in _chunk_plan(n, cq):
        _chunk(start, size)

    dk_ref[0] = (dk_scr[...] * jnp.asarray(sm_scale, jnp.float32)).astype(
        dk_ref.dtype)
    dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("sm_scale", "bkv", "cq", "cast"))
def _flash_prefix_dkv(q, k, v, do, dvec, lse, kv_lens, sm_scale: float,
                      bkv: int = 256, cq: int = 512, cast: bool = False):
    """dk, dv for [H, n, d] folded heads given lse2 from the dq sweep.

    dvec, lse: [H, 1, n] per-query rows (XLA relayouts the dq kernel's
    column outputs — tiny, H*n fp32)."""
    H, n, d = q.shape
    assert n % bkv == 0 and n % LANES == 0, (n, bkv)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H, n // bkv),
        in_specs=[
            pl.BlockSpec((1, bkv, d), lambda h, j, *_: (h, j, 0)),   # k
            pl.BlockSpec((1, bkv, d), lambda h, j, *_: (h, j, 0)),   # v
            pl.BlockSpec((1, n, d), lambda h, j, *_: (h, 0, 0)),     # q
            pl.BlockSpec((1, n, d), lambda h, j, *_: (h, 0, 0)),     # dO
            # [H, 1, n] rows: a (1, n) block of an [H, n] array violates
            # Mosaic's (8, 128)-divisibility rule; (1, 1, n) is dims-equal
            pl.BlockSpec((1, 1, n), lambda h, j, *_: (h, 0, 0)),     # D
            pl.BlockSpec((1, 1, n), lambda h, j, *_: (h, 0, 0)),     # lse2
        ],
        out_specs=[
            pl.BlockSpec((1, bkv, d), lambda h, j, *_: (h, j, 0)),
            pl.BlockSpec((1, bkv, d), lambda h, j, *_: (h, j, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bkv, d), jnp.float32),
            pltpu.VMEM((bkv, d), jnp.float32),
        ],
    )
    kernel = functools.partial(_kernel_dkv, sm_scale=sm_scale, cq=cq,
                               cast=cast)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((H, n, d), q.dtype),
                   jax.ShapeDtypeStruct((H, n, d), q.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(kv_lens.astype(jnp.int32), k, v, q, do, dvec, lse)


def flash_prefix_attention_bwd(q, k, v, kv_lens, g, o=None, lse=None,
                               bq: int = 256, bkv: int = 512):
    """Pallas flash backward for [b, h, n, d] prefix attention.

    Returns (dq, dk, dv) matching jax.vjp of _xla_prefix_attention (the
    reference formulation) without ever materialising [n, n] in HBM.
    o: the forward output (saved as a custom_vjp residual; only needed for
    D = rowsum(dO * o)) — recomputed with one extra kernel pass if absent.
    lse: [b*h, n, 1] base-2 logsumexp from _flash_prefix_folded_lse — when
    given, the dq sweep consumes it instead of re-running online softmax.

    Tuning env knobs (read at trace time; measured defaults from the
    b=8 x n=1280 training A/B): F5_TTS_BWD_CAST=0 keeps the accumulate-dot
    operands (t / p / ds) fp32 (default casts to the input dtype — wins
    ~10 ms/step: Mosaic's f32-operand dots are penalised);
    F5_TTS_BWD_BQ / F5_TTS_BWD_CK override the query-block / chunk sizes
    (default ck 640 when it divides n: fewer chunk boundaries won the
    sweep at n=1280).
    """
    import os

    b, h, n, d = q.shape
    bq = int(os.environ.get("F5_TTS_BWD_BQ", bq))
    default_ck = 640 if n % 640 == 0 else bkv
    bkv = int(os.environ.get("F5_TTS_BWD_CK", default_ck))
    cast = os.environ.get("F5_TTS_BWD_CAST", "1") != "0"
    scale = 1.0 / math.sqrt(d)
    lens = kv_lens.astype(jnp.int32)
    if lens.shape[0] == 1 and b > 1:
        lens = jnp.broadcast_to(lens, (b,))
    lens_h = jnp.repeat(lens, h)
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vf = v.reshape(b * h, n, d)
    gf = g.reshape(b * h, n, d)
    if o is None:
        o = _flash_prefix_folded(qf, kf, vf, lens_h, scale, bq=bq, ck=bkv,
                                 prune=False)
    dvec = jnp.sum(gf.astype(jnp.float32)
                   * o.reshape(b * h, n, d).astype(jnp.float32),
                   axis=-1, keepdims=True)             # [H, n, 1]
    if lse is not None:
        dq = _flash_prefix_dq_lsein(qf, kf, vf, gf, dvec, lse, lens_h, scale,
                                    bq=bq, ck=bkv, cast=cast)
    else:
        dq, lse = _flash_prefix_dq(qf, kf, vf, gf, dvec, lens_h, scale,
                                   bq=bq, ck=bkv, prune=False, cast=cast)
    dk, dv = _flash_prefix_dkv(qf, kf, vf, gf,
                               dvec.transpose(0, 2, 1), lse.transpose(0, 2, 1),
                               lens_h, scale, bkv=bq, cq=bkv, cast=cast)
    return (dq.reshape(b, h, n, d), dk.reshape(b, h, n, d),
            dv.reshape(b, h, n, d))


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_prefix_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                           kv_lens: jax.Array,
                           bq: int = 256, bkv: int = 512,
                           prune: bool = True) -> jax.Array:
    """[b, h, n, d] attention where item i attends only keys [0, kv_lens[i]).

    kv_lens: [b] (or [1], broadcast) int32 valid-prefix lengths. Query rows
    past the prefix produce well-defined output over the valid keys (the
    caller zeroes them; reference parity keeps them invisible either way).
    bkv is the compute-chunk width (KV stays resident per head).
    """
    import os

    b, h, n, d = q.shape
    scale = 1.0 / math.sqrt(d)
    lens = kv_lens.astype(jnp.int32)
    if lens.shape[0] == 1 and b > 1:
        lens = jnp.broadcast_to(lens, (b,))
    lens_h = jnp.repeat(lens, h)  # [b*h]
    v2_mode = os.environ.get("F5_TTS_FLASH_V2", "0")
    if os.environ.get("F5_TTS_FLASH_T", "0") != "0":
        folded = _flash_prefix_folded_T
    elif 2 * d == LANES and v2_mode in ("1", "2", "3"):
        # measured in-model (bf16 headline): v1 0.02256 beats BOTH v2
        # experiments — mask folded into the QK dot via a 128-wide
        # contraction 0.02327 (contraction rows cost MXU pump time), and
        # bias-row + denominator-in-PV-dot 0.02279. Mosaic fuses the
        # baseline's iota/compare/select chain into the exp2 pass, so the
        # "saved" VPU passes were already free; kept opt-in for other chips.
        folded = functools.partial(_flash_prefix_folded_v2,
                                   fold_denom=v2_mode in ("1", "3"),
                                   bias_mask=v2_mode != "3")
    else:
        folded = _flash_prefix_folded
    out = folded(
        q.reshape(b * h, n, d), k.reshape(b * h, n, d), v.reshape(b * h, n, d),
        lens_h, scale, bq=bq, ck=bkv, prune=prune)
    return out.reshape(b, h, n, d)


def _fp_fwd(q, k, v, kv_lens, bq, bkv, prune):
    import os

    # o rides along as a residual: the backward needs rowsum(dO*o) and
    # saving it beats recomputing it with a whole extra fwd kernel pass
    # (under remat the residual is produced by the recompute either way).
    # In a grad context the lse-emitting fwd runs instead, so BOTH backward
    # kernels consume the forward's logsumexp (the dq rescan disappears).
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if ((on_tpu or _INTERPRET)
            and os.environ.get("F5_TTS_BWD_LSE", "1") != "0"):
        b, h, n, d = q.shape
        lens = kv_lens.astype(jnp.int32)
        if lens.shape[0] == 1 and b > 1:
            lens = jnp.broadcast_to(lens, (b,))
        lens_h = jnp.repeat(lens, h)
        fwd_lse = (_flash_prefix_folded_v2_lse
                   if (2 * d == LANES
                       and os.environ.get("F5_TTS_FLASH_V2", "0") == "1")
                   else _flash_prefix_folded_lse)
        of, lse = fwd_lse(
            q.reshape(b * h, n, d), k.reshape(b * h, n, d),
            v.reshape(b * h, n, d), lens_h, 1.0 / math.sqrt(d),
            bq=bq, ck=bkv, prune=False)
        return of.reshape(b, h, n, d), (q, k, v, kv_lens, of, lse)
    out = flash_prefix_attention(q, k, v, kv_lens, bq, bkv, prune)
    return out, (q, k, v, kv_lens, out, None)


def _fp_bwd(bq, bkv, prune, res, g):
    import os

    import numpy as np

    q, k, v, kv_lens, o, lse = res
    n = q.shape[2]
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if ((on_tpu or _INTERPRET)
            and os.environ.get("F5_TTS_FLASH_BWD", "1") != "0"
            and n % bq == 0 and q.shape[3] <= LANES):
        dq, dk, dv = flash_prefix_attention_bwd(q, k, v, kv_lens, g, o=o,
                                                lse=lse, bq=bq, bkv=bkv)
        return dq, dk, dv, np.zeros(kv_lens.shape, jax.dtypes.float0)
    lens = kv_lens.astype(jnp.int32)
    if lens.shape[0] == 1 and q.shape[0] > 1:
        lens = jnp.broadcast_to(lens, (q.shape[0],))
    _, vjp = jax.vjp(lambda a, b_, c: _xla_prefix_attention(a, b_, c, lens),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, np.zeros(kv_lens.shape, jax.dtypes.float0)


flash_prefix_attention.defvjp(_fp_fwd, _fp_bwd)


# ---------------------------------------------------------------------------
# rope-in-kernel variant: contiguous [H, n, d] layout, rope in-register
# ---------------------------------------------------------------------------


def _head_rope(x, cs, sn, rope_on, dh):
    """Half-split rope on a [rows, dh] tile: out = x*cs + swap(x)*sn with
    cs=[cos||cos], sn=[-sin||sin]; swap rides the MXU as an iota-built
    permutation dot (pltpu.roll on sub-lane slices crashes Mosaic)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (dh, dh), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (dh, dh), 1)
    perm = ((r + dh // 2) % dh == c).astype(x.dtype)
    swapped = jax.lax.dot(x, perm, preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.where(rope_on > 0, x * cs + swapped * sn, x)


def _kernel_rope(kvlen_ref, ropemask_ref, q_ref, k_ref, v_ref,
                 csq_ref, snq_ref, csk_ref, snk_ref, o_ref,
                 m_scr, l_scr, acc_scr,
                 *, sm_scale: float, ck: int, prune: bool):
    h = pl.program_id(0)
    kvlen = kvlen_ref[h]
    rope_on = ropemask_ref[h]
    n = k_ref.shape[1]
    dh = q_ref.shape[-1]
    q = _head_rope(q_ref[0], csq_ref[...], snq_ref[...], rope_on, dh)

    def k_read(start, size):
        kc = k_ref[0, pl.ds(start, size), :]
        return _head_rope(kc, csk_ref[pl.ds(start, size), :],
                          snk_ref[pl.ds(start, size), :], rope_on, dh)

    out = _softmax_over_chunks(
        q, k_read,
        lambda s, z: v_ref[0, pl.ds(s, z), :],
        kvlen, sm_scale, _chunk_plan(n, ck), m_scr, l_scr, acc_scr,
        prune=prune)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "bq", "ck", "prune"))
def _flash_prefix_rope_call(q, k, v, lens_h, ropemask_h, cs, sn,
                            sm_scale: float, bq: int, ck: int, prune: bool):
    H, n, d = q.shape
    assert n % bq == 0 and n % LANES == 0, (n, bq)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(H, n // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, i, *_: (h, i, 0)),
            pl.BlockSpec((1, n, d), lambda h, i, *_: (h, 0, 0)),
            pl.BlockSpec((1, n, d), lambda h, i, *_: (h, 0, 0)),
            pl.BlockSpec((bq, d), lambda h, i, *_: (i, 0)),   # cs, q rows
            pl.BlockSpec((bq, d), lambda h, i, *_: (i, 0)),   # sn, q rows
            pl.BlockSpec((n, d), lambda h, i, *_: (0, 0)),    # cs, all rows (K)
            pl.BlockSpec((n, d), lambda h, i, *_: (0, 0)),    # sn, all rows (K)
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda h, i, *_: (h, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
    )
    kernel = functools.partial(_kernel_rope, sm_scale=sm_scale, ck=ck, prune=prune)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, n, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(lens_h, ropemask_h, q, k, v, cs, sn, cs, sn)


def _xla_rope_prefix_reference(q, k, v, kv_lens, cos, sin, pe_attn_head):
    from korean_f5_tts_tpu.models.modules import apply_rope

    n = q.shape[2]
    qr = apply_rope(q, cos[:n], sin[:n], pe_attn_head)
    kr = apply_rope(k, cos[:n], sin[:n], pe_attn_head)
    lens = kv_lens.astype(jnp.int32)
    if lens.shape[0] == 1 and q.shape[0] > 1:
        lens = jnp.broadcast_to(lens, (q.shape[0],))
    return _xla_prefix_attention(qr, kr, v, lens)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def flash_prefix_rope_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                                kv_lens: jax.Array,
                                cos: jax.Array, sin: jax.Array,
                                pe_attn_head: int | None = None,
                                bq: int = 256, bkv: int = 512,
                                prune: bool = False) -> jax.Array:
    """Prefix attention with half-split rope applied IN-KERNEL (pre-rope q/k
    in, contiguous [b, h, n, d] layout) — the separate rope HBM passes on q
    and k never materialise. K chunks are re-roped per q-block from VMEM (a
    few MXU FLOPs, far cheaper than an HBM pass)."""
    b, h, n, d = q.shape
    scale = 1.0 / math.sqrt(d)
    lens = kv_lens.astype(jnp.int32)
    if lens.shape[0] == 1 and b > 1:
        lens = jnp.broadcast_to(lens, (b,))
    lens_h = jnp.repeat(lens, h)
    n_rope = h if pe_attn_head is None else pe_attn_head
    ropemask = jnp.tile((jnp.arange(h) < n_rope).astype(jnp.int32), b)
    cs = jnp.concatenate([cos[:n], cos[:n]], axis=-1).astype(q.dtype)
    sn = jnp.concatenate([-sin[:n], sin[:n]], axis=-1).astype(q.dtype)
    out = _flash_prefix_rope_call(
        q.reshape(b * h, n, d), k.reshape(b * h, n, d), v.reshape(b * h, n, d),
        lens_h, ropemask, cs, sn, scale, bq, bkv, prune)
    return out.reshape(b, h, n, d)


def _fpr_fwd(q, k, v, kv_lens, cos, sin, pe_attn_head, bq, bkv, prune):
    out = flash_prefix_rope_attention(q, k, v, kv_lens, cos, sin,
                                      pe_attn_head, bq, bkv, prune)
    return out, (q, k, v, kv_lens, cos, sin)


def _fpr_bwd(pe_attn_head, bq, bkv, prune, res, g):
    q, k, v, kv_lens, cos, sin = res
    _, vjp = jax.vjp(
        lambda a, b_, c: _xla_rope_prefix_reference(a, b_, c, kv_lens, cos,
                                                    sin, pe_attn_head),
        q, k, v)
    dq, dk, dv = vjp(g)
    import numpy as np

    return (dq, dk, dv, np.zeros(kv_lens.shape, jax.dtypes.float0),
            jnp.zeros_like(cos), jnp.zeros_like(sin))


flash_prefix_rope_attention.defvjp(_fpr_fwd, _fpr_bwd)


# ---------------------------------------------------------------------------
# fused-layout variant: attention straight from the qkv projection output
# ---------------------------------------------------------------------------


def _kernel_qkv(lens_ref, ropemask_ref, q_ref, k_ref, v_ref,
                csq_ref, snq_ref, csk_ref, snk_ref, o_ref,
                ma_scr, la_scr, aa_scr,
                *, sm_scale: float, ck: int, hp: int, dh: int):
    """Whole-region fused-layout kernel: attention straight from the fused
    qkv matmul output [B, n, 3*h*dh] with NO transposes and NO separate
    rope passes.

    Blocks are the contiguous q/k/v column REGIONS (1024-wide, legal and
    DMA-friendly; a strided 64- or 128-wide head view measured ~2x slower):
    the q block index is constant across the inner head-pair grid dim and
    the K/V blocks are constant across both q and pair dims, so each region
    is fetched ONCE per (batch, q-block). Heads are read in-register as
    dynamic 128-lane slices (pair of dh=64 heads). Half-split rope is
    applied in-register: out = x*cs + swap(x)*sn with cs = [cos||cos],
    sn = [-sin||sin] per head; swap rides the MXU as an iota-built
    block-diagonal permutation dot (pltpu.roll on sub-lane slices crashes
    Mosaic). K chunks are re-roped per use — a few MXU FLOPs, far cheaper
    than an HBM rope pass.
    """
    b = pl.program_id(0)
    pair = pl.program_id(2)   # innermost: q/k/v region blocks stay resident
    kvlen = lens_ref[b]
    rm_a = ropemask_ref[2 * pair]
    rm_b = ropemask_ref[2 * pair + 1]
    W = 2 * dh
    lane0 = pl.multiple_of(pair * W, W)

    def _pair_rope(x, cs, sn):
        rows = x.shape[0]
        r = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
        perm = ((r // dh == c // dh)
                & ((r % dh + dh // 2) % dh == c % dh)).astype(x.dtype)
        swapped = jax.lax.dot(
            x, perm, preferred_element_type=jnp.float32).astype(x.dtype)
        roped = x * cs + swapped * sn
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, W), 1)
        gate = jnp.where(lane < dh, rm_a, rm_b)  # per-half pe_attn_head gating
        return jnp.where(gate > 0, roped, x)

    qp = _pair_rope(q_ref[0, :, pl.ds(lane0, W)], csq_ref[...], snq_ref[...])
    qa, qb = qp[:, :dh], qp[:, dh:]
    n = k_ref.shape[1]
    chunks = _chunk_plan(n, ck)

    def k_half(half):
        def read(start, size):
            kc = k_ref[0, pl.ds(start, size), pl.ds(lane0, W)]
            kc = _pair_rope(kc, csk_ref[pl.ds(start, size), :],
                            snk_ref[pl.ds(start, size), :])
            return kc[:, :dh] if half == 0 else kc[:, dh:]

        return read

    def v_half(half):
        def read(start, size):
            vc = v_ref[0, pl.ds(start, size), pl.ds(lane0, W)]
            return vc[:, :dh] if half == 0 else vc[:, dh:]

        return read

    # the two halves run sequentially, so they SHARE one scratch set
    # (out_a is fully read back into registers before half b reinitialises)
    out_a = _softmax_over_chunks(
        qa, k_half(0), v_half(0),
        kvlen, sm_scale, chunks, ma_scr, la_scr, aa_scr, prune=False)
    out_b = _softmax_over_chunks(
        qb, k_half(1), v_half(1),
        kvlen, sm_scale, chunks, ma_scr, la_scr, aa_scr, prune=False)
    out = jnp.concatenate([out_a, out_b], axis=1)
    o_ref[0, :, pl.ds(lane0, W)] = out.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("heads", "sm_scale", "bq", "ck"))
def _flash_prefix_qkv_call(qkv, lens_b, ropemask, cs, sn, heads: int,
                           sm_scale: float, bq: int, ck: int):
    B, n, three_inner = qkv.shape
    dh = three_inner // (3 * heads)
    inner = heads * dh
    assert n % bq == 0 and n % LANES == 0 and ck % LANES == 0, (n, bq, ck)
    assert 2 * dh == LANES and heads % 2 == 0, (dh, heads)
    hp = heads // 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n // bq, hp),
        in_specs=[
            # contiguous q/k/v column REGIONS of the one fused qkv array;
            # q constant across pair, K/V constant across (i, pair)
            pl.BlockSpec((1, bq, inner), lambda b, i, g, *_: (b, i, 0)),
            pl.BlockSpec((1, n, inner), lambda b, i, g, *_: (b, 0, 1)),
            pl.BlockSpec((1, n, inner), lambda b, i, g, *_: (b, 0, 2)),
            pl.BlockSpec((bq, LANES), lambda b, i, g, *_: (i, 0)),  # cs, q rows
            pl.BlockSpec((bq, LANES), lambda b, i, g, *_: (i, 0)),  # sn, q rows
            pl.BlockSpec((n, LANES), lambda b, i, g, *_: (0, 0)),   # cs (K)
            pl.BlockSpec((n, LANES), lambda b, i, g, *_: (0, 0)),   # sn (K)
        ],
        out_specs=pl.BlockSpec((1, bq, inner), lambda b, i, g, *_: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, dh), jnp.float32),
        ],
    )
    kernel = functools.partial(_kernel_qkv, sm_scale=sm_scale, ck=ck,
                               hp=hp, dh=dh)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n, inner), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(lens_b, ropemask, qkv, qkv, qkv, cs, sn, cs, sn)


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
    n_rope = heads if pe_attn_head is None else pe_attn_head
    ropemask = (jnp.arange(heads) < n_rope).astype(jnp.int32)
    cs1 = jnp.concatenate([cos[:n], cos[:n]], axis=-1)          # [n, dh]
    sn1 = jnp.concatenate([-sin[:n], sin[:n]], axis=-1)
    cs = jnp.tile(cs1, (1, 2)).astype(qkv.dtype)                # [n, 2*dh] pair
    sn = jnp.tile(sn1, (1, 2)).astype(qkv.dtype)
    return _flash_prefix_qkv_call(qkv, lens, ropemask, cs, sn, heads,
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
