"""Fused DiT FF half-block Pallas kernel (TPU).

One kernel computes h + gate * FF(LN(h) * (1+scale) + shift) — the whole
second half of a DiT block (reference modules.py:651-697: AdaLN-zero
modulated FeedForward with gated residual). Fusing it matters because the
two FF matmuls are separated by elementwise stages that XLA materialises in
HBM between programs: the modulated-norm activation [m, d] and the GELU
intermediate [m, 4d/2] each cost a full HBM round-trip per block per step.
Here both stay in VMEM: the kernel streams h tiles, keeps BOTH weight
matrices VMEM-resident (their block index is constant across the grid, so
Mosaic fetches them once), and writes only the final residual output.

LN is computed in fp32 (mean/variance over the feature axis, eps matching
models.modules.layernorm), GELU is the tanh approximation (reference uses
approximate="tanh", modules.py:348-359). Forward-only: sampling is the hot
path; training takes the XLA path (custom_vjp recomputes it for grads).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

_INTERPRET = _os.environ.get("F5_TTS_PALLAS_INTERPRET", "0") != "0"


def _gelu_tanh(x):
    # tanh-approximated GELU in f32 (matches jax.nn.gelu(approximate=True))
    c = math.sqrt(2.0 / math.pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def _kernel(h_ref, sc_ref, sh_ref, gate_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            o_ref, *, eps: float):
    x = h_ref[0]                               # [bm, d] bf16
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    y = xn * (1.0 + sc_ref[...].astype(jnp.float32)) + sh_ref[...].astype(jnp.float32)
    y = y.astype(x.dtype)
    z = jax.lax.dot(y, w1_ref[...], preferred_element_type=jnp.float32)
    z = z + b1_ref[...].astype(jnp.float32)
    z = _gelu_tanh(z).astype(x.dtype)
    o = jax.lax.dot(z, w2_ref[...], preferred_element_type=jnp.float32)
    o = o + b2_ref[...].astype(jnp.float32)
    out = xf + gate_ref[...].astype(jnp.float32) * o
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "eps"))
def _ff_block_call(h, sc, sh, gate, w1, b1, w2, b2, bm: int, eps: float):
    B, n, d = h.shape
    dff = w1.shape[1]
    m = B * n
    h2 = h.reshape(m, d)
    assert m % bm == 0, (m, bm)
    grid_spec = pl.GridSpec(
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((1, bm, d), lambda i: (0, i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            # whole weight blocks: index constant -> fetched once, stay VMEM
            pl.BlockSpec((d, dff), lambda i: (0, 0)),
            pl.BlockSpec((1, dff), lambda i: (0, 0)),
            pl.BlockSpec((dff, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bm, d), lambda i: (0, i, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, m, d), h.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_INTERPRET,
    )(h2[None], sc.reshape(1, d), sh.reshape(1, d), gate.reshape(1, d),
      w1, b1.reshape(1, dff), w2, b2.reshape(1, d))
    return out.reshape(B, n, d)


def _quant_rows(y):
    """Per-row symmetric int8 quantization, entirely in registers."""
    s = jnp.maximum(jnp.max(jnp.abs(y), axis=-1, keepdims=True), 1e-6) / 127.0
    q = jnp.clip(jnp.rint(y / s), -127, 127).astype(jnp.int8)
    return q, s


def _kernel_int8(h_ref, sc_ref, sh_ref, gate_ref, w1_ref, w1s_ref, b1_ref,
                 w2_ref, w2s_ref, b2_ref, o_ref, *, eps: float):
    """int8-weight variant: the prologue (LN+modulate) and BOTH dynamic
    per-row activation quantizations run in VMEM, the two int8 dots ride
    the MXU at 2x bf16 rate, and the rescales fuse in-register — the
    failure mode of the standalone qmatmul (its prologue materialising to
    HBM at the pallas boundary) cannot occur because the prologue IS here."""
    x = h_ref[0]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    y = xn * (1.0 + sc_ref[...].astype(jnp.float32)) + sh_ref[...].astype(jnp.float32)
    yq, ys = _quant_rows(y)
    z = jax.lax.dot_general(yq, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    z = z.astype(jnp.float32) * ys * w1s_ref[...].astype(jnp.float32)
    z = _gelu_tanh(z + b1_ref[...].astype(jnp.float32))
    zq, zs = _quant_rows(z)
    o = jax.lax.dot_general(zq, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    o = o.astype(jnp.float32) * zs * w2s_ref[...].astype(jnp.float32)
    o = o + b2_ref[...].astype(jnp.float32)
    out = xf + gate_ref[...].astype(jnp.float32) * o
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "eps"))
def _ff_block_int8_call(h, sc, sh, gate, w1, w1s, b1, w2, w2s, b2,
                        bm: int, eps: float):
    B, n, d = h.shape
    dff = w1.shape[1]
    m = B * n
    assert m % bm == 0, (m, bm)
    out = pl.pallas_call(
        functools.partial(_kernel_int8, eps=eps),
        grid_spec=pl.GridSpec(
            grid=(m // bm,),
            in_specs=[
                pl.BlockSpec((1, bm, d), lambda i: (0, i, 0)),
                pl.BlockSpec((1, d), lambda i: (0, 0)),
                pl.BlockSpec((1, d), lambda i: (0, 0)),
                pl.BlockSpec((1, d), lambda i: (0, 0)),
                pl.BlockSpec((d, dff), lambda i: (0, 0)),   # int8, VMEM-resident
                pl.BlockSpec((1, dff), lambda i: (0, 0)),
                pl.BlockSpec((1, dff), lambda i: (0, 0)),
                pl.BlockSpec((dff, d), lambda i: (0, 0)),   # int8, VMEM-resident
                pl.BlockSpec((1, d), lambda i: (0, 0)),
                pl.BlockSpec((1, d), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bm, d), lambda i: (0, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((1, m, d), h.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_INTERPRET,
    )(h.reshape(1, m, d), sc.reshape(1, d), sh.reshape(1, d),
      gate.reshape(1, d), w1, w1s.reshape(1, dff), b1.reshape(1, dff),
      w2, w2s.reshape(1, d), b2.reshape(1, d))
    return out.reshape(B, n, d)


def ff_block_fused_int8(h, sc, sh, gate, qp_in: dict, qp_out: dict,
                        bm: int = 256, eps: float = 1e-6) -> jax.Array:
    """int8-weight FF half-block (models/quant.py layout: w_int8/w_scale/b).

    Forward-only (int8 inference mode; training stays bf16/fp32)."""
    d = h.shape[-1]
    return _ff_block_int8_call(
        h, sc.reshape(-1)[-d:], sh.reshape(-1)[-d:], gate.reshape(-1)[-d:],
        qp_in["w_int8"], qp_in["w_scale"], qp_in["b"],
        qp_out["w_int8"], qp_out["w_scale"], qp_out["b"], bm, eps)


def _xla_reference_int8(h, sc, sh, gate, qp_in, qp_out, eps=1e-6):
    """Unfused reference for the int8 kernel (same math, XLA ops)."""
    xf = h.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    y = xn * (1.0 + sc.astype(jnp.float32)) + sh.astype(jnp.float32)
    yq, ys = _quant_rows(y)
    z = jax.lax.dot_general(yq, qp_in["w_int8"], (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    z = z.astype(jnp.float32) * ys * qp_in["w_scale"]
    z = _gelu_tanh(z + qp_in["b"].astype(jnp.float32))
    zq, zs = _quant_rows(z)
    o = jax.lax.dot_general(zq, qp_out["w_int8"], (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    o = o.astype(jnp.float32) * zs * qp_out["w_scale"]
    o = o + qp_out["b"].astype(jnp.float32)
    return (xf + gate.astype(jnp.float32) * o).astype(h.dtype)


def _xla_reference(h, sc, sh, gate, w1, b1, w2, b2, eps=1e-6):
    xf = h.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = (xc * jax.lax.rsqrt(var + eps)).astype(h.dtype)
    y = xn * (1.0 + sc) + sh
    z = jax.nn.gelu((y @ w1 + b1).astype(jnp.float32), approximate=True).astype(h.dtype)
    o = z @ w2 + b2
    return h + gate * o


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def ff_block_fused(h: jax.Array, sc: jax.Array, sh: jax.Array, gate: jax.Array,
                   w1: jax.Array, b1: jax.Array, w2: jax.Array, b2: jax.Array,
                   bm: int = 256, eps: float = 1e-6) -> jax.Array:
    """h [B, n, d] -> h + gate * FF(LN(h)*(1+sc)+sh); sc/sh/gate [d] or [1, d].

    One Pallas program for the whole FF half-block. Backward differentiates
    the XLA formulation (forward-only hot path).
    """
    d = h.shape[-1]
    return _ff_block_call(h, sc.reshape(-1)[-d:], sh.reshape(-1)[-d:],
                          gate.reshape(-1)[-d:], w1, b1, w2, b2, bm, eps)


def _ffb_fwd(h, sc, sh, gate, w1, b1, w2, b2, bm, eps):
    out = ff_block_fused(h, sc, sh, gate, w1, b1, w2, b2, bm, eps)
    return out, (h, sc, sh, gate, w1, b1, w2, b2)


def _ffb_bwd(bm, eps, res, g):
    h, sc, sh, gate, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _xla_reference(*a, eps=eps), h, sc, sh, gate, w1, b1, w2, b2)
    return vjp(g)


ff_block_fused.defvjp(_ffb_fwd, _ffb_bwd)
