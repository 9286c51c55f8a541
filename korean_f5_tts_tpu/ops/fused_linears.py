"""Fused attention-side linear kernels for the DiT block (TPU Pallas).

Complements ops/ff_block.py: with these, every elementwise stage of a DiT
block fuses into the adjacent matmul and the only [m, d] tensors that
round-trip HBM per block are the residual stream and the attention q/k/v/out
(which feed the attention kernel):

  ln_mod_matmul       y = (LN(h) * (1+scale) + shift) @ W + b
                      — the AdaLN-modulated projection producing fused qkv
                        (reference modules.py:651-676 + attention qkv).
  proj_gated_residual o = h + gate * (a @ W + b)
                      — the attention output projection folded into the
                        gated residual add (modules.py:677-680).

Weight blocks use constant index maps, so Mosaic keeps them VMEM-resident
across the m-tile grid. Forward-only hot path; custom_vjp recomputes the
XLA formulation for training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

_INTERPRET = _os.environ.get("F5_TTS_PALLAS_INTERPRET", "0") != "0"


def _ln_mod_matmul_kernel(h_ref, sc_ref, sh_ref, w_ref, b_ref, o_ref, *, eps):
    x = h_ref[0].astype(jnp.float32)                 # [bm, d]
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    y = xn * (1.0 + sc_ref[...].astype(jnp.float32)) + sh_ref[...].astype(jnp.float32)
    y = y.astype(o_ref.dtype)
    o = jax.lax.dot(y, w_ref[...], preferred_element_type=jnp.float32)
    o_ref[0] = (o + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "eps"))
def _ln_mod_matmul_call(h, sc, sh, w, b, bm: int, eps: float):
    B, n, d = h.shape
    dout = w.shape[1]
    m = B * n
    assert m % bm == 0, (m, bm)
    out = pl.pallas_call(
        functools.partial(_ln_mod_matmul_kernel, eps=eps),
        grid_spec=pl.GridSpec(
            grid=(m // bm,),
            in_specs=[
                pl.BlockSpec((1, bm, d), lambda i: (0, i, 0)),
                pl.BlockSpec((1, d), lambda i: (0, 0)),
                pl.BlockSpec((1, d), lambda i: (0, 0)),
                pl.BlockSpec((d, dout), lambda i: (0, 0)),   # VMEM-resident
                pl.BlockSpec((1, dout), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bm, dout), lambda i: (0, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((1, m, dout), h.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_INTERPRET,
    )(h.reshape(1, m, d), sc.reshape(1, d), sh.reshape(1, d), w, b.reshape(1, dout))
    return out.reshape(B, n, dout)


def _ln_mod_matmul_xla(h, sc, sh, w, b, eps=1e-6):
    x = h.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xn = (xc * jax.lax.rsqrt(var + eps)).astype(h.dtype)
    y = xn * (1 + sc) + sh
    return y @ w + b


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def ln_mod_matmul(h, sc, sh, w, b, bm: int = 256, eps: float = 1e-6):
    """[B, n, d] -> (LN(h)*(1+sc)+sh) @ w + b, one Pallas program."""
    d = h.shape[-1]
    return _ln_mod_matmul_call(h, sc.reshape(-1)[-d:], sh.reshape(-1)[-d:],
                               w, b, bm, eps)


def _lmm_fwd(h, sc, sh, w, b, bm, eps):
    return ln_mod_matmul(h, sc, sh, w, b, bm, eps), (h, sc, sh, w, b)


def _lmm_bwd(bm, eps, res, g):
    h, sc, sh, w, b = res
    _, vjp = jax.vjp(lambda *a: _ln_mod_matmul_xla(*a, eps=eps), h, sc, sh, w, b)
    return vjp(g)


ln_mod_matmul.defvjp(_lmm_fwd, _lmm_bwd)


def _quant_rows(y):
    s = jnp.maximum(jnp.max(jnp.abs(y), axis=-1, keepdims=True), 1e-6) / 127.0
    q = jnp.clip(jnp.rint(y / s), -127, 127).astype(jnp.int8)
    return q, s


def _ln_mod_matmul_int8_kernel(h_ref, sc_ref, sh_ref, w_ref, ws_ref, b_ref,
                               o_ref, *, eps):
    x = h_ref[0].astype(jnp.float32)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    y = xn * (1.0 + sc_ref[...].astype(jnp.float32)) + sh_ref[...].astype(jnp.float32)
    yq, ys = _quant_rows(y)
    o = jax.lax.dot_general(yq, w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    o = o.astype(jnp.float32) * ys * ws_ref[...].astype(jnp.float32)
    o_ref[0] = (o + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "eps"))
def ln_mod_matmul_int8(h, sc, sh, qp: dict, bm: int = 256, eps: float = 1e-6):
    """int8-weight ln_mod_matmul (models/quant.py layout); forward-only."""
    B, n, d = h.shape
    w, ws, b = qp["w_int8"], qp["w_scale"], qp["b"]
    dout = w.shape[1]
    m = B * n
    assert m % bm == 0, (m, bm)
    sc = sc.reshape(-1)[-d:]
    sh = sh.reshape(-1)[-d:]
    out = pl.pallas_call(
        functools.partial(_ln_mod_matmul_int8_kernel, eps=eps),
        grid_spec=pl.GridSpec(
            grid=(m // bm,),
            in_specs=[
                pl.BlockSpec((1, bm, d), lambda i: (0, i, 0)),
                pl.BlockSpec((1, d), lambda i: (0, 0)),
                pl.BlockSpec((1, d), lambda i: (0, 0)),
                pl.BlockSpec((d, dout), lambda i: (0, 0)),
                pl.BlockSpec((1, dout), lambda i: (0, 0)),
                pl.BlockSpec((1, dout), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bm, dout), lambda i: (0, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((1, m, dout), h.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_INTERPRET,
    )(h.reshape(1, m, d), sc.reshape(1, d), sh.reshape(1, d), w,
      ws.reshape(1, dout), b.reshape(1, dout))
    return out.reshape(B, n, dout)


def _proj_gated_int8_kernel(a_ref, h_ref, gate_ref, w_ref, ws_ref, b_ref, o_ref):
    a = a_ref[0].astype(jnp.float32)
    aq, as_ = _quant_rows(a)
    o = jax.lax.dot_general(aq, w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    o = o.astype(jnp.float32) * as_ * ws_ref[...].astype(jnp.float32)
    o = o + b_ref[...].astype(jnp.float32)
    out = h_ref[0].astype(jnp.float32) + gate_ref[...].astype(jnp.float32) * o
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm",))
def proj_gated_residual_int8(a, h, gate, qp: dict, bm: int = 256):
    """int8-weight proj_gated_residual; forward-only."""
    B, n, din = a.shape
    w, ws, b = qp["w_int8"], qp["w_scale"], qp["b"]
    d = w.shape[1]
    m = B * n
    assert m % bm == 0, (m, bm)
    gate = gate.reshape(-1)[-d:]
    out = pl.pallas_call(
        _proj_gated_int8_kernel,
        grid_spec=pl.GridSpec(
            grid=(m // bm,),
            in_specs=[
                pl.BlockSpec((1, bm, din), lambda i: (0, i, 0)),
                pl.BlockSpec((1, bm, d), lambda i: (0, i, 0)),
                pl.BlockSpec((1, d), lambda i: (0, 0)),
                pl.BlockSpec((din, d), lambda i: (0, 0)),
                pl.BlockSpec((1, d), lambda i: (0, 0)),
                pl.BlockSpec((1, d), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bm, d), lambda i: (0, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((1, m, d), h.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_INTERPRET,
    )(a.reshape(1, m, din), h.reshape(1, m, d), gate.reshape(1, d), w,
      ws.reshape(1, d), b.reshape(1, d))
    return out.reshape(B, n, d)


def _proj_gated_kernel(a_ref, h_ref, gate_ref, w_ref, b_ref, o_ref):
    a = a_ref[0]
    o = jax.lax.dot(a, w_ref[...], preferred_element_type=jnp.float32)
    o = o + b_ref[...].astype(jnp.float32)
    out = h_ref[0].astype(jnp.float32) + gate_ref[...].astype(jnp.float32) * o
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm",))
def _proj_gated_call(a, h, gate, w, b, bm: int):
    B, n, din = a.shape
    d = w.shape[1]
    m = B * n
    assert m % bm == 0, (m, bm)
    out = pl.pallas_call(
        _proj_gated_kernel,
        grid_spec=pl.GridSpec(
            grid=(m // bm,),
            in_specs=[
                pl.BlockSpec((1, bm, din), lambda i: (0, i, 0)),
                pl.BlockSpec((1, bm, d), lambda i: (0, i, 0)),
                pl.BlockSpec((1, d), lambda i: (0, 0)),
                pl.BlockSpec((din, d), lambda i: (0, 0)),    # VMEM-resident
                pl.BlockSpec((1, d), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bm, d), lambda i: (0, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((1, m, d), h.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_INTERPRET,
    )(a.reshape(1, m, din), h.reshape(1, m, d), gate.reshape(1, d), w,
      b.reshape(1, d))
    return out.reshape(B, n, d)


def _proj_gated_xla(a, h, gate, w, b):
    return h + gate * (a @ w + b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def proj_gated_residual(a, h, gate, w, b, bm: int = 256):
    """[B, n, din] @ w [din, d] folded into the gated residual: h + gate*(aw+b)."""
    d = w.shape[1]
    return _proj_gated_call(a, h, gate.reshape(-1)[-d:], w, b, bm)


def _pgr_fwd(a, h, gate, w, b, bm):
    return proj_gated_residual(a, h, gate, w, b, bm), (a, h, gate, w, b)


def _pgr_bwd(bm, res, g):
    a, h, gate, w, b = res
    _, vjp = jax.vjp(_proj_gated_xla, a, h, gate, w, b)
    return vjp(g)


proj_gated_residual.defvjp(_pgr_fwd, _pgr_bwd)
