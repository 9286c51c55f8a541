"""Pallas TPU kernel for ConvPositionEmbedding's grouped conv1d (+ fused Mish).

The reference runs this as torch ``Conv1d(dim, dim, 31, groups=16)`` twice with
Mish in between (reference src/f5_tts/model/modules.py:170-196). On v5e the
XLA grouped-conv lowering reaches only ~10-20% MXU because each group is a
64-channel contraction (half the 128-lane MXU width) and the unfold
materialises 31x the activation traffic.

This kernel instead:

- packs ``128 // cg`` consecutive groups into one block-diagonal
  ``[128, 128]`` weight per tap (for cg=64 that is 2 groups per block; the
  2x block-diagonal FLOP padding is free because those MXU lanes were idle
  anyway),
- computes the convolution as ``k`` shifted ``[N,128] @ [128,128]`` matmuls
  accumulated in fp32 registers — the input tile is read from HBM exactly
  once per group-block,
- fuses the bias add and the Mish epilogue so the pre-activation never
  round-trips HBM.

Weight layout matches models/modules.py conv1d_init: ``w [k, cg, c_out]``
with group-major output channels, ``b [c_out]``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def use_pallas_conv_pos() -> bool:
    return os.environ.get("F5_TTS_PALLAS_CONVPOS", "1") != "0"


def pallas_conv_supported(c: int, groups: int, kernel: int) -> bool:
    """Shapes the kernel handles: lane-width group blocks, odd SAME kernel."""
    if c % groups != 0:
        return False
    cg = c // groups
    if cg > _LANES or _LANES % cg != 0:
        return False
    gpb = _LANES // cg
    return groups % gpb == 0 and kernel % 2 == 1


def _pack_block_diag(w: jax.Array, groups: int) -> jax.Array:
    """[k, cg, c_out] -> [n_blocks, k, 128, 128] block-diagonal weights."""
    k, cg, c_out = w.shape
    gpb = _LANES // cg
    nb = groups // gpb
    # c_out axis is group-major: (groups, cg_out)
    wg = w.reshape(k, cg, nb, gpb, cg)            # t, ci, block, j, co
    blocks = wg.transpose(2, 0, 3, 1, 4)          # block, t, j, ci, co
    eye = jnp.eye(gpb, dtype=w.dtype)
    w6 = blocks[:, :, :, :, None, :] * eye[None, None, :, None, :, None]
    return w6.reshape(nb, k, gpb * cg, gpb * cg)  # rows=(j,ci), cols=(l,co)


_SUBLANE = 8


def _gc_kernel(x_ref, w_ref, b_ref, o_ref, *, k: int, n: int, fuse_mish: bool):
    # Two-level tap loop: taps t = 8a + r share one sublane-misaligned base
    # slice per phase r (8 rotations total instead of k), then 8-aligned
    # offsets 8a on top of it are free.
    xv = x_ref[0]  # [n + pad_total, 128]
    span = ((k - 1) // _SUBLANE) * _SUBLANE  # extra rows the aligned offsets need
    acc = None
    for r in range(min(_SUBLANE, k)):
        xs = jax.lax.slice_in_dim(xv, r, r + n + span, axis=0)
        for t in range(r, k, _SUBLANE):
            a = t - r
            d = jax.lax.dot(jax.lax.slice_in_dim(xs, a, a + n, axis=0),
                            w_ref[0, t], preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
    acc = acc + b_ref[0].astype(jnp.float32)
    if fuse_mish:
        acc = acc * jnp.tanh(jax.nn.softplus(acc))
    o_ref[0] = acc.astype(o_ref.dtype)


def _pallas_fwd(x: jax.Array, w: jax.Array, b: jax.Array | None,
                groups: int, fuse_mish: bool, interpret: bool) -> jax.Array:
    bsz, n, c = x.shape
    k = w.shape[0]
    assert pallas_conv_supported(c, groups, k), (c, groups, k)
    pad = k // 2
    nb = groups * (c // groups) // _LANES  # number of 128-lane group blocks

    # trailing zeros so every phase-r base slice [r, r+n+span) stays in bounds
    span = ((k - 1) // _SUBLANE) * _SUBLANE
    n_pad = n + span + min(_SUBLANE, k) - 1
    xp = jnp.pad(x, ((0, 0), (pad, n_pad - n - pad), (0, 0)))
    wp = _pack_block_diag(w.astype(x.dtype), groups)
    bias = (b if b is not None else jnp.zeros((c,), jnp.float32))
    bias = bias.astype(jnp.float32).reshape(nb, 1, _LANES)

    kernel = functools.partial(_gc_kernel, k=k, n=n, fuse_mish=fuse_mish)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, n, c), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(bsz, nb),
            in_specs=[
                pl.BlockSpec((1, n_pad, _LANES), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k, _LANES, _LANES), lambda i, j: (j, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, _LANES), lambda i, j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, n, _LANES), lambda i, j: (i, 0, j),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(xp, wp, bias)


def _xla_ref(x: jax.Array, w: jax.Array, b: jax.Array | None,
             groups: int, fuse_mish: bool) -> jax.Array:
    """Reference XLA lowering; also supplies the backward pass."""
    pad = w.shape[0] // 2
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1,), [(pad, pad)],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=groups)
    if b is not None:
        y = y + b.astype(x.dtype)
    if fuse_mish:
        y = y * jnp.tanh(jax.nn.softplus(y))
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gc(x, w, b, groups, fuse_mish, interpret):
    return _pallas_fwd(x, w, b, groups, fuse_mish, interpret)


def _gc_fwd(x, w, b, groups, fuse_mish, interpret):
    # f_fwd only runs when the call is being differentiated (training).
    # There the pallas forward is a net loss: remat re-runs the forward and
    # the backward recomputes it again via XLA, so use XLA end-to-end and
    # keep the pallas kernel for the (grad-free) inference path.
    return _xla_ref(x, w, b, groups, fuse_mish), (x, w, b)


def _gc_bwd(groups, fuse_mish, interpret, res, g):
    # pallas_call has no autodiff rule; differentiate the XLA reference.
    x, w, b = res
    if b is None:
        _, vjp = jax.vjp(lambda x_, w_: _xla_ref(x_, w_, None, groups, fuse_mish),
                         x, w)
        dx, dw = vjp(g)
        return dx, dw, None
    _, vjp = jax.vjp(lambda x_, w_, b_: _xla_ref(x_, w_, b_, groups, fuse_mish),
                     x, w, b)
    return vjp(g)


_gc.defvjp(_gc_fwd, _gc_bwd)


@functools.partial(jax.jit, static_argnames=("groups", "fuse_mish", "interpret"))
def grouped_conv1d_mish(x: jax.Array, w: jax.Array, b: jax.Array | None,
                        groups: int = 16, fuse_mish: bool = True,
                        interpret: bool = False) -> jax.Array:
    """SAME grouped conv1d with optional fused Mish, differentiable.

    x [B, N, C] channels-last, w [k, C/groups, C], b [C] or None.
    Requires pallas_conv_supported(C, groups, k). Forward runs the Pallas
    kernel; the VJP falls back to XLA's grouped-conv gradient.
    """
    return _gc(x, w, b, groups, fuse_mish, interpret)
