"""Fused int8 quant-matmul Pallas kernel.

y = dequant(quant(x) @ w_int8): per-row dynamic activation quantization
happens in VMEM, the int8xint8->int32 contraction rides the MXU at 2x the
bf16 rate (v5e), and the rescale fuses in-register — none of the int8
operands or the fp32 accumulator round-trip HBM. This is the kernel the
plain-XLA int8 path (models/quant.py) lacks: there the quantize/rescale ops
are separate HBM-level passes that erase the MXU gain.

Layout: x [M, K] (bf16/f32), w_int8 [K, N], w_scale [N]. Grid over (M, N)
tiles with the full K in VMEM (K <= 4096 at these model sizes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _qmm_kernel(x_ref, w_ref, ws_ref, b_ref, o_ref, *, activation):
    x = x_ref[:].astype(jnp.float32)
    # per-row dynamic quantization, entirely in VMEM
    x_scale = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-6) / 127.0
    x_q = jnp.clip(jnp.rint(x / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * x_scale * ws_ref[:].astype(jnp.float32)
    y = y + b_ref[:].astype(jnp.float32)
    if activation == "gelu_tanh":
        y = jax.nn.gelu(y, approximate=True)
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "activation"))
def qmatmul(x: jax.Array, w_int8: jax.Array, w_scale: jax.Array,
            bias: jax.Array | None = None, activation: str | None = None,
            block_m: int = 256, block_n: int = 512) -> jax.Array:
    """[M, K] x [K, N] int8-quantized matmul with fused bias/activation
    epilogue; M % block_m == N % block_n == 0."""
    m, k = x.shape
    _, n = w_int8.shape
    grid = (m // block_m, n // block_n)
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)
    kernel = functools.partial(_qmm_kernel, activation=activation)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, k), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, block_n), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                # scales/bias as [1, N]: 1-D blocks trip Mosaic layout checks
                pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
    )(x, w_int8, w_scale.reshape(1, n), bias.reshape(1, n).astype(jnp.float32))
