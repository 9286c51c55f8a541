"""Int8 quantized linears (weight per-channel + dynamic per-row activations).

v5e's MXU runs int8 at 2x the bf16 rate; the DiT sampler is matmul-bound
after the splash-attention work, so quantizing the block linears is the next
RTF lever. Opt-in: `quantize_params` rewrites selected linear param dicts to
{"w_int8", "w_scale", "b"?}, and `models.modules.linear` dispatches on that
layout — no model-code changes.

Scheme: y = (q(x) @ w_int8) * (x_scale ⊗ w_scale) + b with
  w_int8[c] = round(w[:, c] / w_scale[c]),  w_scale[c] = max|w[:, c]| / 127
  q(x)[r] = round(x[r] / x_scale[r]),       x_scale[r] = max|x[r]| / 127
(symmetric, no zero points — both operands centred by design).
"""

from __future__ import annotations

import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_QUANT_PATTERNS = (
    r"attn/to_q$", r"attn/to_k$", r"attn/to_v$", r"attn/to_out$",
    r"ff/in$", r"ff/out$",
)


def quantize_linear(p: dict) -> dict:
    w = np.asarray(p["w"], np.float32)
    w_scale = np.maximum(np.abs(w).max(axis=0), 1e-8) / 127.0
    w_int8 = np.clip(np.rint(w / w_scale[None, :]), -127, 127).astype(np.int8)
    out = {"w_int8": jnp.asarray(w_int8), "w_scale": jnp.asarray(w_scale, jnp.float32)}
    if "b" in p:
        out["b"] = jnp.asarray(p["b"])
    return out


def qlinear(p: dict, x: jax.Array) -> jax.Array:
    """Dynamic-activation int8 matmul; returns x.dtype.

    On TPU with tile-aligned shapes this runs the fused Pallas kernel
    (ops/qmatmul.py: quantize in VMEM, int8 MXU, in-register rescale —
    measured 286 TOPS vs 204 TFLOP/s bf16 on v5e); otherwise a plain XLA
    int8 dot with separate quant/rescale passes.
    """
    orig_shape = x.shape
    k, n = p["w_int8"].shape
    xf = x.reshape(-1, k)
    m = xf.shape[0]
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if on_tpu and m % 256 == 0 and n % 512 == 0:
        from korean_f5_tts_tpu.ops.qmatmul import qmatmul

        # bias fused into the kernel epilogue
        y = qmatmul(xf, p["w_int8"], p["w_scale"], bias=p.get("b"))
        return y.reshape(*orig_shape[:-1], n)
    x_scale = jnp.maximum(jnp.abs(xf).max(axis=-1, keepdims=True),
                          1e-6).astype(jnp.float32) / 127.0
    x_q = jnp.clip(jnp.rint(xf.astype(jnp.float32) / x_scale),
                   -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, p["w_int8"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * x_scale * p["w_scale"][None, :]
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype).reshape(*orig_shape[:-1], n)


def quantize_params(params: Any, patterns=DEFAULT_QUANT_PATTERNS) -> Any:
    """Rewrite matching linear dicts to the int8 layout (path regexes match
    with block indices stripped, as in models/lora.py)."""
    compiled = [re.compile(p) for p in patterns]

    def walk(node, path):
        if isinstance(node, dict):
            if "w" in node and getattr(node["w"], "ndim", 0) == 2:
                canon = re.sub(r"/\d+", "", path)
                if any(c.search(canon) for c in compiled):
                    return quantize_linear(node)
            return {k: walk(v, f"{path}/{k}" if path else k) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [walk(v, f"{path}/{i}") for i, v in enumerate(node)]
        return node

    return walk(params, "")
