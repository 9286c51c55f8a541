"""LoRA adapters over param pytrees.

Capability parity with reference `src/f5_tts/train/train_lora.py` (PEFT LoRA
r=16 α=32 on to_q/to_k/to_v/to_out + input_embed.proj at rank 64/α 128,
`:123-135`) and the inference-side merge (`infer/utils_infer.py:198-239`).

Functional design: the adapter is its own pytree {path: {"a": [r, in],
"b": [out... [in, r] x [r, out]}}; `apply_lora` materialises base + (a@b)·α/r
inside the jitted step (rank-r matmuls are negligible FLOPs), so the model
code is unchanged and only the adapter tree receives gradients.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = {
    r"attn/to_q$|attn/to_k$|attn/to_v$|attn/to_out$": (16, 32.0),
    r"^input_proj$": (64, 128.0),
}


def _iter_linears(params: Any, path: str = ""):
    if isinstance(params, dict):
        if "w" in params and getattr(params["w"], "ndim", 0) == 2:
            yield path, params
        for k, v in params.items():
            if k == "w":
                continue
            yield from _iter_linears(v, f"{path}/{k}" if path else str(k))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            yield from _iter_linears(v, f"{path}/{i}")


def _match(path: str, patterns: dict[str, tuple[int, float]]):
    # strip block indices so patterns match any layer: blocks/3/attn/to_q -> blocks/attn/to_q
    canon = re.sub(r"/\d+", "", path)
    for pat, cfg in patterns.items():
        if re.search(pat, canon):
            return cfg
    return None


def init_lora(key, params: Any, targets: dict[str, tuple[int, float]] | None = None) -> dict:
    """Build the adapter tree: {path: {a, b, scale}} for matched linears.

    a ~ N(0, 1/r) (kaiming-ish), b = 0 — so the adapter starts as identity.
    """
    targets = targets or DEFAULT_TARGETS
    adapters = {}
    for path, lin in _iter_linears(params):
        cfg = _match(path, targets)
        if cfg is None:
            continue
        rank, alpha = cfg
        d_in, d_out = lin["w"].shape
        key, sub = jax.random.split(key)
        adapters[path] = {
            "a": jax.random.normal(sub, (d_in, rank), jnp.float32) / (d_in ** 0.5),
            "b": jnp.zeros((rank, d_out), jnp.float32),
            "scale": jnp.asarray(alpha / rank, jnp.float32),
        }
    return adapters


def apply_lora(base: Any, adapters: dict) -> Any:
    """Return a param tree with w := w + scale * (a @ b) at adapted paths."""

    def walk(node, path):
        if isinstance(node, dict):
            out = {k: walk(v, f"{path}/{k}" if path else str(k)) for k, v in node.items()}
            if path in adapters and "w" in out:
                ad = adapters[path]
                delta = (ad["a"] @ ad["b"]) * ad["scale"]
                out["w"] = out["w"] + delta.astype(out["w"].dtype)
            return out
        if isinstance(node, (list, tuple)):
            return [walk(v, f"{path}/{i}") for i, v in enumerate(node)]
        return node

    return walk(base, "")


def merge_lora(base: Any, adapters: dict) -> Any:
    """Permanently fold the adapter into the base tree (utils_infer.py:198-239)."""
    return jax.tree_util.tree_map(jnp.asarray, apply_lora(base, adapters))
