"""Checkpoint save/load with rotation + resume semantics.

Parity with reference `model/trainer.py:153-270`: checkpoints bundle
{params, optimizer state, EMA params, update count}; `model_last` is written
every `last_per_updates`; numbered checkpoints rotate keeping the last N with
`pretrained_*` files excluded from rotation; load precedence is explicit file
-> model_last -> highest numbered -> pretrained.

Format: flat .npz (keys are '/'-joined pytree paths) — plain numpy, no
framework lock-in, memory-mappable.
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import numpy as np


def flatten_tree(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{path}/{k}" if path else str(k))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{path}/{i}")
        elif node is None:
            pass
        else:
            out[path] = np.asarray(node)

    walk(tree, prefix)
    return out


def unflatten_tree(flat: dict[str, np.ndarray]) -> Any:
    root: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(re.fullmatch(r"\d+", k) for k in keys):
            # numeric keys may be sparse (pytrees with empty subtrees)
            return [listify(node[k]) for k in sorted(keys, key=int)]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_checkpoint(path: str, params, opt_state=None, ema_params=None,
                    update: int = 0, extra: dict | None = None) -> None:
    flat = flatten_tree(params, "params")
    if ema_params is not None:
        flat.update(flatten_tree(ema_params, "ema_params"))
    if opt_state is not None:
        # optax states are tuples/namedtuples with empty subtrees; serialise
        # leaves positionally and rebuild against the live tree structure
        leaves = jax.tree_util.tree_leaves(opt_state)
        for i, leaf in enumerate(leaves):
            flat[f"opt_leaves/{i:05d}"] = np.asarray(leaf)
    flat["update"] = np.asarray(update)
    for k, v in (extra or {}).items():
        flat[f"extra/{k}"] = np.asarray(v)
    tmp = path + ".tmp"
    np.savez(tmp, **flat)
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)


def load_checkpoint(path: str) -> dict:
    data = dict(np.load(path, allow_pickle=False))
    out: dict[str, Any] = {"update": int(data.pop("update", 0))}
    groups: dict[str, dict] = {}
    for k, v in data.items():
        head, _, rest = k.partition("/")
        groups.setdefault(head, {})[rest] = v
    opt_leaves = groups.pop("opt_leaves", None)
    if opt_leaves is not None:
        out["opt_leaves"] = [opt_leaves[k] for k in sorted(opt_leaves)]
    for head, flat in groups.items():
        out[head] = unflatten_tree(flat)
    return out


_CKPT_RE = re.compile(r"model_(\d+)\.npz$")


def rotate_checkpoints(ckpt_dir: str, keep_last_n: int) -> None:
    """Delete oldest numbered checkpoints beyond keep_last_n (trainer.py:172-186).

    keep_last_n < 0 keeps all; 0 keeps none (only model_last). pretrained_*
    files are never rotated.
    """
    if keep_last_n < 0:
        return
    numbered = sorted(
        (int(m.group(1)), f)
        for f in os.listdir(ckpt_dir)
        if (m := _CKPT_RE.search(f)) and not f.startswith("pretrained_")
    )
    to_delete = numbered if keep_last_n == 0 else numbered[:-keep_last_n]
    for _, f in to_delete:
        os.remove(os.path.join(ckpt_dir, f))


def save_checkpoint_orbax(path: str, params, opt_state=None, ema_params=None,
                          update: int = 0) -> None:
    """Orbax backend: sharded/multi-host-safe checkpointing of the same
    bundle. Use for pjit-sharded params on real pods; .npz stays the default
    single-host format."""
    import orbax.checkpoint as ocp

    bundle = {"params": params, "update": update}
    if ema_params is not None:
        bundle["ema_params"] = ema_params
    if opt_state is not None:
        bundle["opt_leaves"] = jax.tree_util.tree_leaves(opt_state)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), bundle, force=True)
    ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str) -> dict:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def resolve_resume_checkpoint(ckpt_dir: str, explicit: str | None = None) -> str | None:
    """Load precedence: explicit -> model_last -> highest step -> pretrained
    (trainer.py:197-220)."""
    if explicit:
        return explicit
    if not os.path.isdir(ckpt_dir):
        return None
    files = os.listdir(ckpt_dir)
    if "model_last.npz" in files:
        return os.path.join(ckpt_dir, "model_last.npz")
    numbered = sorted(
        (int(m.group(1)), f)
        for f in files
        if (m := _CKPT_RE.search(f)) and not f.startswith("pretrained_")
    )
    if numbered:
        return os.path.join(ckpt_dir, numbered[-1][1])
    pretrained = [f for f in files if f.startswith("pretrained_")]
    if pretrained:
        return os.path.join(ckpt_dir, sorted(pretrained)[0])
    return None
