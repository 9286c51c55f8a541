"""Device mesh + sharding rules (dp × tp).

Replaces the reference's NCCL/MPI distribution (SURVEY.md §2.8):
  - data parallel: HF Accelerate DDP (`model/trainer.py:59-70,384`) -> batch
    sharded on the "data" mesh axis; XLA inserts the gradient all-reduce.
  - tensor parallel: TRT-LLM head-split (`scripts/convert_checkpoint.py:16-24`,
    `--tp_size`) -> attention qkv/out and FF weights sharded on the "model"
    axis; XLA inserts the row-parallel all-reduce over ICI.
No hand-written collectives; shardings are NamedSharding annotations and the
compiler does the rest (pp/sp/ep are intentionally out of scope — the
reference has none, its pp path asserts pp_size==1 at f5_tts_trtllm.py:171).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // n_model
    assert n_data * n_model <= n_total, (n_data, n_model, n_total)
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def param_partition_spec(path_elems: tuple, leaf) -> P:
    """Map a param-tree path to a PartitionSpec for the model axis.

    Attention qkv + FF-in are column-parallel; attention out + FF-out are
    row-parallel (mirrors the TRT-LLM TP split the reference used for
    serving, convert_checkpoint.py:166-193).
    """
    names = [getattr(e, "key", getattr(e, "name", str(e))) for e in path_elems]
    path = "/".join(str(n) for n in names)
    is_w = names[-1] in ("w", "w_int8")  # int8 layout shards like its fp weight
    is_b = names[-1] == "b"
    col = any(k in path for k in ("to_q", "to_k", "to_v", "to_q_c", "to_k_c", "to_v_c"))
    col = col or ("ff/in" in path or "ff_x/in" in path or "ff_c/in" in path)
    row = ("to_out" in path) or ("ff/out" in path or "ff_x/out" in path or "ff_c/out" in path)
    if leaf.ndim == 2 and is_w:
        if col:
            return P(None, "model")
        if row:
            return P("model", None)
    if leaf.ndim == 1 and (is_b or names[-1] == "w_scale") and col:
        # per-output-channel vectors (bias, int8 w_scale) follow the columns
        return P("model")
    return P()


def shard_params(params, mesh: Mesh):
    """Place a param pytree on the mesh per the TP rules (replicated on data).

    Multi-process: every process holds the full (identically-initialized)
    host array; `make_array_from_process_local_data` carves out each
    process's addressable shards (the model axis is kept within a process —
    see make_mesh device order)."""
    multiproc = jax.process_count() > 1

    def place(path, leaf):
        spec = param_partition_spec(path, leaf)
        sh = NamedSharding(mesh, spec)
        if multiproc:
            return jax.make_array_from_process_local_data(sh, np.asarray(leaf))
        return jax.device_put(leaf, sh)

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(batch, mesh: Mesh):
    """Shard array leading (batch) dims on the data axis."""
    def place(leaf):
        return jax.device_put(leaf, NamedSharding(mesh, P("data")))

    return jax.tree_util.tree_map(place, batch)
