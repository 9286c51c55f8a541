"""Multi-host (multi-process) training support — the NCCL/DDP equivalent.

Role parity with the reference's distributed launch (SURVEY.md §2.8/§5.8):
HF Accelerate spins up one process per GPU and wraps the model in DDP over
NCCL (`model/trainer.py:59-70`, `accelerate launch` in README.md:251). The
TPU-native equivalent is `jax.distributed.initialize()` + ONE global mesh
spanning every process's devices; gradients reduce through the sharding
annotations (XLA inserts the all-reduce over ICI/DCN), and each process feeds
only its own shard of the global batch.

Env-triggered (mirrors torchrun/accelerate env conventions):
  F5_TTS_DIST_COORDINATOR   host:port of process 0
  F5_TTS_DIST_NUM_PROCESSES world size
  F5_TTS_DIST_PROCESS_ID    this process's rank
On TPU pods these are auto-detected by JAX; calling initialize() with no args
is correct there, so F5_TTS_DIST_AUTO=1 triggers the no-arg form.
"""

from __future__ import annotations

import os

import jax
import numpy as np

_INITIALIZED = False


def maybe_initialize_distributed() -> bool:
    """Initialize the JAX distributed runtime if env vars request it.

    Must run before any backend use. Returns True if multi-process mode is
    active (either newly initialized or already running under one).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1
    coord = os.environ.get("F5_TTS_DIST_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["F5_TTS_DIST_NUM_PROCESSES"]),
            process_id=int(os.environ["F5_TTS_DIST_PROCESS_ID"]),
        )
        _INITIALIZED = True
    elif os.environ.get("F5_TTS_DIST_AUTO") == "1":
        # TPU pods / cloud: coordinator + ranks auto-detected by the runtime
        jax.distributed.initialize()
        _INITIALIZED = True
    return jax.process_count() > 1


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def shard_rows_for_process(indices: list, rank: int, world: int) -> list:
    """Deterministic per-process row split of one packed batch: row r goes to
    process r % world (the DistributedSampler convention). Every process
    computes the same split from the same sampler stream."""
    return [idx for r, idx in enumerate(indices) if r % world == rank]


def make_global_batch(local_batch: dict, mesh) -> dict:
    """Assemble per-process local rows into ONE global jax.Array per leaf,
    sharded on the "data" mesh axis.

    Local leaves must have identical non-batch dims across processes — use
    `equalize_padded_dims` first. Row counts must also match (pad with
    zero-length rows; lens==0 rows contribute an empty loss span).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def place(leaf):
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data")), np.asarray(leaf)
        )

    return {k: place(v) for k, v in local_batch.items()}


def equalize_padded_dims(batch: dict) -> dict:
    """All-gather each leaf's non-batch dims across processes and re-pad to
    the global max, so every process's local shard has identical shape.

    Needed because collate pads to the LOCAL max mel/text length; different
    row subsets have different maxima. mel pads with 0, text with -1 (the
    tokenizer pad id), lens unchanged.
    """
    if jax.process_count() == 1:
        return batch
    from jax.experimental import multihost_utils

    dims = np.array([batch["mel"].shape[1], batch["text"].shape[1]], np.int32)
    all_dims = np.asarray(multihost_utils.process_allgather(dims))
    n_mel, n_text = int(all_dims[:, 0].max()), int(all_dims[:, 1].max())
    mel, text = batch["mel"], batch["text"]
    if mel.shape[1] < n_mel:
        mel = np.concatenate(
            [mel, np.zeros((mel.shape[0], n_mel - mel.shape[1], mel.shape[2]),
                           mel.dtype)], axis=1)
    if text.shape[1] < n_text:
        text = np.concatenate(
            [text, np.full((text.shape[0], n_text - text.shape[1]), -1,
                           text.dtype)], axis=1)
    return {**batch, "mel": mel, "text": text}


def pad_rows(batch: dict, rows: int) -> dict:
    """Pad a local batch to exactly `rows` rows with zero-length items."""
    b = batch["mel"].shape[0]
    if b >= rows:
        return batch
    pad = rows - b
    return {
        "mel": np.concatenate(
            [batch["mel"], np.zeros((pad, *batch["mel"].shape[1:]),
                                    batch["mel"].dtype)]),
        "text": np.concatenate(
            [batch["text"], np.full((pad, batch["text"].shape[1]), -1,
                                    batch["text"].dtype)]),
        "lens": np.concatenate(
            [batch["lens"], np.zeros(pad, batch["lens"].dtype)]),
    }
