"""Trainer: epochs over frame-budgeted batches, checkpoints, logging, resume.

Capability parity with reference `src/f5_tts/model/trainer.py`:
  - sample- vs frame-based batching (`:289-319`) via DynamicBatchSampler
  - warmup + decay LR schedule, grad clip, AdamW (`:141-147, 323-333`)
  - EMA of params (`:107-109, 395`)
  - checkpoint save / rotation / resume with deterministic batch skipping
    under seed 666 (`:153-270, 337-347`)
  - loss/lr logging via tensorboard when available (wandb has no offline
    image here), tqdm-style progress prints

TPU-first: the inner loop is ONE jitted train_step (loss+grad+allreduce+
optimizer+EMA); data parallelism comes from the mesh passed in — batches are
sharded on the "data" axis and XLA inserts the gradient reduction.
"""

from __future__ import annotations

import os
import time
from typing import Any

import jax
import numpy as np

from korean_f5_tts_tpu.config import CFMConfig
from korean_f5_tts_tpu.data.dataset import DynamicBatchSampler, collate_batch
from korean_f5_tts_tpu.parallel.mesh import shard_batch
from korean_f5_tts_tpu.train import checkpoint as ckpt_lib
from korean_f5_tts_tpu.train.step import (
    TrainState,
    init_train_state,
    make_optimizer,
    train_step,
)


class _Prefetcher:
    """Bounded background iterator: overlaps host-side batch prep (audio IO,
    wav->mel, collate) with the device step. Replaces the reference
    DataLoader's worker pool (trainer.py:300-317) with one thread + queue —
    on a single-core host more workers only add contention."""

    _SENTINEL = object()

    def __init__(self, gen, depth: int = 2):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._exc: BaseException | None = None

        def run():
            try:
                for item in gen:
                    self._q.put(item)
            except BaseException as e:  # surfaced on the consumer side
                self._exc = e
            finally:
                self._q.put(self._SENTINEL)

        self._t = threading.Thread(target=run, daemon=True)
        self._t.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._exc is not None:
                raise self._exc
            raise StopIteration
        return item


class _WandbWriter:
    """SummaryWriter-shaped adapter over wandb (reference logs via
    accelerate's wandb tracker, trainer.py:88-107)."""

    def __init__(self, wandb_module):
        self._wandb = wandb_module

    def add_scalar(self, tag, value, step):
        self._wandb.log({tag: value}, step=step)

    def add_audio(self, tag, audio, step, sample_rate=24_000):
        self._wandb.log(
            {tag: self._wandb.Audio(audio, sample_rate=sample_rate)}, step=step)


class Trainer:
    def __init__(
        self,
        params: Any,
        arch: Any,
        epochs: int = 1,
        learning_rate: float = 7.5e-5,
        num_warmup_updates: int = 20_000,
        total_updates: int = 1_200_000,
        save_per_updates: int = 50_000,
        keep_last_n_checkpoints: int = -1,
        checkpoint_path: str = "ckpts/run",
        batch_size_per_gpu: int = 38_400,
        batch_size_type: str = "frame",  # "frame" | "sample"
        max_samples: int = 64,
        grad_accumulation_steps: int = 1,
        max_grad_norm: float = 1.0,
        cfm: CFMConfig = CFMConfig(),
        ema_decay: float = 0.999,
        last_per_updates: int = 5_000,
        log_dir: str | None = None,
        logger: str | None = "tensorboard",
        mesh=None,
        vocab_char_map: dict[str, int] | None = None,
        tokenize_fn=None,
        log_samples: bool = False,
        sample_fn=None,
        compute_dtype=None,
        ckpt_format: str = "npz",  # "npz" | "orbax" (sharded/multi-host)
    ):
        self.compute_dtype = compute_dtype
        self.ckpt_format = ckpt_format
        self.arch = arch
        self.epochs = epochs
        self.save_per_updates = save_per_updates
        self.last_per_updates = last_per_updates
        self.keep_last_n_checkpoints = keep_last_n_checkpoints
        self.checkpoint_path = checkpoint_path
        self.batch_size_per_gpu = batch_size_per_gpu
        self.batch_size_type = batch_size_type
        self.max_samples = max_samples
        self.grad_accumulation_steps = grad_accumulation_steps
        self.cfm = cfm
        self.ema_decay = ema_decay
        self.mesh = mesh
        self.vocab_char_map = vocab_char_map
        self.tokenize_fn = tokenize_fn

        self.log_samples = log_samples
        self.sample_fn = sample_fn  # (ema_params, update) -> (wav, sr) | None

        n_data = mesh.shape.get("data", 1) if mesh is not None else 1
        self.optimizer = make_optimizer(
            learning_rate=learning_rate,
            # reference multiplies warmup by num_processes (trainer.py:323-326)
            warmup_updates=num_warmup_updates * n_data,
            total_updates=total_updates,
            max_grad_norm=max_grad_norm,
        )
        if grad_accumulation_steps > 1:
            import optax

            self.optimizer = optax.MultiSteps(self.optimizer, grad_accumulation_steps)
        self.state = init_train_state(params, self.optimizer, ema_decay=ema_decay)

        self.writer = None
        if logger == "tensorboard":
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.writer = SummaryWriter(log_dir or os.path.join(checkpoint_path, "tb"))
            except Exception:
                self.writer = None
        elif logger == "wandb":
            # reference trainer.py:88-107 parity: wandb when importable
            # (absent in offline images -> falls back to no logging)
            try:
                import wandb

                wandb.init(project=os.environ.get("WANDB_PROJECT", "korean-f5-tts"),
                           dir=log_dir or checkpoint_path, resume="allow")
                self.writer = _WandbWriter(wandb)
            except Exception:
                self.writer = None

    # -- checkpointing ------------------------------------------------------

    @staticmethod
    def _to_host(x):
        """Global array -> host numpy. Multi-process arrays are data-
        replicated (TP stays within a process for npz checkpoints), so the
        first addressable shard IS the full value."""
        if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
            return np.asarray(x.addressable_data(0))
        return np.asarray(x)

    def save_checkpoint(self, update: int, last: bool = False) -> str:
        if jax.process_count() > 1 and self.ckpt_format == "npz" \
                and jax.process_index() != 0:
            return ""  # rank 0 writes; params are data-replicated
        os.makedirs(self.checkpoint_path, exist_ok=True)
        if self.ckpt_format == "orbax":
            # sharded params stay distributed — no host gather
            name = "model_last_orbax" if last else f"model_{update}_orbax"
            path = os.path.join(self.checkpoint_path, name)
            ckpt_lib.save_checkpoint_orbax(
                path, self.state.params, opt_state=self.state.opt_state,
                ema_params=self.state.ema_params, update=update,
            )
            return path
        name = "model_last.npz" if last else f"model_{update}.npz"
        path = os.path.join(self.checkpoint_path, name)
        ckpt_lib.save_checkpoint(
            path,
            jax.tree_util.tree_map(self._to_host, self.state.params),
            opt_state=jax.tree_util.tree_map(self._to_host, self.state.opt_state),
            ema_params=jax.tree_util.tree_map(self._to_host, self.state.ema_params)
            if self.state.ema_params is not None else None,
            update=update,
        )
        if not last:
            ckpt_lib.rotate_checkpoints(self.checkpoint_path, self.keep_last_n_checkpoints)
        return path

    def load_checkpoint(self, explicit: str | None = None) -> int:
        path = ckpt_lib.resolve_resume_checkpoint(self.checkpoint_path, explicit)
        if path is None:
            return 0
        data = ckpt_lib.load_checkpoint(path)
        params = jax.tree_util.tree_map(jax.numpy.asarray, data["params"])
        ema = data.get("ema_params")
        if ema is not None:
            ema = jax.tree_util.tree_map(jax.numpy.asarray, ema)
        opt_state = self.state.opt_state
        if "opt_leaves" in data:
            opt_state = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(self.state.opt_state),
                [jax.numpy.asarray(x) for x in data["opt_leaves"]],
            )
        self.state = TrainState(params, opt_state, ema, jax.numpy.asarray(data["update"]))
        print(f"resumed from {path} at update {data['update']}")
        return int(data["update"])

    # -- training loop ------------------------------------------------------

    def _make_batches(self, dataset, seed: int | None):
        if self.batch_size_type == "frame":
            sampler = DynamicBatchSampler(
                dataset, self.batch_size_per_gpu, max_samples=self.max_samples,
                random_seed=seed, drop_residual=False,
            )
            return sampler
        # sample batching: fixed-size index chunks
        idx = np.arange(len(dataset))
        batches = [list(idx[i: i + self.batch_size_per_gpu])
                   for i in range(0, len(idx), self.batch_size_per_gpu)]

        class _Static:
            def __init__(self, batches):
                self.batches = batches

            def set_epoch(self, e):
                self._e = e

            def __iter__(self):
                return iter(self.batches)

            def __len__(self):
                return len(self.batches)

        return _Static(batches)

    def _load_local_batch(self, dataset, batch_idx) -> tuple[dict, int | None]:
        """Host-side IO + mel + collate for one packed batch (prefetchable:
        no collectives, no device placement). Returns (local numpy batch,
        target row count for multi-host padding or None single-process)."""
        world = jax.process_count()
        if world > 1 and self.mesh is not None:
            from korean_f5_tts_tpu.parallel import distributed as dist

            rank = jax.process_index()
            local_idx = dist.shard_rows_for_process(list(batch_idx), rank, world)
            n_data = self.mesh.shape.get("data", 1)
            local_data = max(n_data // world, 1)
            rows = -(-len(batch_idx) // world)  # same on all ranks
            rows = -(-rows // local_data) * local_data
            items = [dataset[i] for i in local_idx]
            if not items:  # degenerate tiny batch: feed one zero row
                items = [dataset[batch_idx[0]]]
                local_np = collate_batch(items, self.vocab_char_map,
                                         self.tokenize_fn)
                local = {
                    "mel": np.zeros_like(local_np["mel"][:1]),
                    "text": np.full_like(local_np["text"][:1], -1),
                    "lens": np.zeros(1, local_np["mel_lengths"].dtype),
                }
            else:
                local_np = collate_batch(items, self.vocab_char_map,
                                         self.tokenize_fn)
                local = {
                    "mel": local_np["mel"],
                    "text": local_np["text"],
                    "lens": local_np["mel_lengths"],
                }
            return local, rows
        items = [dataset[i] for i in batch_idx]
        batch_np = collate_batch(items, self.vocab_char_map, self.tokenize_fn)
        return {
            "mel": batch_np["mel"],
            "text": batch_np["text"],
            "lens": batch_np["mel_lengths"],
        }, None

    def _place_batch(self, local: dict, rows: int | None):
        """Device placement (+multi-host collectives) — main thread only."""
        if rows is not None:
            from korean_f5_tts_tpu.parallel import distributed as dist

            local = dist.equalize_padded_dims(local)
            local = dist.pad_rows(local, rows)
            return dist.make_global_batch(local, self.mesh)
        if self.mesh is not None:
            # batch dim must divide the data axis: pad with zero-length rows
            # (lens=0 -> empty loss span)
            n_data = self.mesh.shape.get("data", 1)
            b = local["mel"].shape[0]
            pad = (-b) % n_data
            if pad:
                from korean_f5_tts_tpu.parallel.distributed import pad_rows

                local = pad_rows(local, b + pad)
            return shard_batch(local, self.mesh)
        return local

    def train(self, dataset, num_workers: int = 0, resumable_with_seed: int | None = None,
              resume_from: str | None = None, log_every: int = 10,
              max_updates: int | None = None) -> dict:
        start_update = self.load_checkpoint(resume_from)
        update = start_update
        sampler = self._make_batches(dataset, resumable_with_seed)
        batches_per_epoch = max(len(sampler), 1)
        start_epoch = start_update // batches_per_epoch
        skip_batches = start_update % batches_per_epoch

        key = jax.random.PRNGKey(resumable_with_seed or 0)
        losses = []
        t0 = time.time()
        for epoch in range(start_epoch, self.epochs):
            sampler.set_epoch(epoch)

            def epoch_stream(epoch=epoch):
                for bi, batch_idx in enumerate(sampler):
                    if epoch == start_epoch and bi < skip_batches:
                        continue  # deterministic resume (trainer.py:340-347)
                    yield self._load_local_batch(dataset, batch_idx)

            # wav->mel + collate overlap with the device step: a bounded
            # background prefetcher replaces the reference's DataLoader
            # num_workers (trainer.py:300-317). Collectives/device_put stay
            # on the main thread (_place_batch) — ordering must match
            # across processes.
            stream = (_Prefetcher(epoch_stream(), depth=max(2, num_workers))
                      if num_workers > 0 else epoch_stream())
            for local, rows in stream:
                batch = self._place_batch(local, rows)
                step_key = jax.random.fold_in(key, update)
                self.state, loss = train_step(
                    self.state, batch, step_key, self.arch, self.optimizer,
                    self.cfm, ema_decay=self.ema_decay,
                    compute_dtype=self.compute_dtype,
                )
                update += 1
                losses.append(float(self._to_host(loss)))
                if update % log_every == 0:
                    dt = time.time() - t0
                    print(f"update {update} loss {np.mean(losses[-log_every:]):.4f} "
                          f"({log_every / max(dt, 1e-9):.2f} it/s)")
                    t0 = time.time()
                    if self.writer is not None:
                        self.writer.add_scalar("loss", float(loss), update)
                if update % self.save_per_updates == 0:
                    self.save_checkpoint(update)
                    if self.log_samples and self.sample_fn is not None:
                        # periodic sample inference (trainer.py:415-457 role)
                        try:
                            out = self.sample_fn(self.state.ema_params, update)
                            if out is not None and self.writer is not None:
                                wav, sr = out
                                import torch as _torch

                                self.writer.add_audio(
                                    "sample", _torch.from_numpy(
                                        np.asarray(wav, np.float32))[None, :],
                                    update, sample_rate=sr,
                                )
                        except Exception as e:
                            print(f"sample logging failed: {e!r}")
                if update % self.last_per_updates == 0:
                    self.save_checkpoint(update, last=True)
                if max_updates is not None and update - start_update >= max_updates:
                    self.save_checkpoint(update, last=True)
                    return {"updates": update, "losses": losses}
        self.save_checkpoint(update, last=True)
        return {"updates": update, "losses": losses}
