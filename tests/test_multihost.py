"""Multi-host (multi-process) training: 2-process CPU cluster via
jax.distributed + Gloo collectives, each process feeding its shard of the
global batch (SURVEY.md §2.8 comm-backend row — the Accelerate-DDP
equivalent, reference trainer.py:59-70)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys, json
rank = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["F5_TTS_DIST_COORDINATOR"] = f"localhost:{port}"
os.environ["F5_TTS_DIST_NUM_PROCESSES"] = "2"
os.environ["F5_TTS_DIST_PROCESS_ID"] = str(rank)
import jax
jax.config.update("jax_platforms", "cpu")
from korean_f5_tts_tpu.parallel.distributed import maybe_initialize_distributed
assert maybe_initialize_distributed() is True
assert jax.process_count() == 2 and jax.device_count() == 4

import numpy as np
from korean_f5_tts_tpu.config import DiTConfig
from korean_f5_tts_tpu.models.dit import init_dit
from korean_f5_tts_tpu.parallel.mesh import make_mesh, shard_params
from korean_f5_tts_tpu.train.trainer import Trainer

cfg = DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, mel_dim=8,
                text_num_embeds=20, text_dim=16, conv_layers=1, dropout=0.0)
mesh = make_mesh(n_model=1)
params = shard_params(init_dit(jax.random.PRNGKey(0), cfg), mesh)

class SynthDataset:
    def __init__(self, n=12):
        rng = np.random.default_rng(0)  # same data on every process
        self.items = [
            {"mel_spec": rng.standard_normal((8, 24 + 4 * (i % 3))).astype(np.float32),
             "text": [1 + (i % 5), 2, 3]}
            for i in range(n)
        ]
    def __len__(self):
        return len(self.items)
    def get_frame_len(self, i):
        return self.items[i]["mel_spec"].shape[1]
    def __getitem__(self, i):
        return self.items[i]

def tok(texts):
    return texts  # already id lists

ckpt_dir = sys.argv[3]
trainer = Trainer(params, cfg, epochs=1, learning_rate=1e-3,
                  num_warmup_updates=2, batch_size_per_gpu=96,
                  batch_size_type="frame", max_samples=4,
                  checkpoint_path=ckpt_dir, save_per_updates=1000,
                  last_per_updates=1000, logger=None, mesh=mesh,
                  vocab_char_map=None, tokenize_fn=tok)
res = trainer.train(SynthDataset(), resumable_with_seed=666, max_updates=3,
                    log_every=1)
print("RESULT " + json.dumps({"rank": rank,
                              "losses": [round(x, 6) for x in res["losses"]]}),
      flush=True)
"""


def test_two_process_training_step(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(r), str(port), str(tmp_path / "ck")],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd="/root/repo", text=True,
        )
        for r in (0, 1)
    ]
    outs = [p.communicate(timeout=560)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    import json

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["rank"]] = r["losses"]
    assert set(results) == {0, 1}, outs[0][-2000:]
    # the loss is a global reduction: every process must see the SAME value
    assert results[0] == results[1]
    assert len(results[0]) == 3
    assert all(np.isfinite(v) for v in results[0])
    # rank 0 wrote the checkpoint, rank 1 did not double-write
    ckpts = list((tmp_path / "ck").glob("*.npz"))
    assert len(ckpts) == 1, ckpts


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


_SAMPLER_WORKER = r"""
import os, sys, json
rank = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["F5_TTS_DIST_COORDINATOR"] = f"localhost:{port}"
os.environ["F5_TTS_DIST_NUM_PROCESSES"] = "2"
os.environ["F5_TTS_DIST_PROCESS_ID"] = str(rank)
import jax
jax.config.update("jax_platforms", "cpu")
from korean_f5_tts_tpu.parallel.distributed import maybe_initialize_distributed
assert maybe_initialize_distributed() is True
assert jax.process_count() == 2 and jax.device_count() == 4

import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils
from jax.sharding import NamedSharding, PartitionSpec as P
from korean_f5_tts_tpu.config import DiTConfig
from korean_f5_tts_tpu.models.cfm import _sample_core
from korean_f5_tts_tpu.models.dit import init_dit
from korean_f5_tts_tpu.parallel.mesh import make_mesh, shard_params

cfg = DiTConfig(dim=32, depth=2, heads=4, dim_head=8, ff_mult=2, mel_dim=10,
                text_num_embeds=20, text_dim=16, conv_layers=1, dropout=0.0)
params = init_dit(jax.random.PRNGKey(0), cfg)
params["proj_out"]["w"] = jax.random.normal(
    jax.random.PRNGKey(1), params["proj_out"]["w"].shape) * 0.05

rng = np.random.default_rng(0)  # identical on both ranks
b, N = 2, 32
cond_np = rng.standard_normal((b, N, 10)).astype(np.float32)
text_np = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.int32)
y0_np = rng.standard_normal((b, N, 10)).astype(np.float32)
mask_np = np.ones((b, N), bool)

# replicated single-process reference (plain jit, local devices only)
ref = np.asarray(_sample_core(params, cfg, jnp.asarray(cond_np),
                              jnp.asarray(text_np), jnp.asarray(mask_np),
                              None, jnp.asarray(y0_np), 2.0, 0.0, steps=2,
                              use_cfg=True, use_sway=False, use_epss=True))

# dp=2 (across processes) x tp=2 (within-process): batch item r lives on rank r
mesh = make_mesh(n_data=2, n_model=2)
with mesh:
    sp = shard_params(init_dit(jax.random.PRNGKey(0), cfg), mesh)
    sp["proj_out"]["w"] = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P()), np.asarray(params["proj_out"]["w"]))
    dp = lambda a: jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), a[rank:rank + 1])
    mel = _sample_core(sp, cfg, dp(cond_np), dp(text_np), dp(mask_np),
                       None, dp(y0_np), 2.0, 0.0, steps=2,
                       use_cfg=True, use_sway=False, use_epss=True)
    got = np.asarray(multihost_utils.process_allgather(mel, tiled=True))

mae = float(np.mean(np.abs(got - ref)))
print("RESULT " + json.dumps({"rank": rank, "mae": mae,
                              "finite": bool(np.isfinite(got).all())}), flush=True)
"""


def test_two_process_sampler_parity(tmp_path):
    """dp2 x tp2 over 2 processes: sampler output == single-device output.

    Mirrors test_two_process_training_step for the INFERENCE path (round-2
    VERDICT item 9)."""
    port = _free_port()
    script = tmp_path / "sampler_worker.py"
    script.write_text(_SAMPLER_WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(r), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd="/root/repo", text=True,
        )
        for r in (0, 1)
    ]
    outs = [p.communicate(timeout=560)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    import json

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["rank"]] = r
    assert set(results) == {0, 1}, outs[0][-2000:]
    for r in results.values():
        assert r["finite"]
        assert r["mae"] < 1e-4, results
