"""Data layer, Trainer loop (checkpoint/resume), and LoRA tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.config import CFMConfig, DiTConfig
from korean_f5_tts_tpu.data.dataset import CustomDataset, DynamicBatchSampler, collate_batch
from korean_f5_tts_tpu.models.cfm import cfm_loss
from korean_f5_tts_tpu.models.dit import init_dit
from korean_f5_tts_tpu.models.lora import apply_lora, init_lora, merge_lora
from korean_f5_tts_tpu.ops.mel import MelConfig
from korean_f5_tts_tpu.train.checkpoint import (
    flatten_tree,
    load_checkpoint,
    resolve_resume_checkpoint,
    rotate_checkpoints,
    save_checkpoint,
    unflatten_tree,
)
from korean_f5_tts_tpu.train.trainer import Trainer

TINY = DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, mel_dim=100,
                 text_num_embeds=30, text_dim=16, conv_layers=1)


def _mel_rows(n=10, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        dur = float(rng.uniform(0.5, 3.0))
        t = int(dur * 24000 / 256)
        rows.append({
            "mel_spec": rng.standard_normal((100, t)).astype(np.float32),
            "text": "abc def",
            "duration": dur,
        })
    return rows


class TestDataset:
    def test_duration_filter_skips(self):
        rows = _mel_rows(3)
        rows[0]["duration"] = 0.1  # too short -> skipped
        ds = CustomDataset(rows, preprocessed_mel=True)
        item = ds[0]
        np.testing.assert_array_equal(item["mel_spec"], rows[1]["mel_spec"])

    def test_frame_len(self):
        rows = _mel_rows(2)
        ds = CustomDataset(rows, preprocessed_mel=True)
        assert ds.get_frame_len(0) == rows[0]["duration"] * 24000 / 256

    def test_dynamic_batch_sampler_budget(self):
        rows = _mel_rows(20, seed=1)
        ds = CustomDataset(rows, preprocessed_mel=True)
        sampler = DynamicBatchSampler(ds, frames_threshold=500, max_samples=4,
                                      random_seed=666)
        all_idx = []
        for batch in sampler:
            assert len(batch) <= 4
            assert sum(ds.get_frame_len(i) for i in batch) <= 500 or len(batch) == 1
            all_idx.extend(batch)
        # every in-budget item appears exactly once
        expected = [i for i in range(20) if ds.get_frame_len(i) <= 500]
        assert sorted(all_idx) == sorted(expected)

    def test_sampler_epoch_shuffle_deterministic(self):
        rows = _mel_rows(20, seed=2)
        ds = CustomDataset(rows, preprocessed_mel=True)
        s1 = DynamicBatchSampler(ds, 500, random_seed=666)
        s2 = DynamicBatchSampler(ds, 500, random_seed=666)
        s1.set_epoch(3)
        s2.set_epoch(3)
        assert list(s1) == list(s2)
        s2.set_epoch(4)
        assert list(s1) != list(s2)

    def test_collate_shapes_and_buckets(self):
        rows = _mel_rows(3, seed=3)
        ds = CustomDataset(rows, preprocessed_mel=True)
        vocab = {c: i for i, c in enumerate(" abcdef")}
        batch = collate_batch([ds[i] for i in range(3)], vocab, frame_bucket=64)
        assert batch["mel"].shape[0] == 3
        assert batch["mel"].shape[1] % 64 == 0
        assert batch["text"].shape[1] % 32 == 0
        assert (batch["text"][0][: batch["text_lengths"][0]] >= 0).all()
        # padding is -1
        assert batch["text"][0][-1] == -1


class TestCheckpoint:
    def test_flatten_roundtrip(self):
        tree = {"a": np.ones(3), "b": [np.zeros(2), {"c": np.arange(4)}]}
        flat = flatten_tree(tree)
        rt = unflatten_tree(flat)
        np.testing.assert_array_equal(rt["a"], tree["a"])
        np.testing.assert_array_equal(rt["b"][1]["c"], tree["b"][1]["c"])

    def test_save_load_rotation_resume(self, tmp_path):
        d = str(tmp_path)
        params = {"w": np.ones((2, 2))}
        for step in (100, 200, 300):
            save_checkpoint(os.path.join(d, f"model_{step}.npz"), params, update=step)
        rotate_checkpoints(d, keep_last_n=2)
        assert sorted(os.listdir(d)) == ["model_200.npz", "model_300.npz"]
        # resume precedence: highest numbered when no model_last
        assert resolve_resume_checkpoint(d).endswith("model_300.npz")
        save_checkpoint(os.path.join(d, "model_last.npz"), params, update=350)
        assert resolve_resume_checkpoint(d).endswith("model_last.npz")
        data = load_checkpoint(os.path.join(d, "model_last.npz"))
        assert data["update"] == 350
        np.testing.assert_array_equal(data["params"]["w"], params["w"])

    def test_pretrained_fallback(self, tmp_path):
        d = str(tmp_path)
        save_checkpoint(os.path.join(d, "pretrained_model_1200000.npz"),
                        {"w": np.ones(2)}, update=0)
        assert "pretrained" in resolve_resume_checkpoint(d)


class TestTrainerLoop:
    def test_two_updates_and_resume(self, tmp_path):
        rows = _mel_rows(8, seed=5)
        ds = CustomDataset(rows, preprocessed_mel=True)
        vocab = {c: i for i, c in enumerate(" abcdef")}
        params = init_dit(jax.random.PRNGKey(0), TINY)
        ckpt_dir = str(tmp_path / "ck")

        def make_trainer():
            return Trainer(
                params, TINY, epochs=100, learning_rate=1e-4,
                num_warmup_updates=2, checkpoint_path=ckpt_dir,
                batch_size_per_gpu=2000, batch_size_type="frame", max_samples=4,
                last_per_updates=2, save_per_updates=1000, logger=None,
                vocab_char_map=vocab,
            )

        t1 = make_trainer()
        res = t1.train(ds, resumable_with_seed=666, max_updates=2)
        assert res["updates"] == 2
        assert os.path.exists(os.path.join(ckpt_dir, "model_last.npz"))

        t2 = make_trainer()
        res2 = t2.train(ds, resumable_with_seed=666, max_updates=2)
        assert res2["updates"] == 4  # resumed from update 2


class TestLoRA:
    def test_init_targets_and_identity(self):
        params = init_dit(jax.random.PRNGKey(0), TINY)
        adapters = init_lora(jax.random.PRNGKey(1), params)
        paths = list(adapters)
        assert any("to_q" in p for p in paths)
        assert any(p == "input_proj" for p in paths)
        assert not any("ff/in" in p for p in paths)
        # b zero-init -> apply_lora is identity initially
        merged = apply_lora(params, adapters)
        np.testing.assert_allclose(
            np.asarray(merged["blocks"][0]["attn"]["to_q"]["w"]),
            np.asarray(params["blocks"][0]["attn"]["to_q"]["w"]),
        )

    def test_lora_training_moves_only_adapters(self):
        params = init_dit(jax.random.PRNGKey(0), TINY)
        # zero-init proj_out blocks all upstream grads (AdaLN-zero start);
        # emulate a trained base so gradients reach the adapters
        params["proj_out"]["w"] = jax.random.normal(
            jax.random.PRNGKey(9), params["proj_out"]["w"].shape
        ) * 0.1
        adapters = init_lora(jax.random.PRNGKey(1), params)
        rng = np.random.default_rng(0)
        mel = jnp.asarray(rng.standard_normal((2, 32, 100)).astype(np.float32))
        text = jnp.asarray(np.array([[1, 2, -1], [3, 4, 5]], dtype=np.int32))
        lens = jnp.asarray([32, 32])

        def loss_fn(ad):
            merged = apply_lora(params, ad)
            loss, _, _ = cfm_loss(merged, TINY, mel, text, lens, jax.random.PRNGKey(0),
                                  CFMConfig())
            return loss

        g = jax.grad(loss_fn)(adapters)
        assert all(np.isfinite(np.asarray(v["b"])).all() for v in g.values())
        # at b=0, dL/db through the ungated input_proj path must be nonzero
        # (attention adapters are gated to zero by AdaLN-zero at init)
        assert np.abs(np.asarray(g["input_proj"]["b"])).sum() > 0

    def test_merge_matches_apply(self):
        params = init_dit(jax.random.PRNGKey(0), TINY)
        adapters = init_lora(jax.random.PRNGKey(1), params)
        # make b nonzero
        for k in adapters:
            adapters[k]["b"] = jnp.ones_like(adapters[k]["b"]) * 0.01
        merged = merge_lora(params, adapters)
        applied = apply_lora(params, adapters)
        np.testing.assert_allclose(
            np.asarray(merged["input_proj"]["w"]),
            np.asarray(applied["input_proj"]["w"]),
        )
        assert not np.allclose(np.asarray(merged["input_proj"]["w"]),
                               np.asarray(params["input_proj"]["w"]))


class TestOrbaxBackend:
    def test_roundtrip(self, tmp_path):
        from korean_f5_tts_tpu.train.checkpoint import (
            load_checkpoint_orbax,
            save_checkpoint_orbax,
        )

        tree = {"a": np.ones((4, 4), np.float32),
                "blocks": [{"w": np.arange(6.0).reshape(2, 3)}]}
        p = str(tmp_path / "ck1")
        save_checkpoint_orbax(p, tree, update=42)
        out = load_checkpoint_orbax(p)
        assert out["update"] == 42
        np.testing.assert_array_equal(out["params"]["a"], tree["a"])
        np.testing.assert_array_equal(out["params"]["blocks"][0]["w"],
                                      tree["blocks"][0]["w"])
