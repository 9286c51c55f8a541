"""Tensor-parallel inference: the sampler under a ("data","model") mesh.

Validates that TP param sharding produces identical sampler output to
single-device execution (XLA inserts the row-parallel all-reduces)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.config import DiTConfig
from korean_f5_tts_tpu.models.cfm import _sample_core, cfm_sample
from korean_f5_tts_tpu.models.dit import init_dit
from korean_f5_tts_tpu.parallel.mesh import make_mesh, shard_params

TINY = DiTConfig(dim=32, depth=2, heads=4, dim_head=8, ff_mult=2, mel_dim=10,
                 text_num_embeds=20, text_dim=16, conv_layers=1)


class TestTPInference:
    def test_tp_sampler_matches_single_device(self):
        assert len(jax.devices()) >= 8
        params = init_dit(jax.random.PRNGKey(0), TINY)
        params["proj_out"]["w"] = jax.random.normal(
            jax.random.PRNGKey(1), params["proj_out"]["w"].shape) * 0.05
        rng = np.random.default_rng(0)
        cond = jnp.asarray(rng.standard_normal((1, 16, 10)).astype(np.float32))
        text = jnp.asarray(np.array([[1, 2, 3]], dtype=np.int32))

        out_single, _ = cfm_sample(params, TINY, cond, text, duration=32, steps=2,
                                   cfg_strength=2.0, seed=0, duration_bucket=8)

        mesh = make_mesh(n_data=2, n_model=4)
        with mesh:
            sharded = shard_params(init_dit(jax.random.PRNGKey(0), TINY), mesh)
            sharded["proj_out"]["w"] = params["proj_out"]["w"]
            out_tp, _ = cfm_sample(sharded, TINY, cond, text, duration=32, steps=2,
                                   cfg_strength=2.0, seed=0, duration_bucket=8)
        np.testing.assert_allclose(np.asarray(out_tp), np.asarray(out_single),
                                   atol=1e-4, rtol=1e-4)

    def test_tp_batched_core(self):
        """Batched sampler core with data+model sharding both active."""
        mesh = make_mesh(n_data=2, n_model=4)
        params = init_dit(jax.random.PRNGKey(0), TINY)
        rng = np.random.default_rng(1)
        b, N = 2, 16
        step_cond = jnp.asarray(rng.standard_normal((b, N, 10)).astype(np.float32))
        text = jnp.asarray(np.array([[1, 2], [3, 4]], dtype=np.int32))
        y0 = jnp.asarray(rng.standard_normal((b, N, 10)).astype(np.float32))
        mask = jnp.ones((b, N), bool)
        with mesh:
            sp = shard_params(params, mesh)
            from korean_f5_tts_tpu.parallel.mesh import shard_batch

            sb = shard_batch({"c": step_cond, "y": y0, "m": mask}, mesh)
            out = _sample_core(sp, TINY, sb["c"], text, sb["m"], None, sb["y"],
                               2.0, 0.0, steps=2, use_cfg=True, use_sway=False,
                               use_epss=True)
            out = np.asarray(jax.block_until_ready(out))
        assert out.shape == (b, N, 10) and np.isfinite(out).all()
