"""UNetT and MMDiT backbone tests: shapes, zero-init, sampler integration."""

import numpy as np

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.config import MMDiTConfig, UNetTConfig
from korean_f5_tts_tpu.models.cfm import cfm_loss, cfm_sample
from korean_f5_tts_tpu.models.mmdit import init_mmdit, mmdit_forward
from korean_f5_tts_tpu.models.unett import init_unett, unett_forward

UT = UNetTConfig(dim=32, depth=4, heads=2, dim_head=16, ff_mult=2, mel_dim=8,
                 text_num_embeds=20, text_dim=16, conv_layers=1)
MM = MMDiTConfig(dim=32, depth=3, heads=2, dim_head=16, ff_mult=2, mel_dim=8,
                 text_num_embeds=20)


def _inputs(b=2, n=24, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    x = jnp.asarray(rng.standard_normal((b, n, 8)).astype(np.float32))
    text = jnp.asarray(np.array([[1, 2, 3, -1], [4, 5, -1, -1]][:b], dtype=np.int32))
    time = jnp.asarray(np.linspace(0.2, 0.8, b).astype(np.float32))
    return x, text, time


class TestUNetT:
    def test_forward_shape(self):
        params = init_unett(jax.random.PRNGKey(0), UT)
        x, text, time = _inputs()
        out = unett_forward(params, UT, x, x, text, time)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_skip_projections_exist_only_in_second_half(self):
        params = init_unett(jax.random.PRNGKey(0), UT)
        assert "skip_proj" not in params["layers"][0]
        assert "skip_proj" in params["layers"][UT.depth // 2]

    def test_add_skip_variant(self):
        import dataclasses
        cfg = dataclasses.replace(UT, skip_connect_type="add")
        params = init_unett(jax.random.PRNGKey(1), cfg)
        x, text, time = _inputs()
        out = unett_forward(params, cfg, x, x, text, time)
        assert out.shape == x.shape

    def test_sampler_with_unett(self):
        params = init_unett(jax.random.PRNGKey(0), UT)
        rng = np.random.default_rng(1)
        cond = jnp.asarray(rng.standard_normal((1, 12, 8)).astype(np.float32))
        text = jnp.asarray(np.array([[1, 2, 3]], dtype=np.int32))
        out, _ = cfm_sample(params, UT, cond, text, duration=24, steps=2,
                            cfg_strength=2.0, seed=0, duration_bucket=8)
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_allclose(np.asarray(out)[:, :12], np.asarray(cond), atol=1e-6)

    def test_loss_with_unett(self):
        params = init_unett(jax.random.PRNGKey(0), UT)
        x, text, _ = _inputs()
        loss, _, _ = cfm_loss(params, UT, x, text, jnp.asarray([24, 20]),
                              jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))


class TestMMDiT:
    def test_forward_shape_and_zero_init(self):
        params = init_mmdit(jax.random.PRNGKey(0), MM)
        x, text, time = _inputs()
        out = mmdit_forward(params, MM, x, x, text, time)
        assert out.shape == x.shape
        np.testing.assert_allclose(np.asarray(out), 0.0)  # zero-init outputs

    def test_sampler_with_mmdit(self):
        params = init_mmdit(jax.random.PRNGKey(0), MM)
        rng = np.random.default_rng(2)
        cond = jnp.asarray(rng.standard_normal((1, 12, 8)).astype(np.float32))
        text = jnp.asarray(np.array([[1, 2, 3]], dtype=np.int32))
        out, _ = cfm_sample(params, MM, cond, text, duration=24, steps=2,
                            cfg_strength=2.0, seed=0, duration_bucket=8)
        assert np.isfinite(np.asarray(out)).all()

    def test_loss_with_mmdit(self):
        params = init_mmdit(jax.random.PRNGKey(0), MM)
        x, text, _ = _inputs()
        loss, _, _ = cfm_loss(params, MM, x, text, jnp.asarray([24, 20]),
                              jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))
