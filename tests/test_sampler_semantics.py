"""Sampler semantics: the jitted lax.scan core must equal a step-by-step
Python reference loop (validates text-embed hoisting, schedule handling, CFG
wiring — the re-designed parts)."""

import numpy as np

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.config import DiTConfig
from korean_f5_tts_tpu.models.cfm import _sample_core
from korean_f5_tts_tpu.models.dit import dit_forward, init_dit
from korean_f5_tts_tpu.utils.timesteps import make_schedule

TINY = DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, mel_dim=10,
                 text_num_embeds=20, text_dim=16, conv_layers=1)


def reference_euler_loop(params, cfg, step_cond, text, y0, steps, cfg_strength,
                         sway, use_epss):
    """Direct loop calling the training-path forward twice per step (the
    reference's odeint+cfg_infer semantics, cfm.py:162-218)."""
    ts = make_schedule(steps, use_epss=use_epss, sway_sampling_coef=sway)
    x = np.asarray(y0)
    for i in range(steps):
        t_i, dt = float(ts[i]), float(ts[i + 1] - ts[i])
        time = jnp.full((x.shape[0],), t_i, dtype=y0.dtype)
        pred = dit_forward(params, cfg, jnp.asarray(x), step_cond, text, time,
                           drop_audio_cond=False, drop_text=False)
        null = dit_forward(params, cfg, jnp.asarray(x), step_cond, text, time,
                           drop_audio_cond=True, drop_text=True)
        guided = np.asarray(pred) + (np.asarray(pred) - np.asarray(null)) * cfg_strength
        x = x + dt * guided
    return x


class TestScanEqualsLoop:
    def test_cfg_scan_matches_reference_loop(self):
        params = init_dit(jax.random.PRNGKey(0), TINY)
        # non-trivial outputs
        params["proj_out"]["w"] = jax.random.normal(
            jax.random.PRNGKey(1), params["proj_out"]["w"].shape) * 0.05
        rng = np.random.default_rng(0)
        N, b = 24, 1
        step_cond = jnp.asarray(rng.standard_normal((b, N, 10)).astype(np.float32))
        text = jnp.asarray(np.array([[1, 2, 3, -1]], dtype=np.int32))
        y0 = jnp.asarray(rng.standard_normal((b, N, 10)).astype(np.float32))

        got = np.asarray(_sample_core(
            params, TINY, step_cond, text, None, None, y0, 2.0, -1.0,
            steps=6, use_cfg=True, use_sway=True, use_epss=True,
        ))
        want = reference_euler_loop(params, TINY, step_cond, text, y0, 6, 2.0,
                                    -1.0, True)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)

    def test_no_cfg_branch_matches(self):
        params = init_dit(jax.random.PRNGKey(2), TINY)
        params["proj_out"]["w"] = jax.random.normal(
            jax.random.PRNGKey(3), params["proj_out"]["w"].shape) * 0.05
        rng = np.random.default_rng(1)
        step_cond = jnp.asarray(rng.standard_normal((1, 16, 10)).astype(np.float32))
        text = jnp.asarray(np.array([[1, 2]], dtype=np.int32))
        y0 = jnp.asarray(rng.standard_normal((1, 16, 10)).astype(np.float32))
        got = np.asarray(_sample_core(
            params, TINY, step_cond, text, None, None, y0, 0.0, 0.0,
            steps=4, use_cfg=False, use_sway=False, use_epss=False,
        ))
        # cfg_strength < 1e-5: single conditional forward per step
        ts = make_schedule(4, use_epss=False, sway_sampling_coef=None)
        x = np.asarray(y0)
        for i in range(4):
            time = jnp.full((1,), float(ts[i]), dtype=jnp.float32)
            pred = dit_forward(params, TINY, jnp.asarray(x), step_cond, text, time)
            x = x + float(ts[i + 1] - ts[i]) * np.asarray(pred)
        np.testing.assert_allclose(got, x, atol=2e-4, rtol=1e-4)


class TestTextBucketing:
    """Text-axis padding with -1 must be output-exact (cfm.py host wrapper)."""

    def test_padded_text_exact_in_core(self):
        params = init_dit(jax.random.PRNGKey(4), TINY)
        params["proj_out"]["w"] = jax.random.normal(
            jax.random.PRNGKey(5), params["proj_out"]["w"].shape) * 0.05
        rng = np.random.default_rng(2)
        step_cond = jnp.asarray(rng.standard_normal((1, 24, 10)).astype(np.float32))
        y0 = jnp.asarray(rng.standard_normal((1, 24, 10)).astype(np.float32))
        text = jnp.asarray(np.array([[3, 1, 4, 1, 5]], dtype=np.int32))
        text_padded = jnp.pad(text, ((0, 0), (0, 11)), constant_values=-1)
        a = np.asarray(_sample_core(
            params, TINY, step_cond, text, None, None, y0, 2.0, -1.0,
            steps=4, use_cfg=True, use_sway=True, use_epss=True))
        b = np.asarray(_sample_core(
            params, TINY, step_cond, text_padded, None, None, y0, 2.0, -1.0,
            steps=4, use_cfg=True, use_sway=True, use_epss=True))
        np.testing.assert_array_equal(a, b)

    def test_cfm_sample_buckets_text(self, monkeypatch):
        from korean_f5_tts_tpu.models.cfm import cfm_sample

        params = init_dit(jax.random.PRNGKey(4), TINY)
        rng = np.random.default_rng(3)
        cond = rng.standard_normal((1, 16, 10)).astype(np.float32)
        text = np.array([[1, 2, 3]], dtype=np.int32)
        monkeypatch.setenv("F5_TTS_TEXT_BUCKET", "64")
        out_b, _ = cfm_sample(params, TINY, cond, text, duration=24, seed=0)
        monkeypatch.setenv("F5_TTS_TEXT_BUCKET", "0")
        out_e, _ = cfm_sample(params, TINY, cond, text, duration=24, seed=0)
        np.testing.assert_array_equal(np.asarray(out_b), np.asarray(out_e))

    def test_text_longer_than_bucket_multiple(self, monkeypatch):
        from korean_f5_tts_tpu.models.cfm import cfm_sample

        params = init_dit(jax.random.PRNGKey(4), TINY)
        rng = np.random.default_rng(4)
        cond = rng.standard_normal((1, 16, 10)).astype(np.float32)
        text = np.asarray(rng.integers(1, 20, (1, 70)), dtype=np.int32)  # > 64
        monkeypatch.setenv("F5_TTS_TEXT_BUCKET", "64")
        out, _ = cfm_sample(params, TINY, cond, text, duration=128, seed=0)
        assert np.isfinite(np.asarray(out)).all()
