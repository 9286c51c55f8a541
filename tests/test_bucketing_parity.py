"""Shape-bucketing parity: padded (bucketed) sampling must reproduce the
exact-length run on the valid region, and seeded noise must follow the
reference's per-item semantics (cfm.py:194-201).

These pin the round-2 fixes for the bucket-padding leak (attention logits,
ConvNeXt dwconv boundary, GRN sequence stats) and the noise draw:
  - pad_mask is applied in attention regardless of attn_mask_enabled,
  - text-embedding ConvNeXt blocks zero bucket-tail rows at dwconv/GRN,
  - noise is drawn at a canonical length so N (the bucket) doesn't change it,
  - seed=None draws fresh per-item noise; seed=k shares one tensor (reference
    reseeds every item with the same seed).
"""

import numpy as np

import jax

from korean_f5_tts_tpu.config import DiTConfig
from korean_f5_tts_tpu.models.cfm import cfm_sample
from korean_f5_tts_tpu.models.dit import init_dit

TINY = DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, mel_dim=10,
                 text_num_embeds=20, text_dim=16, conv_layers=2)
TINY_MASKED = DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2,
                        mel_dim=10, text_num_embeds=20, text_dim=16,
                        conv_layers=2, attn_mask_enabled=True)


def _params(key=0):
    p = init_dit(jax.random.PRNGKey(key), TINY)
    p["proj_out"]["w"] = jax.random.normal(
        jax.random.PRNGKey(key + 1), p["proj_out"]["w"].shape) * 0.05
    return p


class TestBucketedEqualsExact:
    """Bucket padding (rows the reference run never has) must not perturb the
    valid region — the reference never pads b=1 inference (cfm.py:156-158)."""

    def test_b1_bucketed_matches_exact_default_config(self):
        params = _params(0)
        rng = np.random.default_rng(0)
        dur = 50  # not a multiple of the bucket
        cond = rng.standard_normal((1, 20, 10)).astype(np.float32)
        text = np.array([[1, 2, 3, 4, -1, -1]], dtype=np.int32)
        exact, _ = cfm_sample(params, TINY, cond, text, duration=dur, seed=7,
                              steps=4, cfg_strength=2.0, duration_bucket=1)
        bucketed, _ = cfm_sample(params, TINY, cond, text, duration=dur, seed=7,
                                 steps=4, cfg_strength=2.0, duration_bucket=64)
        assert np.asarray(exact).shape[1] == dur
        assert np.asarray(bucketed).shape[1] == 64
        np.testing.assert_allclose(
            np.asarray(bucketed)[:, :dur], np.asarray(exact),
            atol=1e-5, rtol=1e-5,
        )

    def test_b1_bucketed_matches_exact_attn_mask_enabled(self):
        params = _params(2)
        rng = np.random.default_rng(1)
        dur = 37
        cond = rng.standard_normal((1, 12, 10)).astype(np.float32)
        text = np.array([[5, 6, 7]], dtype=np.int32)
        exact, _ = cfm_sample(params, TINY_MASKED, cond, text, duration=dur,
                              seed=3, steps=4, cfg_strength=1.5, duration_bucket=1)
        bucketed, _ = cfm_sample(params, TINY_MASKED, cond, text, duration=dur,
                                 seed=3, steps=4, cfg_strength=1.5,
                                 duration_bucket=32)
        np.testing.assert_allclose(
            np.asarray(bucketed)[:, :dur], np.asarray(exact),
            atol=1e-5, rtol=1e-5,
        )

    def test_b1_bucketed_no_cfg(self):
        params = _params(4)
        rng = np.random.default_rng(2)
        dur = 45
        cond = rng.standard_normal((1, 16, 10)).astype(np.float32)
        text = np.array([[2, 4, 6, 8]], dtype=np.int32)
        exact, _ = cfm_sample(params, TINY, cond, text, duration=dur, seed=1,
                              steps=3, cfg_strength=0.0, duration_bucket=1)
        bucketed, _ = cfm_sample(params, TINY, cond, text, duration=dur, seed=1,
                                 steps=3, cfg_strength=0.0, duration_bucket=64)
        np.testing.assert_allclose(
            np.asarray(bucketed)[:, :dur], np.asarray(exact),
            atol=1e-5, rtol=1e-5,
        )


class TestNoiseSemantics:
    def test_seeded_batch_equals_single_runs(self):
        """Equal-duration seeded batch == the same items run alone (the
        reference reseeds each item with the same seed, cfm.py:196-201)."""
        params = _params(6)
        rng = np.random.default_rng(3)
        dur = 40
        conds = rng.standard_normal((3, 14, 10)).astype(np.float32)
        texts = np.array([[1, 2, 3], [4, 5, -1], [6, -1, -1]], dtype=np.int32)
        batched, _ = cfm_sample(params, TINY, conds, texts, duration=dur,
                                seed=11, steps=3, cfg_strength=2.0,
                                duration_bucket=64)
        for i in range(3):
            single, _ = cfm_sample(params, TINY, conds[i:i + 1], texts[i:i + 1],
                                   duration=dur, seed=11, steps=3,
                                   cfg_strength=2.0, duration_bucket=64)
            np.testing.assert_allclose(
                np.asarray(batched)[i, :dur], np.asarray(single)[0, :dur],
                atol=1e-5, rtol=1e-5,
            )

    def test_noise_independent_of_bucket_size(self):
        """Canonical-length noise draw: the bucket (N) must not change the
        noise at a given frame."""
        params = _params(8)
        rng = np.random.default_rng(4)
        dur = 30
        cond = rng.standard_normal((1, 10, 10)).astype(np.float32)
        text = np.array([[3, 1, 4]], dtype=np.int32)
        a, _ = cfm_sample(params, TINY, cond, text, duration=dur, seed=5,
                          steps=2, cfg_strength=0.0, duration_bucket=32)
        b, _ = cfm_sample(params, TINY, cond, text, duration=dur, seed=5,
                          steps=2, cfg_strength=0.0, duration_bucket=128)
        np.testing.assert_allclose(np.asarray(a)[:, :dur], np.asarray(b)[:, :dur],
                                   atol=1e-5, rtol=1e-5)

    def test_unseeded_draws_fresh_noise(self):
        """seed=None must not be deterministic across calls (reference draws
        from the ambient RNG), and items in a batch get distinct noise."""
        params = _params(10)
        rng = np.random.default_rng(5)
        cond = rng.standard_normal((2, 10, 10)).astype(np.float32)
        text = np.array([[1, 2], [1, 2]], dtype=np.int32)
        a, _ = cfm_sample(params, TINY, cond, text, duration=30, seed=None,
                          steps=2, duration_bucket=32)
        b, _ = cfm_sample(params, TINY, cond, text, duration=30, seed=None,
                          steps=2, duration_bucket=32)
        assert not np.allclose(np.asarray(a), np.asarray(b))
        # identical cond/text but per-item keys -> different outputs per item
        assert not np.allclose(np.asarray(a)[0], np.asarray(a)[1])


class TestGuidanceIsTraced:
    def test_no_recompile_across_cfg_and_sway_values(self):
        """cfg_strength/sway are traced operands: distinct values reuse ONE
        compiled sampler (CLAUDE.md invariant: few distinct jitted shapes)."""
        from korean_f5_tts_tpu.models.cfm import _sample_core

        params = _params(12)
        rng = np.random.default_rng(6)
        cond = rng.standard_normal((1, 12, 10)).astype(np.float32)
        text = np.array([[1, 2, 3]], dtype=np.int32)

        n0 = _sample_core._cache_size()
        outs = []
        for cfg_val, sway in ((1.0, -1.0), (2.0, -1.0), (3.5, -0.5)):
            out, _ = cfm_sample(params, TINY, cond, text, duration=24,
                                seed=0, steps=2, cfg_strength=cfg_val,
                                sway_sampling_coef=sway, duration_bucket=32)
            outs.append(np.asarray(out))
        assert _sample_core._cache_size() == n0 + 1, (
            "guidance/sway values must share one compiled program"
        )
        assert not np.allclose(outs[0], outs[1])  # the value still matters


class TestSplitByBucket:
    def test_mixed_duration_split_matches_joint(self):
        """Duration-group splitting (cfm_sample split_by_bucket) must produce
        the same valid-region output as one joint max-bucket batch — masked
        rows are invisible either way; splitting only removes padded FLOPs."""
        import jax

        from korean_f5_tts_tpu.config import DiTConfig
        from korean_f5_tts_tpu.models.cfm import cfm_sample
        from korean_f5_tts_tpu.models.dit import init_dit

        cfg = DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2,
                        mel_dim=10, text_num_embeds=20, text_dim=16,
                        conv_layers=1)
        params = init_dit(jax.random.PRNGKey(0), cfg)
        params["proj_out"]["w"] = jax.random.normal(
            jax.random.PRNGKey(1), params["proj_out"]["w"].shape) * 0.05
        rng = np.random.default_rng(0)
        b = 3
        cond = rng.standard_normal((b, 10, 10)).astype(np.float32)
        text = np.array([[1, 2, 3], [4, 5, -1], [6, -1, -1]], np.int32)
        durations = np.array([18, 30, 44])  # buckets 24 / 32 / 48 at bucket=8 -> split
        lens = np.full((b,), 10)

        joint, _ = cfm_sample(params, cfg, cond, text, durations, lens=lens,
                              steps=2, cfg_strength=2.0, seed=0,
                              duration_bucket=8, split_by_bucket=False)
        split, _ = cfm_sample(params, cfg, cond, text, durations, lens=lens,
                              steps=2, cfg_strength=2.0, seed=0,
                              duration_bucket=8, split_by_bucket=True)
        joint = np.asarray(joint)
        split = np.asarray(split)
        for i in range(b):
            np.testing.assert_allclose(split[i, :durations[i]],
                                       joint[i, :durations[i]],
                                       atol=2e-4, rtol=2e-4)
