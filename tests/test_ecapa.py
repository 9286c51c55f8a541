"""ECAPA-TDNN speaker encoder tests."""

import numpy as np

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.eval.ecapa_tdnn import (
    EcapaConfig,
    ecapa_embed,
    init_ecapa,
    make_embed_fn,
)

TINY = EcapaConfig(feat_dim=8, channels=16, emb_dim=12, res2_scale=4,
                   se_bottleneck=8, attn_bottleneck=8)


class TestEcapa:
    def test_embedding_shape_and_norm(self):
        p = init_ecapa(jax.random.PRNGKey(0), TINY)
        feats = jnp.asarray(np.random.default_rng(0)
                            .standard_normal((3, 50, 8)).astype(np.float32))
        emb = ecapa_embed(p, feats, TINY)
        assert emb.shape == (3, 12)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0,
                                   atol=1e-5)

    def test_length_invariance_of_shape(self):
        p = init_ecapa(jax.random.PRNGKey(0), TINY)
        for t in (30, 77):
            feats = jnp.zeros((1, t, 8))
            assert ecapa_embed(p, feats, TINY).shape == (1, 12)

    def test_embed_fn_with_run_sim(self, tmp_path):
        from korean_f5_tts_tpu.eval.utils_eval import run_sim
        from korean_f5_tts_tpu.utils.audio import save_wav

        p = init_ecapa(jax.random.PRNGKey(0), TINY)
        embed_fn = make_embed_fn(p, TINY, sample_rate=16_000)
        sr = 16_000
        rng = np.random.default_rng(1)
        wav_a = (0.2 * np.sin(2 * np.pi * 200 * np.arange(sr) / sr)
                 + 0.01 * rng.standard_normal(sr)).astype(np.float32)
        prompt = str(tmp_path / "p.wav")
        save_wav(prompt, wav_a, sr)
        gen_dir = tmp_path / "gen"
        gen_dir.mkdir()
        save_wav(str(gen_dir / "u1.wav"), wav_a, sr)  # same audio -> sim ~1
        meta = [("u1", "text", prompt, "text")]
        results = run_sim(str(gen_dir), meta, embed_fn)
        assert len(results) == 1
        assert results[0]["sim"] > 0.99
