"""duplicate_test sampling mode, ASR backend hooks, hour-subset tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.config import DiTConfig
from korean_f5_tts_tpu.models.cfm import cfm_sample
from korean_f5_tts_tpu.models.dit import init_dit

TINY = DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, mel_dim=10,
                 text_num_embeds=20, text_dim=16, conv_layers=1)


class TestDuplicateTest:
    def test_runs_and_differs_from_normal(self):
        params = init_dit(jax.random.PRNGKey(0), TINY)
        rng = np.random.default_rng(0)
        cond = jnp.asarray(rng.standard_normal((1, 16, 10)).astype(np.float32))
        text = jnp.asarray(np.array([[1, 2, 3]], dtype=np.int32))
        a, _ = cfm_sample(params, TINY, cond, text, duration=48, steps=10,
                          cfg_strength=1.0, seed=0, duration_bucket=8)
        b, _ = cfm_sample(params, TINY, cond, text, duration=48, steps=10,
                          cfg_strength=1.0, seed=0, duration_bucket=8,
                          duplicate_test=True, t_inter=0.2)
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        # generated region differs (initial state shifted toward cond)
        assert not np.allclose(a[:, 16:48], b[:, 16:48])


class TestAsrBackendHook:
    def test_transcribe_gated_then_injected(self, tmp_path):
        import korean_f5_tts_tpu.infer.utils_infer as ui

        with pytest.raises(RuntimeError, match="ASR"):
            ui.transcribe("whatever.wav")
        ui.set_asr_backend(lambda path, language=None: "injected text")
        try:
            assert ui.transcribe("x.wav") == "injected text"
            # empty ref_text now auto-transcribes in preprocess
            from korean_f5_tts_tpu.utils.audio import save_wav

            sr = 24000
            # distinctive frequency: the md5-keyed ref caches are module-global
            # and identical sines from other tests would alias
            wav = (0.2 * np.sin(2 * np.pi * 333 * np.arange(sr) / sr)).astype(np.float32)
            p = str(tmp_path / "r.wav")
            save_wav(p, wav, sr)
            (w, s), text = ui.preprocess_ref_audio_text(p, "", show_info=lambda *a: None)
            assert text.startswith("injected text")
        finally:
            ui.set_asr_backend(None)


class TestSubsetHours:
    def test_deterministic_subset(self):
        from korean_f5_tts_tpu.train.datasets.prepare import subset_by_hours

        rows = [{"i": i} for i in range(100)]
        durs = [36.0] * 100  # 100 * 36s = 1h total
        r1, d1 = subset_by_hours(rows, durs, hours=0.5, seed=1)
        r2, d2 = subset_by_hours(rows, durs, hours=0.5, seed=1)
        assert r1 == r2
        assert abs(sum(d1) - 1800) <= 36
        r3, _ = subset_by_hours(rows, durs, hours=0.5, seed=2)
        assert r1 != r3


class TestAdviceRound2Fixes:
    def test_duration_bucket_env_validated(self, monkeypatch):
        from korean_f5_tts_tpu.models.cfm import _default_duration_bucket

        monkeypatch.setenv("F5_TTS_DURATION_BUCKET", "0")
        with pytest.raises(ValueError):
            _default_duration_bucket()
        monkeypatch.setenv("F5_TTS_DURATION_BUCKET", "banana")
        with pytest.raises(ValueError):
            _default_duration_bucket()
        monkeypatch.setenv("F5_TTS_DURATION_BUCKET", "256")
        assert _default_duration_bucket() == 256

    def test_prefix_mask_debug_guard(self, monkeypatch):
        import jax.numpy as jnp
        from korean_f5_tts_tpu.models.modules import attention

        monkeypatch.setenv("F5_TTS_CHECK_PREFIX_MASK", "1")
        rng = np.random.default_rng(0)
        dim, heads, n = 32, 2, 8
        p = {
            name: {"w": rng.standard_normal((dim, dim)).astype(np.float32) * 0.05,
                   "b": np.zeros(dim, np.float32)}
            for name in ("to_q", "to_k", "to_v", "to_out")
        }
        x = rng.standard_normal((1, n, dim)).astype(np.float32)
        holey = np.ones((1, n), bool)
        holey[0, 3] = False  # same sum as a prefix of 7 but not a prefix
        with pytest.raises(ValueError, match="non-prefix"):
            attention(p, jnp.asarray(x), heads, mask=jnp.asarray(holey))
        ok = np.arange(n)[None, :] < 6
        attention(p, jnp.asarray(x), heads, mask=jnp.asarray(ok))

    def test_server_bucket_clamped(self):
        from korean_f5_tts_tpu.serving.server import TTSService

        svc = TTSService.__new__(TTSService)  # no model; exercise submit's bucket math only
        svc.max_duration = 4096
        svc.nfe_step = 16
        svc.strict_max_duration = False
        svc.accepting = True
        svc.max_queue = 64
        svc.lock = __import__("threading").Lock()
        svc.param_groups = {}
        svc.pending = {}
        svc.counter = 0
        seen = {}
        svc.batcher = type("B", (), {"submit": lambda self, rid, key: seen.update(key=key)})()
        svc.submit({"_duration_frames": 10**9})
        key = seen["key"]
        assert 0 < key < 2**31  # no int32 overflow: bucket clamped to max_duration
        assert (key >> 18) <= svc.max_duration
