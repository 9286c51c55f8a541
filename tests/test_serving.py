"""Serving layer: native batcher semantics + HTTP server end-to-end on a tiny
model."""

import base64
import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from korean_f5_tts_tpu.serving.native import NativeBatcher, crossfade, f32_to_i16


class TestNativeBatcher:
    def test_batches_by_bucket(self):
        b = NativeBatcher(max_batch=4, max_wait_us=10_000)
        for i in range(3):
            b.submit(i, bucket=128)
        b.submit(99, bucket=256)
        seen = {}
        for _ in range(2):
            bucket, ids = b.next_batch(timeout_us=200_000)
            seen[bucket] = ids
        assert seen[128] == [0, 1, 2]
        assert seen[256] == [99]

    def test_max_batch_cap(self):
        b = NativeBatcher(max_batch=2, max_wait_us=5_000)
        for i in range(5):
            b.submit(i, bucket=1)
        sizes = []
        for _ in range(3):
            _, ids = b.next_batch(timeout_us=200_000)
            sizes.append(len(ids))
        assert sizes == [2, 2, 1]

    def test_timeout_returns_empty(self):
        b = NativeBatcher(max_batch=2, max_wait_us=1_000)
        bucket, ids = b.next_batch(timeout_us=10_000)
        assert ids == []

    def test_wait_coalesces(self):
        b = NativeBatcher(max_batch=8, max_wait_us=100_000)
        b.submit(1, bucket=5)

        def late_submit():
            time.sleep(0.02)
            b.submit(2, bucket=5)

        threading.Thread(target=late_submit).start()
        bucket, ids = b.next_batch(timeout_us=500_000)
        assert ids == [1, 2]



    @pytest.mark.parametrize("force_python", [False, True])
    def test_concurrent_submit_stress(self, force_python, monkeypatch):
        """SURVEY §5.2: many producer threads + one consumer; every id must
        come back exactly once, grouped by its own bucket, batches capped."""
        if force_python:
            from korean_f5_tts_tpu.serving import native as native_mod

            monkeypatch.setattr(native_mod, "_load_lib", lambda: None)
        b = NativeBatcher(max_batch=4, max_wait_us=2_000)
        n_threads, per_thread = 8, 50
        buckets = [128, 256, 512, 1024]

        def producer(t):
            rng = np.random.default_rng(t)
            for j in range(per_thread):
                rid = t * per_thread + j
                b.submit(rid, bucket=buckets[rng.integers(0, len(buckets))])
                if j % 17 == 0:
                    time.sleep(0.0005)

        threads = [threading.Thread(target=producer, args=(t,))
                   for t in range(n_threads)]
        for t in threads:
            t.start()
        got = {}
        deadline = time.time() + 30.0
        while len(got) < n_threads * per_thread and time.time() < deadline:
            bucket, ids = b.next_batch(timeout_us=100_000)
            assert len(ids) <= 4
            for rid in ids:
                assert rid not in got, f"duplicate {rid}"
                got[rid] = bucket
        for t in threads:
            t.join()
        assert len(got) == n_threads * per_thread

class TestPcmHelpers:
    def test_f32_to_i16_clamps(self):
        out = f32_to_i16(np.array([0.0, 1.5, -1.5, 0.5], np.float32))
        assert out.tolist() == [0, 32767, -32767, 16384]

    def test_crossfade_lengths(self):
        a, b = np.ones(100, np.float32), np.zeros(80, np.float32)
        out = crossfade(a, b, 20)
        assert len(out) == 160
        assert out[0] == 1.0 and out[-1] == 0.0
        # fade region is monotone decreasing
        fade = out[80:100]
        assert (np.diff(fade) <= 1e-6).all()


@pytest.fixture(scope="module")
def tiny_server():
    import jax

    from korean_f5_tts_tpu.config import DiTConfig, ModelConfig
    from korean_f5_tts_tpu.infer.model import TTSModel, load_model
    from korean_f5_tts_tpu.models.vocos import VocosConfig, init_vocos, vocos_decode
    from korean_f5_tts_tpu.serving.server import serve
    from korean_f5_tts_tpu.utils.audio import save_wav

    arch = DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, mel_dim=100,
                     text_num_embeds=40, text_dim=16, conv_layers=1)
    model = load_model(ModelConfig(name="tiny", backbone="DiT", arch=arch,
                                   tokenizer="custom"), use_n2gk_plus=False)
    model.vocab_char_map = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.,!")}
    vcfg = VocosConfig(input_channels=100, dim=16, intermediate_dim=32, num_layers=1)
    vparams = init_vocos(jax.random.PRNGKey(0), vcfg)
    vocoder = jax.jit(lambda m: vocos_decode(vparams, m, vcfg))

    httpd, service = serve(model, vocoder, host="127.0.0.1", port=0, max_batch=2,
                           max_wait_us=2_000, nfe_step=2)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()

    # ref wav bytes
    sr = 24_000
    ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
    buf = io.BytesIO()
    from scipy.io import wavfile

    wavfile.write(buf, sr, (ref * 32767).astype(np.int16))
    yield {"port": port, "ref_b64": base64.b64encode(buf.getvalue()).decode()}
    httpd.shutdown()


class TestHTTPServer:
    def _post(self, port, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/tts", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        return urllib.request.urlopen(req, timeout=300)

    def test_health_and_stats(self, tiny_server):
        with urllib.request.urlopen(
            f"http://127.0.0.1:{tiny_server['port']}/health", timeout=10
        ) as r:
            assert json.loads(r.read())["status"] == "ok"
        with urllib.request.urlopen(
            f"http://127.0.0.1:{tiny_server['port']}/stats", timeout=10
        ) as r:
            assert "requests" in json.loads(r.read())

    def test_tts_roundtrip(self, tiny_server):
        with self._post(tiny_server["port"], {
            "reference_audio": tiny_server["ref_b64"],
            "reference_text": "hello there friend",
            "target_text": "a generated sentence.",
            "nfe_step": 2,
        }) as resp:
            body = resp.read()
        assert resp.status == 200
        assert body[:4] == b"RIFF"
        assert len(body) > 10_000

    def test_bad_request_returns_500(self, tiny_server):
        with pytest.raises(urllib.error.HTTPError) as e:
            self._post(tiny_server["port"], {"nonsense": 1})
        assert e.value.code == 500

    def test_mixed_params_not_batched_together(self, tiny_server):
        """Concurrent requests with different sampling params must each be
        honored — the batch key includes (nfe, cfg, sway, seed), so they land
        in separate batches (round-1 ADVICE: items[0]'s nfe silently applied
        to the whole duration bucket)."""
        results = {}

        def post_one(tag, nfe, seed):
            with self._post(tiny_server["port"], {
                "reference_audio": tiny_server["ref_b64"],
                "reference_text": "hello there friend",
                "target_text": "mixed parameter batch test.",
                "nfe_step": nfe,
                "seed": seed,
            }) as resp:
                results[tag] = resp.read()

        threads = [
            threading.Thread(target=post_one, args=("a16", 16, 1)),
            threading.Thread(target=post_one, args=("b2", 2, 2)),
            threading.Thread(target=post_one, args=("c2", 2, 2)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert set(results) == {"a16", "b2", "c2"}
        for body in results.values():
            assert body[:4] == b"RIFF"
        # identical params -> identical audio; different nfe/seed -> different
        assert results["b2"] == results["c2"]
        assert results["a16"] != results["b2"]



class TestBatchDurationClamp:
    def test_long_text_batch_clamps_not_crashes(self):
        """A very long target text used to over-estimate gen_lens past the
        sampler's max_duration clamp and raise a broadcast error that 500'd
        the whole batch (round-1 ADVICE); the host now applies the same
        floor/clip as cfm_sample. Exercises _synthesize_batch directly with
        a small max_duration so the CPU compile stays tiny."""
        import jax

        from korean_f5_tts_tpu.config import DiTConfig, ModelConfig
        from korean_f5_tts_tpu.infer.model import load_model
        from korean_f5_tts_tpu.models.vocos import VocosConfig, init_vocos, vocos_decode
        from korean_f5_tts_tpu.serving.server import TTSService, _Pending

        arch = DiTConfig(dim=32, depth=1, heads=2, dim_head=16, ff_mult=2,
                         mel_dim=100, text_num_embeds=40, text_dim=16,
                         conv_layers=0)
        model = load_model(ModelConfig(name="tiny", backbone="DiT", arch=arch,
                                       tokenizer="custom"), use_n2gk_plus=False)
        model.vocab_char_map = {c: i for i, c in
                                enumerate(" abcdefghijklmnopqrstuvwxyz.,!")}
        vcfg = VocosConfig(input_channels=100, dim=16, intermediate_dim=32,
                           num_layers=1)
        vparams = init_vocos(jax.random.PRNGKey(0), vcfg)
        vocoder = jax.jit(lambda m: vocos_decode(vparams, m, vcfg))

        svc = TTSService.__new__(TTSService)
        svc.model, svc.vocoder, svc.nfe_step = model, vocoder, 2
        svc.vocoder_fused = None
        svc.max_duration = 96
        svc.stats = {"requests": 0}
        sr = 24_000
        ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
        items = [
            _Pending({"ref_wav": ref, "sr": sr, "ref_text": "hi",
                      "target_text": "long " * 400, "nfe_step": 2, "seed": 1}),
            _Pending({"ref_wav": ref, "sr": sr, "ref_text": "hi",
                      "target_text": "ok.", "nfe_step": 2, "seed": 1}),
        ]
        svc._synthesize_batch(items, bucket=128)
        for it in items:
            assert it.error is None
            wav, out_sr = it.result
            assert out_sr == sr and np.asarray(wav).size > 0


class TestBatchKeyGrouping:
    def test_param_signature_separates_batches(self):
        """TTSService._batch_key: same bucket, different params -> different
        keys; same params -> same key."""
        from korean_f5_tts_tpu.serving.server import TTSService

        svc = TTSService.__new__(TTSService)
        svc.nfe_step = 16
        svc.param_groups = {}
        svc.lock = threading.Lock()
        k1 = svc._batch_key({"nfe_step": 16, "seed": 1}, 1024)
        k2 = svc._batch_key({"nfe_step": 32, "seed": 1}, 1024)
        k3 = svc._batch_key({"nfe_step": 16, "seed": 1}, 1024)
        k4 = svc._batch_key({"nfe_step": 16, "seed": 1}, 512)
        assert k1 == k3
        assert len({k1, k2, k4}) == 3


class TestLongRefClip:
    def test_60s_ref_is_clipped_and_served(self, tiny_server):
        # pre-round-3 this drove the gen length negative (no ref clip in
        # serving; reference preprocessing clips refs to <=12 s)
        sr = 24_000
        ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(60 * sr) / sr)).astype(np.float32)
        buf = io.BytesIO()
        from scipy.io import wavfile

        wavfile.write(buf, sr, (ref * 32767).astype(np.int16))
        with TestHTTPServer._post(TestHTTPServer(), tiny_server["port"], {
            "reference_audio": base64.b64encode(buf.getvalue()).decode(),
            "reference_text": "hello there friend",
            "target_text": "a generated sentence.",
            "nfe_step": 2,
        }) as resp:
            body = resp.read()
        assert resp.status == 200
        sr2, data = wavfile.read(io.BytesIO(body))
        assert data.shape[0] > 0


class TestFusedVocoderPath:
    def _build(self):
        import jax

        from korean_f5_tts_tpu.config import DiTConfig, ModelConfig
        from korean_f5_tts_tpu.infer.model import load_model
        from korean_f5_tts_tpu.models.vocos import VocosConfig, init_vocos, vocos_decode

        arch = DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2,
                         mel_dim=100, text_num_embeds=40, text_dim=16,
                         conv_layers=1)
        model = load_model(ModelConfig(name="tiny", backbone="DiT", arch=arch,
                                       tokenizer="custom"), use_n2gk_plus=False)
        model.vocab_char_map = {c: i for i, c in
                                enumerate(" abcdefghijklmnopqrstuvwxyz.,!")}
        vcfg = VocosConfig(input_channels=100, dim=16, intermediate_dim=32,
                           num_layers=1)
        vparams = init_vocos(jax.random.PRNGKey(0), vcfg)
        vocoder = jax.jit(lambda m: vocos_decode(vparams, m, vcfg))
        vocoder.params, vocoder.vcfg = vparams, vcfg  # api.load_vocoder shape
        return model, vocoder

    def test_service_batch_uses_fused_program(self):
        from korean_f5_tts_tpu.serving.server import TTSService, _Pending

        model, vocoder = self._build()
        svc = TTSService.__new__(TTSService)
        svc.model, svc.vocoder, svc.nfe_step = model, vocoder, 2
        svc.vocoder_fused = (vocoder.params, vocoder.vcfg)
        svc.max_duration = 256
        svc.stats = {"requests": 0}
        sr = 24_000
        ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
        items = [
            _Pending({"ref_wav": ref, "sr": sr, "ref_text": "hi",
                      "target_text": "one sentence.", "nfe_step": 2, "seed": 1}),
            _Pending({"ref_wav": ref, "sr": sr, "ref_text": "hi",
                      "target_text": "two.", "nfe_step": 2, "seed": 1}),
        ]
        svc._synthesize_batch(items, bucket=128)
        fused_wavs = []
        for it in items:
            assert it.error is None
            wav, out_sr = it.result
            assert out_sr == sr and np.asarray(wav).size > 0
            assert np.isfinite(np.asarray(wav)).all()
            fused_wavs.append(np.asarray(wav))

        # two-program fallback on the SAME requests: lengths must agree and
        # the waveforms must match except vocoder receptive-field boundary
        # effects (fused decodes cond+gen jointly)
        svc2 = TTSService.__new__(TTSService)
        svc2.model, svc2.vocoder, svc2.nfe_step = model, vocoder, 2
        svc2.vocoder_fused = None
        svc2.max_duration = 256
        svc2.stats = {"requests": 0}
        items2 = [
            _Pending({"ref_wav": ref, "sr": sr, "ref_text": "hi",
                      "target_text": "one sentence.", "nfe_step": 2, "seed": 1}),
            _Pending({"ref_wav": ref, "sr": sr, "ref_text": "hi",
                      "target_text": "two.", "nfe_step": 2, "seed": 1}),
        ]
        svc2._synthesize_batch(items2, bucket=128)
        for fw, it2 in zip(fused_wavs, items2):
            w2 = np.asarray(it2.result[0])
            assert fw.shape == w2.shape
            # interior (past the receptive field) must agree closely
            if fw.size > 4096:
                mid = slice(2048, -2048)
                assert np.abs(fw[mid] - w2[mid]).max() < 5e-2

    def test_infer_batch_process_fused_matches(self):
        from korean_f5_tts_tpu.infer.utils_infer import infer_batch_process

        model, vocoder = self._build()
        sr = 24_000
        ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
        out_f = next(infer_batch_process((ref, sr), "hello there", ["a test."],
                                         model, vocoder, nfe_step=2, seed=3,
                                         vocoder_fused=(vocoder.params, vocoder.vcfg)))
        out_2 = next(infer_batch_process((ref, sr), "hello there", ["a test."],
                                         model, vocoder, nfe_step=2, seed=3))
        wf, w2 = np.asarray(out_f[0]), np.asarray(out_2[0])
        assert wf.size > 0 and np.isfinite(wf).all()
        assert abs(wf.size - w2.size) <= 256  # same gen region length


class TestServeFastPath:
    """One-dispatch serving path: bucketed device mel front-end + serve_sample.

    Pins serve_sample == cfm_sample semantics (masks, noise, splice, vocoder,
    int16 quantization) and the service-level fast path end to end."""

    def _build(self):
        import jax

        from korean_f5_tts_tpu.config import DiTConfig, ModelConfig
        from korean_f5_tts_tpu.infer.model import load_model
        from korean_f5_tts_tpu.models.vocos import VocosConfig, init_vocos

        arch = DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2,
                         mel_dim=100, text_num_embeds=40, text_dim=16,
                         conv_layers=1)
        model = load_model(ModelConfig(name="tiny", backbone="DiT", arch=arch,
                                       tokenizer="custom"), use_n2gk_plus=False)
        model.vocab_char_map = {c: i for i, c in
                                enumerate(" abcdefghijklmnopqrstuvwxyz.,!")}
        vcfg = VocosConfig(input_channels=100, dim=16, intermediate_dim=32,
                           num_layers=1)
        vparams = init_vocos(jax.random.PRNGKey(0), vcfg)
        return model, (vparams, vcfg)

    def test_mel_of_wav_device_exact(self):
        model, _ = self._build()
        sr = 24_000
        rng = np.random.default_rng(3)
        for seconds in (0.9, 4.0, 8.3):
            wav = (0.1 * rng.standard_normal(int(seconds * sr))).astype(np.float32)
            exact = model.mel_of_wav(wav)                    # [F, d] host
            dev, n_frames = model.mel_of_wav_device(wav)     # [1, Bc, d] device
            assert n_frames == exact.shape[0]
            got = np.asarray(dev)[0, :n_frames]
            assert np.abs(got - exact).max() < 2e-4

    def test_serve_sample_matches_cfm_sample(self):
        from korean_f5_tts_tpu.models.cfm import cfm_sample, serve_sample

        model, fused = self._build()
        sr = 24_000
        ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
        mel = model.mel_of_wav(ref)                       # exact host mel
        dev, n_frames = model.mel_of_wav_device(ref)
        assert n_frames == mel.shape[0]

        b = 2
        text = np.full((b, 40), -1, np.int64)
        text[0, :7] = [3, 4, 5, 0, 6, 7, 2]
        text[1, :5] = [9, 8, 1, 1, 4]
        # same 128-frame duration bucket for both items: cfm_sample would
        # otherwise split the batch into per-bucket b=1 runs (different masks
        # + vocoder lengths; only the valid gen region agrees then)
        durations = np.array([n_frames + 60, n_frames + 93])
        lens = np.full((b,), n_frames)

        import jax.numpy as jnp

        cond_b = jnp.concatenate([dev, dev], axis=0)
        wav_i16, durs = serve_sample(
            model.params, model.arch, cond_b, text, durations, lens,
            vocoder_fused=fused, steps=2, cfg_strength=2.0,
            sway_sampling_coef=-1.0, seed=5)
        wav_i16 = np.asarray(wav_i16)
        assert wav_i16.dtype == np.int16
        assert (durs == durations).all()

        cond = np.stack([mel, mel])
        _, wav_ref = cfm_sample(
            model.params, model.arch, cond, text, durations, lens=lens,
            steps=2, cfg_strength=2.0, sway_sampling_coef=-1.0, seed=5,
            vocoder_fused=fused)
        ref_i16 = np.round(np.clip(np.asarray(wav_ref, np.float32), -1, 1)
                           * 32767.0).astype(np.int16)
        # identical graphs up to op ordering: allow 2 LSB of i16
        assert wav_i16.shape == ref_i16.shape
        assert np.abs(wav_i16.astype(np.int32) - ref_i16.astype(np.int32)).max() <= 2

    def test_serve_sample_wav_scale(self):
        from korean_f5_tts_tpu.models.cfm import serve_sample

        model, fused = self._build()
        sr = 24_000
        ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
        dev, n_frames = model.mel_of_wav_device(ref)
        text = np.full((1, 20), -1, np.int64)
        text[0, :4] = [3, 4, 5, 6]
        full, _ = serve_sample(model.params, model.arch, dev, text,
                               np.array([n_frames + 40]), np.array([n_frames]),
                               vocoder_fused=fused, steps=2, seed=1)
        half, _ = serve_sample(model.params, model.arch, dev, text,
                               np.array([n_frames + 40]), np.array([n_frames]),
                               vocoder_fused=fused, steps=2, seed=1,
                               wav_scale=np.array([0.5], np.float32))
        full, half = np.asarray(full, np.int32), np.asarray(half, np.int32)
        assert np.abs(half - (full * 0.5).round()).max() <= 2

    def test_service_fast_path(self):
        from korean_f5_tts_tpu.infer.utils_infer import hop_length
        from korean_f5_tts_tpu.serving.server import TTSService, _Pending

        model, fused = self._build()
        svc = TTSService.__new__(TTSService)
        svc.model, svc.vocoder, svc.nfe_step = model, None, 2
        svc.vocoder_fused = fused
        svc.max_duration = 256
        svc.stats = {"requests": 0}
        svc.lock = threading.Lock()
        svc._mel_cache, svc._mel_cache_cap = {}, 64
        sr = 24_000
        ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
        items = [
            _Pending({"ref_wav": ref, "sr": sr, "ref_text": "hi",
                      "target_text": "one sentence.", "nfe_step": 2, "seed": 1}),
            _Pending({"ref_wav": ref, "sr": sr, "ref_text": "hi",
                      "target_text": "two longer.", "nfe_step": 2, "seed": 1}),
        ]
        svc._synthesize_fast(items)
        n_ref = model.mel_of_wav_device(ref)[1]
        for it in items:
            assert it.error is None
            wav, out_sr = it.result
            assert out_sr == sr
            assert wav.dtype == np.int16 and wav.size > 0
            # exact generated length: both byte-ratio estimates exceed
            # max_duration=256 so durations clamp there, and the slice must
            # include the FINAL frame — duration*hop, not (duration-1)*hop
            # (reference utils_infer.py:321; round-4 advisor finding)
            assert wav.size == (256 - n_ref) * hop_length
        # mel cache hit: both items share the ref -> a single cache entry
        assert len(svc._mel_cache) == 1
        assert svc.stats["requests"] == 2

    def test_http_server_fast_path_roundtrip(self):
        import jax

        from scipy.io import wavfile

        from korean_f5_tts_tpu.serving.server import serve

        model, (vparams, vcfg) = self._build()
        from korean_f5_tts_tpu.models.vocos import vocos_decode

        vocoder = jax.jit(lambda m: vocos_decode(vparams, m, vcfg))
        vocoder.params, vocoder.vcfg = vparams, vcfg  # api.load_vocoder shape
        httpd, service = serve(model, vocoder, host="127.0.0.1", port=0,
                               max_batch=2, max_wait_us=2_000, nfe_step=2)
        assert service.vocoder_fused is not None
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            sr = 24_000
            ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
            buf = io.BytesIO()
            wavfile.write(buf, sr, (ref * 32767).astype(np.int16))
            payload = {
                "reference_audio": base64.b64encode(buf.getvalue()).decode(),
                "reference_text": "hello there",
                "target_text": "a quick test.",
                "nfe_step": 2,
                "seed": 7,
            }
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/tts", data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                body = r.read()
            out_sr, data = wavfile.read(io.BytesIO(body))
            assert out_sr == sr
            assert data.dtype == np.int16 and data.size > 0
            assert np.isfinite(data.astype(np.float32)).all()
        finally:
            httpd.shutdown()

    def test_serve_sample_bf16_model_close_to_fp32(self):
        """bf16-weighted serving (the headline mode) runs the WHOLE graph in
        bf16 — bounded-close to the fp32 serve output, not bit-exact
        (round-3 ADVICE: the docstring previously over-claimed exactness)."""
        import jax
        import jax.numpy as jnp

        from korean_f5_tts_tpu.models.cfm import serve_sample

        model, fused = self._build()
        sr = 24_000
        ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
        dev, n_frames = model.mel_of_wav_device(ref)
        text = np.full((1, 20), -1, np.int64)
        text[0, :4] = [3, 4, 5, 6]
        from korean_f5_tts_tpu.models.cfm import cfm_sample

        p16 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            model.params)
        durations, lens = np.array([n_frames + 40]), np.array([n_frames])
        b16, _ = serve_sample(p16, model.arch, dev, text, durations, lens,
                              vocoder_fused=fused, steps=2, cfg_strength=2.0,
                              sway_sampling_coef=-1.0, seed=5)
        # matching dtypes: serve_sample auto-casts cond to bf16 for
        # bf16-weighted params (the headline mode); hand cfm_sample the
        # SAME bf16 cond so both run the bf16 graph (an f32 cond would keep
        # cfm_sample on the fp32-logit parity path — the documented
        # divergence this test brackets)
        mel_host = jnp.asarray(model.mel_of_wav(ref)[None], jnp.bfloat16)
        _, wav_ref = cfm_sample(p16, model.arch, mel_host, text,
                                durations, lens=lens, steps=2,
                                cfg_strength=2.0, sway_sampling_coef=-1.0,
                                seed=5, vocoder_fused=fused)
        ref_i16 = np.round(np.clip(np.asarray(wav_ref, np.float32), -1, 1)
                           * 32767.0).astype(np.int16)
        b16 = np.asarray(b16, np.float32).reshape(-1) / 32767.0
        f16 = ref_i16.astype(np.float32).reshape(-1) / 32767.0
        # SAME dtype both sides: identical graphs up to op ordering at bf16
        # precision — strongly correlated, modest relative deviation
        corr = float(np.corrcoef(f16, b16)[0, 1])
        assert corr > 0.98, corr
        rel = np.abs(b16 - f16).mean() / (np.abs(f16).mean() + 1e-9)
        assert rel < 0.2, rel

    def test_mel_of_wav_device_overlong_raises(self):
        model, _ = self._build()
        sr = 24_000
        too_long = np.zeros(14 * sr, np.float32)  # > largest 12 s bucket
        with pytest.raises(ValueError, match="exceeds"):
            model.mel_of_wav_device(too_long)

    def test_mel_of_wav_device_tiny_input_ok(self):
        model, _ = self._build()
        # shorter than n_fft//2: used to raise an opaque numpy reflect error
        dev, n_frames = model.mel_of_wav_device(np.zeros(100, np.float32))
        assert n_frames >= 1 and np.isfinite(np.asarray(dev)).all()

    def test_ref_mel_cache_is_lru(self):
        """A hot reference interleaved with many distinct refs must survive
        eviction (round-3 ADVICE: FIFO evicted by insertion order)."""
        from korean_f5_tts_tpu.serving.server import TTSService

        model, fused = self._build()
        service = TTSService.__new__(TTSService)  # no worker thread needed
        import threading

        service.model = model
        service.lock = threading.Lock()
        service._mel_cache = {}
        service._mel_cache_cap = 4
        sr = 24_000
        rng = np.random.default_rng(0)

        def payload(i):
            return {"ref_wav": (0.1 * rng.standard_normal(2000) + i * 0.0
                                ).astype(np.float32) + np.float32(i) * 1e-3,
                    "sr": sr}

        hot = {"ref_wav": (0.2 * np.sin(np.arange(2000) / 10)).astype(np.float32),
               "sr": sr}
        service._ref_mel(hot)
        hot_key = next(iter(service._mel_cache))
        for i in range(8):  # interleave: hot ref hit between distinct refs
            service._ref_mel(payload(i))
            service._ref_mel(hot)
        assert hot_key in service._mel_cache
        assert len(service._mel_cache) <= service._mel_cache_cap


class TestOverloadBehavior:
    """Queue cap / strict max_duration / graceful shutdown (round-3 VERDICT
    item 8; Triton queue-policy + engine max_seq_len roles)."""

    def _tiny_service(self, **kw):
        import jax

        from korean_f5_tts_tpu.config import DiTConfig, ModelConfig
        from korean_f5_tts_tpu.infer.model import load_model
        from korean_f5_tts_tpu.models.vocos import VocosConfig, init_vocos, vocos_decode
        from korean_f5_tts_tpu.serving.server import TTSService

        arch = DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2,
                         mel_dim=100, text_num_embeds=40, text_dim=16,
                         conv_layers=1)
        model = load_model(ModelConfig(name="tiny", backbone="DiT", arch=arch,
                                       tokenizer="custom"), use_n2gk_plus=False)
        model.vocab_char_map = {c: i for i, c in
                                enumerate(" abcdefghijklmnopqrstuvwxyz.,!")}
        vcfg = VocosConfig(dim=16, intermediate_dim=32, num_layers=1)
        vp = init_vocos(jax.random.PRNGKey(0), vcfg)
        vocoder = jax.jit(lambda m: vocos_decode(vp, m, vcfg))
        return TTSService(model, vocoder, max_batch=2, max_wait_us=2000,
                          nfe_step=2, **kw)

    def _payload(self, text="hello"):
        sr = 24000
        ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
        return {"ref_wav": ref, "sr": sr, "ref_text": "hi",
                "target_text": text, "nfe_step": 2, "seed": 1,
                "_duration_frames": 128}

    def test_queue_cap_raises_overloaded(self):
        from korean_f5_tts_tpu.serving.server import ServiceOverloaded, TTSService

        service = TTSService.__new__(TTSService)  # no worker: queue only fills
        import threading

        service.lock = threading.Lock()
        service.pending = {}
        service.max_queue = 3
        service.max_duration = 4096
        service.strict_max_duration = False
        service.accepting = True
        service.counter = 0
        service.param_groups = {}
        service.nfe_step = 2

        class _NullBatcher:
            def submit(self, rid, key):
                pass

        service.batcher = _NullBatcher()
        for _ in range(3):
            service.submit(self._payload())
        with pytest.raises(ServiceOverloaded, match="queue full"):
            service.submit(self._payload())

    def test_strict_max_duration_rejects(self):
        from korean_f5_tts_tpu.serving.server import RequestTooLong

        service = self._tiny_service(max_duration=256,
                                     strict_max_duration=True)
        try:
            p = self._payload()
            p["_duration_frames"] = 3001  # past the engine max_seq_len role
            with pytest.raises(RequestTooLong, match="max_duration"):
                service.submit(p)
            # in-range requests still serve
            ok = service.submit(self._payload())
            assert ok.event.wait(timeout=120) and ok.error is None
        finally:
            service.shutdown(drain=False, timeout=5)

    def test_graceful_shutdown_drains_inflight(self):
        from korean_f5_tts_tpu.serving.server import ServiceShuttingDown

        service = self._tiny_service()
        items = [service.submit(self._payload(t))
                 for t in ("one sentence.", "two here.")]
        service.shutdown(drain=True, timeout=120)
        for it in items:
            assert it.event.is_set()
            assert it.error is None, it.error  # in-flight work completed
            wav, sr = it.result
            assert sr == 24000 and np.asarray(wav).size > 0
        # post-shutdown submits are refused
        with pytest.raises(ServiceShuttingDown):
            service.submit(self._payload())

    def test_shutdown_fails_unscheduled_fast(self):
        """drain=False: queued-but-unbatched items fail with a clear error
        instead of hanging their waiters."""
        from korean_f5_tts_tpu.serving.server import TTSService

        service = self._tiny_service()
        # stop the worker first so submissions can never be scheduled
        service.running = False
        service.worker.join(timeout=10)
        items = [service.submit(self._payload(t)) for t in ("a.", "b.")]
        service.shutdown(drain=False, timeout=1)
        for it in items:
            assert it.event.is_set()
            assert it.error and "ServiceShuttingDown" in it.error

    def test_http_429_and_400_statuses(self):
        """Full HTTP stack: queue-full -> 429 (with Retry-After), strict
        over-length -> 400."""
        import base64
        import io
        import urllib.error
        import urllib.request

        from scipy.io import wavfile

        from korean_f5_tts_tpu.serving.server import ThreadingHTTPServer, make_handler

        service = self._tiny_service(max_duration=256,
                                     strict_max_duration=True)
        # block scheduling so the queue can fill: stop the worker
        service.running = False
        service.worker.join(timeout=10)
        service.max_queue = 1
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            sr = 24000
            ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
            buf = io.BytesIO()
            wavfile.write(buf, sr, (ref * 32767).astype(np.int16))
            b64 = base64.b64encode(buf.getvalue()).decode()

            def post(body):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/tts",
                    data=json.dumps(body).encode(),
                    headers={"Content-Type": "application/json"})
                return urllib.request.urlopen(req, timeout=10)

            base = {"reference_audio": b64, "reference_text": "hi",
                    "target_text": "ok.", "nfe_step": 2}
            # fill the queue directly (worker stopped, so it stays full)
            service.submit(self._payload())
            with pytest.raises(urllib.error.HTTPError) as exc:
                post(base)
            assert exc.value.code == 429
            assert exc.value.headers.get("Retry-After") == "1"

            service.pending.clear()  # free the queue
            too_long = dict(base, target_text="x" * 4000)
            with pytest.raises(urllib.error.HTTPError) as exc:
                post(too_long)
            assert exc.value.code == 400
        finally:
            httpd.shutdown()
            service.shutdown(drain=False, timeout=1)


class TestWarmStart:
    """warm_start is the production precompile path (server.py --warm_buckets,
    grpc_server.py --warm_buckets); both vocoder branches must actually
    compile the graphs the service later dispatches."""

    def _tiny(self):
        from korean_f5_tts_tpu.config import DiTConfig, ModelConfig
        from korean_f5_tts_tpu.infer.model import load_model

        arch = DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2,
                         mel_dim=100, text_num_embeds=40, text_dim=16,
                         conv_layers=1)
        model = load_model(ModelConfig(name="tiny", backbone="DiT", arch=arch,
                                       tokenizer="custom"), use_n2gk_plus=False)
        model.vocab_char_map = {
            c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.,!")}
        return model

    def test_fused_branch_then_serve(self):
        """Fused-capable vocoder (params/vcfg attrs, like api.load_vocoder):
        warm_start must compile serve_sample's fused program and the mel
        front-end buckets, and a subsequent request reuses them."""
        import jax

        from korean_f5_tts_tpu.models.vocos import (VocosConfig, init_vocos,
                                                     vocos_decode)
        from korean_f5_tts_tpu.serving.server import TTSService, warm_start

        model = self._tiny()
        vcfg = VocosConfig(dim=16, intermediate_dim=32, num_layers=1)
        vp = init_vocos(jax.random.PRNGKey(0), vcfg)
        decode = jax.jit(lambda m: vocos_decode(vp, m, vcfg))
        decode.params = vp
        decode.vcfg = vcfg
        warm_start(model, decode, [128], 2, text_tokens=8)

        service = TTSService(model, decode, nfe_step=2)
        try:
            sr = 24000
            ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)
                   ).astype(np.float32)
            it = service.submit({"ref_wav": ref, "sr": sr, "ref_text": "hi",
                                 "target_text": "a test.", "nfe_step": 2,
                                 "seed": 1, "_duration_frames": 100})
            assert it.event.wait(timeout=300) and it.error is None
            wav, out_sr = it.result
            assert out_sr == 24000 and len(np.asarray(wav).reshape(-1)) > 4000
            assert np.isfinite(np.asarray(wav)).all()
        finally:
            service.shutdown(drain=False, timeout=1)

    def test_plain_vocoder_branch(self):
        """Vocoder without params/vcfg (plain callable): the non-fused branch
        warms cfm_sample + the 256-frame-bucketed vocoder decode lengths."""
        import jax

        from korean_f5_tts_tpu.models.vocos import (VocosConfig, init_vocos,
                                                     vocos_decode)
        from korean_f5_tts_tpu.serving.server import warm_start

        model = self._tiny()
        vcfg = VocosConfig(dim=16, intermediate_dim=32, num_layers=1)
        vp = init_vocos(jax.random.PRNGKey(0), vcfg)
        vocoder = jax.jit(lambda m: vocos_decode(vp, m, vcfg))
        warm_start(model, vocoder, [256], 2, text_tokens=8)
