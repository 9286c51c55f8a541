"""Batching TTS inference server (HTTP) — the Triton+TRT-LLM stack equivalent.

Role parity with reference `src/f5_tts/runtime/triton_trtllm/` (§2.6): a C++
dynamic batcher (serving/native.py -> native/f5_runtime.cpp) groups requests
by duration bucket under a max-batch/max-delay policy, and a single jitted
XLA program (sampler + vocoder fused) executes each batch on the TPU — the
role the TRT engine + host Euler loop split played on GPU
(`f5_tts_trtllm.py:296-372`).

Protocol: POST /tts  JSON {reference_audio: b64 wav, reference_text, target_text,
nfe_step?, cfg_strength?, sway_sampling_coef?, seed?} -> audio/wav bytes.
GET /health -> {"status": "ok"}; GET /stats -> latency counters
(client parity with `client_http.py` / `client_grpc.py`).
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from korean_f5_tts_tpu.infer.utils_infer import infer_batch_process, preprocess_ref_audio_text
from korean_f5_tts_tpu.serving.native import NativeBatcher, f32_to_i16
from korean_f5_tts_tpu.utils.audio import load_wav, to_mono


class ServiceOverloaded(RuntimeError):
    """Queue is at max_queue capacity — reject-with-429 instead of letting
    latency grow unboundedly (the Triton dynamic batcher's queue-policy role,
    config.pbtxt:17-20)."""


class RequestTooLong(ValueError):
    """Estimated duration exceeds max_duration in strict mode (the TRT
    engine's max_seq_len=3000 rejection role, patch/f5tts/model.py:109)."""


class ServiceShuttingDown(RuntimeError):
    """submit() after shutdown() started: in-flight work drains, new work
    is refused (503)."""


class _Pending:
    __slots__ = ("payload", "event", "result", "error", "t_enqueue")

    def __init__(self, payload):
        self.payload = payload
        self.event = threading.Event()
        self.result = None
        self.error = None
        self.t_enqueue = time.perf_counter()


class TTSService:
    """Model + batch worker. Requests flow: submit() -> batcher -> worker ->
    per-request events."""

    def __init__(self, model_obj, vocoder, max_batch: int = 8,
                 max_wait_us: int = 5_000, nfe_step: int = 16,
                 max_duration: int = 4096, max_queue: int = 64,
                 strict_max_duration: bool = False):
        self.model = model_obj
        self.vocoder = vocoder
        # fuse DiT + vocoder into ONE device program when the vocoder exposes
        # its params/config (api.load_vocoder does): one dispatch + one fenced
        # readback per request instead of two (~30 ms relay roundtrip each)
        self.vocoder_fused = (
            (vocoder.params, vocoder.vcfg)
            if vocoder is not None and hasattr(vocoder, "params")
            and hasattr(vocoder, "vcfg") else None
        )
        self.nfe_step = nfe_step
        self.max_duration = max_duration  # sampler frame cap (engine max_seq_len role)
        self.max_queue = max_queue        # queued-request cap (429 beyond it)
        # strict: reject requests whose duration estimate exceeds
        # max_duration instead of clamping (the TRT engine errors there)
        self.strict_max_duration = strict_max_duration
        self.accepting = True
        self.batcher = NativeBatcher(max_batch=max_batch, max_wait_us=max_wait_us)
        # device-resident ref-mel cache: preprocessing + the jitted mel
        # front-end run once per distinct reference (keyed by content hash);
        # repeat requests skip the wav upload and mel program entirely
        self._mel_cache: dict[tuple, tuple] = {}
        self._mel_cache_cap = 64
        self.pending: dict[int, _Pending] = {}
        self.lock = threading.Lock()
        self.counter = 0
        self.param_groups: dict[tuple, int] = {}
        self.stats = {"requests": 0, "batches": 0, "batch_sizes": [], "latency_ms": []}
        self.worker = threading.Thread(target=self._run, daemon=True)
        self.running = True
        self.worker.start()

    def _batch_key(self, payload: dict, bucket: int) -> int:
        """Composite batch key: duration bucket + sampling parameters.

        Requests only share a batch when (nfe, cfg, sway, seed) all match —
        the Triton batcher never mixed per-request params either (they were
        per-request engine inputs); batching on duration alone silently
        applied items[0]'s settings to everyone (round-1 ADVICE)."""
        sig = (
            int(payload.get("nfe_step", self.nfe_step)),
            float(payload.get("cfg_strength", 2.0)),
            float(payload.get("sway_sampling_coef", -1.0)),
            payload.get("seed"),
        )
        with self.lock:
            gid = self.param_groups.setdefault(sig, len(self.param_groups))
        # C++ batcher keys are int32: bucket <= 4096 needs 13 bits, leaving
        # 18 for the param-group id (wraps harmlessly: worst case two groups
        # share a key and fall back to the uniform-param assertion path)
        return (bucket << 18) | (gid & 0x3FFFF)

    def submit(self, payload: dict) -> _Pending:
        # cap the reference at 12 s (the reference preprocessing's clip,
        # utils_infer.py:388-415): an unclipped long ref leaves no frame
        # budget for generation under max_duration and drives the gen
        # length negative (found by a 60 s-ref serving drive)
        if payload.get("ref_wav") is not None and payload.get("sr"):
            cap = 12 * int(payload["sr"])
            if np.asarray(payload["ref_wav"]).shape[-1] > cap:
                payload["ref_wav"] = np.asarray(payload["ref_wav"])[..., :cap]
        # overload / validity gates BEFORE registering anything
        est = max(1, int(payload.get("_duration_frames", 1024)))
        if self.strict_max_duration and est > self.max_duration:
            raise RequestTooLong(
                f"estimated {est} mel frames exceeds max_duration="
                f"{self.max_duration} (engine max_seq_len role); chunk the "
                "text or raise --max_duration")
        with self.lock:
            if not self.accepting:
                raise ServiceShuttingDown("server is shutting down")
            if len(self.pending) >= self.max_queue:
                raise ServiceOverloaded(
                    f"queue full ({self.max_queue} requests in flight); "
                    "retry later")
            self.counter += 1
            rid = self.counter
            item = _Pending(payload)
            self.pending[rid] = item
        # bucket by estimated duration so batches share one compiled shape.
        # Clamp to the engine cap BEFORE bucketing: an oversized estimate
        # would otherwise shift past the 13 bits reserved in _batch_key
        # (round-2 ADVICE) — the sampler clamps durations to max_duration
        # anyway (non-strict mode), so the oversized bucket could never be
        # used.
        bucket = int(np.ceil(min(est, self.max_duration) / 128) * 128)
        self.batcher.submit(rid, self._batch_key(payload, bucket))
        return item

    def shutdown(self, drain: bool = True, timeout: float = 30.0) -> None:
        """Graceful shutdown: stop accepting, drain in-flight work, stop the
        worker, fail anything still queued with a clear error.

        In-flight batches always complete (the worker is never killed
        mid-execution); `drain` controls whether queued-but-unbatched
        requests get served (up to `timeout` seconds) or failed fast."""
        with self.lock:
            self.accepting = False
        deadline = time.monotonic() + timeout
        if drain:
            while time.monotonic() < deadline:
                with self.lock:
                    if not self.pending:
                        break
                time.sleep(0.01)
        self.running = False
        self.worker.join(timeout=max(0.0, deadline - time.monotonic()) + 1.0)
        with self.lock:
            leftovers = list(self.pending.values())
            self.pending.clear()
        for item in leftovers:
            if item.result is None and item.error is None:
                item.error = "ServiceShuttingDown: server stopped before the request was scheduled"
            item.event.set()

    def _run(self):
        while self.running:
            bucket, ids = self.batcher.next_batch(timeout_us=200_000)
            if not ids:
                continue
            with self.lock:
                items = [self.pending.pop(i) for i in ids if i in self.pending]
            if not items:
                continue
            t0 = time.perf_counter()
            try:
                # partition by exact param signature (the int batch key is a
                # hash of it; this guarantees no mixing even on collisions)
                groups: dict[tuple, list[_Pending]] = {}
                for it in items:
                    p = it.payload
                    sig = (int(p.get("nfe_step", self.nfe_step)),
                           float(p.get("cfg_strength", 2.0)),
                           float(p.get("sway_sampling_coef", -1.0)),
                           p.get("seed"))
                    groups.setdefault(sig, []).append(it)
                for group in groups.values():
                    if self.vocoder_fused is not None:
                        # one-dispatch fast path (single requests AND batches)
                        self._synthesize_fast(group)
                    elif len(group) > 1:
                        self._synthesize_batch(group, bucket)
                    else:
                        group[0].result = self._synthesize(group[0].payload)
            except Exception as e:  # batch-level failure: report to all
                for item in items:
                    if item.result is None and item.error is None:
                        item.error = repr(e)
            for item in items:
                item.event.set()
            dt = (time.perf_counter() - t0) * 1e3
            self.stats["batches"] += 1
            self.stats["batch_sizes"].append(len(items))
            self.stats["latency_ms"].append(dt / max(len(items), 1))

    def _ref_mel(self, p: dict) -> tuple:
        """Preprocess + mel one reference, cached ON DEVICE by content hash.

        Returns ([1, Bc, d] device mel, n_frames, rms). Preprocessing order
        matches infer_batch_process (utils_infer.py:264-276): mono, RMS boost
        below target_rms, resample, 12 s clip."""
        import hashlib

        from korean_f5_tts_tpu.infer.utils_infer import target_rms, target_sample_rate
        from korean_f5_tts_tpu.utils import audio as au

        wav = np.asarray(p["ref_wav"], np.float32)
        key = (hashlib.sha1(wav.tobytes()).hexdigest(), int(p["sr"]))
        with self.lock:
            hit = self._mel_cache.get(key)
            if hit is not None:
                # LRU bump: re-insert so a hot reference interleaved with many
                # distinct refs isn't evicted (round-3 ADVICE: FIFO evicted by
                # insertion order regardless of hits)
                self._mel_cache.pop(key)
                self._mel_cache[key] = hit
        if hit is not None:
            return hit
        wav = au.to_mono(wav)
        r = au.rms(wav)
        if 0 < r < target_rms:
            wav = wav * (target_rms / r)
        if int(p["sr"]) != target_sample_rate:
            wav = au.resample(wav, int(p["sr"]), target_sample_rate)
        wav = wav[: 12 * target_sample_rate]
        mel_dev, n_frames = self.model.mel_of_wav_device(wav)
        entry = (mel_dev, n_frames, float(r))
        with self.lock:
            if len(self._mel_cache) >= self._mel_cache_cap:
                self._mel_cache.pop(next(iter(self._mel_cache)))
            self._mel_cache[key] = entry
        return entry

    def _synthesize_fast(self, items: list[_Pending]) -> None:
        """One-dispatch serving: cached device ref mels -> serve_sample (all
        request-side device work as ONE jitted program, int16 readback).

        Replaces the eager-mel + two-program route whose front-end alone
        measured 383 ms/request through the TPU relay
        (scripts/profile_serving_request.py). The batch key guarantees every
        item shares (nfe, cfg, sway, seed)."""
        import jax.numpy as jnp

        from korean_f5_tts_tpu.infer.utils_infer import (
            hop_length,
            target_rms,
            target_sample_rate,
        )
        from korean_f5_tts_tpu.models.cfm import serve_sample
        from korean_f5_tts_tpu.text.vocab import list_str_to_idx, tokenize_text

        mels, texts, durations, lens, scales = [], [], [], [], []
        for it in items:
            p = it.payload
            mel_dev, n_frames, r = self._ref_mel(p)
            mels.append(mel_dev)
            lens.append(n_frames)
            ref_text = p["ref_text"]
            if ref_text and len(ref_text[-1].encode()) == 1:
                ref_text += " "
            gen_text = p["target_text"]
            texts.append(ref_text + gen_text)
            # byte-ratio duration with the reference's short-text slowdown
            # (utils_infer.py:278-300 semantics)
            speed = 0.3 if len(gen_text.encode()) < 10 else 1.0
            ratio = len(gen_text.encode()) / max(len(ref_text.encode()), 1)
            durations.append(n_frames + int(n_frames * ratio / speed))
            scales.append(r / target_rms if 0 < r < target_rms else 1.0)

        token_lists = tokenize_text(
            texts, tokenizer_type=self.model.tokenizer_type,
            vocab=self.model.vocab_char_map,
            use_n2gk_plus=self.model.use_n2gk_plus,
            use_skip_tc=self.model.use_skip_tc,
            legacy=self.model.tokenizer_legacy,
        )
        text_ids = np.asarray(
            list_str_to_idx(token_lists, self.model.vocab_char_map or {" ": 0}))
        cond_b = mels[0] if len(mels) == 1 else jnp.concatenate(mels, axis=0)
        p0 = items[0].payload
        wav_i16, durs = serve_sample(
            self.model.params, self.model.arch, cond_b, text_ids,
            np.asarray(durations), np.asarray(lens),
            vocoder_fused=self.vocoder_fused,
            steps=int(p0.get("nfe_step", self.nfe_step)),
            cfg_strength=float(p0.get("cfg_strength", 2.0)),
            sway_sampling_coef=float(p0.get("sway_sampling_coef", -1.0)),
            seed=p0.get("seed"),
            wav_scale=np.asarray(scales, np.float32),
            max_duration=self.max_duration,
        )
        wav_np = np.asarray(wav_i16)  # ONE readback, int16 (half the f32 bytes)
        for i, it in enumerate(items):
            lo = int(lens[i]) * hop_length
            hi = int(durs[i]) * hop_length
            w = wav_np[i, lo:hi]
            if w.size == 0:
                w = np.zeros(hop_length, np.int16)
            it.result = (w, target_sample_rate)
            self.stats["requests"] += 1

    def _synthesize_batch(self, items: list[_Pending], bucket: int) -> None:
        """True batched synthesis: one cfm_sample over the whole batch with
        per-item lens/durations (the role Triton's dynamic batcher + batched
        TRT engine played). Single-chunk texts only; long texts fall back to
        the chunked per-item path."""
        import jax.numpy as jnp

        from korean_f5_tts_tpu.infer.utils_infer import hop_length, target_rms, target_sample_rate
        from korean_f5_tts_tpu.models.cfm import cfm_sample
        from korean_f5_tts_tpu.text.vocab import list_str_to_idx, tokenize_text
        from korean_f5_tts_tpu.utils import audio as au

        mels, texts, durations, rms_vals = [], [], [], []
        for it in items:
            p = it.payload
            wav = au.to_mono(np.asarray(p["ref_wav"], np.float32))
            r = au.rms(wav)
            rms_vals.append(r)
            if 0 < r < target_rms:
                wav = wav * (target_rms / r)
            if p["sr"] != target_sample_rate:
                wav = au.resample(wav, p["sr"], target_sample_rate)
            # cap the reference at 12 s (the reference preprocessing's clip,
            # utils_infer.py:388-415): an unclipped long ref would otherwise
            # leave no frame budget for generation under max_duration and
            # drive gen_len negative (found by a 60 s-ref serving drive)
            wav = wav[: 12 * target_sample_rate]
            mel = self.model.mel_of_wav(wav)
            mels.append(mel)
            ref_text = p["ref_text"]
            if ref_text and len(ref_text[-1].encode()) == 1:
                ref_text += " "
            texts.append(ref_text + p["target_text"])
            ref_len = mel.shape[0]
            ratio = len(p["target_text"].encode()) / max(len(ref_text.encode()), 1)
            durations.append(ref_len + int(ref_len * ratio))

        d = self.model.mel.n_mel_channels
        max_ref = max(m.shape[0] for m in mels)
        cond = np.zeros((len(items), max_ref, d), np.float32)
        for i, m in enumerate(mels):
            cond[i, : m.shape[0]] = m
        lens = np.array([m.shape[0] for m in mels])
        token_lists = tokenize_text(
            texts, tokenizer_type=self.model.tokenizer_type,
            vocab=self.model.vocab_char_map,
            use_n2gk_plus=self.model.use_n2gk_plus,
            use_skip_tc=self.model.use_skip_tc,
        )
        text_ids = list_str_to_idx(token_lists, self.model.vocab_char_map or {" ": 0})
        # mirror cfm_sample's internal duration floor/clamp (cfm.py:135-139)
        # so the gen_lens slices below agree with what was actually generated
        # (unclamped host estimates used to over-slice -> broadcast error)
        max_duration = self.max_duration
        text_lens = np.asarray((np.asarray(text_ids) != -1).sum(axis=-1))
        durations = np.maximum(np.maximum(text_lens, lens) + 1,
                               np.asarray(durations))
        durations = np.clip(durations, None, max_duration)
        # the batch key guarantees uniform sampling params (see _batch_key)
        p0 = items[0].payload
        out, wav_full = cfm_sample(
            self.model.params, self.model.arch, cond, text_ids,
            np.array(durations), lens=lens,
            steps=int(p0.get("nfe_step", self.nfe_step)),
            cfg_strength=float(p0.get("cfg_strength", 2.0)),
            sway_sampling_coef=float(p0.get("sway_sampling_coef", -1.0)),
            seed=p0.get("seed"),
            max_duration=max_duration,
            vocoder_fused=self.vocoder_fused,
        )
        out = np.asarray(out, np.float32)
        gen_lens = np.array([durations[i] - lens[i] for i in range(len(items))])
        wavs: list[np.ndarray | None] = [None] * len(items)
        if self.vocoder_fused is not None:
            # fused path: the whole batch's wav came back with the mel in one
            # program; slice each item's generated region by sample offsets
            wav_full = np.asarray(wav_full, np.float32)
            for i in range(len(items)):
                if gen_lens[i] > 0:
                    # slice duration*hop samples: consistent with
                    # infer_batch_process and the reference
                    # (utils_infer.py:321); round-3 ADVICE — the earlier
                    # (duration-1)*hop dropped the final ~10.7 ms frame
                    wavs[i] = wav_full[i, int(lens[i]) * hop_length:
                                       int(durations[i]) * hop_length]
        elif self.vocoder is not None and gen_lens.max(initial=0) > 1:
            # two-program fallback (external vocoder callable): pad every
            # item's generated mel to one 256-frame-bucketed static length and
            # decode in a single call. Per-item decode at exact lengths would
            # compile a fresh Vocos graph for every novel length. Pad frames
            # replicate the final frame; each wav is sliced per item.
            d_mel = out.shape[-1]
            voc_len = max(256, int(-(-int(gen_lens.max()) // 256)) * 256)
            genb = np.zeros((len(items), d_mel, voc_len), np.float32)
            for i in range(len(items)):
                if gen_lens[i] > 0:
                    g = out[i, lens[i]: durations[i], :].T
                    genb[i, :, : gen_lens[i]] = g
                    # replicate the final frame into the pad: zeros are loud
                    # in log-mel space and would bleed into the sliced tail
                    genb[i, :, gen_lens[i]:] = g[:, -1:]
            wavb = np.asarray(self.vocoder(jnp.asarray(genb)))
            wavb = wavb.reshape(len(items), -1)
            for i in range(len(items)):
                # gen_lens*hop samples, matching the fused path and
                # infer_batch_process (round-3 ADVICE final-frame fix)
                wavs[i] = wavb[i, : int(gen_lens[i]) * hop_length]
        for i, it in enumerate(items):
            wav = wavs[i]
            if wav is None or wav.size == 0:
                wav = np.zeros(max(int(gen_lens[i]), 1) * hop_length, np.float32)
            if 0 < rms_vals[i] < target_rms:
                wav = wav * (rms_vals[i] / target_rms)
            it.result = (wav, target_sample_rate)
            self.stats["requests"] += 1

    def _synthesize(self, p: dict) -> tuple[np.ndarray, int]:
        ref_wav, sr = p["ref_wav"], p["sr"]
        gen = next(infer_batch_process(
            (ref_wav, sr), p["ref_text"], [p["target_text"]], self.model,
            self.vocoder,
            nfe_step=int(p.get("nfe_step", self.nfe_step)),
            cfg_strength=float(p.get("cfg_strength", 2.0)),
            sway_sampling_coef=float(p.get("sway_sampling_coef", -1.0)),
            seed=p.get("seed"),
            vocoder_fused=self.vocoder_fused,
        ))
        wav, sr_out = gen[0], 24_000
        self.stats["requests"] += 1
        return wav, sr_out


def _wav_bytes(wav: np.ndarray, sr: int) -> bytes:
    from scipy.io import wavfile

    wav = np.asarray(wav)
    buf = io.BytesIO()
    # the fast path already quantized to int16 in-graph; legacy paths are f32
    wavfile.write(buf, sr, wav if wav.dtype == np.int16 else f32_to_i16(wav))
    return buf.getvalue()


def make_handler(service: TTSService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path == "/health":
                body = json.dumps({"status": "ok"}).encode()
            elif self.path == "/stats":
                lat = service.stats["latency_ms"]
                body = json.dumps({
                    "requests": service.stats["requests"],
                    "batches": service.stats["batches"],
                    "avg_batch_size": float(np.mean(service.stats["batch_sizes"]))
                    if service.stats["batch_sizes"] else 0.0,
                    "latency_ms_p50": float(np.percentile(lat, 50)) if lat else None,
                    "latency_ms_p95": float(np.percentile(lat, 95)) if lat else None,
                    "native_batcher": service.batcher.is_native,
                }).encode()
            else:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/tts":
                self.send_error(404)
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                wav_bytes = base64.b64decode(req["reference_audio"])
                from scipy.io import wavfile as _wf

                sr, data = _wf.read(io.BytesIO(wav_bytes))
                if data.dtype == np.int16:
                    data = data.astype(np.float32) / 32768.0
                ref_wav = to_mono(data.T if data.ndim == 2 else data)
                payload = {
                    "ref_wav": np.asarray(ref_wav, np.float32),
                    "sr": int(sr),
                    "ref_text": req["reference_text"],
                    "target_text": req["target_text"],
                    "nfe_step": req.get("nfe_step", service.nfe_step),
                    "cfg_strength": req.get("cfg_strength", 2.0),
                    "sway_sampling_coef": req.get("sway_sampling_coef", -1.0),
                    "seed": req.get("seed"),
                }
                # duration estimate for bucketing (byte-length ratio heuristic)
                ref_frames = len(ref_wav) / sr * 24000 / 256
                ratio = len(req["target_text"].encode()) / max(
                    len(req["reference_text"].encode()), 1)
                payload["_duration_frames"] = int(ref_frames * (1 + ratio))
                item = service.submit(payload)
                if not item.event.wait(timeout=600):
                    raise TimeoutError("synthesis timed out")
                if item.error:
                    if "ServiceShuttingDown" in item.error:
                        raise ServiceShuttingDown(item.error)
                    raise RuntimeError(item.error)
                wav, sr_out = item.result
                body = _wav_bytes(wav, sr_out)
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:
                # overload / lifecycle conditions get their proper statuses
                # (Triton queue-policy parity: reject, don't queue forever)
                status = (429 if isinstance(e, ServiceOverloaded) else
                          400 if isinstance(e, RequestTooLong) else
                          503 if isinstance(e, ServiceShuttingDown) else
                          504 if isinstance(e, TimeoutError) else 500)
                msg = json.dumps({"error": repr(e)}).encode()
                self.send_response(status)
                if status == 429:
                    self.send_header("Retry-After", "1")
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(msg)))
                self.end_headers()
                self.wfile.write(msg)

    return Handler


def warm_start(model_obj, vocoder, buckets: list[int] = (512, 1024, 1536),
               nfe_step: int = 16, batch_sizes: tuple = (1,),
               text_tokens: int = 16) -> None:
    """Precompile the sampler+vocoder for the serving duration buckets so the
    first real request doesn't pay the (minutes-long on TPU) compile.

    batch_sizes: the dynamic batcher compiles ONE graph per (batch, bucket)
    pair — under concurrency the batch path hits b=2..max_batch shapes, each
    a fresh multi-minute TPU compile mid-request unless warmed here. Warms
    the SAME graph the service dispatches: fused DiT+vocoder when the vocoder
    exposes params/vcfg (mirrors TTSService.vocoder_fused), per-item
    duration/lens arrays like _synthesize_batch.

    text_tokens: expected request token count — the compiled shape also keys
    on the 64-token text-axis bucket, so warm with a length that lands in the
    same bucket as real traffic (chars ≈ tokens for the char tokenizer)."""
    import jax.numpy as jnp

    from korean_f5_tts_tpu.models.cfm import cfm_sample

    fused = ((vocoder.params, vocoder.vcfg)
             if vocoder is not None and hasattr(vocoder, "params")
             and hasattr(vocoder, "vcfg") else None)
    d = model_obj.mel.n_mel_channels
    if fused is not None:
        # warm the graphs the fast path actually dispatches: the jitted mel
        # front-end (one shape per ref wav bucket) and serve_sample's fused
        # program per (batch, duration bucket)
        from korean_f5_tts_tpu.models.cfm import serve_sample

        hop = model_obj.mel.hop_length
        for f_b in model_obj.REF_FRAME_BUCKETS:
            dev, _ = model_obj.mel_of_wav_device(
                np.zeros((f_b - 1) * hop, np.float32))
        float(jnp.abs(dev).sum())
        print(f"warmed mel front-end buckets {model_obj.REF_FRAME_BUCKETS}")
        bc = model_obj.REF_FRAME_BUCKETS[-1]
        for n in buckets:
            for b in batch_sizes:
                cond = jnp.zeros((b, bc, d), jnp.float32)
                text = np.zeros((b, max(1, text_tokens)), np.int32)
                lens = np.full((b,), min(256, n // 2), np.int64)
                dur = np.full(
                    (b,), max(n - 64, int(lens[0]) + 2, text_tokens + 2),
                    np.int64)
                wav, _ = serve_sample(
                    model_obj.params, model_obj.arch, cond, text, dur, lens,
                    vocoder_fused=fused, steps=nfe_step, cfg_strength=2.0,
                    sway_sampling_coef=-1.0, seed=0, duration_bucket=n)
                np.asarray(wav)
                print(f"warmed serve bucket {n} batch {b}")
        return
    for n in buckets:
        for b in batch_sizes:
            cond = np.zeros((b, min(256, n // 2), d), np.float32)
            text = np.zeros((b, max(1, text_tokens)), np.int32)
            lens = np.full((b,), cond.shape[1], np.int64)
            # duration strictly below the bucket: real requests almost never
            # land exactly on N, and max_dur < N is what instantiates the
            # bucket-tail pad_mask — duration == N would warm the (rare)
            # unmasked graph variant instead of the one traffic hits
            dur = max(n - 64, cond.shape[1] + 2, text_tokens + 2)
            out, wav = cfm_sample(
                model_obj.params, model_obj.arch, cond, text,
                duration=np.full((b,), dur, np.int64), lens=lens,
                steps=nfe_step, cfg_strength=2.0,
                sway_sampling_coef=-1.0, seed=0, duration_bucket=n,
                vocoder_fused=fused)
            if fused is not None:
                float(jnp.abs(wav).sum())
            elif vocoder is not None:
                float(jnp.abs(vocoder(jnp.swapaxes(out, 1, 2))).sum())
            print(f"warmed bucket {n} batch {b}")
    if vocoder is not None:
        # the batch path decodes generated mels at 256-frame-bucketed
        # lengths; warm every multiple the largest sampler bucket can hit
        for vn in range(256, max(buckets) + 1, 256):
            float(jnp.abs(vocoder(jnp.zeros((1, d, vn), np.float32))).sum())
        print(f"warmed vocoder lengths 256..{max(buckets)}")


def serve(model_obj, vocoder, host: str = "0.0.0.0", port: int = 8000,
          max_batch: int = 8, max_wait_us: int = 5_000, nfe_step: int = 16,
          max_queue: int = 64, strict_max_duration: bool = False):
    service = TTSService(model_obj, vocoder, max_batch=max_batch,
                         max_wait_us=max_wait_us, nfe_step=nfe_step,
                         max_queue=max_queue,
                         strict_max_duration=strict_max_duration)
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    print(f"serving on {host}:{port} (native batcher: {service.batcher.is_native})")
    return httpd, service


def main(argv=None):
    parser = argparse.ArgumentParser(prog="f5-tts_server")
    parser.add_argument("--model", default="F5TTS_v1_Base")
    parser.add_argument("--model_cfg", default=None)
    parser.add_argument("--ckpt_file", default=None)
    parser.add_argument("--vocab_file", default=None)
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--max_batch", type=int, default=8)
    parser.add_argument("--max_wait_us", type=int, default=5000)
    parser.add_argument("--nfe_step", type=int, default=16)
    parser.add_argument("--tokenizer", default=None)
    parser.add_argument("--device", default=None)
    parser.add_argument("--warm_buckets", type=int, nargs="*", default=[1024],
                        help="precompile these duration buckets before serving")
    parser.add_argument("--warm_batch_sizes", type=int, nargs="*", default=[1],
                        help="precompile these batch sizes per bucket (the "
                             "batcher forms one graph per (batch, bucket))")
    parser.add_argument("--warm_text_tokens", type=int, default=16,
                        help="token count used for warm graphs; pick the "
                             "64-token bucket real traffic lands in")
    parser.add_argument("--max_queue", type=int, default=64,
                        help="in-flight request cap; beyond it /tts returns "
                             "429 (Triton queue-policy role)")
    parser.add_argument("--strict_max_duration", action="store_true",
                        help="reject (400) requests whose duration estimate "
                             "exceeds max_duration instead of clamping")
    args = parser.parse_args(argv)
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    from korean_f5_tts_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    from korean_f5_tts_tpu.api import load_vocoder
    from korean_f5_tts_tpu.config import load_model_config, preset_model_config
    from korean_f5_tts_tpu.infer.model import load_model

    model_cfg = (load_model_config(args.model_cfg) if args.model_cfg
                 else preset_model_config(args.model))
    model_obj = load_model(model_cfg, ckpt_path=args.ckpt_file,
                           vocab_file=args.vocab_file, tokenizer=args.tokenizer)
    vocoder = load_vocoder("vocos")
    if args.warm_buckets:
        warm_start(model_obj, vocoder, args.warm_buckets, args.nfe_step,
                   batch_sizes=tuple(args.warm_batch_sizes),
                   text_tokens=args.warm_text_tokens)
    httpd, service = serve(model_obj, vocoder, port=args.port,
                           max_batch=args.max_batch,
                           max_wait_us=args.max_wait_us,
                           nfe_step=args.nfe_step, max_queue=args.max_queue,
                           strict_max_duration=args.strict_max_duration)
    # SIGTERM/SIGINT: stop accepting, drain in-flight requests, then exit
    import signal

    def _graceful(signum, frame):
        print(f"signal {signum}: draining in-flight requests ...")
        threading.Thread(target=httpd.shutdown, daemon=True).start()
        service.shutdown(drain=True, timeout=60.0)

    signal.signal(signal.SIGTERM, _graceful)
    signal.signal(signal.SIGINT, _graceful)
    httpd.serve_forever()
    service.shutdown(drain=True, timeout=60.0)
    print("server stopped")


if __name__ == "__main__":
    main()
