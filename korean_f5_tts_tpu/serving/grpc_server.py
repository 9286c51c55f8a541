"""gRPC TTS service + load-gen client.

Parity with reference `runtime/triton_trtllm/client_grpc.py` (async gRPC
load generator with latency percentiles and server-stat scrape) and the
Triton gRPC endpoint it talks to. TWO protocols are served:

1. `inference.GRPCInferenceService` — the REAL Triton predict-v2 protobuf
   contract the reference client speaks (named tensors reference_wav FP32,
   reference_wav_len INT32, reference_text/target_text BYTES -> waveform
   FP32; client_grpc.py:273-295). Messages are true proto3 wire bytes,
   encoded/decoded by serving/proto.py (hand-rolled codec; grpcio-tools
   isn't in the image for stub codegen).
2. `f5tts.TTS` — a JSON-bodied convenience service (kept as fallback).
"""

from __future__ import annotations

import argparse
import base64
import concurrent.futures
import json
import time

import numpy as np

_SERVICE = "f5tts.TTS"


def _submit_mapped(service, payload, context, grpc):
    """submit() with overload conditions mapped to gRPC status codes
    (Triton queue-policy parity; see serving/server.py exceptions)."""
    from korean_f5_tts_tpu.serving.server import (
        RequestTooLong,
        ServiceOverloaded,
        ServiceShuttingDown,
    )

    try:
        return service.submit(payload)
    except ServiceOverloaded as e:
        context.abort(grpc.StatusCode.RESOURCE_EXHAUSTED, str(e))
    except RequestTooLong as e:
        context.abort(grpc.StatusCode.INVALID_ARGUMENT, str(e))
    except ServiceShuttingDown as e:
        context.abort(grpc.StatusCode.UNAVAILABLE, str(e))


def _estimate_frames(ref_wav, sr: int, ref_text: str, target_text: str) -> int:
    """Byte-ratio duration estimate for bucketing/overload gating — the same
    heuristic the HTTP frontend applies (server.py:525-528); a hardcoded
    estimate would bucket long-text requests into a too-small shape."""
    ref_frames = len(ref_wav) / sr * 24000 / 256
    ratio = len(target_text.encode()) / max(len(ref_text.encode()), 1)
    return int(ref_frames * (1 + ratio))


def _json_ser(obj) -> bytes:
    return json.dumps(obj).encode()


def _json_de(data: bytes):
    return json.loads(data)


def make_grpc_server(service, host: str = "0.0.0.0", port: int = 8001,
                     max_workers: int = 8):
    """service: serving.server.TTSService (shared with the HTTP frontend)."""
    import io

    import grpc
    from scipy.io import wavfile

    from korean_f5_tts_tpu.serving.native import f32_to_i16
    from korean_f5_tts_tpu.utils.audio import to_mono

    def synthesize(request, context):
        wav_bytes = base64.b64decode(request["reference_audio"])
        sr, data = wavfile.read(io.BytesIO(wav_bytes))
        if data.dtype == np.int16:
            data = data.astype(np.float32) / 32768.0
        ref_wav = to_mono(data.T if data.ndim == 2 else data)
        payload = {
            "ref_wav": np.asarray(ref_wav, np.float32),
            "sr": int(sr),
            "ref_text": request["reference_text"],
            "target_text": request["target_text"],
            "nfe_step": request.get("nfe_step", 16),
            "cfg_strength": request.get("cfg_strength", 2.0),
            "sway_sampling_coef": request.get("sway_sampling_coef", -1.0),
            "seed": request.get("seed"),
            "_duration_frames": _estimate_frames(
                ref_wav, int(sr), request["reference_text"],
                request["target_text"]),
        }
        item = _submit_mapped(service, payload, context, grpc)
        if not item.event.wait(timeout=600):
            context.abort(grpc.StatusCode.DEADLINE_EXCEEDED, "synthesis timeout")
        if item.error:
            context.abort(grpc.StatusCode.INTERNAL, item.error)
        wav, out_sr = item.result
        buf = io.BytesIO()
        wavfile.write(buf, out_sr, f32_to_i16(wav))
        return {"audio": base64.b64encode(buf.getvalue()).decode(),
                "sample_rate": out_sr}

    def health(request, context):
        return {"status": "ok"}

    handlers = grpc.method_handlers_generic_handler(
        _SERVICE,
        {
            "Synthesize": grpc.unary_unary_rpc_method_handler(
                synthesize, request_deserializer=_json_de, response_serializer=_json_ser
            ),
            "Health": grpc.unary_unary_rpc_method_handler(
                health, request_deserializer=_json_de, response_serializer=_json_ser
            ),
        },
    )

    # --- Triton predict-v2 protocol (real protobuf wire format) ---
    from korean_f5_tts_tpu.serving import proto as pb

    def model_infer(request_bytes: bytes, context):
        req = pb.decode_model_infer_request(request_bytes)
        ins = req["inputs"]
        try:
            ref_wav = np.asarray(ins["reference_wav"], np.float32).reshape(-1)
            if "reference_wav_len" in ins:
                ref_wav = ref_wav[: int(np.asarray(
                    ins["reference_wav_len"]).reshape(-1)[0])]
            ref_text = ins["reference_text"][0].decode()
            target_text = ins["target_text"][0].decode()
        except (KeyError, IndexError) as e:
            context.abort(grpc.StatusCode.INVALID_ARGUMENT,
                          f"missing tensor: {e}")
        payload = {
            "ref_wav": ref_wav,
            "sr": 24000,  # protocol contract: client resamples to 24 kHz
            "ref_text": ref_text,
            "target_text": target_text,
            "_duration_frames": _estimate_frames(ref_wav, 24000, ref_text,
                                                 target_text),
        }
        item = _submit_mapped(service, payload, context, grpc)
        if not item.event.wait(timeout=600):
            context.abort(grpc.StatusCode.DEADLINE_EXCEEDED, "synthesis timeout")
        if item.error:
            context.abort(grpc.StatusCode.INTERNAL, item.error)
        wav, out_sr = item.result
        out = pb.InferTensor("waveform", "FP32", (1, len(wav)),
                             np.asarray(wav, np.float32))
        return pb.encode_model_infer_response(
            req["model_name"] or "f5_tts", [out], request_id=req["id"])

    def server_ready(request_bytes: bytes, context):
        return pb.encode_ready_response(True)

    _ident = lambda b: b  # raw bytes in/out; proto.py does the (de)framing
    triton_handlers = grpc.method_handlers_generic_handler(
        "inference.GRPCInferenceService",
        {
            "ModelInfer": grpc.unary_unary_rpc_method_handler(
                model_infer, request_deserializer=_ident,
                response_serializer=_ident),
            "ServerReady": grpc.unary_unary_rpc_method_handler(
                server_ready, request_deserializer=_ident,
                response_serializer=_ident),
            "ServerLive": grpc.unary_unary_rpc_method_handler(
                server_ready, request_deserializer=_ident,
                response_serializer=_ident),
        },
    )
    server = grpc.server(
        concurrent.futures.ThreadPoolExecutor(max_workers=max_workers)
    )
    server.add_generic_rpc_handlers((handlers, triton_handlers))
    server.add_insecure_port(f"{host}:{port}")
    return server


class TritonGrpcClient:
    """Client speaking the REAL Triton protobuf protocol (the reference's
    client_grpc.py tensor contract), via the hand-rolled proto3 codec."""

    def __init__(self, target: str = "localhost:8001",
                 model_name: str = "f5_tts"):
        import grpc

        from korean_f5_tts_tpu.serving import proto as pb

        self._pb = pb
        self.model_name = model_name
        self.channel = grpc.insecure_channel(target)
        ident = lambda b: b
        self._infer = self.channel.unary_unary(
            "/inference.GRPCInferenceService/ModelInfer",
            request_serializer=ident, response_deserializer=ident)
        self._ready = self.channel.unary_unary(
            "/inference.GRPCInferenceService/ServerReady",
            request_serializer=ident, response_deserializer=ident)

    def ready(self) -> bool:
        return self._pb.decode_ready_response(self._ready(b""))

    def synthesize(self, ref_wav: "np.ndarray", ref_text: str,
                   target_text: str, request_id: str = "1"):
        """ref_wav: float32 mono at 24 kHz (client resamples, as the
        reference's load_audio does). Returns (waveform float32, 24000)."""
        pb = self._pb
        samples = np.asarray(ref_wav, np.float32).reshape(1, -1)
        lengths = np.array([[samples.shape[1]]], dtype=np.int32)
        inputs = [
            pb.InferTensor("reference_wav", "FP32", samples.shape, samples),
            pb.InferTensor("reference_wav_len", "INT32", (1, 1), lengths),
            pb.InferTensor("reference_text", "BYTES", (1, 1), [ref_text]),
            pb.InferTensor("target_text", "BYTES", (1, 1), [target_text]),
        ]
        req = pb.encode_model_infer_request(
            self.model_name, inputs, outputs=["waveform"],
            request_id=request_id)
        resp = pb.decode_model_infer_response(self._infer(req))
        return np.asarray(resp["outputs"]["waveform"],
                          np.float32).reshape(-1), 24000


class GrpcTTSClient:
    def __init__(self, target: str = "localhost:8001"):
        import grpc

        self.channel = grpc.insecure_channel(target)
        self._synth = self.channel.unary_unary(
            f"/{_SERVICE}/Synthesize",
            request_serializer=_json_ser, response_deserializer=_json_de,
        )
        self._health = self.channel.unary_unary(
            f"/{_SERVICE}/Health",
            request_serializer=_json_ser, response_deserializer=_json_de,
        )

    def health(self) -> dict:
        return self._health({})

    def synthesize(self, ref_wav_path: str, ref_text: str, target_text: str,
                   nfe_step: int = 16, **kw) -> tuple[bytes, int]:
        with open(ref_wav_path, "rb") as f:
            audio_b64 = base64.b64encode(f.read()).decode()
        resp = self._synth({
            "reference_audio": audio_b64,
            "reference_text": ref_text,
            "target_text": target_text,
            "nfe_step": nfe_step,
            **kw,
        })
        return base64.b64decode(resp["audio"]), resp["sample_rate"]


def load_test(target: str, requests: list[dict], concurrency: int = 2) -> dict:
    """Concurrent latency benchmark (client_grpc.py:50-104 role)."""
    client = GrpcTTSClient(target)
    latencies, audio_s = [], []

    def one(r):
        t0 = time.perf_counter()
        audio, sr = client.synthesize(**r)
        dt = time.perf_counter() - t0
        return dt, (len(audio) - 44) / 2 / sr

    with concurrent.futures.ThreadPoolExecutor(max_workers=concurrency) as ex:
        for dt, secs in ex.map(one, requests):
            latencies.append(dt)
            audio_s.append(secs)
    lat = np.asarray(latencies)
    return {
        "n": len(requests),
        "concurrency": concurrency,
        "latency_ms_avg": float(lat.mean() * 1e3),
        "latency_ms_p50": float(np.percentile(lat, 50) * 1e3),
        "latency_ms_p95": float(np.percentile(lat, 95) * 1e3),
        "rtf": float(lat.sum() / concurrency / max(sum(audio_s), 1e-9)),
    }


def main(argv=None):  # pragma: no cover - thin CLI
    p = argparse.ArgumentParser(prog="f5-tts_grpc-server")
    p.add_argument("--model", default="F5TTS_v1_Base")
    p.add_argument("--ckpt_file", default=None)
    p.add_argument("--vocab_file", default=None)
    p.add_argument("--port", type=int, default=8001)
    p.add_argument("--nfe_step", type=int, default=16)
    p.add_argument("--device", default=None)
    p.add_argument("--warm_buckets", type=int, nargs="*", default=[],
                   help="precompile these duration buckets before serving "
                        "(same semantics as the HTTP frontend's flag)")
    p.add_argument("--warm_text_tokens", type=int, default=16)
    args = p.parse_args(argv)
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    from korean_f5_tts_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    from korean_f5_tts_tpu.api import load_vocoder
    from korean_f5_tts_tpu.config import preset_model_config
    from korean_f5_tts_tpu.infer.model import load_model
    from korean_f5_tts_tpu.serving.server import TTSService

    model_obj = load_model(preset_model_config(args.model), ckpt_path=args.ckpt_file,
                           vocab_file=args.vocab_file)
    vocoder = load_vocoder("vocos")
    if args.warm_buckets:
        from korean_f5_tts_tpu.serving.server import warm_start

        warm_start(model_obj, vocoder, args.warm_buckets, args.nfe_step,
                   text_tokens=args.warm_text_tokens)
    service = TTSService(model_obj, vocoder, nfe_step=args.nfe_step)
    server = make_grpc_server(service, port=args.port)
    server.start()
    print(f"gRPC serving on :{args.port}")
    server.wait_for_termination()


if __name__ == "__main__":
    main()
