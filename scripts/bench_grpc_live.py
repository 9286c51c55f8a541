"""Live load-gen for the REAL Triton predict-v2 protobuf gRPC path.

Round-4 verdict item: the proto wire codec was round-trip-tested on CPU tiny
models only; this drives the production server (TPU) through
`TritonGrpcClient` — the same named-tensor contract the reference's
`runtime/triton_trtllm/client_grpc.py:227-307` speaks — and records latency
percentiles for LATENCY_r05.json.

Usage (server first, then this):
    F5_TTS_INT8=1 python -u -m korean_f5_tts_tpu.serving.grpc_server \
        --port 8801 --warm_buckets 1024 &
    python -u scripts/bench_grpc_live.py --target localhost:8801 --n 12

Protocol discipline (CLAUDE.md): the gRPC wire null (ServerReady round trip)
is measured IN-RUN; the TPU relay tax is embedded server-side and varies by
phase, so through-wire numbers are only comparable to same-run baselines.
"""

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--target", default="localhost:8801")
    p.add_argument("--n", type=int, default=12)
    p.add_argument("--warm", type=int, default=2,
                   help="unrecorded warm requests first (compile/populate)")
    p.add_argument("--ref_seconds", type=float, default=4.8)
    p.add_argument("--ref_text", default="이것은 참조 음성의 전사 텍스트입니다.")
    p.add_argument("--target_text",
                   default="안녕하세요, 프로토버프 지연 시간 측정을 위한 문장입니다.")
    p.add_argument("--out", default=None, help="write/merge into this JSON")
    p.add_argument("--key", default="grpc_proto_live")
    args = p.parse_args()

    from korean_f5_tts_tpu.serving.grpc_server import TritonGrpcClient

    # synthetic mono reference at the protocol's 24 kHz (the reference client
    # resamples before building the FP32 tensor; client_grpc.py load_audio)
    rng = np.random.default_rng(0)
    t = np.arange(int(args.ref_seconds * 24000), dtype=np.float32) / 24000.0
    ref_wav = (0.2 * np.sin(2 * np.pi * 220.0 * t)
               + 0.02 * rng.standard_normal(t.shape)).astype(np.float32)

    client = TritonGrpcClient(args.target)
    assert client.ready(), "server not ready"

    # in-run wire null: same channel, no TPU work
    nulls = []
    for _ in range(20):
        t0 = time.perf_counter()
        client.ready()
        nulls.append(time.perf_counter() - t0)
    null_ms = float(np.percentile(np.asarray(nulls) * 1e3, 50))

    for i in range(args.warm):
        wav, _ = client.synthesize(ref_wav, args.ref_text, args.target_text,
                                   request_id=f"warm{i}")
        print(f"warm {i}: {len(wav) / 24000:.2f} s audio")

    lats, secs = [], []
    for i in range(args.n):
        t0 = time.perf_counter()
        wav, sr = client.synthesize(ref_wav, args.ref_text, args.target_text,
                                    request_id=str(i))
        dt = time.perf_counter() - t0
        lats.append(dt)
        secs.append(len(wav) / sr)
        print(f"req {i}: {dt * 1e3:.1f} ms for {secs[-1]:.2f} s audio")

    lat = np.asarray(lats) * 1e3
    gen_s = float(np.median(secs))
    rec = {
        "protocol": "TritonGrpcClient.synthesize -> inference."
                    "GRPCInferenceService/ModelInfer (real proto3 wire bytes,"
                    " serving/proto.py codec), sequential c1",
        "n_items": args.n,
        "gen_seconds": gen_s,
        "latency_p50_ms": float(np.percentile(lat, 50)),
        "latency_p95_ms": float(np.percentile(lat, 95)),
        "latency_avg_ms": float(lat.mean()),
        "grpc_wire_null_ms": null_ms,
        "rtf_p50": float(np.percentile(lat, 50) / 1e3 / max(gen_s, 1e-9)),
        "reference_l20_avg_ms": 253.0,
        "note": "through-relay end-to-end (proto decode + batcher + TPU + "
                "proto encode); relay tax embedded server-side — compare "
                "only within-run (CLAUDE.md relay-phase caveat)",
    }
    print(json.dumps(rec, indent=1, sort_keys=True))
    if args.out:
        try:
            with open(args.out) as f:
                doc = json.load(f)
        except FileNotFoundError:
            doc = {}
        doc[args.key] = rec
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        print(f"wrote {args.out}[{args.key}]")


if __name__ == "__main__":
    main()
