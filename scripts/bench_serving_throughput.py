"""Concurrent-serving throughput benchmark: flagship model behind the real
HTTP server + C++ dynamic batcher, driven by the in-repo load generator.

Role of the reference's `runtime/triton_trtllm/client_grpc.py` benchmark
(concurrency sweep against Triton; its published table is 0.0394 RTF at
concurrency 2 on L20, README.md:122-131). Here the whole stack is local:
load_model (random weights — throughput is weight-agnostic) -> warm_start
-> ThreadingHTTPServer -> load_test at each concurrency.

Run ON TPU (no --device): `python -u scripts/bench_serving_throughput.py`.
Prints one JSON line per concurrency level.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="F5TTS_v1_Base")
    p.add_argument("--nfe_step", type=int, default=16)
    p.add_argument("--n_requests", type=int, default=16)
    p.add_argument("--concurrency", type=int, nargs="*", default=[1, 2, 4])
    p.add_argument("--gen_seconds", type=float, default=10.0)
    p.add_argument("--device", default=None)
    p.add_argument("--tiny", action="store_true",
                   help="dim-64 model for CPU smoke runs")
    args = p.parse_args(argv)
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    from korean_f5_tts_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    from korean_f5_tts_tpu.api import load_vocoder
    from korean_f5_tts_tpu.config import preset_model_config
    from korean_f5_tts_tpu.infer.model import load_model
    from korean_f5_tts_tpu.serving.client import load_test
    from korean_f5_tts_tpu.serving.server import serve, warm_start
    from korean_f5_tts_tpu.utils.audio import save_wav

    import jax.numpy as jnp

    cfg = preset_model_config(args.model)
    if args.tiny:
        import dataclasses

        cfg = dataclasses.replace(cfg, arch=dataclasses.replace(
            cfg.arch, dim=64, depth=2, heads=2, text_dim=32, conv_layers=1))
    model = load_model(cfg, compute_dtype=jnp.bfloat16)
    vocoder = load_vocoder("vocos")

    # ~4.6 s reference clip + ~gen_seconds of target text puts every request
    # in one duration bucket — the batcher groups them into full batches.
    sr = 24_000
    rng = np.random.default_rng(0)
    ref = (0.05 * np.sin(2 * np.pi * 220 * np.arange(int(4.6 * sr)) / sr)
           + 0.01 * rng.standard_normal(int(4.6 * sr))).astype(np.float32)
    tmp = tempfile.mkdtemp()
    ref_path = os.path.join(tmp, "ref.wav")
    save_wav(ref_path, ref, sr)
    ref_text = "the quick brown fox jumps over the lazy dog. "
    # duration estimate scales with target/ref text length ratio
    target_text = ref_text * max(1, int(args.gen_seconds / 4.6))

    # warm every (batch, bucket, text-bucket) shape the batcher can form at
    # the swept concurrencies — an unwarmed batch shape is a multi-minute
    # mid-request TPU compile that lands in the p95 column
    warm_start(model, vocoder, buckets=(1536,), nfe_step=args.nfe_step,
               batch_sizes=tuple(range(1, max(args.concurrency) + 1)),
               text_tokens=len(ref_text + target_text))
    httpd, service = serve(model, vocoder, host="127.0.0.1", port=0,
                           max_batch=8, nfe_step=args.nfe_step)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{port}"

    reqs = [dict(ref_wav_path=ref_path, ref_text=ref_text,
                 target_text=target_text, nfe_step=args.nfe_step, seed=0)
            for _ in range(args.n_requests)]
    try:
        # one throwaway request compiles any leftover shape
        load_test(url, reqs[:1], concurrency=1)
        mode = ("int8" if os.environ.get("F5_TTS_INT8", "0") != "0"
                else "bf16")
        for c in args.concurrency:
            r = load_test(url, reqs, concurrency=c)
            r["protocol"] = ("http server + dynamic batcher, "
                             + ("tiny (smoke)" if args.tiny
                                else f"flagship {mode}"))
            print(json.dumps(r), flush=True)
    finally:
        del service
        httpd.shutdown()


if __name__ == "__main__":
    main()
