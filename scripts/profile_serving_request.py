"""Decompose single-request serving latency into pipeline stages.

Mirrors serving/server.py _synthesize -> infer/utils_infer.infer_batch_process
stage by stage and times each with a host fence, to attribute the gap between
the in-graph RTF (bench.py ~0.022) and the served per-request latency
(bench_serving_throughput.py). Each fence itself costs a ~30 ms relay
roundtrip on TPU, so stage sums slightly overcount the un-instrumented path.

Run ON TPU: `python -u scripts/profile_serving_request.py`.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--device", default=None)
    p.add_argument("--nfe_step", type=int, default=16)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args(argv)
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    from korean_f5_tts_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from korean_f5_tts_tpu.api import load_vocoder
    from korean_f5_tts_tpu.config import preset_model_config
    from korean_f5_tts_tpu.infer.model import load_model
    from korean_f5_tts_tpu.infer.utils_infer import hop_length, target_sample_rate
    from korean_f5_tts_tpu.models.cfm import cfm_sample
    from korean_f5_tts_tpu.text.vocab import list_str_to_idx, tokenize_text

    cfg = preset_model_config("F5TTS_v1_Base")
    if args.tiny:
        import dataclasses

        cfg = dataclasses.replace(cfg, arch=dataclasses.replace(
            cfg.arch, dim=64, depth=2, heads=2, text_dim=32, conv_layers=1))
    model = load_model(cfg, compute_dtype=jnp.bfloat16)
    vocoder = load_vocoder("vocos")
    fused = (vocoder.params, vocoder.vcfg)

    sr = 24_000
    rng = np.random.default_rng(0)
    ref = (0.05 * np.sin(2 * np.pi * 220 * np.arange(int(4.6 * sr)) / sr)
           + 0.01 * rng.standard_normal(int(4.6 * sr))).astype(np.float32)
    ref_text = "the quick brown fox jumps over the lazy dog. "
    target_text = ref_text * 2

    def fence(x):
        return float(jnp.abs(x).sum())

    stages = {}

    def run_once(record):
        t = {}
        t0 = time.perf_counter()
        mel = model.mel_of_wav(ref)  # device STFT program + full readback
        t["ref_mel_ms"] = (time.perf_counter() - t0) * 1e3

        t0 = time.perf_counter()
        toks = tokenize_text([ref_text + target_text],
                             tokenizer_type=model.tokenizer_type,
                             vocab=model.vocab_char_map,
                             use_n2gk_plus=model.use_n2gk_plus,
                             use_skip_tc=model.use_skip_tc)
        text_ids = list_str_to_idx(toks, model.vocab_char_map or {" ": 0})
        t["tokenize_ms"] = (time.perf_counter() - t0) * 1e3

        ref_len = mel.shape[0]
        dur = ref_len + int(ref_len * len(target_text.encode())
                            / len(ref_text.encode()))
        t0 = time.perf_counter()
        out, wav_full = cfm_sample(
            model.params, model.arch, mel[None], text_ids, dur,
            steps=args.nfe_step, cfg_strength=2.0, sway_sampling_coef=-1.0,
            seed=0, vocoder_fused=fused)
        t["dispatch_ms"] = (time.perf_counter() - t0) * 1e3

        t0 = time.perf_counter()
        wav_np = np.asarray(wav_full, np.float32)
        t["wav_readback_ms"] = (time.perf_counter() - t0) * 1e3

        t0 = time.perf_counter()
        mel_np = np.asarray(out, np.float32)
        t["mel_readback_ms"] = (time.perf_counter() - t0) * 1e3

        t0 = time.perf_counter()
        _ = wav_np[0, ref_len * hop_length: dur * hop_length].copy()
        t["host_slice_ms"] = (time.perf_counter() - t0) * 1e3
        t["total_ms"] = sum(v for k, v in t.items() if k != "total_ms")
        if record:
            for k, v in t.items():
                stages.setdefault(k, []).append(v)
        return t, dur, ref_len

    tw, dur, ref_len = run_once(False)
    print("warmup:", json.dumps({k: round(v, 1) for k, v in tw.items()}), flush=True)
    for _ in range(args.reps):
        tr, dur, ref_len = run_once(True)
        print(json.dumps({k: round(v, 1) for k, v in tr.items()}), flush=True)
    print(json.dumps({"stage_ms_median": {k: round(float(np.median(v)), 1)
                                          for k, v in stages.items()},
                      "gen_audio_s": (dur - ref_len) * hop_length / target_sample_rate,
                      "duration_frames": dur, "protocol": "serving stage profile"}),
          flush=True)


if __name__ == "__main__":
    main()
