"""Training-throughput benchmark: frames/second of the jitted train step.

Counterpart to the reference's pretraining scale numbers (BASELINE.md:
8 GPUs x 38,400 frames per update on A100-class). Reports frames/s for one
chip (or the current mesh) at a given per-step frame budget, bf16 or fp32.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=9_600,
                   help="frames per step (24GB-GPU finetune budget = 9600)")
    p.add_argument("--seq_len", type=int, default=1_200)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--remat", action="store_true", default=True,
                   help="activation checkpointing per DiT block (needed to fit "
                        "large frame budgets in 16GB HBM)")
    p.add_argument("--no-remat", dest="remat", action="store_false")
    p.add_argument("--no-ema", dest="ema", action="store_false", default=True)
    p.add_argument("--device", default=None)
    p.add_argument("--io_overlap", action="store_true",
                   help="also measure input-pipeline overlap: step time with "
                        "synchronous host wav->mel vs the trainer prefetcher")
    args = p.parse_args(argv)
    import jax
    import jax.numpy as jnp

    if args.device:
        jax.config.update("jax_platforms", args.device)

    from korean_f5_tts_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    from korean_f5_tts_tpu.config import CFMConfig, DiTConfig
    from korean_f5_tts_tpu.models.dit import init_dit
    from korean_f5_tts_tpu.train.step import init_train_state, make_optimizer, train_step

    batch = max(args.frames // args.seq_len, 1)
    arch = DiTConfig(dim=1024, depth=22, heads=16, ff_mult=2, text_dim=512,
                     conv_layers=4, text_num_embeds=2545,
                     checkpoint_activations=args.remat)
    params = init_dit(jax.random.PRNGKey(0), arch)
    opt = make_optimizer()
    state = init_train_state(params, opt, use_ema=args.ema)
    rng = np.random.default_rng(0)
    data = {
        "mel": jnp.asarray(rng.standard_normal((batch, args.seq_len, 100))
                           .astype(np.float32)),
        "text": jnp.asarray(rng.integers(1, 2545, (batch, 256)).astype(np.int32)),
        "lens": jnp.asarray(np.full((batch,), args.seq_len, np.int32)),
    }
    dtype = jnp.bfloat16 if args.bf16 else None

    state, loss = train_step(state, data, jax.random.PRNGKey(1), arch, opt,
                             CFMConfig(), compute_dtype=dtype)
    float(loss)  # fence (relay block_until_ready doesn't synchronise)

    t0 = time.perf_counter()
    losses = []
    for i in range(args.iters):
        state, loss = train_step(state, data, jax.random.PRNGKey(i), arch, opt,
                                 CFMConfig(), compute_dtype=dtype)
        losses.append(loss)
    for l in losses:
        float(l)
    dt = (time.perf_counter() - t0) / args.iters
    frames = batch * args.seq_len
    result = {
        "metric": "train_frames_per_s",
        "value": round(frames / dt, 1),
        "unit": f"mel frames/s per chip (batch {batch} x {args.seq_len}, "
                f"{'bf16' if args.bf16 else 'fp32'})",
        "step_ms": round(dt * 1e3, 1),
    }

    if args.io_overlap:
        # input-pipeline overlap check: emulate per-step host work (wav->mel
        # for the whole batch) and measure the step time with and without the
        # trainer's _Prefetcher thread hiding it behind the device step
        from korean_f5_tts_tpu.ops.mel import MelConfig, log_mel_spectrogram
        from korean_f5_tts_tpu.train.trainer import _Prefetcher

        mel_cfg = MelConfig()
        wav_len = args.seq_len * mel_cfg.hop_length
        host_wavs = rng.standard_normal((batch, wav_len)).astype(np.float32)

        def host_prep():
            # the expensive host-side path a real epoch pays per step
            return np.asarray(log_mel_spectrogram(jnp.asarray(host_wavs), mel_cfg))

        def timed_epoch(prefetch: bool, steps: int = 4) -> float:
            gen = (host_prep() for _ in range(steps))
            stream = _Prefetcher(gen, depth=2) if prefetch else gen
            t0 = time.perf_counter()
            pend = []
            st = state
            for _ in stream:
                st, l = train_step(st, data, jax.random.PRNGKey(2), arch, opt,
                                   CFMConfig(), compute_dtype=dtype)
                pend.append(l)
            for l in pend:
                float(l)
            return (time.perf_counter() - t0) / steps

        sync_ms = timed_epoch(False) * 1e3
        overlap_ms = timed_epoch(True) * 1e3
        result["io_sync_step_ms"] = round(sync_ms, 1)
        result["io_prefetch_step_ms"] = round(overlap_ms, 1)
        result["io_overlap_gain"] = round(sync_ms / max(overlap_ms, 1e-9), 3)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
