"""Training throughput benchmark: mel frames/s/chip on the flagship DiT.

Round-2 baseline: 30,087 frames/s (bf16, per-block FULL remat, batch 8 x 1200
frames, AdamW+EMA). Reference trains 38,400 frames/GPU/step
(/root/reference/src/f5_tts/configs/F5TTS_Base.yaml:5-9).

Usage (real TPU; nothing CPU-heavy in parallel or timings corrupt):
    python -u scripts/bench_train.py --remat full
    python -u scripts/bench_train.py --remat dots    # selective: keep dots
    python -u scripts/bench_train.py --remat none    # no remat (OOM risk)
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

from korean_f5_tts_tpu.config import CFMConfig, DiTConfig  # noqa: E402
from korean_f5_tts_tpu.models.dit import init_dit  # noqa: E402
from korean_f5_tts_tpu.train.step import (  # noqa: E402
    init_train_state,
    make_optimizer,
    train_step,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--remat", default="full", choices=["full", "dots", "none"])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--frames", type=int, default=1200)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--fence_every", type=int, default=5,
                   help="host readbacks per this many steps: each fence "
                        "embeds a ~30 ms relay roundtrip with run-to-run "
                        "jitter, so amortise it over several async-dispatched "
                        "steps for a stable per-step number")
    p.add_argument("--device", default=None)
    args = p.parse_args()
    if args.device:
        jax.config.update("jax_platforms", args.device)

    cfg = DiTConfig(dim=1024, depth=22, heads=16, ff_mult=2, text_dim=512,
                    conv_layers=4, text_num_embeds=2545,
                    checkpoint_activations=args.remat != "none",
                    remat_policy=args.remat if args.remat != "none" else "full")
    params = init_dit(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer()
    state = init_train_state(params, opt, use_ema=True)
    rng = np.random.default_rng(0)
    b, n = args.batch, args.frames
    # mirror collate_batch: mel padded to a 128-multiple (flash fwd+bwd
    # kernel eligibility), lens = the true frame count; throughput is
    # reported on VALID frames only
    n_pad = ((n + 127) // 128) * 128
    batch = {
        "mel": jnp.asarray(rng.standard_normal((b, n_pad, 100)).astype(np.float32)),
        "text": jnp.asarray(rng.integers(1, 2545, (b, 256)).astype(np.int32)),
        "lens": jnp.asarray(np.full((b,), n, dtype=np.int32)),
    }
    cfm = CFMConfig()

    def step(state, i):
        return train_step(state, batch, jax.random.PRNGKey(i), cfg, opt, cfm,
                          compute_dtype=jnp.bfloat16)

    state, loss = step(state, 0)
    # host scalar readback = the only reliable fence through the relay
    float(loss)
    fe = max(1, args.fence_every)
    t0 = time.perf_counter()
    done = 0
    i = 0
    while done < args.iters:
        burst = min(fe, args.iters - done)
        for _ in range(burst):  # async dispatch; device runs back-to-back
            i += 1
            state, loss = step(state, i)
        float(loss)
        done += burst
    dt = (time.perf_counter() - t0) / args.iters
    frames_per_s = b * n / dt
    print(json.dumps({
        "remat": args.remat, "batch": b, "frames": n,
        "ms_per_step": dt * 1e3, "frames_per_s": frames_per_s,
        "vs_round2_30087": frames_per_s / 30_087.0,
    }))


if __name__ == "__main__":
    main()
