"""Mixed-duration batch synthesis benchmark (wall s per generated audio s).

Round-2 finding: batch-4 with durations 50-100% of the bucket measured
0.0389 wall/generated-s — bucket padding ate nearly all the batching win
vs the 0.0394 L20 baseline. cfm_sample(split_by_bucket=True) regroups the
batch so each item runs at its own duration bucket; this script measures
both paths through the REAL cfm_sample host wrapper (reference protocol:
eval batch synthesis, /root/reference/src/f5_tts/eval/utils_eval.py:95-98
duration-bucketed prompts).

Usage (real TPU, nothing CPU-heavy in parallel):
    python -u scripts/bench_mixed_batch.py            # both modes, bf16
    python -u scripts/bench_mixed_batch.py --int8
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from korean_f5_tts_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from korean_f5_tts_tpu.config import DiTConfig  # noqa: E402
from korean_f5_tts_tpu.models.cfm import cfm_sample  # noqa: E402
from korean_f5_tts_tpu.models.dit import init_dit  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--int8", action="store_true")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--device", default=None)
    args = p.parse_args()
    if args.device:
        jax.config.update("jax_platforms", args.device)

    arch = DiTConfig(dim=1024, depth=22, heads=16, ff_mult=2, text_dim=512,
                     conv_layers=4, text_num_embeds=2545)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        init_dit(jax.random.PRNGKey(0), arch))
    if args.int8:
        from korean_f5_tts_tpu.models.quant import quantize_params

        params = quantize_params(params)

    hop, sr = 256, 24_000
    b, cond_len, total_len = args.batch, 432, 1536
    rng = np.random.default_rng(0)
    cond = rng.standard_normal((b, cond_len, 100)).astype(np.float32)
    text = rng.integers(1, 2545, (b, 160)).astype(np.int32)
    # the round-2 protocol: durations 50%..100% of the max bucket
    durations = np.linspace(total_len // 2, total_len, b).astype(np.int64)
    lens = np.full((b,), cond_len, dtype=np.int64)
    gen_seconds = float((durations - cond_len).sum() * hop / sr)

    # In-run relay-null measurement (CLAUDE.md: relay turnaround swings
    # 30-45 ms run-to-run — a mixed-batch number is only comparable when the
    # SAME run records the fenced scalar roundtrip it was paying). The split
    # path embeds several such turnarounds (4 async group dispatches +
    # gather), so its absolute wall moves with relay phase; the range +
    # null make that visible in the artifact instead of a misleading point.
    null = jax.jit(lambda x: x + 1.0)
    null(jnp.zeros(()))  # compile
    null_times = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(null(jnp.zeros(())))
        null_times.append(time.perf_counter() - t0)
    relay_null_ms = round(float(np.median(null_times)) * 1e3, 1)

    results = {}
    for split in (False, True):
        def run():
            out, _ = cfm_sample(params, arch, cond, text, durations, lens=lens,
                                steps=16, cfg_strength=2.0,
                                sway_sampling_coef=-1.0, seed=0,
                                split_by_bucket=split)
            # host materialisation inside cfm_sample is the fence
            return np.asarray(out)

        run()  # compile
        per_iter = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            run()
            per_iter.append((time.perf_counter() - t0) / gen_seconds)
        results["split" if split else "joint"] = per_iter

    def stats(xs):
        return {"median": round(float(np.median(xs)), 5),
                "min": round(min(xs), 5), "max": round(max(xs), 5),
                "runs": [round(x, 5) for x in xs]}

    print(json.dumps({
        "metric": "mixed_batch_wall_per_generated_s",
        "batch": b, "durations": durations.tolist(),
        "mode": "int8" if args.int8 else "bf16",
        "joint": stats(results["joint"]),
        "split": stats(results["split"]),
        "relay_null_ms": relay_null_ms,
        "round2_baseline": 0.0389, "l20_baseline": 0.0394,
    }))


if __name__ == "__main__":
    main()
