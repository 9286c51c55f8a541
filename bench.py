"""Headline benchmark: single-utterance zero-shot synthesis RTF at 16 NFE.

Protocol mirrors the reference's offline benchmark
(`runtime/triton_trtllm/benchmark.py:458-470`): DiT F5TTS Base (CFG-doubled,
16 NFE Euler) + Vocos vocoder, batch 1, measuring wall-clock per generated
audio second. Reference baselines (BASELINE.md): 0.0394 RTF client-server /
0.0402 offline TRT-LLM on an L20; north-star RTF <= 0.02 per v5e chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline = baseline_rtf / our_rtf (speedup factor vs the reference's best
published number; > 1.0 means faster than reference).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_RTF = 0.0394  # L20 Triton+TRT-LLM, concurrency 2, 16 NFE


def _wait_for_backend(max_wait_s: float = 600.0):
    """The TPU relay has transient outages (observed: minutes to hours).
    Retry backend init so a bench launched during a blip still records a
    number instead of an UNAVAILABLE traceback. Covers the fail-fast outage
    mode (UNAVAILABLE raised in ~1 s); in the hang mode jax.devices() blocks
    inside the plugin and no in-process retry can run — bound those with an
    external `timeout`."""
    import jax
    import jax.extend.backend as jex_backend

    deadline = time.time() + max_wait_s
    while True:
        try:
            return jax.devices()
        except RuntimeError as e:
            if time.time() > deadline:
                raise
            print(f"backend unavailable ({e}); retrying in 30 s", flush=True)
            time.sleep(30)
            # jax caches the failed backend; clear so the next try re-inits
            jex_backend.clear_backends()


def main():
    import os

    import jax
    import jax.numpy as jnp

    from korean_f5_tts_tpu.utils.jax_cache import enable_compilation_cache

    _wait_for_backend()
    enable_compilation_cache()

    from korean_f5_tts_tpu.config import DiTConfig
    from korean_f5_tts_tpu.models.cfm import _sample_core
    from korean_f5_tts_tpu.models.dit import init_dit
    from korean_f5_tts_tpu.models.vocos import VocosConfig, init_vocos, vocos_decode

    compute_dtype = jnp.bfloat16

    arch = DiTConfig(dim=1024, depth=22, heads=16, ff_mult=2, text_dim=512,
                     conv_layers=4, text_num_embeds=2545)
    vcfg = VocosConfig()

    key = jax.random.PRNGKey(0)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(compute_dtype) if x.dtype == jnp.float32 else x,
        init_dit(key, arch),
    )
    # int8 weight mode is the HEADLINE since round 3: it meets the <= 0.02
    # north star with quality proven against the torch oracle chain
    # (PARITY_FLAGSHIP.json: torch == fp32 at 1.7e-6 mel MAE; and
    # flagship_trained_headline_mode — the EXACT stack this bench runs,
    # int8 weights + static-max softmax, trained flagship weights, headline
    # shapes — is 0.0078 mel MAE vs fp32, under the 1e-2 north star).
    # 0 = bf16, 1 = FF-only int8, 2 = + attention linears (default).
    int8_mode = os.environ.get("F5_TTS_BENCH_INT8", "2")
    if int8_mode != "0":
        from korean_f5_tts_tpu.models.quant import quantize_params

        pats = ((r"ff/in$", r"ff/out$") if int8_mode == "1" else None)
        params = quantize_params(params, **({"patterns": pats} if pats else {}))
    voc_params = jax.tree_util.tree_map(
        lambda x: x.astype(compute_dtype) if x.dtype == jnp.float32 else x,
        init_vocos(jax.random.PRNGKey(1), vcfg),
    )

    # 10 s of generated audio conditioned on ~4.6 s of prompt (typical CLI use)
    hop, sr = 256, 24_000
    cond_len, total_len = 432, 1376  # frames; total padded by sampler bucket
    # 512-frame bucket (shared-segment splash, best measured); A/B override
    n_bucket = int(os.environ.get("F5_TTS_BENCH_BUCKET", "1536"))
    if os.environ.get("F5_TTS_BENCH_NOPAD", "0") != "0":
        # A/B: exact bucket fit -> pad_mask=None -> unmasked splash path,
        # same generated seconds (isolates the cost of masking)
        cond_len, total_len = n_bucket - (total_len - cond_len), n_bucket
    rng = np.random.default_rng(0)
    batch = int(os.environ.get("F5_TTS_BENCH_BATCH", "1"))

    cond = jnp.asarray(rng.standard_normal((batch, n_bucket, 100)).astype(np.float32)).astype(compute_dtype)
    cond_mask = np.zeros((batch, n_bucket, 1), dtype=bool)
    cond_mask[:, :cond_len] = True
    step_cond = jnp.where(jnp.asarray(cond_mask), cond, 0.0)
    text = jnp.asarray(rng.integers(1, 2545, (batch, 160)).astype(np.int32))
    y0 = jax.random.normal(jax.random.PRNGKey(42), (batch, n_bucket, 100), compute_dtype)

    if batch > 1:
        # serving-batch protocol: per-item durations (reference-semantics
        # [b, n] duration mask -> per-item prefix-flash with pruning)
        durations = np.linspace(total_len // 2, total_len, batch).astype(np.int64)
        dur_mask = np.arange(n_bucket)[None, :] < durations[:, None]
        item_mask = jnp.asarray(dur_mask)
        y0 = jnp.where(item_mask[..., None], y0, 0.0)
        pad_mask = (jnp.asarray(np.arange(n_bucket)[None, :] < total_len)
                    if total_len < n_bucket else None)
        gen_frames = int((durations - cond_len).sum())
    else:
        # bucket padding past the requested duration: [1, n] pad_mask —
        # always masked in attention, b==1 so no reference-semantics
        # duration mask; None when the request fits exactly
        item_mask = None
        pad_mask = (jnp.asarray(np.arange(n_bucket)[None, :] < total_len)
                    if total_len < n_bucket else None)
        gen_frames = total_len - cond_len

    skip_vocoder = os.environ.get("F5_TTS_BENCH_NOVOC", "0") != "0"  # attribution A/B

    def synthesize(params, voc_params, step_cond, text, y0):
        mel = _sample_core.__wrapped__(
            params, arch, step_cond, text, item_mask, pad_mask, y0,
            jnp.asarray(2.0, compute_dtype), jnp.asarray(-1.0, compute_dtype),
            steps=16, use_cfg=True, use_sway=True, use_epss=True,
        )
        out = jnp.where(jnp.asarray(cond_mask), step_cond, mel)
        if skip_vocoder:
            return out
        wav = vocos_decode(voc_params, jnp.swapaxes(out, 1, 2).astype(compute_dtype), vcfg)
        return wav

    fn = jax.jit(synthesize)
    # NB: on the axon relay, block_until_ready does not synchronise; a host
    # scalar readback is the only reliable fence.
    float(jnp.abs(fn(params, voc_params, step_cond, text, y0)).sum())

    # offline-throughput protocol (reference benchmark.py: total elapsed over
    # the whole request set / total audio): dispatch all items, then drain —
    # device executes back-to-back, host roundtrip amortises
    n_iters = 10
    t0 = time.perf_counter()
    sums = [jnp.abs(fn(params, voc_params, step_cond, text, y0)).sum()
            for _ in range(n_iters)]
    for s in sums:
        float(s)
    dt = (time.perf_counter() - t0) / n_iters

    gen_seconds = gen_frames * hop / sr
    rtf = dt / gen_seconds
    mode = {"0": "bf16", "1": "int8ff", "2": "int8"}.get(int8_mode, "int8")
    print(json.dumps({
        "metric": "rtf_16nfe_f5base_vocos",
        "value": round(rtf, 5),
        "unit": f"rtf (wall s / generated audio s, batch {batch}, {mode}, "
                "parity: PARITY_FLAGSHIP.json)",
        "vs_baseline": round(BASELINE_RTF / rtf, 3),
    }))


if __name__ == "__main__":
    main()
