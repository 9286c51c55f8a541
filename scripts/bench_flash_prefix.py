"""TPU microbench: prefix-flash kernel vs splash (unmasked) vs XLA masked.

Per-call timings through the axon relay are dominated by the ~30 ms
roundtrip, so each attention variant is repeated in-jit with a data
dependency (mirroring the sampler: 22 layers inside one program) and timed
at two repetition counts — the difference isolates per-layer cost.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

from korean_f5_tts_tpu.ops.attention import _tpu_splash, _xla_sdpa
from korean_f5_tts_tpu.ops.flash_prefix import flash_prefix_attention

DT = jnp.bfloat16


def fence(x):
    return float(jnp.abs(x).sum())


def chained(fn, iters):
    def run(q, k, v):
        def body(carry, _):
            o = fn(carry, k, v)
            return (carry + o * 1e-3).astype(carry.dtype), None

        out, _ = jax.lax.scan(body, q, None, length=iters)
        return out

    return jax.jit(run)


def bench_layer(fn, q, k, v, name, lo=8, hi=30, reps=8):
    f_lo, f_hi = chained(fn, lo), chained(fn, hi)
    fence(f_lo(q, k, v)); fence(f_hi(q, k, v))
    t0 = time.perf_counter()
    outs = [f_lo(q, k, v) for _ in range(reps)]
    for o in outs:
        fence(o)
    t_lo = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    outs = [f_hi(q, k, v) for _ in range(reps)]
    for o in outs:
        fence(o)
    t_hi = (time.perf_counter() - t0) / reps
    per_layer = (t_hi - t_lo) / (hi - lo) * 1e3
    print(json.dumps({"name": name, "ms_per_layer": round(per_layer, 4),
                      "lo_ms": round(t_lo * 1e3, 2), "hi_ms": round(t_hi * 1e3, 2)}),
          flush=True)
    return per_layer


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    b, h, n, d = 2, 16, 1536, 64
    q = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32)).astype(DT)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32)).astype(DT)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32)).astype(DT)
    lens1376 = jnp.asarray([1376], jnp.int32)
    lens700 = jnp.asarray([700], jnp.int32)
    mask = jnp.asarray(np.arange(n)[None, :] < 1376)

    bench_layer(lambda a, kk, vv: flash_prefix_attention(a, kk, vv, lens1376),
                q, k, v, "prefix_flash_len1376")
    bench_layer(lambda a, kk, vv: flash_prefix_attention(a, kk, vv, lens700),
                q, k, v, "prefix_flash_len700(prune)")
    bench_layer(lambda a, kk, vv: _tpu_splash(a, kk, vv, None), q, k, v,
                "splash_unmasked")
    bench_layer(lambda a, kk, vv: _xla_sdpa(a, kk, vv, mask), q, k, v,
                "xla_masked")

    # fused-layout kernel: [B, n, 3*h*dh] in -> [B, n, h*dh] out (incl. rope)
    from korean_f5_tts_tpu.models.modules import rope_cos_sin
    from korean_f5_tts_tpu.ops.flash_prefix import (
        _xla_qkv_reference,
        flash_prefix_qkv_attention,
    )

    cos, sin = rope_cos_sin(n, d)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * h * d)).astype(np.float32)).astype(DT)

    got = jax.jit(lambda a: flash_prefix_qkv_attention(a, lens1376, h, cos, sin))(qkv)
    want = jax.jit(lambda a: _xla_qkv_reference(a, lens1376, h, cos, sin, None))(qkv)
    diff = float(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))[
        :, :1376].max())
    print(json.dumps({"name": "qkv_kernel_vs_xla_maxdiff", "val": diff}), flush=True)

    def chained_qkv(iters):
        def run(a):
            def body(carry, _):
                o = flash_prefix_qkv_attention(carry, lens1376, h, cos, sin)
                return (carry + jnp.tile(o, (1, 1, 3)) * 1e-3).astype(carry.dtype), None
            out, _ = jax.lax.scan(body, a, None, length=iters)
            return out
        return jax.jit(run)

    f_lo, f_hi = chained_qkv(8), chained_qkv(30)
    fence(f_lo(qkv)); fence(f_hi(qkv))
    reps = 8
    t0 = time.perf_counter(); outs = [f_lo(qkv) for _ in range(reps)]
    for o in outs:
        fence(o)
    t_lo = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter(); outs = [f_hi(qkv) for _ in range(reps)]
    for o in outs:
        fence(o)
    t_hi = (time.perf_counter() - t0) / reps
    print(json.dumps({"name": "qkv_kernel_len1376", "ms_per_layer":
                      round((t_hi - t_lo) / 22 * 1e3, 4)}), flush=True)
    # batch-4 serving case: 128 folded heads
    b4 = 8  # CFG-packed batch 4 -> 8
    q4 = jnp.asarray(rng.standard_normal((b4, 16, n, d)).astype(np.float32)).astype(DT)
    k4 = jnp.asarray(rng.standard_normal((b4, 16, n, d)).astype(np.float32)).astype(DT)
    v4 = jnp.asarray(rng.standard_normal((b4, 16, n, d)).astype(np.float32)).astype(DT)
    lens4 = jnp.asarray([1376, 900, 1200, 400, 1376, 900, 1200, 400], jnp.int32)
    bench_layer(lambda a, kk, vv: flash_prefix_attention(a, kk, vv, lens4),
                q4, k4, v4, "prefix_flash_b8_peritem", lo=4, hi=12)
