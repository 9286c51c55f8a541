"""Clean qkv-pair-kernel sweep: n x bq, vs XLA masked. Run on an IDLE host."""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

from korean_f5_tts_tpu.models.modules import rope_cos_sin
from korean_f5_tts_tpu.ops.attention import _xla_sdpa
from korean_f5_tts_tpu.ops.flash_prefix import (
    _xla_qkv_reference,
    flash_prefix_qkv_attention,
)

DT = jnp.bfloat16
b, h, d = 2, 16, 64


def fence(x):
    return float(jnp.abs(x).sum())


def slope(make_fn, x, lo=8, hi=30, reps=8, name=""):
    f_lo, f_hi = make_fn(lo), make_fn(hi)
    fence(f_lo(x)); fence(f_hi(x))
    t0 = time.perf_counter()
    outs = [f_lo(x) for _ in range(reps)]
    for o in outs:
        fence(o)
    t_lo = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    outs = [f_hi(x) for _ in range(reps)]
    for o in outs:
        fence(o)
    t_hi = (time.perf_counter() - t0) / reps
    print(json.dumps({"name": name,
                      "ms_per_layer": round((t_hi - t_lo) / (hi - lo) * 1e3, 4),
                      "lo_ms": round(t_lo * 1e3, 2)}), flush=True)


def qkv_chain(n, bq, kvlen, iters):
    cos, sin = rope_cos_sin(n, d)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    lens = jnp.asarray([kvlen], jnp.int32)

    def run(a):
        def body(carry, _):
            o = flash_prefix_qkv_attention(carry, lens, h, cos, sin, None, bq, 512)
            return (carry + jnp.tile(o, (1, 1, 3)) * 1e-3).astype(carry.dtype), None

        out, _ = jax.lax.scan(body, a, None, length=iters)
        return out

    return jax.jit(run)


def xla_chain(n, kvlen, iters):
    mask = jnp.asarray(np.arange(n)[None, :] < kvlen)

    def run(q):
        def body(carry, _):
            o = _xla_sdpa(carry, carry, carry, mask)
            return (carry + o * 1e-3).astype(carry.dtype), None

        out, _ = jax.lax.scan(body, q, None, length=iters)
        return out

    return jax.jit(run)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    for n, bq in [(1408, 128), (1408, 256), (1536, 256)]:
        qkv = jnp.asarray(
            rng.standard_normal((b, n, 3 * h * d)).astype(np.float32)).astype(DT)
        kvlen = min(1376, n)
        try:
            got = jax.jit(lambda a, n=n, bq=bq, kvlen=kvlen: flash_prefix_qkv_attention(
                a, jnp.asarray([kvlen], jnp.int32), h,
                jnp.asarray(rope_cos_sin(n, d)[0]), jnp.asarray(rope_cos_sin(n, d)[1]),
                None, bq, 512))(qkv)
            want = _xla_qkv_reference(qkv, jnp.asarray([kvlen], jnp.int32), h,
                                      jnp.asarray(rope_cos_sin(n, d)[0]),
                                      jnp.asarray(rope_cos_sin(n, d)[1]), None)
            diff = float(jnp.abs(got.astype(jnp.float32)
                                 - want.astype(jnp.float32))[:, :kvlen].max())
            print(json.dumps({"name": f"qkv_n{n}_bq{bq}_maxdiff", "val": diff}),
                  flush=True)
            slope(lambda it, n=n, bq=bq, kvlen=kvlen: qkv_chain(n, bq, kvlen, it),
                  qkv, name=f"qkv_n{n}_bq{bq}")
        except Exception as e:
            print(json.dumps({"name": f"qkv_n{n}_bq{bq}", "error":
                              f"{type(e).__name__}: {str(e)[:200]}"}), flush=True)

    q4 = jnp.asarray(rng.standard_normal((b, h, 1408, d)).astype(np.float32)).astype(DT)
    slope(lambda it: xla_chain(1408, 1376, it), q4, name="xla_masked_n1408")
