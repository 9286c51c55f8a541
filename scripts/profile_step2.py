"""Follow-up TPU checks: (1) folded-splash shared-segment mask numerics vs
XLA SDPA, (2) vocoder decode time with the depthwise-as-shifts conv,
(3) fused vs unfused depthwise at DiT text-embed shapes."""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

DT = jnp.bfloat16


def fence(x):
    return float(jnp.abs(x).sum())


def bench(fn, args, iters=20, name=""):
    f = jax.jit(fn)
    fence(f(*args))
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(iters)]
    for o in outs:
        fence(o)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({"name": name, "ms": round(dt, 3)}), flush=True)
    return dt


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    # 1) splash masked-path numerics: folded shared-segment vs XLA reference
    from korean_f5_tts_tpu.ops.attention import _tpu_splash, _xla_sdpa

    b, h, n, d = 2, 16, 1536, 64
    q = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32)).astype(DT)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32)).astype(DT)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32)).astype(DT)
    mask = jnp.asarray(np.arange(n)[None, :] < 1376)

    a = jax.jit(_tpu_splash)(q, k, v, mask)
    bref = jax.jit(_xla_sdpa)(q, k, v, mask)
    diff = float(jnp.abs(a.astype(jnp.float32) - bref.astype(jnp.float32))[
        :, :, :1376, :].max())
    print(json.dumps({"name": "splash_sharedseg_vs_xla_maxdiff", "val": diff}),
          flush=True)
    bench(_tpu_splash, (q, k, v, mask), name="splash_folded_masked_1layer")
    bench(_tpu_splash, (q, k, v, None), name="splash_folded_unmasked_1layer")

    # 2) vocoder with depthwise-as-shifts
    from korean_f5_tts_tpu.models.vocos import VocosConfig, init_vocos, vocos_decode

    vcfg = VocosConfig()
    vp = jax.tree_util.tree_map(
        lambda x: x.astype(DT) if x.dtype == jnp.float32 else x,
        init_vocos(jax.random.PRNGKey(1), vcfg))
    mel = jnp.asarray(rng.standard_normal((1, 100, 1024)).astype(np.float32)).astype(DT)
    bench(lambda m: vocos_decode(vp, m, vcfg), (mel,), iters=10,
          name="vocos_decode_1024f_shifts")
