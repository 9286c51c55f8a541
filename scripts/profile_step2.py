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
    # 1) vocoder with depthwise-as-shifts
    from korean_f5_tts_tpu.models.vocos import VocosConfig, init_vocos, vocos_decode

    vcfg = VocosConfig()
    vp = jax.tree_util.tree_map(
        lambda x: x.astype(DT) if x.dtype == jnp.float32 else x,
        init_vocos(jax.random.PRNGKey(1), vcfg))
    mel = jnp.asarray(rng.standard_normal((1, 100, 1024)).astype(np.float32)).astype(DT)
    bench(lambda m: vocos_decode(vp, m, vcfg), (mel,), iters=10,
          name="vocos_decode_1024f_shifts")
