"""Probe Mosaic support for head-pair kernel idioms: lane half-slice + dot,
block-diag permutation dot, lane write of two 64-halves."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from korean_f5_tts_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()


def probe(name, kernel, out_shape, *args):
    try:
        out = pl.pallas_call(kernel, out_shape=out_shape)(*args)
        print(name, "OK", float(jnp.abs(out).sum()))
        return out
    except Exception as e:
        print(name, "FAIL", type(e).__name__, str(e)[:300])
        return None


rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((256, 128)).astype(np.float32)).astype(jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((512, 128)).astype(np.float32)).astype(jnp.bfloat16)


def k_halfslice_dot(x_ref, k_ref, o_ref):
    a = x_ref[:, :64]          # lane half-slice
    b = k_ref[:, :64]
    o_ref[...] = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)


probe("halfslice_dot", k_halfslice_dot,
      jax.ShapeDtypeStruct((256, 512), jnp.float32), x, k)


def k_two_halves(x_ref, k_ref, o_ref):
    # both halves, two dots, write halves into a 128-wide output
    qa, qb = x_ref[:, :64], x_ref[:, 64:]
    ka, kb = k_ref[:, :64], k_ref[:, 64:]
    sa = jax.lax.dot_general(qa, ka, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [256, 512]
    sb = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    o_ref[:, :64] = sa[:, :64]
    o_ref[:, 64:] = sb[:, :64]


probe("two_halves_dots_lane_writes", k_two_halves,
      jax.ShapeDtypeStruct((256, 128), jnp.float32), x, k)


def k_permdot_roll(x_ref, o_ref):
    # block-diag half-swap via iota-built permutation, on the MXU
    r = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    perm = ((r // 64 == c // 64) & (jnp.abs(r % 64 - c % 64) == 32)).astype(x_ref.dtype)
    # NB half-swap of 64 needs shift 32 per half; just probe the dot pattern
    o_ref[...] = jax.lax.dot(x_ref[...], perm, preferred_element_type=jnp.float32)


probe("iota_perm_dot", k_permdot_roll,
      jax.ShapeDtypeStruct((256, 128), jnp.float32), x)


def k_lane_concat(x_ref, o_ref):
    a, b = x_ref[:, 64:], x_ref[:, :64]
    o_ref[...] = jnp.concatenate([a, b], axis=1).astype(jnp.float32)


probe("lane_halfswap_concat", k_lane_concat,
      jax.ShapeDtypeStruct((256, 128), jnp.float32), x)


def k_roll64(x_ref, o_ref):
    from jax.experimental.pallas import tpu as pltpu

    a = x_ref[:, :64]
    o_ref[...] = jnp.concatenate(
        [pltpu.roll(a, 32, 1), pltpu.roll(x_ref[:, 64:], 32, 1)], axis=1
    ).astype(jnp.float32)


probe("roll_within_halves", k_roll64,
      jax.ShapeDtypeStruct((256, 128), jnp.float32), x)
