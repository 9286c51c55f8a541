"""Small tensor/host helpers.

Capability parity with reference `src/f5_tts/model/utils.py:19-106` (mask
helpers, seeding) — re-designed for JAX: masks are built with broadcasting
under jit (static max length), randomness flows through `jax.random` keys.
"""

from __future__ import annotations

import os
import random as _pyrandom

import jax
import jax.numpy as jnp
import numpy as np


def exists(v):
    return v is not None


def default(v, d):
    return v if exists(v) else d


def seed_everything(seed: int = 0) -> jax.Array:
    """Seed host-side RNGs and return a jax PRNG key for device-side sampling.

    Mirrors reference `model/utils.py:19-26` in spirit; JAX randomness is
    explicit, so the important part is the returned key.
    """
    _pyrandom.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed % (2**32))
    return jax.random.PRNGKey(seed)


def lens_to_mask(lens: jax.Array, length: int | None = None) -> jax.Array:
    """[b] lengths -> [b, n] bool mask. `length` must be static under jit."""
    if length is None:
        length = int(lens.max())
    seq = jnp.arange(length, dtype=lens.dtype)
    return seq[None, :] < lens[:, None]


def mask_from_start_end_indices(start: jax.Array, end: jax.Array, length: int) -> jax.Array:
    """[b] start/end -> [b, n] bool mask with start <= i < end."""
    seq = jnp.arange(length, dtype=start.dtype)
    return (seq[None, :] >= start[:, None]) & (seq[None, :] < end[:, None])


def mask_from_frac_lengths(
    seq_len: jax.Array, frac_lengths: jax.Array, key: jax.Array, length: int
) -> jax.Array:
    """Random contiguous span covering `frac` of each row (training infill mask).

    Parity: reference `model/utils.py:69-77`.
    """
    lengths = (frac_lengths * seq_len.astype(frac_lengths.dtype)).astype(jnp.int32)
    max_start = seq_len.astype(jnp.int32) - lengths
    rand = jax.random.uniform(key, frac_lengths.shape, dtype=frac_lengths.dtype)
    start = jnp.clip((max_start.astype(frac_lengths.dtype) * rand).astype(jnp.int32), 0, None)
    end = start + lengths
    return mask_from_start_end_indices(start, end, length)


def maybe_masked_mean(t: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """Mean over sequence axis, respecting an optional [b, n] mask."""
    if mask is None:
        return t.mean(axis=1)
    t = jnp.where(mask[:, :, None], t, 0.0)
    num = t.sum(axis=1)
    den = mask.astype(t.dtype).sum(axis=1)
    return num / jnp.clip(den, 1.0, None)[:, None]
