"""F5_TTS_PV_BF16=1: the PV accumulate dot runs as bf16 p @ bf16 v (MXU
native rate) instead of the multi-pass f32-operand dot. Engages ONLY for
bf16 K/V — fp32 inputs keep the exact f32 dot (parity-path invariant).

Env is read at kernel trace time, so this module sets it before importing
anything jit-cached and clears the wrapper caches around each test.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.ops import flash_prefix as fp


@pytest.fixture(autouse=True)
def _pv_bf16(monkeypatch):
    monkeypatch.setenv("F5_TTS_PV_BF16", "1")
    old = fp._INTERPRET
    fp._INTERPRET = True
    fp._flash_prefix_folded.clear_cache()
    yield
    fp._INTERPRET = old
    fp._flash_prefix_folded.clear_cache()


def _rand_bf16(shape, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)


@pytest.mark.parametrize("staticmax", ["0", "1"])
def test_bf16_inputs_match_f32_reference(monkeypatch, staticmax):
    monkeypatch.setenv("F5_TTS_FLASH_STATICMAX", staticmax)
    fp._flash_prefix_folded.clear_cache()
    b, h, n, d = 2, 2, 256, 64
    q, k, v = (_rand_bf16((b, h, n, d), s) for s in (1, 2, 3))
    lens = jnp.asarray([100, 256], jnp.int32)
    got = fp.flash_prefix_attention(q, k, v, lens, 128, 128, False)
    want = fp._xla_prefix_attention(*(x.astype(jnp.float32) for x in (q, k, v)),
                                    lens)
    # bf16 p (8-bit mantissa) bounds the deviation; weights sum to 1 so the
    # output error stays within a few bf16 ulps of the value scale
    for i, L in enumerate([100, 256]):
        np.testing.assert_allclose(
            np.asarray(got, np.float32)[i, :, :L],
            np.asarray(want)[i, :, :L], atol=2e-2, rtol=2e-2)


def test_f32_inputs_keep_exact_path():
    """With the env set, fp32 K/V must still take the f32 @ f32 dot."""
    rng = np.random.default_rng(9)
    b, h, n, d = 1, 2, 256, 64
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
               for _ in range(3))
    lens = jnp.asarray([200], jnp.int32)
    got = fp.flash_prefix_attention(q, k, v, lens, 128, 128, False)
    want = fp._xla_prefix_attention(q, k, v, lens)
    np.testing.assert_allclose(np.asarray(got)[:, :, :200],
                               np.asarray(want)[:, :, :200],
                               atol=2e-5, rtol=2e-5)


def test_pv_cast_dtype_gate(monkeypatch):
    assert fp._pv_cast_dtype(jnp.bfloat16) == jnp.bfloat16
    assert fp._pv_cast_dtype(jnp.float32) is None
    monkeypatch.setenv("F5_TTS_PV_BF16", "0")
    assert fp._pv_cast_dtype(jnp.bfloat16) is None
