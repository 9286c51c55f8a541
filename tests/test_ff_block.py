"""Fused FF half-block kernel vs the XLA formulation (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.ops import ff_block as fb


@pytest.fixture(autouse=True)
def _interpret():
    old = fb._INTERPRET
    fb._INTERPRET = True
    yield
    fb._INTERPRET = old


def _rand(shape, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def _inputs(B=1, n=16, d=128, dff=256, seed=0):
    h = _rand((B, n, d), seed)
    sc, sh, gate = _rand((d,), seed + 1) * 0.1, _rand((d,), seed + 2) * 0.1, \
        _rand((d,), seed + 3)
    w1, b1 = _rand((d, dff), seed + 4) * 0.05, _rand((dff,), seed + 5) * 0.1
    w2, b2 = _rand((dff, d), seed + 6) * 0.05, _rand((d,), seed + 7) * 0.1
    return h, sc, sh, gate, w1, b1, w2, b2


def test_matches_xla_fp32():
    args = _inputs()
    got = fb.ff_block_fused(*args, 8, 1e-6)
    want = fb._xla_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_bf16():
    h, sc, sh, gate, w1, b1, w2, b2 = _inputs(seed=10)
    hb = h.astype(jnp.bfloat16)
    got = fb.ff_block_fused(hb, sc.astype(jnp.bfloat16), sh.astype(jnp.bfloat16),
                            gate.astype(jnp.bfloat16), w1.astype(jnp.bfloat16),
                            b1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16),
                            b2.astype(jnp.bfloat16), 8, 1e-6)
    want = fb._xla_reference(h, sc, sh, gate, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got.astype(jnp.float32)),
                               np.asarray(want), rtol=0.03, atol=0.03)


def test_row_major_tiling_multi_batch():
    args = _inputs(B=2, n=24, seed=20)  # m=48, bm=8 -> 6 tiles
    got = fb.ff_block_fused(*args, 8, 1e-6)
    want = fb._xla_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_int8_matches_int8_reference():
    from korean_f5_tts_tpu.models.quant import quantize_linear

    h, sc, sh, gate, w1, b1, w2, b2 = _inputs(seed=50)
    qp_in = quantize_linear({"w": np.asarray(w1), "b": np.asarray(b1)})
    qp_out = quantize_linear({"w": np.asarray(w2), "b": np.asarray(b2)})
    got = fb.ff_block_fused_int8(h, sc, sh, gate, qp_in, qp_out, 8)
    want = fb._xla_reference_int8(h, sc, sh, gate, qp_in, qp_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)
    # and the int8 path approximates the fp path to quantization error
    fp = fb._xla_reference(h, sc, sh, gate, w1, b1, w2, b2)
    rel = float(jnp.abs(got - fp).max() / (jnp.abs(fp).max() + 1e-9))
    assert rel < 0.05, rel


def test_grad_matches_xla():
    args = _inputs(seed=30)
    w = _rand(args[0].shape, 99)

    def loss_k(h, w1, w2):
        a = (h,) + args[1:4] + (w1, args[5], w2, args[7])
        return jnp.sum(fb.ff_block_fused(*a, 8, 1e-6) * w)

    def loss_r(h, w1, w2):
        a = (h,) + args[1:4] + (w1, args[5], w2, args[7])
        return jnp.sum(fb._xla_reference(*a) * w)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(args[0], args[4], args[6])
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(args[0], args[4], args[6])
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5)
