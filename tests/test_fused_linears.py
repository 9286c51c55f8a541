"""ln_mod_matmul / proj_gated_residual kernels vs XLA (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.ops import fused_linears as fl


@pytest.fixture(autouse=True)
def _interpret():
    old = fl._INTERPRET
    fl._INTERPRET = True
    yield
    fl._INTERPRET = old


def _rand(shape, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def test_ln_mod_matmul():
    B, n, d, dout = 2, 16, 128, 256
    h, sc, sh = _rand((B, n, d), 0), _rand((d,), 1) * 0.1, _rand((d,), 2) * 0.1
    w, b = _rand((d, dout), 3) * 0.05, _rand((dout,), 4) * 0.1
    got = fl.ln_mod_matmul(h, sc, sh, w, b, 8)
    want = fl._ln_mod_matmul_xla(h, sc, sh, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_ln_mod_matmul_grad():
    B, n, d, dout = 1, 8, 128, 128
    h, sc, sh = _rand((B, n, d), 5), _rand((d,), 6) * 0.1, _rand((d,), 7) * 0.1
    w, b = _rand((d, dout), 8) * 0.05, _rand((dout,), 9) * 0.1
    t = _rand((B, n, dout), 10)
    gk = jax.grad(lambda hh, ww: jnp.sum(fl.ln_mod_matmul(hh, sc, sh, ww, b, 8) * t),
                  argnums=(0, 1))(h, w)
    gr = jax.grad(lambda hh, ww: jnp.sum(fl._ln_mod_matmul_xla(hh, sc, sh, ww, b) * t),
                  argnums=(0, 1))(h, w)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=3e-5, atol=3e-5)


def test_proj_gated_residual():
    B, n, din, d = 2, 16, 256, 128
    a, h = _rand((B, n, din), 11), _rand((B, n, d), 12)
    gate = _rand((d,), 13)
    w, b = _rand((din, d), 14) * 0.05, _rand((d,), 15) * 0.1
    got = fl.proj_gated_residual(a, h, gate, w, b, 8)
    want = fl._proj_gated_xla(a, h, gate, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_int8_variants_match_quant_math():
    from korean_f5_tts_tpu.models.quant import quantize_linear
    from korean_f5_tts_tpu.ops.ff_block import _quant_rows

    B, n, d, dout = 1, 16, 128, 256
    h, sc, sh = _rand((B, n, d), 30), _rand((d,), 31) * 0.1, _rand((d,), 32) * 0.1
    w, b = _rand((d, dout), 33) * 0.05, _rand((dout,), 34) * 0.1
    qp = quantize_linear({"w": np.asarray(w), "b": np.asarray(b)})
    got = fl.ln_mod_matmul_int8(h, sc, sh, qp, 8)

    # reference: same LN then int8 math in XLA
    y = fl._ln_mod_matmul_xla(h, sc, sh, jnp.eye(d), jnp.zeros((d,)))  # LN+mod only
    yq, ys = _quant_rows(y.astype(jnp.float32))
    want = (jax.lax.dot_general(yq, qp["w_int8"], (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32).astype(jnp.float32)
            * ys * qp["w_scale"] + qp["b"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)
    # close to the fp formulation up to quantization error
    fp = fl._ln_mod_matmul_xla(h, sc, sh, w, b)
    rel = float(jnp.abs(got - fp).max() / (jnp.abs(fp).max() + 1e-9))
    assert rel < 0.05, rel

    a, hh = _rand((B, n, dout), 35), _rand((B, n, d), 36)
    gate = _rand((d,), 37)
    qp2 = quantize_linear({"w": np.asarray(_rand((dout, d), 38) * 0.05),
                           "b": np.asarray(_rand((d,), 39) * 0.1)})
    got2 = fl.proj_gated_residual_int8(a, hh, gate, qp2, 8)
    aq, as_ = _quant_rows(a.astype(jnp.float32))
    o = (jax.lax.dot_general(aq, qp2["w_int8"], (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32).astype(jnp.float32)
         * as_ * qp2["w_scale"] + qp2["b"])
    want2 = hh + gate * o
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=3e-5, atol=3e-5)


def test_proj_gated_bf16():
    B, n, din, d = 1, 16, 128, 128
    a = _rand((B, n, din), 16).astype(jnp.bfloat16)
    h = _rand((B, n, d), 17).astype(jnp.bfloat16)
    gate = _rand((d,), 18).astype(jnp.bfloat16)
    w = (_rand((din, d), 19) * 0.05).astype(jnp.bfloat16)
    b = (_rand((d,), 20) * 0.1).astype(jnp.bfloat16)
    got = fl.proj_gated_residual(a, h, gate, w, b, 8)
    want = fl._proj_gated_xla(a.astype(jnp.float32), h.astype(jnp.float32),
                              gate.astype(jnp.float32), w.astype(jnp.float32),
                              b.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got.astype(jnp.float32)),
                               np.asarray(want), rtol=0.03, atol=0.03)
