"""Int8 quantization tests."""

import numpy as np

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.config import DiTConfig
from korean_f5_tts_tpu.models.dit import dit_forward, init_dit
from korean_f5_tts_tpu.models.modules import linear, linear_init
from korean_f5_tts_tpu.models.quant import qlinear, quantize_linear, quantize_params

TINY = DiTConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=10,
                 text_num_embeds=20, text_dim=32, conv_layers=1)


class TestQuant:
    def test_qlinear_accuracy(self):
        p = linear_init(jax.random.PRNGKey(0), 256, 512)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 256)).astype(np.float32))
        y = np.asarray(linear(p, x))
        yq = np.asarray(qlinear(quantize_linear(p), x))
        rel = np.abs(y - yq).max() / np.abs(y).max()
        assert rel < 0.02

    def test_linear_dispatches_on_layout(self):
        p = linear_init(jax.random.PRNGKey(1), 32, 16)
        qp = quantize_linear(p)
        x = jnp.ones((2, 32))
        np.testing.assert_allclose(np.asarray(linear(qp, x)),
                                   np.asarray(qlinear(qp, x)))

    def test_quantize_params_targets_block_linears(self):
        params = init_dit(jax.random.PRNGKey(0), TINY)
        qparams = quantize_params(params)
        blk = qparams["blocks"][0]
        assert "w_int8" in blk["attn"]["to_q"]
        assert "w_int8" in blk["ff"]["in"]
        # non-target leaves untouched
        assert "w" in qparams["input_proj"]
        assert "w" in qparams["proj_out"]
        assert "w" in blk["attn_norm"]["linear"]

    def test_quantized_model_forward_close(self):
        params = init_dit(jax.random.PRNGKey(0), TINY)
        params["proj_out"]["w"] = jax.random.normal(
            jax.random.PRNGKey(1), params["proj_out"]["w"].shape) * 0.05
        for blk in params["blocks"]:  # activate AdaLN gates
            for k, scale in (("w", 0.02), ("b", 0.2)):
                blk["attn_norm"]["linear"][k] = jax.random.normal(
                    jax.random.PRNGKey(2), blk["attn_norm"]["linear"][k].shape) * scale
        qparams = quantize_params(params)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, 32, 10)).astype(np.float32))
        text = jnp.asarray(np.array([[1, 2, 3]], dtype=np.int32))
        t = jnp.asarray(np.array([0.4], np.float32))
        o1 = np.asarray(dit_forward(params, TINY, x, x, text, t))
        o2 = np.asarray(dit_forward(qparams, TINY, x, x, text, t))
        assert np.abs(o1 - o2).max() / np.abs(o1).max() < 0.02

    def test_int8_weights_memory(self):
        params = init_dit(jax.random.PRNGKey(0), TINY)
        qparams = quantize_params(params)
        assert qparams["blocks"][0]["attn"]["to_q"]["w_int8"].dtype == jnp.int8
