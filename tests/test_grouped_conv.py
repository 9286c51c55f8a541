"""Pallas grouped-conv kernel (ops/grouped_conv.py): numerics + VJP.

Runs the kernel in interpret mode on CPU and checks it against the XLA
grouped-conv reference used by conv_position_embedding
(reference src/f5_tts/model/modules.py:170-196).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.models.modules import (
    _grouped_conv_as_batched,
    conv1d_init,
    mish,
)
from korean_f5_tts_tpu.ops.grouped_conv import (
    _pack_block_diag,
    grouped_conv1d_mish,
    pallas_conv_supported,
)


def _ref(p, x, groups, fuse_mish):
    y = _grouped_conv_as_batched(p, x, groups, p["w"].shape[0] // 2)
    return mish(y) if fuse_mish else y


class TestSupported:
    def test_dit_shape(self):
        assert pallas_conv_supported(1024, 16, 31)

    def test_unsupported(self):
        assert not pallas_conv_supported(1000, 16, 31)   # c % groups != 0 lanes
        assert not pallas_conv_supported(1024, 4, 31)    # cg=256 > 128
        assert not pallas_conv_supported(1024, 16, 30)   # even kernel
        assert not pallas_conv_supported(96, 16, 31)     # cg=6, 128 % 6 != 0


class TestForward:
    @pytest.mark.parametrize("groups,kernel", [(16, 31), (8, 7), (16, 3)])
    def test_matches_xla(self, groups, kernel):
        c = 1024
        p = conv1d_init(jax.random.PRNGKey(0), c, c, kernel, groups=groups)
        x = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((2, 64, c)).astype(np.float32))
        ref = _ref(p, x, groups, True)
        out = grouped_conv1d_mish(x, p["w"], p["b"], groups=groups,
                                  fuse_mish=True, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-6, rtol=1e-5)

    def test_no_bias_no_mish(self):
        c, g, k = 1024, 16, 31
        p = conv1d_init(jax.random.PRNGKey(1), c, c, k, groups=g, bias=False)
        x = jnp.asarray(np.random.default_rng(1)
                        .standard_normal((1, 40, c)).astype(np.float32))
        ref = _ref(p, x, g, False)
        out = grouped_conv1d_mish(x, p["w"], None, groups=g,
                                  fuse_mish=False, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-6, rtol=1e-5)

    def test_block_diag_packing(self):
        c, g, k = 256, 4, 3  # cg=64 -> 2 groups per 128-lane block
        w = jnp.asarray(np.random.default_rng(2)
                        .standard_normal((k, 64, c)).astype(np.float32))
        packed = _pack_block_diag(w, g)
        assert packed.shape == (2, k, 128, 128)
        wg = np.asarray(w).reshape(k, 64, g, 64)
        pk = np.asarray(packed)
        np.testing.assert_array_equal(pk[0, 1, :64, :64], wg[1, :, 0, :])
        np.testing.assert_array_equal(pk[0, 1, 64:, 64:], wg[1, :, 1, :])
        np.testing.assert_array_equal(pk[1, 2, :64, :64], wg[2, :, 2, :])
        np.testing.assert_array_equal(pk[0, 0, :64, 64:], 0.0)  # off-diagonal


class TestVJP:
    def test_grad_matches_xla_grad(self):
        c, g, k = 1024, 16, 7
        p = conv1d_init(jax.random.PRNGKey(3), c, c, k, groups=g)
        x = jnp.asarray(np.random.default_rng(3)
                        .standard_normal((1, 24, c)).astype(np.float32))

        def loss_pallas(x, w, b):
            return jnp.sum(grouped_conv1d_mish(x, w, b, groups=g,
                                               fuse_mish=True, interpret=True) ** 2)

        def loss_xla(x, w, b):
            return jnp.sum(_ref({"w": w, "b": b}, x, g, True) ** 2)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, p["w"], p["b"])
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, p["w"], p["b"])
        for a, b_ in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-4, rtol=1e-4)
