"""Model-core tests: torch-oracle parity for primitives, structure checks,
CFM loss/sampler behaviour on a tiny model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.config import CFMConfig, DiTConfig
from korean_f5_tts_tpu.models import modules as m
from korean_f5_tts_tpu.models.cfm import cfm_loss, cfm_sample
from korean_f5_tts_tpu.models.dit import count_params, dit_forward, init_dit, text_embedding

torch = pytest.importorskip("torch")

TINY = DiTConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=10,
                 text_num_embeds=30, text_dim=32, conv_layers=1, dropout=0.0)


def t2j(x):
    return jnp.asarray(x.detach().numpy())


class TestPrimitivesVsTorch:
    def test_linear(self):
        key = jax.random.PRNGKey(0)
        p = m.linear_init(key, 8, 16)
        x = np.random.default_rng(0).standard_normal((3, 8)).astype(np.float32)
        ours = np.asarray(m.linear(p, jnp.asarray(x)))
        ref = torch.from_numpy(x) @ torch.from_numpy(np.asarray(p["w"])) + torch.from_numpy(
            np.asarray(p["b"])
        )
        np.testing.assert_allclose(ours, ref.numpy(), atol=1e-6)

    def test_layernorm_matches_torch(self):
        x = np.random.default_rng(1).standard_normal((2, 5, 16)).astype(np.float32)
        p = m.layernorm_init(16)
        ours = np.asarray(m.layernorm(p, jnp.asarray(x), eps=1e-6))
        ref = torch.nn.functional.layer_norm(torch.from_numpy(x), (16,), eps=1e-6)
        np.testing.assert_allclose(ours, ref.numpy(), atol=1e-5)

    def test_rmsnorm_matches_torch(self):
        x = np.random.default_rng(2).standard_normal((2, 7, 32)).astype(np.float32)
        p = m.rmsnorm_init(32)
        ours = np.asarray(m.rmsnorm(p, jnp.asarray(x), eps=1e-6))
        ref = torch.nn.functional.rms_norm(torch.from_numpy(x), (32,), eps=1e-6)
        np.testing.assert_allclose(ours, ref.numpy(), atol=1e-5)

    def test_conv1d_grouped_matches_torch(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal((2, 20, 16)).astype(np.float32)  # NHC
        w_hio = rng.standard_normal((5, 4, 16)).astype(np.float32)  # [k, in/g, out], g=4
        b = rng.standard_normal(16).astype(np.float32)
        ours = np.asarray(
            m.conv1d({"w": jnp.asarray(w_hio), "b": jnp.asarray(b)}, jnp.asarray(x),
                     groups=4, padding=2)
        )
        # torch: NCW, weight [out, in/g, k]
        wt = torch.from_numpy(np.transpose(w_hio, (2, 1, 0)))
        ref = torch.nn.functional.conv1d(
            torch.from_numpy(np.transpose(x, (0, 2, 1))), wt, torch.from_numpy(b),
            padding=2, groups=4,
        ).numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_depthwise_dilated_conv_matches_torch(self):
        rng = np.random.default_rng(4)
        c = 8
        x = rng.standard_normal((1, 30, c)).astype(np.float32)
        w_hio = rng.standard_normal((7, 1, c)).astype(np.float32)
        ours = np.asarray(
            m.conv1d({"w": jnp.asarray(w_hio)}, jnp.asarray(x), groups=c, padding=3)
        )
        wt = torch.from_numpy(np.transpose(w_hio, (2, 1, 0)))
        ref = torch.nn.functional.conv1d(
            torch.from_numpy(np.transpose(x, (0, 2, 1))), wt, padding=3, groups=c
        ).numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_mish_gelu(self):
        x = np.linspace(-4, 4, 33, dtype=np.float32)
        np.testing.assert_allclose(
            np.asarray(m.mish(jnp.asarray(x))),
            torch.nn.functional.mish(torch.from_numpy(x)).numpy(), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(m.gelu_tanh(jnp.asarray(x))),
            torch.nn.functional.gelu(torch.from_numpy(x), approximate="tanh").numpy(),
            atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(m.gelu_exact(jnp.asarray(x))),
            torch.nn.functional.gelu(torch.from_numpy(x)).numpy(), atol=1e-6)

    def test_grn_matches_formula(self):
        rng = np.random.default_rng(5)
        x = rng.standard_normal((2, 9, 6)).astype(np.float32)
        p = {"gamma": jnp.full((1, 1, 6), 0.5), "beta": jnp.full((1, 1, 6), 0.1)}
        ours = np.asarray(m.grn(p, jnp.asarray(x)))
        xt = torch.from_numpy(x)
        gx = torch.norm(xt, p=2, dim=1, keepdim=True)
        nx = gx / (gx.mean(dim=-1, keepdim=True) + 1e-6)
        ref = (0.5 * (xt * nx) + 0.1 + xt).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_sinus_position_embedding(self):
        t = np.array([0.0, 0.5, 1.0], dtype=np.float32)
        ours = np.asarray(m.sinus_position_embedding(jnp.asarray(t), 8))
        import math
        half = 4
        emb = math.log(10000) / (half - 1)
        freqs = np.exp(np.arange(half) * -emb)
        ang = 1000 * t[:, None] * freqs[None, :]
        ref = np.concatenate([np.sin(ang), np.cos(ang)], axis=-1)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_softmax_attention_matches_torch_sdpa(self):
        rng = np.random.default_rng(6)
        q = rng.standard_normal((2, 2, 9, 16)).astype(np.float32)
        k = rng.standard_normal((2, 2, 9, 16)).astype(np.float32)
        v = rng.standard_normal((2, 2, 9, 16)).astype(np.float32)
        mask = np.ones((2, 9), dtype=bool)
        mask[1, 6:] = False
        ours = np.asarray(m.scaled_dot_product_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask)))
        am = torch.from_numpy(mask)[:, None, None, :].expand(2, 2, 9, 9)
        ref = torch.nn.functional.scaled_dot_product_attention(
            torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v), attn_mask=am
        ).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestRopeEquivalence:
    def test_halfsplit_rope_equals_interleaved_after_permutation(self):
        """Attention logits with half-split rope on permuted q/k == interleaved
        rope on the originals (the checkpoint-converter invariance)."""
        rng = np.random.default_rng(7)
        b, h, n, d = 1, 2, 12, 16
        q = rng.standard_normal((b, h, n, d)).astype(np.float32)
        k = rng.standard_normal((b, h, n, d)).astype(np.float32)

        # interleaved (x_transformers >= 1.31 style) in numpy
        inv_freq = 1.0 / (10000 ** (np.arange(0, d, 2) / d))
        ang = np.outer(np.arange(n), inv_freq)  # [n, d/2]
        cos_i = np.repeat(np.cos(ang), 2, axis=-1)
        sin_i = np.repeat(np.sin(ang), 2, axis=-1)

        def rotate_half_interleaved(x):
            x1, x2 = x[..., 0::2], x[..., 1::2]
            return np.stack([-x2, x1], axis=-1).reshape(x.shape)

        def rope_i(x):
            return x * cos_i + rotate_half_interleaved(x) * sin_i

        logits_ref = np.einsum("bhqd,bhkd->bhqk", rope_i(q), rope_i(k))

        # half-split on permuted dims
        perm = np.concatenate([np.arange(0, d, 2), np.arange(1, d, 2)])
        cos, sin = m.rope_cos_sin(n, d)
        qp, kp = q[..., perm], k[..., perm]
        qr = np.asarray(m.apply_rope(jnp.asarray(qp), jnp.asarray(cos), jnp.asarray(sin)))
        kr = np.asarray(m.apply_rope(jnp.asarray(kp), jnp.asarray(cos), jnp.asarray(sin)))
        logits_ours = np.einsum("bhqd,bhkd->bhqk", qr, kr)
        np.testing.assert_allclose(logits_ours, logits_ref, atol=1e-4)

    def test_pe_attn_head_limits_rope(self):
        x = jnp.asarray(np.random.default_rng(8).standard_normal((1, 3, 6, 8)).astype(np.float32))
        cos, sin = m.rope_cos_sin(6, 8)
        out = m.apply_rope(x, jnp.asarray(cos), jnp.asarray(sin), pe_attn_head=1)
        # heads 1..2 unchanged
        np.testing.assert_allclose(np.asarray(out[:, 1:]), np.asarray(x[:, 1:]))
        assert not np.allclose(np.asarray(out[:, 0]), np.asarray(x[:, 0]))


class TestDiT:
    def setup_method(self):
        self.params = init_dit(jax.random.PRNGKey(0), TINY)

    def test_zero_init_output(self):
        b, n = 2, 24
        x = jnp.asarray(np.random.default_rng(0).standard_normal((b, n, 10)).astype(np.float32))
        text = jnp.asarray(np.array([[1, 2, 3, -1], [4, 5, -1, -1]], dtype=np.int32))
        time = jnp.asarray(np.array([0.3, 0.7], dtype=np.float32))
        out = dit_forward(self.params, TINY, x, x, text, time)
        assert out.shape == (b, n, 10)
        np.testing.assert_allclose(np.asarray(out), 0.0)  # proj_out zero-init

    def test_text_embedding_shapes_and_drop(self):
        text = jnp.asarray(np.array([[1, 2, -1]], dtype=np.int32))
        emb = text_embedding(self.params["text_embed"], TINY, text, 10)
        assert emb.shape == (1, 10, 32)
        emb_drop = text_embedding(self.params["text_embed"], TINY, text, 10, drop_text=True)
        assert not np.allclose(np.asarray(emb), np.asarray(emb_drop))
        # padding positions are masked to zero contributions
        emb_np = np.asarray(emb)
        np.testing.assert_allclose(emb_np[0, 3:], 0.0, atol=1e-6)

    def test_param_count_f5_base(self):
        cfg = DiTConfig(dim=1024, depth=22, heads=16, ff_mult=2, text_dim=512,
                        conv_layers=4, text_num_embeds=256)
        shapes = jax.eval_shape(lambda k: init_dit(k, cfg), jax.random.PRNGKey(0))
        n_params = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes))
        # reference: 335.8 M (scripts/count_params_gflops.py:22-25)
        assert abs(n_params / 1e6 - 335.8) < 0.5, n_params / 1e6


class TestCFM:
    def setup_method(self):
        self.params = init_dit(jax.random.PRNGKey(1), TINY)
        rng = np.random.default_rng(9)
        self.mel = jnp.asarray(rng.standard_normal((2, 32, 10)).astype(np.float32))
        self.text = jnp.asarray(np.array([[1, 2, 3, -1], [4, 5, -1, -1]], dtype=np.int32))
        self.lens = jnp.asarray(np.array([32, 24]))

    def test_loss_finite_and_grads(self):
        loss, cond, pred = cfm_loss(self.params, TINY, self.mel, self.text, self.lens,
                                    jax.random.PRNGKey(0), CFMConfig())
        assert np.isfinite(float(loss))
        # zero-init model -> pred 0 -> loss = E[flow^2] over span, roughly 2
        assert 0.5 < float(loss) < 5.0

        g = jax.grad(
            lambda p: cfm_loss(p, TINY, self.mel, self.text, self.lens,
                               jax.random.PRNGKey(0), CFMConfig())[0]
        )(self.params)
        flat = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in flat)
        assert any(np.abs(np.asarray(x)).sum() > 0 for x in flat)

    def test_sample_shapes_and_cond_splice(self):
        cond = self.mel[:, :16, :]
        out, _ = cfm_sample(
            self.params, TINY, cond, self.text, duration=40,
            lens=np.array([16, 16]), steps=4, cfg_strength=2.0,
            sway_sampling_coef=-1.0, seed=0, duration_bucket=8,
        )
        out = np.asarray(out)
        assert out.shape[0] == 2 and out.shape[2] == 10 and out.shape[1] >= 40
        # conditioning region spliced back exactly
        np.testing.assert_allclose(out[:, :16, :], np.asarray(cond), atol=1e-6)

    def test_sample_deterministic_with_seed(self):
        cond = self.mel[:1, :16, :]
        kwargs = dict(duration=32, steps=2, cfg_strength=1.0, seed=7, duration_bucket=8)
        a, _ = cfm_sample(self.params, TINY, cond, self.text[:1], **kwargs)
        b, _ = cfm_sample(self.params, TINY, cond, self.text[:1], **kwargs)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_duration_floor(self):
        # duration smaller than prompt -> floored to lens+1
        cond = self.mel[:1, :16, :]
        out, _ = cfm_sample(self.params, TINY, cond, self.text[:1], duration=4,
                            lens=np.array([16]), steps=2, duration_bucket=8)
        assert np.asarray(out).shape[1] >= 17
