"""Tensor-parallel inference: the sampler under a ("data","model") mesh.

Validates that TP param sharding produces identical sampler output to
single-device execution (XLA inserts the row-parallel all-reduces), and that
the PRODUCTION Pallas kernels run under the mesh via shard_map
(parallel/tp_kernels.py, interpret mode on the CPU mesh) — the TPU-native
equivalent of the reference's TRT-LLM head-split TP
(convert_checkpoint.py:16-24 + all-reduce patch/f5tts/model.py:116-117)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.config import DiTConfig
from korean_f5_tts_tpu.models.cfm import _sample_core, cfm_sample
from korean_f5_tts_tpu.models.dit import init_dit
from korean_f5_tts_tpu.parallel.mesh import make_mesh, shard_params

TINY = DiTConfig(dim=32, depth=2, heads=4, dim_head=8, ff_mult=2, mel_dim=10,
                 text_num_embeds=20, text_dim=16, conv_layers=1)

# kernel-eligible shapes: the prefix-flash kernel needs dim_head in (64, 128)
# and n % 128 == 0
KERNEL_TINY = DiTConfig(dim=128, depth=2, heads=4, dim_head=64, ff_mult=2,
                        mel_dim=10, text_num_embeds=20, text_dim=16,
                        conv_layers=1)


@pytest.fixture
def interpret_kernels(monkeypatch):
    """Force the production Pallas kernels into interpret mode on CPU."""
    from korean_f5_tts_tpu.ops import ff_block as fb
    from korean_f5_tts_tpu.ops import flash_prefix as fp
    from korean_f5_tts_tpu.ops import fused_linears as fl

    monkeypatch.setenv("F5_TTS_PALLAS_INTERPRET", "1")
    monkeypatch.setattr(fp, "_INTERPRET", True)
    monkeypatch.setattr(fb, "_INTERPRET", True)
    monkeypatch.setattr(fl, "_INTERPRET", True)


class TestTPInference:
    def test_tp_sampler_matches_single_device(self):
        assert len(jax.devices()) >= 8
        params = init_dit(jax.random.PRNGKey(0), TINY)
        params["proj_out"]["w"] = jax.random.normal(
            jax.random.PRNGKey(1), params["proj_out"]["w"].shape) * 0.05
        rng = np.random.default_rng(0)
        cond = jnp.asarray(rng.standard_normal((1, 16, 10)).astype(np.float32))
        text = jnp.asarray(np.array([[1, 2, 3]], dtype=np.int32))

        out_single, _ = cfm_sample(params, TINY, cond, text, duration=32, steps=2,
                                   cfg_strength=2.0, seed=0, duration_bucket=8)

        mesh = make_mesh(n_data=2, n_model=4)
        with mesh:
            sharded = shard_params(init_dit(jax.random.PRNGKey(0), TINY), mesh)
            sharded["proj_out"]["w"] = params["proj_out"]["w"]
            out_tp, _ = cfm_sample(sharded, TINY, cond, text, duration=32, steps=2,
                                   cfg_strength=2.0, seed=0, duration_bucket=8)
        np.testing.assert_allclose(np.asarray(out_tp), np.asarray(out_single),
                                   atol=1e-4, rtol=1e-4)

    def test_tp_batched_core(self):
        """Batched sampler core with data+model sharding both active."""
        mesh = make_mesh(n_data=2, n_model=4)
        params = init_dit(jax.random.PRNGKey(0), TINY)
        rng = np.random.default_rng(1)
        b, N = 2, 16
        step_cond = jnp.asarray(rng.standard_normal((b, N, 10)).astype(np.float32))
        text = jnp.asarray(np.array([[1, 2], [3, 4]], dtype=np.int32))
        y0 = jnp.asarray(rng.standard_normal((b, N, 10)).astype(np.float32))
        mask = jnp.ones((b, N), bool)
        with mesh:
            sp = shard_params(params, mesh)
            from korean_f5_tts_tpu.parallel.mesh import shard_batch

            sb = shard_batch({"c": step_cond, "y": y0, "m": mask}, mesh)
            out = _sample_core(sp, TINY, sb["c"], text, sb["m"], None, sb["y"],
                               2.0, 0.0, steps=2, use_cfg=True, use_sway=False,
                               use_epss=True)
            out = np.asarray(jax.block_until_ready(out))
        assert out.shape == (b, N, 10) and np.isfinite(out).all()


class TestTPPallasKernels:
    """The production Pallas kernels under the dp x tp mesh (shard_map)."""

    def test_tp_flash_matches_single_and_xla(self, interpret_kernels):
        from korean_f5_tts_tpu.ops import attention as A

        rng = np.random.default_rng(0)
        b, h, n, d = 2, 8, 128, 64
        q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
                   for _ in range(3))
        lens = jnp.asarray(np.array([100, 128], np.int32))
        mask = jnp.arange(n)[None, :] < lens[:, None]

        xla = A._xla_sdpa(q, k, v, mask)
        single = A.sdpa(q, k, v, mask, prefix_lens=lens)
        np.testing.assert_allclose(np.asarray(single), np.asarray(xla),
                                   atol=2e-5, rtol=2e-5)
        mesh = make_mesh(n_data=2, n_model=4)
        A.reset_dispatch_log()
        with mesh:
            tp = A.sdpa(q, k, v, mask, prefix_lens=lens)
        assert any("prefix-flash-tp" in p for p in A.get_dispatch_log()), \
            A.get_dispatch_log()
        # TP flash == single-device flash exactly (same kernel per head shard)
        np.testing.assert_allclose(np.asarray(tp), np.asarray(single),
                                   atol=1e-6, rtol=1e-6)

    def test_tp_fused_ff_block(self, interpret_kernels):
        from korean_f5_tts_tpu.ops.ff_block import ff_block_fused
        from korean_f5_tts_tpu.parallel import tp_kernels as T

        mesh = make_mesh(n_data=2, n_model=4)
        rng = np.random.default_rng(1)
        b, n, d, ff = 2, 128, 64, 128
        h = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
        sc, sh_, gate = (jnp.asarray(
            rng.standard_normal((1, d)).astype(np.float32)) * 0.1
            for _ in range(3))
        w1 = jnp.asarray(rng.standard_normal((d, ff)).astype(np.float32) * 0.05)
        b1 = jnp.asarray(rng.standard_normal((ff,)).astype(np.float32) * 0.05)
        w2 = jnp.asarray(rng.standard_normal((ff, d)).astype(np.float32) * 0.05)
        b2 = jnp.asarray(rng.standard_normal((d,)).astype(np.float32) * 0.05)
        want = ff_block_fused(h, sc, sh_, gate, w1, b1, w2, b2, 128)
        with mesh:
            got = T.ff_block_tp(h, sc, sh_, gate, w1, b1, w2, b2, mesh, bm=64)
        assert got is not None
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-6, rtol=1e-5)

    def test_tp_fused_ff_block_int8(self, interpret_kernels):
        from korean_f5_tts_tpu.models.quant import quantize_linear
        from korean_f5_tts_tpu.ops.ff_block import ff_block_fused_int8
        from korean_f5_tts_tpu.parallel import tp_kernels as T

        mesh = make_mesh(n_data=2, n_model=4)
        rng = np.random.default_rng(2)
        b, n, d, ff = 2, 128, 64, 128
        h = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32))
        sc, sh_, gate = (jnp.asarray(
            rng.standard_normal((1, d)).astype(np.float32)) * 0.1
            for _ in range(3))
        qin = quantize_linear(
            {"w": rng.standard_normal((d, ff)).astype(np.float32) * 0.05,
             "b": rng.standard_normal((ff,)).astype(np.float32) * 0.05})
        qout = quantize_linear(
            {"w": rng.standard_normal((ff, d)).astype(np.float32) * 0.05,
             "b": rng.standard_normal((d,)).astype(np.float32) * 0.05})
        want = ff_block_fused_int8(h, sc, sh_, gate, qin, qout, 128)
        with mesh:
            got = T.ff_block_int8_tp(h, sc, sh_, gate, qin, qout, mesh, bm=64)
        assert got is not None
        # the 2nd activation quant uses per-shard scales: tiny (sub-quant-noise)
        # deviation from the single-device kernel is expected
        dev = float(np.abs(np.asarray(got) - np.asarray(want)).max())
        assert dev < 5e-3 * float(np.abs(np.asarray(want)).mean() + 1e-9), dev

    def test_tp_fused_attn_half_block(self, interpret_kernels):
        from korean_f5_tts_tpu.models.dit import _rope_table
        from korean_f5_tts_tpu.models.modules import (
            _merge_heads,
            _split_heads,
            apply_rope,
        )
        from korean_f5_tts_tpu.ops.flash_prefix import flash_prefix_attention
        from korean_f5_tts_tpu.ops.fused_linears import (
            ln_mod_matmul,
            proj_gated_residual,
        )
        from korean_f5_tts_tpu.parallel import tp_kernels as T

        mesh = make_mesh(n_data=2, n_model=4)
        rng = np.random.default_rng(3)
        b, n, dim, heads, dh = 2, 128, 128, 8, 64
        inner = heads * dh
        h = jnp.asarray(rng.standard_normal((b, n, dim)).astype(np.float32))
        sc, sh_, gate = (jnp.asarray(
            rng.standard_normal((1, dim)).astype(np.float32)) * 0.1
            for _ in range(3))
        ap = {}
        for k_ in ("to_q", "to_k", "to_v"):
            ap[k_] = {"w": jnp.asarray(
                rng.standard_normal((dim, inner)).astype(np.float32) * 0.05),
                "b": jnp.asarray(
                rng.standard_normal((inner,)).astype(np.float32) * 0.02)}
        ap["to_out"] = {"w": jnp.asarray(
            rng.standard_normal((inner, dim)).astype(np.float32) * 0.05),
            "b": jnp.asarray(
            rng.standard_normal((dim,)).astype(np.float32) * 0.02)}
        cos, sin = _rope_table(n, dh)
        rope = (jnp.asarray(cos), jnp.asarray(sin))
        lens = jnp.asarray(np.array([96, 128], np.int32))
        pe = 1  # rope on the FIRST GLOBAL head only (F5TTS_Base semantics)

        wqkv = jnp.concatenate([ap[k]["w"] for k in ("to_q", "to_k", "to_v")],
                               axis=1)
        bqkv = jnp.concatenate([ap[k]["b"] for k in ("to_q", "to_k", "to_v")])
        qkv = ln_mod_matmul(h, sc, sh_, wqkv, bqkv, 64)
        q = apply_rope(_split_heads(qkv[..., :inner], heads), rope[0], rope[1], pe)
        k = apply_rope(_split_heads(qkv[..., inner:2 * inner], heads),
                       rope[0], rope[1], pe)
        v = _split_heads(qkv[..., 2 * inner:], heads)
        a = _merge_heads(flash_prefix_attention(q, k, v, lens, 128, 128, True))
        want = proj_gated_residual(a, h, gate, ap["to_out"]["w"],
                                   ap["to_out"]["b"], 64)
        with mesh:
            got = T.attn_half_block_tp(h, sc, sh_, gate, ap, heads, rope, pe,
                                       lens, False, mesh, bq=128, bkv=128, bm=64)
        assert got is not None
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

    def test_tp_flash_int8_matches_single(self, interpret_kernels):
        """int8-dot flash under TP == the single-device int8 kernel exactly
        (attention is head-separable; quantization is per-head-row)."""
        from korean_f5_tts_tpu.ops.flash_prefix import flash_prefix_attention_i8
        from korean_f5_tts_tpu.parallel import tp_kernels as T

        rng = np.random.default_rng(4)
        b, h, n, d = 2, 8, 128, 64
        q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
                   for _ in range(3))
        lens = jnp.asarray(np.array([100, 128], np.int32))
        single = flash_prefix_attention_i8(q, k, v, lens, bq=128, bkv=128,
                                           prune=False, pv_i8=True)
        mesh = make_mesh(n_data=2, n_model=4)
        with mesh:
            tp = T.flash_prefix_i8_tp(q, k, v, lens, 128, 128, False, True, mesh)
        assert tp is not None
        np.testing.assert_allclose(np.asarray(tp), np.asarray(single),
                                   atol=1e-6, rtol=1e-6)

    def test_tp_int8_attn_dispatch(self, interpret_kernels, monkeypatch):
        """F5_TTS_INT8_ATTN under a TP mesh routes sdpa through
        flash_prefix_i8_tp (the dispatch-log proof the dryrun relies on)."""
        from korean_f5_tts_tpu.ops import attention as A

        monkeypatch.setenv("F5_TTS_INT8_ATTN", "1")
        rng = np.random.default_rng(5)
        b, h, n, d = 2, 8, 128, 64
        q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)).astype(np.float32))
                   for _ in range(3))
        lens = jnp.asarray(np.array([100, 128], np.int32))
        mask = jnp.arange(n)[None, :] < lens[:, None]
        mesh = make_mesh(n_data=2, n_model=4)
        A.reset_dispatch_log()
        with mesh:
            out = A.sdpa(q, k, v, mask, prefix_lens=lens)
        assert any("prefix-flash-int8-tp" in p for p in A.get_dispatch_log()), \
            A.get_dispatch_log()
        assert np.isfinite(np.asarray(out)).all()

    def test_tp_fused_attn_half_block_int8(self, interpret_kernels):
        """int8-weight fused attention half-block under TP vs the
        single-device int8 fused chain (the headline serving mode's TP path)."""
        from korean_f5_tts_tpu.models.dit import _rope_table
        from korean_f5_tts_tpu.models.modules import (
            _merge_heads,
            _split_heads,
            apply_rope,
        )
        from korean_f5_tts_tpu.models.quant import quantize_linear
        from korean_f5_tts_tpu.ops.flash_prefix import flash_prefix_attention
        from korean_f5_tts_tpu.ops.fused_linears import (
            ln_mod_matmul_int8,
            proj_gated_residual_int8,
        )
        from korean_f5_tts_tpu.parallel import tp_kernels as T

        mesh = make_mesh(n_data=2, n_model=4)
        rng = np.random.default_rng(6)
        b, n, dim, heads, dh = 2, 128, 128, 8, 64
        inner = heads * dh
        h = jnp.asarray(rng.standard_normal((b, n, dim)).astype(np.float32))
        sc, sh_, gate = (jnp.asarray(
            rng.standard_normal((1, dim)).astype(np.float32)) * 0.1
            for _ in range(3))
        ap = {}
        for k_ in ("to_q", "to_k", "to_v"):
            ap[k_] = quantize_linear(
                {"w": rng.standard_normal((dim, inner)).astype(np.float32) * 0.05,
                 "b": rng.standard_normal((inner,)).astype(np.float32) * 0.02})
        ap["to_out"] = quantize_linear(
            {"w": rng.standard_normal((inner, dim)).astype(np.float32) * 0.05,
             "b": rng.standard_normal((dim,)).astype(np.float32) * 0.02})
        cos, sin = _rope_table(n, dh)
        rope = (jnp.asarray(cos), jnp.asarray(sin))
        lens = jnp.asarray(np.array([96, 128], np.int32))
        pe = 1

        qp_qkv = {
            "w_int8": jnp.concatenate(
                [ap[k]["w_int8"] for k in ("to_q", "to_k", "to_v")], axis=1),
            "w_scale": jnp.concatenate(
                [ap[k]["w_scale"] for k in ("to_q", "to_k", "to_v")]),
            "b": jnp.concatenate([ap[k]["b"] for k in ("to_q", "to_k", "to_v")]),
        }
        qkv = ln_mod_matmul_int8(h, sc, sh_, qp_qkv, 64)
        q = apply_rope(_split_heads(qkv[..., :inner], heads), rope[0], rope[1], pe)
        k = apply_rope(_split_heads(qkv[..., inner:2 * inner], heads),
                       rope[0], rope[1], pe)
        v = _split_heads(qkv[..., 2 * inner:], heads)
        a = _merge_heads(flash_prefix_attention(q, k, v, lens, 128, 128, True))
        want = proj_gated_residual_int8(a, h, gate, ap["to_out"], 64)
        with mesh:
            got = T.attn_half_block_tp(h, sc, sh_, gate, ap, heads, rope, pe,
                                       lens, False, mesh, bq=128, bkv=128, bm=64)
        assert got is not None
        # out-proj activation quant is per shard (its own row scales): tiny
        # sub-quant-noise deviation from the single-device kernel is expected
        dev = float(np.abs(np.asarray(got) - np.asarray(want)).max())
        assert dev < 5e-3 * float(np.abs(np.asarray(want)).mean() + 1e-9), dev

    def test_tp_int8_sampler_matches_single_device(self, interpret_kernels):
        """Regression (round-4 advisor high): with int8 weights under a TP
        mesh, attn_half_block_tp succeeds AND the unfused attention used to
        run a second time on top of it (dit.py else-branch), diverging 0.27
        max-abs. The AdaLN-zero layers must be randomized or every gate is 0
        and the bug is invisible."""
        from korean_f5_tts_tpu.models.quant import quantize_params
        from korean_f5_tts_tpu.ops import attention as A

        params = init_dit(jax.random.PRNGKey(0), KERNEL_TINY)
        keys = iter(jax.random.split(jax.random.PRNGKey(7), 200))
        params = jax.tree_util.tree_map(
            lambda x: (0.05 * jax.random.normal(next(keys), x.shape)
                       ).astype(x.dtype)
            if x.size and float(jnp.abs(x).max()) == 0.0 else x, params)
        qparams = quantize_params(params)
        rng = np.random.default_rng(0)
        cond = jnp.asarray(rng.standard_normal((1, 80, 10)).astype(np.float32))
        text = jnp.asarray(np.array([[1, 2, 3]], dtype=np.int32))

        out_single, _ = cfm_sample(qparams, KERNEL_TINY, cond, text,
                                   duration=200, steps=2, cfg_strength=2.0,
                                   seed=0, duration_bucket=256)
        mesh = make_mesh(n_data=2, n_model=4)
        A.reset_dispatch_log()
        with mesh:
            sharded = shard_params(qparams, mesh)
            out_tp, _ = cfm_sample(sharded, KERNEL_TINY, cond, text,
                                   duration=200, steps=2, cfg_strength=2.0,
                                   seed=0, duration_bucket=256)
        log = A.get_dispatch_log()
        assert any("attn-half-block-int8-tp" in p for p in log), log
        assert any("ff-fused-int8-tp" in p for p in log), log
        ref = np.asarray(out_single)
        d = np.abs(np.asarray(out_tp) - ref)
        scale = float(np.abs(ref).mean() + 1e-9)
        # per-shard second-quant scales accumulate ~0.1% MAE over the CFG
        # Euler steps; the double-apply bug measured 35% of mean — orders
        # apart from both thresholds
        assert float(d.mean()) < 5e-3 * scale, (d.mean(), scale)
        assert float(d.max()) < 5e-2 * scale, (d.max(), scale)

    def test_tp_sampler_runs_pallas_kernels(self, interpret_kernels):
        """Full CFG sampler under dp x tp: attention through the Pallas
        prefix-flash kernel via shard_map, output == the plain XLA sampler."""
        from korean_f5_tts_tpu.ops import attention as A

        params = init_dit(jax.random.PRNGKey(0), KERNEL_TINY)
        params["proj_out"]["w"] = jax.random.normal(
            jax.random.PRNGKey(1), params["proj_out"]["w"].shape) * 0.05
        rng = np.random.default_rng(0)
        cond = jnp.asarray(rng.standard_normal((1, 40, 10)).astype(np.float32))
        text = jnp.asarray(np.array([[1, 2, 3]], dtype=np.int32))

        # duration 100 < bucket 128: the bucket-tail pad mask exercises the
        # MASKED prefix-flash path (the production serving configuration)
        out_xla, _ = cfm_sample(params, KERNEL_TINY, cond, text, duration=100,
                                steps=2, cfg_strength=2.0, seed=0,
                                duration_bucket=128)

        mesh = make_mesh(n_data=2, n_model=4)
        A.reset_dispatch_log()
        with mesh:
            sharded = shard_params(
                init_dit(jax.random.PRNGKey(0), KERNEL_TINY), mesh)
            sharded["proj_out"]["w"] = params["proj_out"]["w"]
            out_tp, _ = cfm_sample(sharded, KERNEL_TINY, cond, text,
                                   duration=100, steps=2, cfg_strength=2.0,
                                   seed=0, duration_bucket=128)
        log = A.get_dispatch_log()
        assert any("prefix-flash" in p and "-tp[" in p for p in log), log
        np.testing.assert_allclose(np.asarray(out_tp), np.asarray(out_xla),
                                   atol=5e-4, rtol=5e-4)
