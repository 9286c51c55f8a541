"""Prefix-flash Pallas kernel vs the XLA reference formulation (interpret
mode on CPU; the same kernel code runs compiled on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.ops import flash_prefix as fp


@pytest.fixture(autouse=True)
def _interpret():
    old = fp._INTERPRET
    fp._INTERPRET = True
    yield
    fp._INTERPRET = old


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize("lens", [[100, 256], [256, 256], [40, 150]])
def test_matches_xla_reference(lens):
    b, h, n, d = 2, 2, 256, 64
    q, k, v = _rand((b, h, n, d), 1), _rand((b, h, n, d), 2), _rand((b, h, n, d), 3)
    kv_lens = jnp.asarray(lens, jnp.int32)
    got = fp.flash_prefix_attention(q, k, v, kv_lens, bq=128, bkv=128)
    want = fp._xla_prefix_attention(q, k, v, kv_lens)
    # compare only valid query rows; rows past the prefix are zeroed by callers
    for i, L in enumerate(lens):
        np.testing.assert_allclose(np.asarray(got)[i, :, :L],
                                   np.asarray(want)[i, :, :L],
                                   rtol=2e-5, atol=2e-5)


def test_noprune_matches_pruned():
    # prune=False (headline path: all chunks computed, masked-out chunks are
    # exact no-ops) must equal prune=True and the XLA reference
    b, h, n, d = 1, 2, 512, 64
    q, k, v = _rand((b, h, n, d), 40), _rand((b, h, n, d), 41), _rand((b, h, n, d), 42)
    kv_lens = jnp.asarray([130], jnp.int32)  # 3 of 4 chunks fully masked
    got_np = fp.flash_prefix_attention(q, k, v, kv_lens, 128, 128, False)
    got_p = fp.flash_prefix_attention(q, k, v, kv_lens, 128, 128, True)
    want = fp._xla_prefix_attention(q, k, v, kv_lens)
    np.testing.assert_allclose(np.asarray(got_np)[:, :, :130],
                               np.asarray(want)[:, :, :130], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_np)[:, :, :130],
                               np.asarray(got_p)[:, :, :130], rtol=1e-6, atol=1e-6)


def test_broadcast_single_len():
    b, h, n, d = 3, 2, 256, 64
    q, k, v = _rand((b, h, n, d), 4), _rand((b, h, n, d), 5), _rand((b, h, n, d), 6)
    kv_lens = jnp.asarray([190], jnp.int32)  # [1] broadcasts over the batch
    got = fp.flash_prefix_attention(q, k, v, kv_lens, bq=128, bkv=128)
    want = fp._xla_prefix_attention(q, k, v, jnp.full((b,), 190, jnp.int32))
    np.testing.assert_allclose(np.asarray(got)[:, :, :190],
                               np.asarray(want)[:, :, :190], rtol=2e-5, atol=2e-5)


def test_short_prefix_prunes_blocks():
    # kv_len < bkv: later KV blocks are skipped entirely; result still exact
    b, h, n, d = 1, 2, 512, 64
    q, k, v = _rand((b, h, n, d), 7), _rand((b, h, n, d), 8), _rand((b, h, n, d), 9)
    kv_lens = jnp.asarray([77], jnp.int32)
    got = fp.flash_prefix_attention(q, k, v, kv_lens, bq=128, bkv=128)
    want = fp._xla_prefix_attention(q, k, v, kv_lens)
    np.testing.assert_allclose(np.asarray(got)[:, :, :77],
                               np.asarray(want)[:, :, :77], rtol=2e-5, atol=2e-5)


def test_nondividing_chunk_plan():
    # n = 384 with bkv=256 -> static chunks [256, 128]; n%512 != 0 shapes
    # (128-frame duration buckets) must still be exact
    b, h, n, d = 2, 2, 384, 64
    q, k, v = _rand((b, h, n, d), 30), _rand((b, h, n, d), 31), _rand((b, h, n, d), 32)
    kv_lens = jnp.asarray([300, 384], jnp.int32)
    got = fp.flash_prefix_attention(q, k, v, kv_lens, bq=128, bkv=256)
    want = fp._xla_prefix_attention(q, k, v, kv_lens)
    for i, L in enumerate([300, 384]):
        np.testing.assert_allclose(np.asarray(got)[i, :, :L],
                                   np.asarray(want)[i, :, :L], rtol=2e-5, atol=2e-5)


def test_qkv_nondividing_chunk_plan():
    from korean_f5_tts_tpu.models.modules import rope_cos_sin

    b, heads, n, dh = 1, 2, 384, 64
    qkv = _rand((b, n, 3 * heads * dh), 33)
    cos, sin = rope_cos_sin(n, dh)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    kv_lens = jnp.asarray([311], jnp.int32)
    got = fp.flash_prefix_qkv_attention(qkv, kv_lens, heads, cos, sin,
                                        None, 128, 256)
    want = fp._xla_qkv_reference(qkv, kv_lens, heads, cos, sin, None)
    np.testing.assert_allclose(np.asarray(got)[:, :311],
                               np.asarray(want)[:, :311], rtol=2e-5, atol=2e-5)


def test_bf16_inputs():
    b, h, n, d = 2, 2, 256, 64
    q = _rand((b, h, n, d), 10).astype(jnp.bfloat16)
    k = _rand((b, h, n, d), 11).astype(jnp.bfloat16)
    v = _rand((b, h, n, d), 12).astype(jnp.bfloat16)
    kv_lens = jnp.asarray([200, 130], jnp.int32)
    got = fp.flash_prefix_attention(q, k, v, kv_lens, bq=128, bkv=128)
    want = fp._xla_prefix_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                                    v.astype(jnp.float32), kv_lens)
    for i, L in enumerate([200, 130]):
        np.testing.assert_allclose(np.asarray(got.astype(jnp.float32))[i, :, :L],
                                   np.asarray(want)[i, :, :L], rtol=0.02, atol=0.02)


@pytest.mark.parametrize("pe_attn_head", [None, 1])
def test_qkv_fused_matches_reference(pe_attn_head):
    # fused-layout kernel: strided qkv views + in-register rope
    from korean_f5_tts_tpu.models.modules import rope_cos_sin

    b, heads, n, dh = 2, 2, 256, 64
    qkv = _rand((b, n, 3 * heads * dh), 20)
    cos, sin = rope_cos_sin(n, dh)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    kv_lens = jnp.asarray([200, 256], jnp.int32)
    got = fp.flash_prefix_qkv_attention(qkv, kv_lens, heads, cos, sin,
                                        pe_attn_head, 128, 128)
    want = fp._xla_qkv_reference(qkv, kv_lens, heads, cos, sin, pe_attn_head)
    for i, L in enumerate([200, 256]):
        np.testing.assert_allclose(np.asarray(got)[i, :L],
                                   np.asarray(want)[i, :L], rtol=2e-5, atol=2e-5)


def test_qkv_fused_unmasked_full_len():
    from korean_f5_tts_tpu.models.modules import rope_cos_sin

    b, heads, n, dh = 1, 4, 256, 64
    qkv = _rand((b, n, 3 * heads * dh), 21)
    cos, sin = rope_cos_sin(n, dh)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    kv_lens = jnp.asarray([n], jnp.int32)
    got = fp.flash_prefix_qkv_attention(qkv, kv_lens, heads, cos, sin,
                                        None, 128, 128)
    want = fp._xla_qkv_reference(qkv, kv_lens, heads, cos, sin, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_qkv_fused_grad():
    from korean_f5_tts_tpu.models.modules import rope_cos_sin

    b, heads, n, dh = 1, 2, 256, 64
    qkv = _rand((b, n, 3 * heads * dh), 22)
    cos, sin = rope_cos_sin(n, dh)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    kv_lens = jnp.asarray([256], jnp.int32)
    w = _rand((b, n, heads * dh), 23)

    def loss_kernel(a):
        return jnp.sum(fp.flash_prefix_qkv_attention(a, kv_lens, heads, cos,
                                                     sin, None, 128, 128) * w)

    def loss_ref(a):
        return jnp.sum(fp._xla_qkv_reference(a, kv_lens, heads, cos, sin, None) * w)

    gk = jax.grad(loss_kernel)(qkv)
    gr = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("pe_attn_head", [None, 1])
def test_rope_in_kernel_matches_reference(pe_attn_head):
    from korean_f5_tts_tpu.models.modules import rope_cos_sin

    b, h, n, d = 2, 2, 256, 64
    q, k, v = _rand((b, h, n, d), 60), _rand((b, h, n, d), 61), _rand((b, h, n, d), 62)
    cos, sin = rope_cos_sin(n, d)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    kv_lens = jnp.asarray([200, 256], jnp.int32)
    got = fp.flash_prefix_rope_attention(q, k, v, kv_lens, cos, sin,
                                         pe_attn_head, 128, 128, False)
    want = fp._xla_rope_prefix_reference(q, k, v, kv_lens, cos, sin, pe_attn_head)
    for i, L in enumerate([200, 256]):
        np.testing.assert_allclose(np.asarray(got)[i, :, :L],
                                   np.asarray(want)[i, :, :L], rtol=2e-5, atol=2e-5)


def test_grad_matches_xla():
    # training path: custom_vjp backward == differentiating the XLA reference
    b, h, n, d = 1, 2, 256, 64
    q, k, v = _rand((b, h, n, d), 13), _rand((b, h, n, d), 14), _rand((b, h, n, d), 15)
    kv_lens = jnp.asarray([180], jnp.int32)
    w = _rand((b, h, n, d), 16)

    def loss_kernel(q, k, v):
        out = fp.flash_prefix_attention(q, k, v, kv_lens, 128, 128)
        return jnp.sum(out[:, :, :180] * w[:, :, :180])

    def loss_ref(q, k, v):
        out = fp._xla_prefix_attention(q, k, v, kv_lens)
        return jnp.sum(out[:, :, :180] * w[:, :, :180])

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-5, atol=2e-5)


def test_transposed_kernel_matches_reference(monkeypatch):
    # F5_TTS_FLASH_T=1: transposed-compute variant (PV accumulate contracts
    # the chunk dim -> full MXU lanes at dh=64) must be numerically identical
    monkeypatch.setenv("F5_TTS_FLASH_T", "1")
    b, h, n, d = 2, 2, 256, 64
    q, k, v = _rand((b, h, n, d), 50), _rand((b, h, n, d), 51), _rand((b, h, n, d), 52)
    kv_lens = jnp.asarray([100, 256], jnp.int32)
    got = fp.flash_prefix_attention(q, k, v, kv_lens, bq=128, bkv=128)
    want = fp._xla_prefix_attention(q, k, v, kv_lens)
    for i, L in enumerate([100, 256]):
        np.testing.assert_allclose(np.asarray(got)[i, :, :L],
                                   np.asarray(want)[i, :, :L],
                                   rtol=2e-5, atol=2e-5)


def test_transposed_kernel_prune(monkeypatch):
    monkeypatch.setenv("F5_TTS_FLASH_T", "1")
    b, h, n, d = 1, 2, 512, 64
    q, k, v = _rand((b, h, n, d), 53), _rand((b, h, n, d), 54), _rand((b, h, n, d), 55)
    kv_lens = jnp.asarray([130], jnp.int32)
    got = fp.flash_prefix_attention(q, k, v, kv_lens, 128, 128, True)
    want = fp._xla_prefix_attention(q, k, v, kv_lens)
    np.testing.assert_allclose(np.asarray(got)[:, :, :130],
                               np.asarray(want)[:, :, :130], rtol=2e-5, atol=2e-5)


def test_flash_bwd_per_item_lens_bf16():
    # pallas backward (dq/dk/dv kernels) vs XLA vjp: batch of 2 with
    # different prefixes, bf16 inputs (the training dtype)
    b, h, n, d = 2, 2, 256, 64
    q = _rand((b, h, n, d), 60).astype(jnp.bfloat16)
    k = _rand((b, h, n, d), 61).astype(jnp.bfloat16)
    v = _rand((b, h, n, d), 62).astype(jnp.bfloat16)
    g = _rand((b, h, n, d), 63).astype(jnp.bfloat16)
    kv_lens = jnp.asarray([150, 230], jnp.int32)

    _, vjp = jax.vjp(
        lambda a, b_, c: fp._xla_prefix_attention(a, b_, c, kv_lens), q, k, v)
    ref = vjp(g)
    got = fp.flash_prefix_attention_bwd(q, k, v, kv_lens, g, bq=128, bkv=128)
    for a, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(r, np.float32),
                                   rtol=0.05, atol=0.05)


def test_flash_bwd_env_off_matches(monkeypatch):
    # F5_TTS_FLASH_BWD=0 must fall back to the XLA-vjp backward
    monkeypatch.setenv("F5_TTS_FLASH_BWD", "0")
    b, h, n, d = 1, 2, 256, 64
    q, k, v = _rand((b, h, n, d), 70), _rand((b, h, n, d), 71), _rand((b, h, n, d), 72)
    kv_lens = jnp.asarray([180], jnp.int32)
    w = _rand((b, h, n, d), 73)

    def loss(q, k, v):
        out = fp.flash_prefix_attention(q, k, v, kv_lens, 128, 128)
        return jnp.sum(out[:, :, :180] * w[:, :, :180])

    def loss_ref(q, k, v):
        out = fp._xla_prefix_attention(q, k, v, kv_lens)
        return jnp.sum(out[:, :, :180] * w[:, :, :180])

    gk = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("prune", [False, True])
def test_v2_dot_folded_kernel(prune):
    # v2 kernel (mask + denominator folded into the dots) vs XLA reference,
    # called directly: mixed per-item prefixes incl. a bucket-exact one
    b, h, n, d = 2, 2, 512, 64
    q = _rand((b, h, n, d), 80)
    k = _rand((b, h, n, d), 81)
    v = _rand((b, h, n, d), 82)
    kv_lens = jnp.asarray([130, 512], jnp.int32)
    lens_h = jnp.repeat(kv_lens, h)
    got = fp._flash_prefix_folded_v2(
        q.reshape(b * h, n, d), k.reshape(b * h, n, d),
        v.reshape(b * h, n, d), lens_h, 1.0 / np.sqrt(d),
        bq=128, ck=128, prune=prune).reshape(b, h, n, d)
    want = fp._xla_prefix_attention(q, k, v, kv_lens)
    for i, L in enumerate([130, 512]):
        np.testing.assert_allclose(np.asarray(got)[i, :, :L],
                                   np.asarray(want)[i, :, :L],
                                   rtol=2e-5, atol=2e-5)


def test_v2_env_off_uses_v1(monkeypatch):
    # both kernel generations must agree through the public API
    b, h, n, d = 1, 2, 256, 64
    q, k, v = _rand((b, h, n, d), 90), _rand((b, h, n, d), 91), _rand((b, h, n, d), 92)
    kv_lens = jnp.asarray([200], jnp.int32)
    monkeypatch.setenv("F5_TTS_FLASH_V2", "0")
    got_v1 = fp.flash_prefix_attention(q, k, v, kv_lens, 128, 128, False)
    monkeypatch.setenv("F5_TTS_FLASH_V2", "1")
    got_v2 = fp.flash_prefix_attention(q, k, v, kv_lens, 128, 128, False)
    want = fp._xla_prefix_attention(q, k, v, kv_lens)
    np.testing.assert_allclose(np.asarray(got_v1)[:, :, :200],
                               np.asarray(want)[:, :, :200], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_v2)[:, :, :200],
                               np.asarray(want)[:, :, :200], rtol=2e-5, atol=2e-5)


def test_v2_bf16_bucket_tail():
    # bf16 inputs (the serving dtype) with a short prefix in a long bucket
    b, h, n, d = 1, 4, 640, 64
    q = _rand((b, h, n, d), 95).astype(jnp.bfloat16)
    k = _rand((b, h, n, d), 96).astype(jnp.bfloat16)
    v = _rand((b, h, n, d), 97).astype(jnp.bfloat16)
    kv_lens = jnp.asarray([300], jnp.int32)
    lens_h = jnp.repeat(kv_lens, b * h)
    got = fp._flash_prefix_folded_v2(
        q.reshape(b * h, n, d), k.reshape(b * h, n, d),
        v.reshape(b * h, n, d), lens_h, 1.0 / np.sqrt(d),
        bq=128, ck=256, prune=False).reshape(b, h, n, d)
    want = fp._xla_prefix_attention(q, k, v, kv_lens)
    np.testing.assert_allclose(np.asarray(got, np.float32)[:, :, :300],
                               np.asarray(want, np.float32)[:, :, :300],
                               rtol=2e-2, atol=2e-2)


def test_v2_lse_matches_v1_lse():
    # training fwd: v2 (dot-folded) o/lse must match the v1 lse-emitting fwd
    b, h, n, d = 1, 2, 384, 64
    q = _rand((b, h, n, d), 100)
    k = _rand((b, h, n, d), 101)
    v = _rand((b, h, n, d), 102)
    lens_h = jnp.repeat(jnp.asarray([250], jnp.int32), b * h)
    sc = 1.0 / np.sqrt(d)
    o1, lse1 = fp._flash_prefix_folded_lse(
        q.reshape(b * h, n, d), k.reshape(b * h, n, d),
        v.reshape(b * h, n, d), lens_h, sc, bq=128, ck=128)
    o2, lse2 = fp._flash_prefix_folded_v2_lse(
        q.reshape(b * h, n, d), k.reshape(b * h, n, d),
        v.reshape(b * h, n, d), lens_h, sc, bq=128, ck=128)
    np.testing.assert_allclose(np.asarray(o2)[:, :250], np.asarray(o1)[:, :250],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lse2)[:, :250],
                               np.asarray(lse1)[:, :250], rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("pv_i8", [True, False])
def test_int8_attention_close_to_reference(pv_i8):
    # int8 QK(/PV) kernel: per-head 127-level quantization bounds the error;
    # attention outputs are O(1) (weighted means of v), so absolute ~2e-2
    b, h, n, d = 2, 2, 256, 64
    q, k, v = _rand((b, h, n, d), 110), _rand((b, h, n, d), 111), _rand((b, h, n, d), 112)
    kv_lens = jnp.asarray([150, 256], jnp.int32)
    got = fp.flash_prefix_attention_i8(q, k, v, kv_lens, bq=128, bkv=128,
                                       pv_i8=pv_i8)
    want = fp._xla_prefix_attention(q, k, v, kv_lens)
    for i, L in enumerate([150, 256]):
        err = np.abs(np.asarray(got, np.float32)[i, :, :L]
                     - np.asarray(want)[i, :, :L])
        assert err.max() < 0.03, (pv_i8, err.max())
        assert err.mean() < 0.005, (pv_i8, err.mean())


def test_int8_attention_prune_matches_noprune():
    b, h, n, d = 1, 2, 512, 64
    q, k, v = _rand((b, h, n, d), 120), _rand((b, h, n, d), 121), _rand((b, h, n, d), 122)
    kv_lens = jnp.asarray([130], jnp.int32)
    a = fp.flash_prefix_attention_i8(q, k, v, kv_lens, 128, 128, prune=False)
    b_ = fp.flash_prefix_attention_i8(q, k, v, kv_lens, 128, 128, prune=True)
    np.testing.assert_allclose(np.asarray(a, np.float32)[:, :, :130],
                               np.asarray(b_, np.float32)[:, :, :130],
                               rtol=1e-6, atol=1e-6)


class TestOnlineMaxOptOut:
    """F5_TTS_FLASH_STATICMAX=0 reverts the inference forward to the
    online-max kernel (static-max is the default since round 4); keep that
    kernel covered under the flipped default."""

    @pytest.fixture(autouse=True)
    def _onlinemax(self, monkeypatch):
        monkeypatch.setenv("F5_TTS_FLASH_STATICMAX", "0")
        fp._flash_prefix_folded.clear_cache()
        yield
        fp._flash_prefix_folded.clear_cache()

    def test_matches_xla_reference(self):
        b, h, n, d = 2, 2, 256, 64
        q, k, v = _rand((b, h, n, d), 21), _rand((b, h, n, d), 22), _rand((b, h, n, d), 23)
        lens = [100, 256]
        kv_lens = jnp.asarray(lens, jnp.int32)
        got = fp.flash_prefix_attention(q, k, v, kv_lens, 128, 128, False)
        want = fp._xla_prefix_attention(q, k, v, kv_lens)
        for i, L in enumerate(lens):
            np.testing.assert_allclose(np.asarray(got)[i, :, :L],
                                       np.asarray(want)[i, :, :L],
                                       atol=2e-5, rtol=2e-5)


class TestStaticMaxSoftmax:
    """F5_TTS_FLASH_STATICMAX=1 (the default): single-pass softmax with a
    static base-2 offset (no online max). Mathematically identical within the
    bounded-logit contract; overflow clamps instead of NaN."""

    @pytest.fixture(autouse=True)
    def _staticmax(self, monkeypatch):
        monkeypatch.setenv("F5_TTS_FLASH_STATICMAX", "1")
        # the jitted wrapper reads the env at trace time; clear its cache so
        # this test doesn't reuse an online-max trace (and vice versa)
        fp._flash_prefix_folded.clear_cache()
        yield
        fp._flash_prefix_folded.clear_cache()

    @pytest.mark.parametrize("lens", [[100, 256], [256, 256]])
    def test_matches_xla_reference(self, lens):
        b, h, n, d = 2, 2, 256, 64
        q, k, v = _rand((b, h, n, d), 1), _rand((b, h, n, d), 2), _rand((b, h, n, d), 3)
        kv_lens = jnp.asarray(lens, jnp.int32)
        got = fp.flash_prefix_attention(q, k, v, kv_lens, 128, 128, False)
        want = fp._xla_prefix_attention(q, k, v, kv_lens)
        for i, L in enumerate(lens):
            np.testing.assert_allclose(np.asarray(got)[i, :, :L],
                                       np.asarray(want)[i, :, :L],
                                       atol=2e-5, rtol=2e-5)

    def test_prune_matches_noprune(self):
        b, h, n, d = 1, 2, 512, 64
        q, k, v = _rand((b, h, n, d), 4), _rand((b, h, n, d), 5), _rand((b, h, n, d), 6)
        kv_lens = jnp.asarray([130], jnp.int32)
        a = fp.flash_prefix_attention(q, k, v, kv_lens, 128, 128, False)
        b_ = fp.flash_prefix_attention(q, k, v, kv_lens, 128, 128, True)
        np.testing.assert_allclose(np.asarray(a)[:, :, :130],
                                   np.asarray(b_)[:, :, :130],
                                   rtol=1e-6, atol=1e-6)

    def test_extreme_logits_clamp_not_nan(self):
        b, h, n, d = 1, 1, 256, 64
        q = _rand((b, h, n, d), 7) * 30.0  # raw logits far past the contract
        k, v = _rand((b, h, n, d), 8), _rand((b, h, n, d), 9)
        out = np.asarray(fp.flash_prefix_attention(
            q, k, v, jnp.asarray([256], jnp.int32), 128, 128, False))
        assert np.isfinite(out).all()

    def test_grad_context_keeps_online_max(self):
        """Training forwards must NOT switch to the static-max kernel: the
        custom_vjp fwd routes through the lse-emitting online-max kernel."""
        b, h, n, d = 1, 2, 256, 64
        q, k, v = _rand((b, h, n, d), 10), _rand((b, h, n, d), 11), _rand((b, h, n, d), 12)
        lens = jnp.asarray([256], jnp.int32)

        def f(q_):
            return fp.flash_prefix_attention(q_, k, v, lens, 128, 128, False).sum()

        g = jax.grad(f)(q)
        # grads must match the XLA formulation (exact math, loose fp tol)
        def f_ref(q_):
            return fp._xla_prefix_attention(q_, k, v, lens).sum()

        g_ref = jax.grad(f_ref)(q)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   atol=3e-5, rtol=3e-5)


class TestHeadsTwoPerInstance:
    """F5_TTS_FLASH_HEADS2=1: two heads per kernel instance with interleaved
    chunk chains (staticmax-only). Must match the XLA reference exactly like
    the single-head kernel does."""

    @pytest.fixture(autouse=True)
    def _heads2(self, monkeypatch):
        monkeypatch.setenv("F5_TTS_FLASH_STATICMAX", "1")
        monkeypatch.setenv("F5_TTS_FLASH_HEADS2", "1")
        fp._flash_prefix_folded.clear_cache()
        yield
        fp._flash_prefix_folded.clear_cache()

    @pytest.mark.parametrize("lens", [[100, 256], [256, 200]])
    def test_matches_xla_reference(self, lens):
        b, h, n, d = 2, 2, 256, 64  # folded H = 4 -> two instances
        q, k, v = _rand((b, h, n, d), 31), _rand((b, h, n, d), 32), _rand((b, h, n, d), 33)
        kv_lens = jnp.asarray(lens, jnp.int32)
        got = fp.flash_prefix_attention(q, k, v, kv_lens, 128, 128, False)
        want = fp._xla_prefix_attention(q, k, v, kv_lens)
        for i, L in enumerate(lens):
            np.testing.assert_allclose(np.asarray(got)[i, :, :L],
                                       np.asarray(want)[i, :, :L],
                                       atol=2e-5, rtol=2e-5)

    def test_prune_matches_noprune(self):
        b, h, n, d = 1, 2, 512, 64
        q, k, v = _rand((b, h, n, d), 34), _rand((b, h, n, d), 35), _rand((b, h, n, d), 36)
        kv_lens = jnp.asarray([130], jnp.int32)
        a = fp.flash_prefix_attention(q, k, v, kv_lens, 128, 128, False)
        b_ = fp.flash_prefix_attention(q, k, v, kv_lens, 128, 128, True)
        np.testing.assert_allclose(np.asarray(a)[:, :, :130],
                                   np.asarray(b_)[:, :, :130],
                                   rtol=1e-6, atol=1e-6)

    def test_odd_head_count_falls_back(self):
        """H odd -> the single-head kernel runs (no shape error)."""
        b, h, n, d = 1, 3, 256, 64
        q, k, v = _rand((b, h, n, d), 37), _rand((b, h, n, d), 38), _rand((b, h, n, d), 39)
        kv_lens = jnp.asarray([200], jnp.int32)
        got = fp.flash_prefix_attention(q, k, v, kv_lens, 128, 128, False)
        want = fp._xla_prefix_attention(q, k, v, kv_lens)
        np.testing.assert_allclose(np.asarray(got)[:, :, :200],
                                   np.asarray(want)[:, :, :200],
                                   atol=2e-5, rtol=2e-5)


class TestHeadsNPerInstance:
    """F5_TTS_FLASH_HEADS=nh generalizes the two-chain kernel to nh
    interleaved per-head chains. Same math per head, so XLA parity must
    hold at any nh dividing the folded head count."""

    @pytest.fixture(autouse=True)
    def _heads4(self, monkeypatch):
        monkeypatch.setenv("F5_TTS_FLASH_STATICMAX", "1")
        monkeypatch.setenv("F5_TTS_FLASH_HEADS", "4")
        fp._flash_prefix_folded.clear_cache()
        yield
        fp._flash_prefix_folded.clear_cache()

    @pytest.mark.parametrize("lens", [[100, 256], [256, 200]])
    def test_matches_xla_reference(self, lens):
        b, h, n, d = 2, 4, 256, 64  # folded H = 8 -> two instances
        q, k, v = _rand((b, h, n, d), 41), _rand((b, h, n, d), 42), _rand((b, h, n, d), 43)
        kv_lens = jnp.asarray(lens, jnp.int32)
        got = fp.flash_prefix_attention(q, k, v, kv_lens, 128, 128, False)
        want = fp._xla_prefix_attention(q, k, v, kv_lens)
        for i, L in enumerate(lens):
            np.testing.assert_allclose(np.asarray(got)[i, :, :L],
                                       np.asarray(want)[i, :, :L],
                                       atol=2e-5, rtol=2e-5)

    def test_prune_matches_noprune(self):
        b, h, n, d = 1, 4, 512, 64
        q, k, v = _rand((b, h, n, d), 44), _rand((b, h, n, d), 45), _rand((b, h, n, d), 46)
        kv_lens = jnp.asarray([130], jnp.int32)
        a = fp.flash_prefix_attention(q, k, v, kv_lens, 128, 128, False)
        b_ = fp.flash_prefix_attention(q, k, v, kv_lens, 128, 128, True)
        np.testing.assert_allclose(np.asarray(a)[:, :, :130],
                                   np.asarray(b_)[:, :, :130],
                                   rtol=1e-6, atol=1e-6)

    def test_non_divisible_head_count_falls_back(self):
        """folded H = 3 not divisible by 4 -> single-head kernel runs."""
        b, h, n, d = 1, 3, 256, 64
        q, k, v = _rand((b, h, n, d), 47), _rand((b, h, n, d), 48), _rand((b, h, n, d), 49)
        kv_lens = jnp.asarray([200], jnp.int32)
        got = fp.flash_prefix_attention(q, k, v, kv_lens, 128, 128, False)
        want = fp._xla_prefix_attention(q, k, v, kv_lens)
        np.testing.assert_allclose(np.asarray(got)[:, :, :200],
                                   np.asarray(want)[:, :, :200],
                                   atol=2e-5, rtol=2e-5)


class TestHeadsDefaultResolution:
    """Round-5 default: nh=8, VMEM-capped by n (resolve_flash_heads)."""

    def test_default_is_eight_capped_by_n(self, monkeypatch):
        monkeypatch.delenv("F5_TTS_FLASH_HEADS", raising=False)
        monkeypatch.delenv("F5_TTS_FLASH_HEADS2", raising=False)
        assert fp.resolve_flash_heads(512) == 8
        assert fp.resolve_flash_heads(1536) == 8   # headline shape
        assert fp.resolve_flash_heads(2048) == 8
        assert fp.resolve_flash_heads(3072) == 4   # K/V db footprint > 12MB
        assert fp.resolve_flash_heads(4096) == 4
        assert fp.resolve_flash_heads(6144) == 2
        monkeypatch.setenv("F5_TTS_FLASH_HEADS2", "0")
        assert fp.resolve_flash_heads(512) == 1
        monkeypatch.setenv("F5_TTS_FLASH_HEADS", "4")
        assert fp.resolve_flash_heads(6144) == 4   # override skips the cap

    @pytest.mark.parametrize("lens", [[100, 256], [256, 160]])
    def test_nh8_matches_xla_reference(self, lens, monkeypatch):
        """Default resolution (nh=8) on a folded H=16 -> two instances."""
        monkeypatch.setenv("F5_TTS_FLASH_STATICMAX", "1")
        monkeypatch.delenv("F5_TTS_FLASH_HEADS", raising=False)
        monkeypatch.delenv("F5_TTS_FLASH_HEADS2", raising=False)
        fp._flash_prefix_folded.clear_cache()
        try:
            b, h, n, d = 2, 8, 256, 64
            q, k, v = _rand((b, h, n, d), 51), _rand((b, h, n, d), 52), _rand((b, h, n, d), 53)
            kv_lens = jnp.asarray(lens, jnp.int32)
            got = fp.flash_prefix_attention(q, k, v, kv_lens, 128, 128, False)
            want = fp._xla_prefix_attention(q, k, v, kv_lens)
            for i, L in enumerate(lens):
                np.testing.assert_allclose(np.asarray(got)[i, :, :L],
                                           np.asarray(want)[i, :, :L],
                                           atol=2e-5, rtol=2e-5)
        finally:
            fp._flash_prefix_folded.clear_cache()
