"""Attention dispatch: Pallas TPU flash kernel on TPU, XLA SDPA elsewhere.

Role parity with the reference's attention backends (`modules.py:445-544`:
torch SDPA or flash-attn CUDA varlen) — the TPU-native equivalent of the
flash-attn path is the Pallas flash-attention kernel, which never
materialises the [n, n] score matrix in HBM. At n≈1400 the non-flash path
moves ~250 MB of fp32 logits per layer; flash keeps tiles in VMEM and is the
difference between ~43% and >70% MFU on v5e.

Padding is handled with additive bias masking (key-side), matching the
reference's key-padding semantics; fully-padded query rows are zeroed by the
caller (modules.attention output masking).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def _xla_sdpa(q, k, v, mask):
    """XLA attention. fp32 inputs keep fp32 logits (reference parity); bf16
    inputs keep bf16 logits (halves the score-matrix HBM traffic, the main
    cost at n~1.4k) with a fp32 max-subtracted softmax for stability."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    low_precision = q.dtype == jnp.bfloat16
    if low_precision:
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    else:
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
    if mask is not None:
        neg = jnp.asarray(jnp.finfo(jnp.float32).min / 2, dtype=logits.dtype)
        logits = jnp.where(mask[:, None, None, :], logits, neg)
    if low_precision:
        m = jax.lax.stop_gradient(logits.max(axis=-1, keepdims=True))
        e = jnp.exp((logits - m).astype(jnp.float32)).astype(v.dtype)
        probs = e / e.sum(axis=-1, keepdims=True).astype(v.dtype)
    else:
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@functools.lru_cache(maxsize=1)
def _flash_fn():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    return flash_attention, BlockSizes, SegmentIds


def _tpu_flash(q, k, v, mask):
    flash_attention, BlockSizes, SegmentIds = _flash_fn()
    n = q.shape[2]
    scale = 1.0 / math.sqrt(q.shape[-1])
    segment_ids = None
    if mask is not None:
        # valid tokens = segment 1, padding = segment 0: cross-segment logits
        # are masked inside the kernel — no [n, n] bias ever materialised
        seg = mask.astype(jnp.int32)
        segment_ids = SegmentIds(q=seg, kv=seg)
    # blocks must divide the sequence length; n is guaranteed % 128 == 0
    blk = 512 if n % 512 == 0 else (256 if n % 256 == 0 else 128)
    block_sizes = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
        block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )
    return flash_attention(q, k, v, segment_ids=segment_ids, causal=False,
                           sm_scale=scale, block_sizes=block_sizes)


def pallas_interpret_forced() -> bool:
    """F5_TTS_PALLAS_INTERPRET=1: run the production Pallas kernels in
    interpret mode off-TPU (multi-chip CPU dryruns / tests exercise the REAL
    kernel dispatch + shard_map partitioning instead of the XLA fallback)."""
    import os

    return os.environ.get("F5_TTS_PALLAS_INTERPRET", "0") != "0"


# trace-time dispatch log: which attention backend each trace chose (the
# multi-chip dryrun reports this; traces are cached, so entries record new
# traces, not per-step calls)
_dispatch_log: list[str] = []


def _record(path: str) -> None:
    _dispatch_log.append(path)


def get_dispatch_log() -> list[str]:
    return list(_dispatch_log)


def reset_dispatch_log() -> None:
    _dispatch_log.clear()


def _tp_mesh_for(q):
    """Ambient tensor-parallel mesh when the head axis can split on it."""
    from korean_f5_tts_tpu.parallel.tp_kernels import ambient_tp_mesh

    mesh = ambient_tp_mesh()
    if mesh is not None and q.shape[1] % mesh.shape["model"] == 0:
        return mesh
    return None


def flash_enabled() -> bool:
    # measured on v5e (tests/SURVEY): the legacy pallas flash kernel is slower
    # than XLA's fused attention at n~1.4k and diverges numerically through
    # the remote-compile relay — off by default until a vetted kernel lands
    import os

    return os.environ.get("F5_TTS_FLASH_ATTN", "0") != "0"


def splash_enabled() -> bool:
    # tuned splash (block_q=512, block_kv=n) measured 0.34 ms/layer vs 0.51
    # for XLA fused attention at n=1536 on v5e; needs n % 512 == 0
    import os

    return os.environ.get("F5_TTS_SPLASH_ATTN", "1") != "0"


@functools.lru_cache(maxsize=16)
def _splash_fn(n: int, heads: int):
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    mask = sm.MultiHeadMask(masks=[sm.FullMask(_shape=(n, n))] * heads)
    # swept on v5e at n=1536 (batch folded into heads): bq=256/bkv=n/c=512
    # hits 0.1 ms/layer (~compute-bound) vs 0.34 for bq=512
    block_sizes = sk.BlockSizes(
        block_q=256, block_kv=n, block_kv_compute=min(512, n),
        block_q_dkv=None, block_kv_dkv=None, block_kv_dkv_compute=None,
        block_q_dq=None, block_kv_dq=None,
    )
    # ensure_compile_time_eval: make_splash_mha builds mask-info arrays; when
    # first called under a jit trace those become tracers captured in the
    # cached closure, poisoning every LATER trace that hits this cache entry
    # (UnexpectedTracerError -> silent XLA fallback). Concretise them here.
    with jax.ensure_compile_time_eval():
        splash = sk.make_splash_mha(mask=mask, head_shards=1, q_seq_shards=1,
                                    block_sizes=block_sizes)
    return splash, sk


def _tpu_splash(q, k, v, mask):
    b, h, n, d = q.shape
    scale = 1.0 / math.sqrt(d)
    if mask is None:
        # fold batch into heads: ONE kernel launch over b*h heads (vmapping a
        # pallas call serializes batches; folding keeps the grid saturated)
        splash, _ = _splash_fn(n, b * h)
        out = splash(q.reshape(b * h, n, d) * scale, k.reshape(b * h, n, d),
                     v.reshape(b * h, n, d))
        return out.reshape(b, h, n, d)
    if mask.ndim == 2 and mask.shape[0] == 1:
        # batch-uniform key-padding mask (bucket-tail padding): fold batch
        # into heads and hand the kernel ONE shared segment-id vector —
        # in-model this runs at ~the unmasked kernel's speed (best measured
        # masked config on v5e; single-call timings are swamped by the ~30 ms
        # relay roundtrip, so only in-model A/B numbers count)
        splash, sk = _splash_fn(n, b * h)
        seg = mask[0].astype(jnp.int32)
        out = splash(q.reshape(b * h, n, d) * scale, k.reshape(b * h, n, d),
                     v.reshape(b * h, n, d),
                     segment_ids=sk.SegmentIds(q=seg, kv=seg))
        return out.reshape(b, h, n, d)
    # per-item masks go through the prefix-flash kernel (vmapping splash
    # serialises the batch)
    raise NotImplementedError("per-item masked splash: use flash_prefix_attention")


_fallback_warned: set = set()


def _warn_fallback(path: str, err: Exception) -> None:
    if path not in _fallback_warned:
        _fallback_warned.add(path)
        import warnings

        warnings.warn(f"TPU {path} attention kernel unavailable "
                      f"({type(err).__name__}: {err}); using XLA attention")


def _block(n: int, pref: int) -> int:
    """Largest power-of-two block <= pref that divides n (n % 128 == 0)."""
    b = pref
    while n % b != 0:
        b //= 2
    return b


def qkv_fused_sdpa(qkv: jax.Array, heads: int,
                   rope: tuple[jax.Array, jax.Array] | None,
                   pe_attn_head: int | None,
                   prefix_lens: jax.Array | None) -> jax.Array | None:
    """Try the fused-layout TPU kernel: attention (+rope) straight from the
    [B, n, 3*heads*dh] qkv projection output, returning [B, n, heads*dh].

    Returns None when the kernel doesn't apply (off-TPU, tile-unfriendly
    shape, no rope tables) — the caller then runs the unfused path.
    """
    import os

    B, n, three_inner = qkv.shape
    dh = three_inner // (3 * heads)
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    # opt-in: in-model A/B on v5e measured the strided head-pair DMA pattern
    # slower than shared-segment splash + XLA transposes (0.0253 vs 0.0236
    # RTF @ n=1536); keep the kernel available for shapes/chips where it wins
    if os.environ.get("F5_TTS_QKV_KERNEL", "0") == "0":
        return None
    if not (on_tpu and splash_enabled() and rope is not None
            and dh == 64 and heads % 2 == 0 and n % 128 == 0):
        return None
    from korean_f5_tts_tpu.ops.flash_prefix import flash_prefix_qkv_attention

    lens = prefix_lens if prefix_lens is not None else jnp.full((1,), n, jnp.int32)
    cos, sin = rope
    try:
        # bq=128: with K/V regions resident across the whole (i, pair) grid,
        # a smaller q block only shrinks VMEM (the 16 MB scoped limit binds
        # at bq=256: q/out double-buffers push the footprint to 16.49 MB)
        bq = int(os.environ.get("F5_TTS_QKV_BQ", "128"))
        return flash_prefix_qkv_attention(qkv, lens, heads, cos, sin,
                                          pe_attn_head, _block(n, bq), 512)
    except Exception as e:  # pragma: no cover - hardware-dependent
        _warn_fallback("qkv-prefix-flash", e)
        return None


def rope_prefix_sdpa(q: jax.Array, k: jax.Array, v: jax.Array,
                     prefix_lens: jax.Array | None,
                     rope: tuple[jax.Array, jax.Array],
                     pe_attn_head: int | None,
                     uniform: bool) -> jax.Array | None:
    """Try the rope-in-kernel prefix-flash path (q/k arrive PRE-rope).

    Returns None off-TPU / tile-unfriendly shapes — caller applies rope
    itself and falls through to sdpa(). Opt-in: F5_TTS_ROPE_IN_KERNEL=1."""
    import os

    if os.environ.get("F5_TTS_ROPE_IN_KERNEL", "0") == "0":
        return None
    n, d = q.shape[2], q.shape[3]
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if not (on_tpu and splash_enabled() and d in (64, 128) and d % 2 == 0
            and n % 128 == 0):
        return None
    from korean_f5_tts_tpu.ops.flash_prefix import flash_prefix_rope_attention

    lens = prefix_lens if prefix_lens is not None else jnp.full((1,), n, jnp.int32)
    cos, sin = rope
    try:
        return flash_prefix_rope_attention(q, k, v, lens, cos, sin,
                                           pe_attn_head, _block(n, 256), 512,
                                           prune=not uniform)
    except Exception as e:  # pragma: no cover - hardware-dependent
        _warn_fallback("rope-prefix-flash", e)
        return None


def sdpa(q: jax.Array, k: jax.Array, v: jax.Array,
         mask: jax.Array | None = None,
         prefix_lens: jax.Array | None = None) -> jax.Array:
    """[b, h, n, d] scaled-dot-product attention with [b, n] key-padding mask.

    prefix_lens ([b] or [1] int32): set when `mask` is a prefix mask
    (mask[i] == arange(n) < prefix_lens[i]) — every duration/bucket mask in
    this model is. Masked attention then runs the Pallas prefix-flash kernel
    at unmasked speed instead of materialising [n, n] logits in the XLA path.
    Falls back to XLA off-TPU / for tile-unfriendly shapes (warns once).
    """
    import os

    if os.environ.get("F5_TTS_ATTN_IDENTITY", "0") != "0":
        return v  # profiling hack: in-model cost of everything-but-attention
    n, d = q.shape[2], q.shape[3]
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    # own Pallas kernels also run off-TPU in interpret mode when forced
    # (multi-chip CPU dryruns prove the production kernel dispatch)
    kernel_ok = on_tpu or pallas_interpret_forced()
    if kernel_ok and splash_enabled() and d in (64, 128) and n % 128 == 0:
        int8_attn = os.environ.get("F5_TTS_INT8_ATTN", "0")
        if (int8_attn != "0" and n % 128 == 0
                and (prefix_lens is not None or mask is None)):
            # int8 QK/PV dots (2x MXU rate) for the int8 serving mode.
            # INFERENCE-ONLY: the quantization has no vjp — never enable
            # while training. "qk" quantizes only the QK dot; any other
            # non-"0" value quantizes both dots.
            from korean_f5_tts_tpu.ops.flash_prefix import (
                flash_prefix_attention_i8,
            )

            lens = (prefix_lens if prefix_lens is not None
                    else jnp.full((1,), n, jnp.int32))
            try:
                bkv = int(os.environ.get("F5_TTS_PREFIX_BKV", "512"))
                bq = _block(n, int(os.environ.get("F5_TTS_PREFIX_BQ", "256")))
                mesh = _tp_mesh_for(q)
                if mesh is not None:
                    from korean_f5_tts_tpu.parallel.tp_kernels import (
                        flash_prefix_i8_tp,
                    )

                    out = flash_prefix_i8_tp(q, k, v, lens, bq, bkv, False,
                                             int8_attn != "qk", mesh)
                    if out is not None:
                        _record(f"prefix-flash-int8-tp[shard_map model="
                                f"{mesh.shape['model']}]")
                        return out
                _record("prefix-flash-int8")
                return flash_prefix_attention_i8(
                    q, k, v, lens, bq=bq, bkv=bkv, prune=False,
                    pv_i8=int8_attn != "qk")
            except Exception as e:  # pragma: no cover - hardware-dependent
                _warn_fallback("prefix-flash-int8", e)
        if (prefix_lens is not None
                and os.environ.get("F5_TTS_UNIFORM_SPLASH", "0") == "0"):
            # prefix-masked attention: own prefix-flash kernel. In-model on
            # v5e (headline protocol): 0.02256 RTF vs shared-segment splash
            # 0.02353 / XLA 0.02828. Uniform bucket-tail masks fill most of
            # n -> prune=False (per-chunk predication costs more than the
            # skipped chunks save); per-item serving batches prune.
            from korean_f5_tts_tpu.ops.flash_prefix import flash_prefix_attention

            uniform = mask is not None and mask.ndim == 2 and mask.shape[0] == 1
            try:
                bkv = int(os.environ.get("F5_TTS_PREFIX_BKV", "512"))
                bq = _block(n, int(os.environ.get("F5_TTS_PREFIX_BQ", "256")))
                # prune: skip fully-masked KV chunks via per-chunk @pl.when.
                # Wins when prefixes are much shorter than n (per-item
                # serving batches); LOSES when lens ~ n (the predication
                # breaks Mosaic pipelining) — training batches pack
                # similar lengths, so force it off there via env.
                prune_env = os.environ.get("F5_TTS_PREFIX_PRUNE", "auto")
                prune = (not uniform) if prune_env == "auto" else prune_env != "0"
                mesh = _tp_mesh_for(q)
                if mesh is not None:
                    from korean_f5_tts_tpu.parallel.tp_kernels import (
                        flash_prefix_tp,
                    )

                    out = flash_prefix_tp(q, k, v, prefix_lens, bq, bkv,
                                          prune, mesh)
                    if out is not None:
                        _record(f"prefix-flash-tp[shard_map model="
                                f"{mesh.shape['model']}]")
                        return out
                _record("prefix-flash")
                return flash_prefix_attention(q, k, v, prefix_lens,
                                              bq=bq, bkv=bkv, prune=prune)
            except Exception as e:  # pragma: no cover - hardware-dependent
                _warn_fallback("prefix-flash", e)
        if (mask is None and prefix_lens is None
                and os.environ.get("F5_TTS_UNMASKED_FLASH", "1") != "0"):
            # fully unmasked (the TRAINING path: attn_mask_enabled=False and
            # cfm_loss passes no pad_mask): prefix-flash with kv_lens == n.
            # The fwd is exact (every key valid) at uniform-mask speed, and
            # decisively, its custom_vjp brings the Pallas flash BACKWARD —
            # the XLA bwd materialises [n, n] fp32 logits/probs several
            # times per layer, measured at 48% of the training step.
            from korean_f5_tts_tpu.ops.flash_prefix import flash_prefix_attention

            try:
                bkv = int(os.environ.get("F5_TTS_PREFIX_BKV", "512"))
                bq = _block(n, int(os.environ.get("F5_TTS_PREFIX_BQ", "256")))
                lens = jnp.full((1,), n, jnp.int32)
                mesh = _tp_mesh_for(q)
                if mesh is not None:
                    from korean_f5_tts_tpu.parallel.tp_kernels import (
                        flash_prefix_tp,
                    )

                    out = flash_prefix_tp(q, k, v, lens, bq, bkv, False, mesh)
                    if out is not None:
                        _record(f"prefix-flash-unmasked-tp[shard_map model="
                                f"{mesh.shape['model']}]")
                        return out
                _record("prefix-flash-unmasked")
                return flash_prefix_attention(q, k, v, lens,
                                              bq=bq, bkv=bkv, prune=False)
            except Exception as e:  # pragma: no cover - hardware-dependent
                _warn_fallback("prefix-flash-unmasked", e)
        if (on_tpu and (mask is None or (mask.ndim == 2 and mask.shape[0] == 1))
                and n % 512 == 0):
            # unmasked (or splash forced for A/B): shared-segment splash
            try:
                _record("splash")
                return _tpu_splash(q, k, v, mask)
            except Exception as e:  # pragma: no cover - hardware-dependent
                _warn_fallback("splash", e)
    if on_tpu and flash_enabled() and n % 128 == 0 and d in (64, 128, 256):
        try:
            _record("legacy-flash")
            return _tpu_flash(q, k, v, mask)
        except Exception as e:  # pragma: no cover - hardware-dependent
            _warn_fallback("flash", e)
    _record("xla")
    return _xla_sdpa(q, k, v, mask)
