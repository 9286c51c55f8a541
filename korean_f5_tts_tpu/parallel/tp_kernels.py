"""Tensor-parallel execution of the production Pallas kernels via shard_map.

Role parity: the reference's TP is real head-split execution through its C++
engine (`/root/reference/src/f5_tts/runtime/triton_trtllm/scripts/
convert_checkpoint.py:16-24` splits q/k/v head-wise per rank;
`patch/f5tts/model.py:116-117` allocates the all-reduce workspace for the
row-parallel projections). The TPU-native equivalent here: `shard_map` over
the ("data", "model") mesh with attention heads and FF inner dim split on
"model", each shard running the SAME single-chip Pallas kernels
(ops/flash_prefix.py, ops/ff_block.py, ops/fused_linears.py), and
`jax.lax.psum` over "model" standing in for the NCCL all-reduce.

Dispatch happens at trace time inside ops/attention.py / models/dit.py by
checking the ambient mesh (`with mesh:`); jax includes the ambient mesh in
the jit trace cache key (verified on jax 0.9), so meshed and un-meshed calls
never share a trace.

Residual/bias accounting under psum: kernels that fold the residual and the
output bias into the program (h + gate*(a@w + b)) are called per shard with
b/tp, and (tp-1)*h is subtracted after the psum — both terms are linear, so
the reduction reconstructs exactly h + gate*(a@w_full + b). The LayerNorm
prologues read the REPLICATED h, so their statistics are exact per shard.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def ambient_tp_mesh():
    """The active `with mesh:` Mesh if it has a "model" axis of size > 1.

    Returns None otherwise (incl. no mesh / data-only meshes, where XLA's
    default sharding propagation already handles everything).
    """
    try:
        from jax._src import mesh as mesh_lib

        m = mesh_lib.thread_resources.env.physical_mesh
    except Exception:  # pragma: no cover - jax-internal layout change
        return None
    if m is None or m.empty or "model" not in m.axis_names:
        return None
    if m.shape["model"] <= 1:
        return None
    return m


def _batch_axis(mesh, b: int) -> str | None:
    """"data" when the batch can shard on the data axis, else None
    (replicated over data; shard_map all-gathers as needed)."""
    dp = mesh.shape.get("data", 1)
    return "data" if (dp > 1 and b % dp == 0) else None


def _bcast_lens(lens, b: int):
    lens = lens.astype(jnp.int32)
    if lens.shape[0] == 1 and b > 1:
        lens = jnp.broadcast_to(lens, (b,))
    return lens


# ---------------------------------------------------------------------------
# attention core: flash_prefix_attention with heads split on "model"
# ---------------------------------------------------------------------------


def flash_prefix_tp(q, k, v, kv_lens, bq: int, bkv: int, prune: bool, mesh):
    """TP flash attention: [b, h, n, d] with h split on "model". Attention is
    head-separable, so each shard runs the unmodified Pallas kernel on its
    local heads — no collective inside (the row-parallel all-reduce belongs
    to the output projection). Returns None when shapes don't divide."""
    from korean_f5_tts_tpu.ops.flash_prefix import flash_prefix_attention

    b, h, n, d = q.shape
    tp = mesh.shape["model"]
    if h % tp != 0:
        return None
    ba = _batch_axis(mesh, b)
    lens = _bcast_lens(kv_lens, b) if ba else kv_lens.astype(jnp.int32)
    qspec = P(ba, "model", None, None)
    lspec = P(ba) if (ba and lens.shape[0] == b) else P(None)

    fn = jax.shard_map(
        lambda q_, k_, v_, l_: flash_prefix_attention(q_, k_, v_, l_,
                                                      bq, bkv, prune),
        mesh=mesh, in_specs=(qspec, qspec, qspec, lspec), out_specs=qspec, check_vma=False)
    return fn(q, k, v, lens)


def flash_prefix_i8_tp(q, k, v, kv_lens, bq: int, bkv: int, prune: bool,
                       pv_i8: bool, mesh):
    """int8-dot variant of flash_prefix_tp (serving int8 mode)."""
    from korean_f5_tts_tpu.ops.flash_prefix import flash_prefix_attention_i8

    b, h, n, d = q.shape
    tp = mesh.shape["model"]
    if h % tp != 0:
        return None
    ba = _batch_axis(mesh, b)
    lens = _bcast_lens(kv_lens, b) if ba else kv_lens.astype(jnp.int32)
    qspec = P(ba, "model", None, None)
    lspec = P(ba) if (ba and lens.shape[0] == b) else P(None)
    fn = jax.shard_map(
        lambda q_, k_, v_, l_: flash_prefix_attention_i8(
            q_, k_, v_, l_, bq=bq, bkv=bkv, prune=prune, pv_i8=pv_i8),
        mesh=mesh, in_specs=(qspec, qspec, qspec, lspec), out_specs=qspec, check_vma=False)
    return fn(q, k, v, lens)


# ---------------------------------------------------------------------------
# fused FF half-block: column-parallel w1, row-parallel w2, psum epilogue
# ---------------------------------------------------------------------------


def ff_block_tp(h, sc, sh, gate, w1, b1, w2, b2, mesh, bm: int = 256,
                eps: float = 1e-6):
    """TP fused FF half-block: h + gate*FF(mod_LN(h)). w1 [d, ff] split on
    columns, w2 [ff, d] on rows (the TRT-LLM split, convert_checkpoint.py:
    166-193); each shard runs the single-chip fused kernel end-to-end and the
    psum over "model" reconstructs the full FF output. Returns None when the
    mesh doesn't divide the shapes."""
    from korean_f5_tts_tpu.ops.ff_block import ff_block_fused

    b, n, d = h.shape
    ff = w1.shape[1]
    tp = mesh.shape["model"]
    ba = _batch_axis(mesh, b)
    rows_local = (b // mesh.shape.get("data", 1) if ba else b) * n
    if ff % tp != 0 or rows_local % bm != 0:
        return None
    hspec = P(ba, None, None)
    rep2 = P(None, None)

    def body(h_, sc_, sh_, gate_, w1_, b1_, w2_, b2_):
        out = ff_block_fused(h_, sc_, sh_, gate_, w1_, b1_, w2_, b2_, bm, eps)
        return jax.lax.psum(out, "model") - (tp - 1) * h_

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(hspec, rep2, rep2, rep2, P(None, "model"), P("model"),
                  P("model", None), P(None)),
        out_specs=hspec, check_vma=False)
    return fn(h, sc, sh, gate, w1.astype(h.dtype), b1.astype(h.dtype),
              w2.astype(h.dtype), (b2 / tp).astype(h.dtype))


def ff_block_int8_tp(h, sc, sh, gate, qp_in: dict, qp_out: dict, mesh,
                     bm: int = 256, eps: float = 1e-6):
    """int8-weight TP FF half-block. Activation row-quantization inside the
    kernel stays exact per shard: the first quant reads the replicated
    mod-LN(h); the second quantizes each shard's own GELU slice and dequants
    with that shard's scales before the psum."""
    from korean_f5_tts_tpu.ops.ff_block import ff_block_fused_int8

    b, n, d = h.shape
    ff = qp_in["w_int8"].shape[1]
    tp = mesh.shape["model"]
    ba = _batch_axis(mesh, b)
    rows_local = (b // mesh.shape.get("data", 1) if ba else b) * n
    if ff % tp != 0 or rows_local % bm != 0:
        return None
    hspec = P(ba, None, None)
    rep2 = P(None, None)
    in_specs = (hspec, rep2, rep2, rep2,
                {"w_int8": P(None, "model"), "w_scale": P("model"),
                 "b": P("model")},
                {"w_int8": P("model", None), "w_scale": P(None), "b": P(None)})

    def body(h_, sc_, sh_, gate_, qin, qout):
        out = ff_block_fused_int8(h_, sc_, sh_, gate_, qin, qout, bm, eps)
        return jax.lax.psum(out, "model") - (tp - 1) * h_

    fn = jax.shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=hspec, check_vma=False)
    qout = dict(qp_out)
    qout["b"] = qp_out["b"] / tp
    return fn(h, sc, sh, gate, dict(qp_in), qout)


# ---------------------------------------------------------------------------
# fused attention half-block: the whole AdaLN->qkv->rope->flash->out-proj
# chain under ONE shard_map (per-shard qkv concat keeps head slices aligned)
# ---------------------------------------------------------------------------


def attn_half_block_tp(h, sc, sh, gate, ap: dict, heads: int, rope,
                       pe_attn_head, prefix_lens, uniform: bool, mesh,
                       bq: int, bkv: int, bm: int = 256):
    """TP fused attention half-block (bf16 or int8 weights, detected from the
    param dict). One shard_map region spans ln_mod_matmul -> head split ->
    rope -> flash_prefix -> proj_gated_residual(+psum): the q/k/v concat and
    the head slicing happen PER SHARD, so column-sharded to_q/to_k/to_v and
    row-sharded to_out stay aligned with the head split (the layout mismatch
    a global qkv concat of sharded weights would create is avoided by
    construction). Returns None when shapes don't divide."""
    int8 = "w_int8" in ap["to_q"]
    wkey = "w_int8" if int8 else "w"
    b, n, d = h.shape
    inner = ap["to_q"][wkey].shape[1]
    dh = inner // heads
    tp = mesh.shape["model"]
    ba = _batch_axis(mesh, b)
    rows_local = (b // mesh.shape.get("data", 1) if ba else b) * n
    if heads % tp != 0 or inner % tp != 0 or rows_local % bm != 0:
        return None
    if dh not in (64, 128) or n % 128 != 0:
        return None  # prefix-flash kernel eligibility (ops/attention.py gate)
    heads_local = heads // tp
    hspec = P(ba, None, None)
    rep2 = P(None, None)
    cos, sin = rope
    lens = (_bcast_lens(prefix_lens, b) if prefix_lens is not None
            else jnp.full((b if ba else 1,), n, jnp.int32))
    lspec = P(ba) if (ba and lens.shape[0] == b) else P(None)
    prune = prefix_lens is not None and not uniform

    col_l = {"w_int8": P(None, "model"), "w_scale": P("model"), "b": P("model")} \
        if int8 else {"w": P(None, "model"), "b": P("model")}
    row_l = {"w_int8": P("model", None), "w_scale": P(None), "b": P(None)} \
        if int8 else {"w": P("model", None), "b": P(None)}
    in_specs = (hspec, rep2, rep2, rep2, col_l, col_l, col_l, row_l,
                lspec, rep2, rep2)

    def body(h_, sc_, sh_, gate_, pq, pk, pv, po, lens_, cos_, sin_):
        from korean_f5_tts_tpu.models.modules import (
            _merge_heads,
            _split_heads,
            apply_rope,
        )
        from korean_f5_tts_tpu.ops.flash_prefix import flash_prefix_attention

        if int8:
            from korean_f5_tts_tpu.ops.fused_linears import (
                ln_mod_matmul_int8,
                proj_gated_residual_int8,
            )

            qp_qkv = {
                "w_int8": jnp.concatenate(
                    [pq["w_int8"], pk["w_int8"], pv["w_int8"]], axis=1),
                "w_scale": jnp.concatenate(
                    [pq["w_scale"], pk["w_scale"], pv["w_scale"]]),
                "b": jnp.concatenate([pq["b"], pk["b"], pv["b"]]),
            }
            qkv = ln_mod_matmul_int8(h_, sc_, sh_, qp_qkv, bm)
        else:
            from korean_f5_tts_tpu.ops.fused_linears import (
                ln_mod_matmul,
                proj_gated_residual,
            )

            wqkv = jnp.concatenate(
                [pq["w"], pk["w"], pv["w"]], axis=1).astype(h_.dtype)
            bqkv = jnp.concatenate([pq["b"], pk["b"], pv["b"]]).astype(h_.dtype)
            qkv = ln_mod_matmul(h_, sc_, sh_, wqkv, bqkv, bm)
        inner_l = inner // tp
        q = _split_heads(qkv[..., :inner_l], heads_local)
        k = _split_heads(qkv[..., inner_l:2 * inner_l], heads_local)
        v = _split_heads(qkv[..., 2 * inner_l:], heads_local)

        def rope_local(x):
            # pe_attn_head counts GLOBAL heads (only the first N get rope,
            # reference modules.py:491-494); recover global head indices of
            # this shard from its position on the "model" axis
            rx = apply_rope(x, cos_, sin_, None)
            if pe_attn_head is None:
                return rx
            gh = (jax.lax.axis_index("model") * heads_local
                  + jnp.arange(heads_local))
            sel = (gh < pe_attn_head)[None, :, None, None]
            return jnp.where(sel, rx, x)

        q = rope_local(q)
        k = rope_local(k)
        lb = lens_ if lens_.shape[0] == q.shape[0] else \
            jnp.broadcast_to(lens_, (q.shape[0],))
        a = _merge_heads(flash_prefix_attention(q, k, v, lb, bq, bkv, prune))
        if int8:
            po_l = dict(po)
            po_l["b"] = po["b"] / tp
            out = proj_gated_residual_int8(a, h_, gate_, po_l, bm)
        else:
            out = proj_gated_residual(a, h_, gate_, po["w"].astype(h_.dtype),
                                      (po["b"] / tp).astype(h_.dtype), bm)
        return jax.lax.psum(out, "model") - (tp - 1) * h_

    fn = jax.shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=hspec, check_vma=False)
    return fn(h, sc, sh, gate, dict(ap["to_q"]), dict(ap["to_k"]),
              dict(ap["to_v"]), dict(ap["to_out"]), lens, cos, sin)
