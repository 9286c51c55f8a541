"""Quantify the int8 inference mode's quality cost on real hardware:
mel MAE between bf16 and int8 sampling at the headline shapes (same noise,
same schedule). Prints JSON lines."""

import json

import numpy as np

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

from korean_f5_tts_tpu.config import DiTConfig
from korean_f5_tts_tpu.models.cfm import _sample_core
from korean_f5_tts_tpu.models.dit import init_dit
from korean_f5_tts_tpu.models.quant import quantize_params

DT = jnp.bfloat16
arch = DiTConfig(dim=1024, depth=22, heads=16, ff_mult=2, text_dim=512,
                 conv_layers=4, text_num_embeds=2545)
params = jax.tree_util.tree_map(
    lambda x: x.astype(DT) if x.dtype == jnp.float32 else x,
    init_dit(jax.random.PRNGKey(0), arch))
# AdaLN-zero init gates every block off AND zeroes the output projection
# (proj_out/norm_out/per-block modulation linears), which would make any
# A/B vacuous — randomise all the zero-init layers
key7 = jax.random.PRNGKey(7)


def _randomise(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key7, len(leaves))
    out = []
    for kk, leaf in zip(keys, leaves):
        if hasattr(leaf, "shape") and leaf.size and float(jnp.abs(leaf).max()) == 0.0:
            leaf = (0.05 * jax.random.normal(kk, leaf.shape)).astype(leaf.dtype)
        out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


params = _randomise(params)

n = 1536
rng = np.random.default_rng(0)
cond = jnp.asarray(rng.standard_normal((1, n, 100)).astype(np.float32)).astype(DT)
cond_mask = np.zeros((1, n, 1), dtype=bool)
cond_mask[:, :432] = True
step_cond = jnp.where(jnp.asarray(cond_mask), cond, 0.0)
text = jnp.asarray(rng.integers(1, 2545, (1, 160)).astype(np.int32))
y0 = jax.random.normal(jax.random.PRNGKey(42), (1, n, 100), DT)
pad_mask = jnp.asarray(np.arange(n)[None, :] < 1376)


def sample(p):
    # fresh jit per call: env knobs (F5_TTS_INT8_ATTN) are read at trace
    # time, so reusing one jit cache would silently ignore mode changes
    import functools

    fn = jax.jit(functools.partial(
        _sample_core.__wrapped__, steps=16, use_cfg=True, use_sway=True,
        use_epss=True))
    return fn(p, arch, step_cond, text, None, pad_mask, y0,
              jnp.asarray(2.0, DT), jnp.asarray(-1.0, DT))


ref = np.asarray(sample(params).astype(jnp.float32))[:, :1376]
scale = float(np.abs(ref).mean())

MODES = [
    ("int8_ff", (r"ff/in$", r"ff/out$"), None),
    ("int8_all", None, None),
    ("bf16+attn_i8qk", "bf16", "qk"),       # attention-quant error alone
    ("bf16+attn_i8", "bf16", "1"),
    ("int8_all+attn_i8qk", None, "qk"),
    ("int8_all+attn_i8", None, "1"),
]
for name, pats, attn in MODES:
    if pats == "bf16":
        qp = params
    else:
        qp = (quantize_params(params) if pats is None
              else quantize_params(params, patterns=pats))
    import os

    if attn:
        os.environ["F5_TTS_INT8_ATTN"] = attn
    else:
        os.environ.pop("F5_TTS_INT8_ATTN", None)
    out = np.asarray(sample(qp).astype(jnp.float32))[:, :1376]
    mae = float(np.abs(out - ref).mean())
    print(json.dumps({"mode": name, "mel_mae_vs_bf16": round(mae, 5),
                      "relative": round(mae / scale, 5)}), flush=True)
