"""UNetT torch-checkpoint converter roundtrip (forward-exact)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.config import UNetTConfig
from korean_f5_tts_tpu.models.unett import init_unett, unett_forward

torch = pytest.importorskip("torch")

UT = UNetTConfig(dim=32, depth=4, heads=2, dim_head=16, ff_mult=2, mel_dim=10,
                 text_num_embeds=20, text_dim=16, conv_layers=1)


def _torch_style_sd(params) -> dict:
    sd = {}

    def lin(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"]).T.copy()
        if "b" in p:
            sd[f"{name}.bias"] = np.asarray(p["b"]).copy()

    def conv(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"]).transpose(2, 1, 0).copy()
        if "b" in p:
            sd[f"{name}.bias"] = np.asarray(p["b"]).copy()

    lin("time_embed.time_mlp.0", params["time_embed"]["mlp1"])
    lin("time_embed.time_mlp.2", params["time_embed"]["mlp2"])
    sd["text_embed.text_embed.weight"] = np.asarray(
        params["text_embed"]["embed"]["w"]).copy()
    for i, blk in enumerate(params["text_embed"]["blocks"]):
        pre = f"text_embed.text_blocks.{i}"
        conv(f"{pre}.dwconv", blk["dwconv"])
        sd[f"{pre}.norm.weight"] = np.asarray(blk["norm"]["g"]).copy()
        sd[f"{pre}.norm.bias"] = np.asarray(blk["norm"]["b"]).copy()
        lin(f"{pre}.pwconv1", blk["pw1"])
        sd[f"{pre}.grn.gamma"] = np.asarray(blk["grn"]["gamma"]).copy()
        sd[f"{pre}.grn.beta"] = np.asarray(blk["grn"]["beta"]).copy()
        lin(f"{pre}.pwconv2", blk["pw2"])
    lin("input_embed.proj", params["input_proj"])
    conv("input_embed.conv_pos_embed.conv1d.0", params["conv_pos_embed"]["conv1"])
    conv("input_embed.conv_pos_embed.conv1d.2", params["conv_pos_embed"]["conv2"])
    d = UT.dim_head
    inv_perm = np.argsort(np.concatenate([np.arange(0, d, 2), np.arange(1, d, 2)]))
    for i, layer in enumerate(params["layers"]):
        pre = f"layers.{i}"
        if "skip_proj" in layer:
            lin(f"{pre}.0", layer["skip_proj"])
        sd[f"{pre}.1.g"] = np.asarray(layer["attn_norm"]["g"]).copy()
        for name in ("to_q", "to_k"):
            w = np.asarray(layer["attn"][name]["w"])
            full = np.concatenate([h * d + inv_perm for h in range(UT.heads)])
            sd[f"{pre}.2.{name}.weight"] = w[:, full].T.copy()
            sd[f"{pre}.2.{name}.bias"] = np.asarray(layer["attn"][name]["b"])[full].copy()
        lin(f"{pre}.2.to_v", layer["attn"]["to_v"])
        lin(f"{pre}.2.to_out.0", layer["attn"]["to_out"])
        sd[f"{pre}.3.g"] = np.asarray(layer["ff_norm"]["g"]).copy()
        lin(f"{pre}.4.ff.0.0", layer["ff"]["in"])
        lin(f"{pre}.4.ff.2", layer["ff"]["out"])
    sd["norm_out.g"] = np.asarray(params["norm_out"]["g"]).copy()
    lin("proj_out", params["proj_out"])
    return sd


def test_unett_converter_roundtrip():
    from korean_f5_tts_tpu.utils.torch_ckpt import convert_unett_state_dict

    params = init_unett(jax.random.PRNGKey(5), UT)
    sd = _torch_style_sd(params)
    conv = convert_unett_state_dict(sd, UT.heads, UT.dim_head, UT.depth,
                                    UT.conv_layers, UT.skip_connect_type)
    conv = jax.tree_util.tree_map(jnp.asarray, conv)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 24, 10)).astype(np.float32))
    text = jnp.asarray(np.array([[1, 2, -1], [3, 4, 5]], dtype=np.int32))
    t = jnp.asarray(np.array([0.3, 0.7], dtype=np.float32))
    o1 = np.asarray(unett_forward(params, UT, x, x, text, t))
    o2 = np.asarray(unett_forward(conv, UT, x, x, text, t))
    np.testing.assert_allclose(o2, o1, atol=2e-5)
