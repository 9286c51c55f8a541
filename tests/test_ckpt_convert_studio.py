"""torch-checkpoint converter and finetune-studio functional core tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.config import DiTConfig
from korean_f5_tts_tpu.models.dit import dit_forward, init_dit

torch = pytest.importorskip("torch")

TINY = DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, mel_dim=10,
                 text_num_embeds=20, text_dim=16, conv_layers=1)


def _torch_style_state_dict(params) -> dict:
    """Reverse-map our pytree into reference state_dict names/layouts so the
    converter can be tested without real torch checkpoints."""
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
    sd["text_embed.text_embed.weight"] = np.asarray(params["text_embed"]["embed"]["w"]).copy()
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
    d = TINY.dim_head
    inv_perm = np.argsort(np.concatenate([np.arange(0, d, 2), np.arange(1, d, 2)]))
    for i, blk in enumerate(params["blocks"]):
        pre = f"transformer_blocks.{i}"
        lin(f"{pre}.attn_norm.linear", blk["attn_norm"]["linear"])
        # our to_q/to_k are in half-split layout; the torch checkpoint stores
        # interleaved — apply the inverse permutation per head
        for name in ("to_q", "to_k"):
            w = np.asarray(blk["attn"][name]["w"])
            full = np.concatenate([h * d + inv_perm for h in range(TINY.heads)])
            sd[f"{pre}.attn.{name}.weight"] = w[:, full].T.copy()
            sd[f"{pre}.attn.{name}.bias"] = np.asarray(blk["attn"][name]["b"])[full].copy()
        lin(f"{pre}.attn.to_v", blk["attn"]["to_v"])
        lin(f"{pre}.attn.to_out.0", blk["attn"]["to_out"])
        lin(f"{pre}.ff.ff.0.0", blk["ff"]["in"])
        lin(f"{pre}.ff.ff.2", blk["ff"]["out"])
    lin("norm_out.linear", params["norm_out"]["linear"])
    lin("proj_out", params["proj_out"])
    return sd


class TestTorchConverter:
    def test_roundtrip_preserves_forward(self):
        from korean_f5_tts_tpu.utils.torch_ckpt import convert_dit_state_dict

        params = init_dit(jax.random.PRNGKey(3), TINY)
        # non-zero outputs so the test is meaningful
        params["proj_out"]["w"] = jax.random.normal(
            jax.random.PRNGKey(4), params["proj_out"]["w"].shape) * 0.1
        sd = _torch_style_state_dict(params)
        converted = convert_dit_state_dict(sd, TINY.heads, TINY.dim_head,
                                           TINY.depth, TINY.conv_layers)
        converted = jax.tree_util.tree_map(jnp.asarray, converted)

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 24, 10)).astype(np.float32))
        text = jnp.asarray(np.array([[1, 2, -1], [3, 4, 5]], dtype=np.int32))
        t = jnp.asarray(np.array([0.3, 0.7], dtype=np.float32))
        out_orig = np.asarray(dit_forward(params, TINY, x, x, text, t))
        out_conv = np.asarray(dit_forward(converted, TINY, x, x, text, t))
        np.testing.assert_allclose(out_conv, out_orig, atol=2e-5)

    def test_ema_prefix_strip(self):
        from korean_f5_tts_tpu.utils.torch_ckpt import strip_ema_prefix

        sd = {"ema_model.transformer.proj_out.weight": np.ones(2),
              "ema_model.mel_spec.dummy": np.zeros(1),
              "initted": np.ones(1), "step": np.ones(1)}
        out = strip_ema_prefix(sd)
        assert list(out) == ["proj_out.weight"]

    def test_lora_merge(self):
        from korean_f5_tts_tpu.utils.torch_ckpt import merge_lora

        w = np.eye(4, dtype=np.float32)
        a = np.ones((2, 4), np.float32)  # lora_A [r, in]
        b = np.full((4, 2), 0.5, np.float32)  # lora_B [out, r]
        sd = {
            "base_model.model.attn.to_q.base_layer.weight": w,
            "base_model.model.attn.to_q.lora_A.weight": a,
            "base_model.model.attn.to_q.lora_B.weight": b,
        }
        out = merge_lora(sd, alpha_over_r=2.0)
        merged = out["attn.to_q.weight"]
        np.testing.assert_allclose(merged, w + 2.0 * (b @ a))


class TestFinetuneStudio:
    def test_project_lifecycle(self, tmp_path, monkeypatch):
        import numpy as np

        from korean_f5_tts_tpu.train.finetune_gradio import FinetuneProject, system_stats
        from korean_f5_tts_tpu.utils.audio import save_wav

        monkeypatch.chdir(tmp_path)
        proj = FinetuneProject("demo", root=str(tmp_path / "data"))
        proj.create()
        assert os.path.isdir(proj.wavs_dir)

        # slice a long file into clips inside the project
        sr = 24000
        voiced = 0.3 * np.sin(2 * np.pi * 220 * np.arange(6 * sr) / sr)
        wav = np.concatenate([voiced, np.zeros(sr), voiced]).astype(np.float32)
        src = str(tmp_path / "long.wav")
        save_wav(src, wav, sr)
        clips = proj.slice_audio(src, min_length=3000, min_interval=300,
                                 hop_size=20, max_sil_kept=200)
        assert len(clips) == 2 and all(os.path.exists(c) for c in clips)

        # transcription requires a backend offline
        with pytest.raises(RuntimeError, match="ASR"):
            proj.transcribe_all()
        meta = proj.transcribe_all(lambda p: "hello world")
        assert os.path.exists(meta)

        out = proj.prepare_arrow(tokenizer="char")
        assert os.path.exists(os.path.join(out, "raw.arrow"))

        stats = system_stats()
        assert "mem_total_gb" in stats

    def test_gradio_gated(self):
        from korean_f5_tts_tpu.train.finetune_gradio import build_app

        with pytest.raises(ImportError, match="gradio"):
            build_app()
