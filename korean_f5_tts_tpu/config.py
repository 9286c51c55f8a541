"""Model/arch configuration dataclasses + YAML loading.

Mirrors the reference Hydra config schema (`src/f5_tts/configs/*.yaml`,
consumed at `train/train.py:17` and `api.py:35-37`) with plain dataclasses —
no Hydra dependency; YAML files with the same keys load directly.
"""

from __future__ import annotations

import dataclasses
from typing import Any

from korean_f5_tts_tpu.ops.mel import MelConfig


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    dim: int = 1024
    depth: int = 22
    heads: int = 16
    dim_head: int = 64
    dropout: float = 0.1
    ff_mult: int = 2
    mel_dim: int = 100
    text_num_embeds: int = 256
    text_dim: int | None = 512
    text_mask_padding: bool = True
    text_embedding_average_upsampling: bool = False
    qk_norm: str | None = None  # None | "rms_norm"
    conv_layers: int = 4
    conv_mult: int = 2
    pe_attn_head: int | None = None
    attn_mask_enabled: bool = False
    long_skip_connection: bool = False
    checkpoint_activations: bool = False
    # remat granularity under checkpoint_activations: "full" recomputes the
    # whole block on bwd (min memory); "dots" keeps matmul outputs resident
    # and recomputes only elementwise ops (jax.checkpoint_policies.
    # dots_with_no_batch_dims_saveable) — faster when HBM allows
    remat_policy: str = "full"

    @property
    def text_dim_(self) -> int:
        return self.text_dim if self.text_dim is not None else self.mel_dim


@dataclasses.dataclass(frozen=True)
class UNetTConfig:
    dim: int = 1024
    depth: int = 24
    heads: int = 16
    dim_head: int = 64
    dropout: float = 0.1
    ff_mult: int = 4
    mel_dim: int = 100
    text_num_embeds: int = 256
    text_dim: int | None = None
    text_mask_padding: bool = True
    qk_norm: str | None = None
    conv_layers: int = 0
    conv_mult: int = 2
    pe_attn_head: int | None = None
    attn_mask_enabled: bool = False
    skip_connect_type: str = "concat"  # "none" | "add" | "concat"
    checkpoint_activations: bool = False

    @property
    def text_dim_(self) -> int:
        return self.text_dim if self.text_dim is not None else self.mel_dim


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    dim: int = 1024
    depth: int = 22
    heads: int = 16
    dim_head: int = 64
    dropout: float = 0.1
    ff_mult: int = 4
    mel_dim: int = 100
    text_num_embeds: int = 256
    text_mask_padding: bool = True
    qk_norm: str | None = None
    checkpoint_activations: bool = False


BACKBONE_CONFIGS = {"DiT": DiTConfig, "UNetT": UNetTConfig, "MMDiT": MMDiTConfig}


@dataclasses.dataclass(frozen=True)
class CFMConfig:
    sigma: float = 0.0
    audio_drop_prob: float = 0.3
    cond_drop_prob: float = 0.2
    frac_lengths_mask: tuple[float, float] = (0.7, 1.0)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    name: str = "F5TTS_v1_Base"
    backbone: str = "DiT"
    arch: Any = dataclasses.field(default_factory=DiTConfig)
    mel: MelConfig = dataclasses.field(default_factory=MelConfig)
    cfm: CFMConfig = dataclasses.field(default_factory=CFMConfig)
    tokenizer: str = "pinyin"
    tokenizer_path: str | None = None


def _filter_kwargs(cls, d: dict) -> dict:
    names = {f.name for f in dataclasses.fields(cls)}
    known = {k: v for k, v in d.items() if k in names}
    # reference arch yamls carry runtime-only keys (attn_backend etc.)
    return known


def model_config_from_dict(cfg: dict) -> ModelConfig:
    """Build a ModelConfig from a reference-schema config dict (model: section)."""
    m = cfg.get("model", cfg)
    backbone = m.get("backbone", "DiT")
    arch_cls = BACKBONE_CONFIGS[backbone]
    arch = arch_cls(**_filter_kwargs(arch_cls, m.get("arch", {})))
    mel_kwargs = _filter_kwargs(MelConfig, m.get("mel_spec", {}))
    return ModelConfig(
        name=m.get("name", "F5TTS_v1_Base"),
        backbone=backbone,
        arch=arch,
        mel=MelConfig(**mel_kwargs),
        tokenizer=m.get("tokenizer", "pinyin"),
        tokenizer_path=m.get("tokenizer_path"),
    )


def load_model_config(path: str) -> ModelConfig:
    import yaml

    with open(path, "r", encoding="utf-8") as f:
        return model_config_from_dict(yaml.safe_load(f))


# Built-in architectures matching the reference model zoo
# (configs/F5TTS_v1_Base.yaml, F5TTS_Base.yaml, E2TTS_Base.yaml, ...)
PRESETS: dict[str, dict] = {
    "F5TTS_v1_Base": dict(
        backbone="DiT",
        arch=dict(dim=1024, depth=22, heads=16, ff_mult=2, text_dim=512,
                  text_mask_padding=True, conv_layers=4, pe_attn_head=None),
    ),
    "F5TTS_Base": dict(
        backbone="DiT",
        arch=dict(dim=1024, depth=22, heads=16, ff_mult=2, text_dim=512,
                  text_mask_padding=False, conv_layers=4, pe_attn_head=1),
    ),
    "F5TTS_Small": dict(
        backbone="DiT",
        arch=dict(dim=768, depth=18, heads=12, ff_mult=2, text_dim=512,
                  text_mask_padding=False, conv_layers=4, pe_attn_head=1),
    ),
    "E2TTS_Base": dict(
        backbone="UNetT",
        arch=dict(dim=1024, depth=24, heads=16, ff_mult=4, text_mask_padding=False),
    ),
    "E2TTS_Small": dict(
        backbone="UNetT",
        arch=dict(dim=768, depth=20, heads=12, ff_mult=4, text_mask_padding=False),
    ),
}


def preset_model_config(name: str, **overrides) -> ModelConfig:
    p = dict(PRESETS[name])
    backbone = p["backbone"]
    arch_cls = BACKBONE_CONFIGS[backbone]
    arch_kwargs = dict(p["arch"])
    arch_kwargs.update(overrides.pop("arch", {}))
    return ModelConfig(
        name=name, backbone=backbone,
        arch=arch_cls(**_filter_kwargs(arch_cls, arch_kwargs)),
        **overrides,
    )
