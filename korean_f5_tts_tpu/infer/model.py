"""TTSModel: loaded model bundle + load_model/load_checkpoint.

Parity with reference `infer/utils_infer.py:242-345`: checkpoint loading
(safetensors / torch .pt with EMA strip and LoRA merge via the converter),
CFM construction with `text_num_embeds = vocab_size + 1`, and the Korean
tokenizer runtime flags the reference attaches to the model object
(`_use_skip_tc/_use_n2gk_plus/_tokenizer_type`, utils_infer.py:330-345).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from korean_f5_tts_tpu.config import (
    BACKBONE_CONFIGS,
    DiTConfig,
    ModelConfig,
    UNetTConfig,
)
from korean_f5_tts_tpu.models.dit import init_dit
from korean_f5_tts_tpu.models.mmdit import init_mmdit
from korean_f5_tts_tpu.models.unett import init_unett
from korean_f5_tts_tpu.ops.mel import MelConfig, log_mel_spectrogram
from korean_f5_tts_tpu.text.vocab import load_vocab_file


@dataclasses.dataclass
class TTSModel:
    params: Any
    arch: Any  # DiTConfig | UNetTConfig | MMDiTConfig
    mel: MelConfig
    vocab_char_map: dict[str, int] | None
    tokenizer_type: str = "custom"
    use_skip_tc: bool = False
    use_n2gk_plus: bool = True
    tokenizer_legacy: bool = False

    def mel_of_wav(self, wav: np.ndarray) -> np.ndarray:
        """[n] waveform -> [n_frames, n_mels] log-mel (host entry)."""
        mel = log_mel_spectrogram(jnp.asarray(wav, dtype=jnp.float32)[None], self.mel)
        return np.asarray(mel)[0].T

    # serving ref-mel frame buckets: refs are capped at 12 s (1126 frames at
    # 24 kHz / hop 256), so three wav-length buckets bound the upload padding
    # at ~2x while keeping the jitted front-end to <= 3 compiled shapes
    REF_FRAME_BUCKETS = (384, 768, 1152)

    def mel_of_wav_device(self, wav: np.ndarray) -> tuple[jax.Array, int]:
        """[n] waveform -> ([1, REF_FRAME_BUCKETS[-1], n_mels] DEVICE mel, n_frames).

        Serving fast-path front-end: exact (the variant's reflect padding runs
        on host so the jitted center=False program sees the same samples as
        `mel_of_wav`), one device dispatch, result stays on device — rows
        >= n_frames are garbage/zero and must be masked by the consumer
        (models/cfm.serve_sample masks cond rows >= lens).
        """
        from korean_f5_tts_tpu.ops.mel import log_mel_prepadded

        wav = np.asarray(wav, np.float32).reshape(-1)
        cfg = self.mel
        hop, n_fft = cfg.hop_length, cfg.n_fft
        pad = n_fft // 2 if cfg.mel_spec_type == "vocos" else (n_fft - hop) // 2
        out_frames = self.REF_FRAME_BUCKETS[-1]
        max_nw = (out_frames - 1) * hop + n_fft - 2 * pad
        if wav.size > max_nw:
            # public API: refuse rather than silently truncate (round-3
            # ADVICE); serving callers pre-clip refs to <= 12 s
            raise ValueError(
                f"mel_of_wav_device: waveform of {wav.size} samples exceeds "
                f"the largest serving ref bucket ({max_nw} samples ~ "
                f"{max_nw / cfg.target_sample_rate:.1f} s); clip the "
                "reference first (serving clips to 12 s) or use mel_of_wav")
        if wav.size <= pad:
            # reflect padding needs > pad samples; zero-extend ultra-short
            # refs instead of surfacing an opaque numpy error
            wav = np.pad(wav, (0, pad + 1 - wav.size))
        x = np.pad(wav, (pad, pad), mode="reflect")
        n_frames = (x.size - n_fft) // hop + 1
        f_b = next(f for f in self.REF_FRAME_BUCKETS if f >= n_frames)
        l_b = (f_b - 1) * hop + n_fft
        x = np.pad(x, (0, l_b - x.size))
        return log_mel_prepadded(x[None], cfg, out_frames), int(n_frames)


_INIT_FNS = {"DiT": init_dit, "UNetT": init_unett, "MMDiT": init_mmdit}


def load_checkpoint_into_pytree(ckpt_path: str, arch, backbone: str,
                                use_ema: bool = True) -> dict:
    """Load a checkpoint file into this framework's param pytree.

    Supports:
      - .npz  — this framework's native flat pytree dump (train/checkpoint.py)
      - .pt / .safetensors — reference torch checkpoints via utils/torch_ckpt
    """
    if ckpt_path.endswith(".npz"):
        from korean_f5_tts_tpu.train.checkpoint import unflatten_tree

        data = dict(np.load(ckpt_path, allow_pickle=False))
        prefix = "ema_params/" if use_ema and any(k.startswith("ema_params/") for k in data) \
            else "params/"
        sub = {k[len(prefix):]: v for k, v in data.items() if k.startswith(prefix)}
        return unflatten_tree(sub if sub else data)

    from korean_f5_tts_tpu.utils.torch_ckpt import (
        convert_dit_state_dict,
        convert_unett_state_dict,
        load_torch_checkpoint,
        merge_lora,
        strip_ema_prefix,
    )

    sd = load_torch_checkpoint(ckpt_path)
    sd = strip_ema_prefix(sd)
    if any("lora_" in k for k in sd):
        sd = merge_lora(sd)
    if backbone == "DiT":
        return convert_dit_state_dict(sd, arch.heads, arch.dim_head, arch.depth,
                                      arch.conv_layers)
    if backbone == "UNetT":
        return convert_unett_state_dict(sd, arch.heads, arch.dim_head, arch.depth,
                                        arch.conv_layers, arch.skip_connect_type)
    raise ValueError(f"torch conversion not implemented for backbone {backbone}")


def load_model(
    model_cfg: ModelConfig,
    ckpt_path: str | None = None,
    vocab_file: str | None = None,
    use_ema: bool = True,
    tokenizer: str | None = None,
    use_skip_tc: bool = False,
    use_n2gk_plus: bool = True,
    tokenizer_version: str = "new",
    compute_dtype=None,
    seed: int = 0,
    quantize: bool | None = None,
) -> TTSModel:
    """Build a ready-to-infer TTSModel (utils_infer.py:292-345 role).

    With no ckpt_path the model is randomly initialised (useful for tests and
    from-scratch setups). `tokenizer_version="legacy"` selects the '' SkipTC
    token — the reference CLI flag that its own load_model forgot to accept
    (SURVEY.md §7 quirk, implemented coherently here).
    """
    vocab_char_map = None
    if vocab_file is not None and os.path.exists(vocab_file):
        vocab_char_map = load_vocab_file(vocab_file)
        vocab_size = len(vocab_char_map)
    else:
        vocab_size = model_cfg.arch.text_num_embeds

    arch = model_cfg.arch
    if vocab_char_map is not None:
        arch = dataclasses.replace(arch, text_num_embeds=vocab_size + 1)

    if ckpt_path:
        params = load_checkpoint_into_pytree(ckpt_path, arch, model_cfg.backbone,
                                             use_ema=use_ema)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        params = _INIT_FNS[model_cfg.backbone](jax.random.PRNGKey(seed), arch)

    if compute_dtype is not None:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(compute_dtype) if x.dtype == jnp.float32 else x, params
        )

    if quantize is None:
        quantize = os.environ.get("F5_TTS_INT8", "0") != "0"
    if quantize:
        # int8 weight quantization (models/quant.py): block linears go to the
        # {w_int8, w_scale, b} layout; on TPU the FF half-blocks then run the
        # fused int8 kernel (ops/ff_block.py) with in-kernel dynamic
        # activation quantization. ~0.35% model output error — opt-in.
        from korean_f5_tts_tpu.models.quant import quantize_params

        params = quantize_params(params)

    return TTSModel(
        params=params,
        arch=arch,
        mel=model_cfg.mel,
        vocab_char_map=vocab_char_map,
        tokenizer_type=tokenizer or model_cfg.tokenizer,
        use_skip_tc=use_skip_tc,
        use_n2gk_plus=use_n2gk_plus,
        tokenizer_legacy=(tokenizer_version == "legacy"),
    )
