"""Public Python API: the F5TTS class.

Parity with reference `src/f5_tts/api.py:23-149` — config lookup by model
name, vocoder attach, checkpoint load, `infer()` with seed management and
wav/spectrogram export. Device selection is jax-native (the default jax
backend: TPU when present, else CPU); HF auto-download is gated (zero-egress
builds pass ckpt_file explicitly).
"""

from __future__ import annotations

import os
import random
import sys

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.config import PRESETS, load_model_config, preset_model_config
from korean_f5_tts_tpu.infer.model import TTSModel, load_model
from korean_f5_tts_tpu.infer.utils_infer import (
    infer_process,
    preprocess_ref_audio_text,
    remove_silence_for_generated_wav,
    save_spectrogram,
)
from korean_f5_tts_tpu.models.vocos import VocosConfig, init_vocos, vocos_decode
from korean_f5_tts_tpu.utils.audio import save_wav


def load_vocoder(vocoder_name: str = "vocos", is_local: bool = False,
                 local_path: str = "", seed: int = 0):
    """Build the in-graph vocoder callable mel[b,d,n] -> wav[b,nw].

    With a local converted checkpoint (.npz from utils/torch_ckpt
    convert_vocos_state_dict) real weights are used; otherwise random init
    (useful for smoke tests; reference downloads from HF at
    utils_infer.py:114-143, unavailable offline).
    """
    if vocoder_name != "vocos":
        raise NotImplementedError(
            "bigvgan vocoder requires external weights; vocos is the in-graph default"
        )
    cfg = VocosConfig()
    if is_local and local_path and os.path.exists(local_path):
        import numpy as np

        from korean_f5_tts_tpu.train.checkpoint import unflatten_tree

        params = unflatten_tree(dict(np.load(local_path, allow_pickle=False)))
        params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        params = init_vocos(jax.random.PRNGKey(seed), cfg)
    decode = jax.jit(lambda mel: vocos_decode(params, mel, cfg))
    decode.params = params  # expose for checkpointing/serving
    decode.vcfg = cfg  # lets serving fuse DiT+vocoder into one program
    return decode


class F5TTS:
    def __init__(
        self,
        model: str = "F5TTS_v1_Base",
        ckpt_file: str = "",
        vocab_file: str = "",
        ode_method: str = "euler",
        use_ema: bool = True,
        vocoder_local_path: str | None = None,
        device: str | None = None,
        hf_cache_dir: str | None = None,
        tokenizer: str | None = None,
        use_skip_tc: bool = False,
        use_n2gk_plus: bool = True,
        tokenizer_version: str = "new",
        compute_dtype=None,
    ):
        if model in PRESETS:
            model_cfg = preset_model_config(model)
        elif os.path.exists(model):
            model_cfg = load_model_config(model)
        else:
            raise ValueError(f"unknown model {model}; presets: {sorted(PRESETS)}")

        assert ode_method == "euler", "euler is the supported ODE method"
        self.mel_spec_type = model_cfg.mel.mel_spec_type
        self.target_sample_rate = model_cfg.mel.target_sample_rate
        self.device = device or jax.devices()[0].platform
        self.seed = None

        self.vocoder = load_vocoder(
            self.mel_spec_type, vocoder_local_path is not None,
            vocoder_local_path or "",
        )
        self.ema_model: TTSModel = load_model(
            model_cfg,
            ckpt_path=ckpt_file or None,
            vocab_file=vocab_file or None,
            use_ema=use_ema,
            tokenizer=tokenizer,
            use_skip_tc=use_skip_tc,
            use_n2gk_plus=use_n2gk_plus,
            tokenizer_version=tokenizer_version,
            compute_dtype=compute_dtype,
        )

    def transcribe(self, ref_audio, language=None):
        from korean_f5_tts_tpu.infer.utils_infer import transcribe

        return transcribe(ref_audio, language)

    def export_wav(self, wav, file_wave, remove_silence: bool = False):
        save_wav(file_wave, wav, self.target_sample_rate)
        if remove_silence:
            remove_silence_for_generated_wav(file_wave)

    def export_spectrogram(self, spec, file_spec):
        save_spectrogram(spec, file_spec)

    def infer(
        self,
        ref_file: str,
        ref_text: str,
        gen_text: str,
        show_info=print,
        progress=None,
        target_rms: float = 0.1,
        cross_fade_duration: float = 0.15,
        sway_sampling_coef: float = -1.0,
        cfg_strength: float = 2.0,
        nfe_step: int = 32,
        speed: float = 1.0,
        fix_duration: float | None = None,
        remove_silence: bool = False,
        file_wave: str | None = None,
        file_spec: str | None = None,
        seed: int | None = None,
    ):
        if seed is None:
            seed = random.randint(0, sys.maxsize) % (2**31)
        self.seed = seed

        ref_audio, ref_text = preprocess_ref_audio_text(ref_file, ref_text)
        wav, sr, spec = infer_process(
            ref_audio, ref_text, gen_text, self.ema_model, self.vocoder,
            self.mel_spec_type, show_info=show_info, progress=progress,
            target_rms=target_rms, cross_fade_duration=cross_fade_duration,
            nfe_step=nfe_step, cfg_strength=cfg_strength,
            sway_sampling_coef=sway_sampling_coef, speed=speed,
            fix_duration=fix_duration, seed=seed,
        )
        if file_wave is not None:
            self.export_wav(wav, file_wave, remove_silence)
        if file_spec is not None:
            self.export_spectrogram(spec, file_spec)
        return wav, sr, spec
