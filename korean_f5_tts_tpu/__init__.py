"""korean_f5_tts_tpu — TPU-native rebuild of Korean-F5-TTS.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
KwangsungKim138/Korean-F5-TTS (a Korean-specialised fork of SWivid/F5-TTS):
zero-shot voice-cloning TTS via conditional flow matching, with a family of
Korean grapheme-to-allophone tokenizers and an N2gk+ text normaliser.

Layout (reference parity targets cited per-module):
  ops/       — mel/STFT/ISTFT kernels, attention (XLA + Pallas), rope
  models/    — DiT / UNetT / MMDiT backbones, CFM wrapper, Vocos vocoder
  text/      — tokenizers, Korean G2P + G2A, N2gk/N2gk+ normalisation
  data/      — Arrow dataset reader, dynamic frame-budget batching
  train/     — optax training loop, EMA, checkpointing, LoRA
  infer/     — chunking/cross-fade pipeline, public F5TTS API, CLI
  parallel/  — device mesh + sharding rules (dp/fsdp/tp)
  serving/   — batching inference server + benchmark harness
  eval/      — CER/WER/SIM evaluation harnesses
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy public API: `from korean_f5_tts_tpu import F5TTS` without paying
    # jax import cost for text-only users
    if name == "F5TTS":
        from korean_f5_tts_tpu.api import F5TTS

        return F5TTS
    if name == "CFM":
        from korean_f5_tts_tpu.models import cfm as CFM

        return CFM
    raise AttributeError(name)
