"""Batch generation of eval wavs from a metadata list (KSS-style).

Parity with reference `src/f5_tts/infer/batch_infer.py` (hard-coded KSS
batch loop) — generalised to any jsonl/csv metadata with a fixed reference
prompt or per-row references.
"""

from __future__ import annotations

import argparse
import json
import os

from korean_f5_tts_tpu.infer.utils_infer import infer_process, preprocess_ref_audio_text
from korean_f5_tts_tpu.utils.audio import save_wav


def batch_generate(model_obj, vocoder, rows: list[dict], out_dir: str,
                   ref_audio: str | None = None, ref_text: str | None = None,
                   nfe_step: int = 32, seed: int | None = None) -> list[str]:
    """rows: [{utt, text, (ref_audio, ref_text)}] -> wav paths written."""
    os.makedirs(out_dir, exist_ok=True)
    shared = None
    if ref_audio is not None:
        shared = preprocess_ref_audio_text(ref_audio, ref_text or "")
    written = []
    for row in rows:
        out_path = os.path.join(out_dir, row["utt"] + ".wav")
        if os.path.exists(out_path):
            continue
        if shared is not None:
            (wav_ref, sr), rtext = shared
        else:
            (wav_ref, sr), rtext = preprocess_ref_audio_text(
                row["ref_audio"], row.get("ref_text", "")
            )
        wav, out_sr, _ = infer_process(
            (wav_ref, sr), rtext, row["text"], model_obj, vocoder,
            nfe_step=nfe_step, show_info=lambda *a: None, seed=seed,
        )
        save_wav(out_path, wav, out_sr)
        written.append(out_path)
    return written


def main(argv=None):
    p = argparse.ArgumentParser(prog="f5-tts_batch-infer")
    p.add_argument("--metadata", required=True, help="jsonl with utt/text")
    p.add_argument("--ref_audio", default=None)
    p.add_argument("--ref_text", default=None)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--model", default="F5TTS_v1_Base")
    p.add_argument("--ckpt_file", default=None)
    p.add_argument("--vocab_file", default=None)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--nfe_step", type=int, default=32)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--device", default=None)
    args = p.parse_args(argv)
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    from korean_f5_tts_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    from korean_f5_tts_tpu.api import load_vocoder
    from korean_f5_tts_tpu.config import preset_model_config
    from korean_f5_tts_tpu.infer.model import load_model

    rows = []
    with open(args.metadata, "r", encoding="utf-8") as f:
        for line in f:
            if line.strip():
                rows.append(json.loads(line))
    model_obj = load_model(preset_model_config(args.model), ckpt_path=args.ckpt_file,
                           vocab_file=args.vocab_file, tokenizer=args.tokenizer)
    vocoder = load_vocoder("vocos")
    written = batch_generate(model_obj, vocoder, rows, args.out_dir,
                             ref_audio=args.ref_audio, ref_text=args.ref_text,
                             nfe_step=args.nfe_step, seed=args.seed)
    print(f"wrote {len(written)} wavs to {args.out_dir}")


if __name__ == "__main__":
    main()
