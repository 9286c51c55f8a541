"""Gradio web UI: basic TTS / multi-speech-type / voice-chat tabs.

Parity with reference `src/f5_tts/infer/infer_gradio.py` (3 tabs at
`:216,395,751`, custom model loader `:77-96`, cached infer `:131-215`).
gradio is not installed in this image, so the app builds lazily; the
tab logic and the speech-type tag parser are importable and tested without
it. The voice-chat tab requires a local chat LLM + ASR and stays gated
offline (reference uses Qwen2.5-3B + Whisper downloads).
"""

from __future__ import annotations

import functools
import re

DEFAULT_TTS_MODEL = "F5TTS_v1_Base"


def parse_speechtypes_text(gen_text: str) -> list[dict]:
    """Split '{Style} text...' segments (multi-speech-type tab contract)."""
    tokens = re.split(r"\{(.*?)\}", gen_text)
    segments = []
    style = "Regular"
    for i, token in enumerate(tokens):
        if i % 2 == 0:
            if token.strip():
                segments.append({"style": style, "text": token.strip()})
        else:
            style = token.strip()
    return segments


@functools.lru_cache(maxsize=4)
def _load_model_cached(model_name: str, ckpt_file: str, vocab_file: str,
                       tokenizer: str):
    from korean_f5_tts_tpu.config import preset_model_config
    from korean_f5_tts_tpu.infer.model import load_model

    return load_model(preset_model_config(model_name),
                      ckpt_path=ckpt_file or None, vocab_file=vocab_file or None,
                      tokenizer=tokenizer or None)


def synthesize_segments(segments: list[dict], voices: dict[str, dict], model_obj,
                        vocoder, nfe_step: int = 32, **kw):
    """Render styled segments with per-style reference audio, concatenated."""
    import numpy as np

    from korean_f5_tts_tpu.infer.utils_infer import infer_process

    out = []
    sr = 24_000
    for seg in segments:
        v = voices.get(seg["style"], voices.get("Regular"))
        if v is None:
            continue
        wav, sr, _ = infer_process(
            (v["ref_wav"], v["sr"]), v["ref_text"], seg["text"], model_obj,
            vocoder, nfe_step=nfe_step, show_info=lambda *a: None, **kw,
        )
        out.append(wav)
    return (np.concatenate(out) if out else None), sr


def build_app(model_name: str = DEFAULT_TTS_MODEL, ckpt_file: str = "",
              vocab_file: str = "", tokenizer: str = ""):
    """Construct the gradio Blocks app (requires gradio)."""
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "gradio is not installed in this image; the inference UI requires it. "
            "Use f5-tts_infer-cli or the HTTP server instead."
        ) from e

    from korean_f5_tts_tpu.api import load_vocoder
    from korean_f5_tts_tpu.infer.utils_infer import infer_process, preprocess_ref_audio_text

    model_obj = _load_model_cached(model_name, ckpt_file, vocab_file, tokenizer)
    vocoder = load_vocoder("vocos")

    def basic_tts(ref_audio, ref_text, gen_text, remove_silence, cross_fade,
                  nfe_step, speed):
        audio, ref_text = preprocess_ref_audio_text(ref_audio, ref_text)
        wav, sr, spec = infer_process(
            audio, ref_text, gen_text, model_obj, vocoder,
            cross_fade_duration=cross_fade, nfe_step=int(nfe_step), speed=speed,
        )
        return (sr, wav)

    with gr.Blocks(title="Korean F5-TTS (TPU)") as app:
        gr.Markdown("# Korean F5-TTS — TPU-native")
        with gr.Tab("Basic TTS"):
            ref_audio = gr.Audio(label="Reference audio", type="filepath")
            ref_text = gr.Textbox(label="Reference text")
            gen_text = gr.Textbox(label="Text to generate", lines=4)
            with gr.Accordion("Advanced", open=False):
                remove_silence = gr.Checkbox(label="Remove silences", value=False)
                cross_fade = gr.Slider(0.0, 1.0, 0.15, label="Cross-fade (s)")
                nfe = gr.Slider(4, 64, 32, step=2, label="NFE steps")
                speed = gr.Slider(0.3, 2.0, 1.0, label="Speed")
            btn = gr.Button("Synthesize", variant="primary")
            out = gr.Audio(label="Output")
            btn.click(basic_tts,
                      [ref_audio, ref_text, gen_text, remove_silence, cross_fade,
                       nfe, speed], out)
        with gr.Tab("Multi-Speech-Type"):
            gr.Markdown("Mark segments as `{Style} text...`; add one reference "
                        "per style below.")
            style_names = gr.Textbox(label="Styles (comma-separated)",
                                     value="Regular,Shouting")
            style_audios = gr.File(label="One reference wav per style",
                                   file_count="multiple", type="filepath")
            style_texts = gr.Textbox(label="Reference texts (one per line)", lines=3)
            multi_text = gr.Textbox(label="Script with {Style} tags", lines=6)
            multi_nfe = gr.Slider(4, 64, 32, step=2, label="NFE steps")
            multi_out = gr.Audio(label="Output")

            def multi_tts(names, files, texts, script, nfe_step):
                from korean_f5_tts_tpu.utils.audio import load_wav, to_mono

                names = [n.strip() for n in names.split(",") if n.strip()]
                texts_list = [t.strip() for t in (texts or "").splitlines()]
                voices = {}
                for i, name in enumerate(names):
                    if files and i < len(files):
                        wav, sr = load_wav(files[i])
                        voices[name] = {
                            "ref_wav": to_mono(wav), "sr": sr,
                            "ref_text": texts_list[i] if i < len(texts_list) else "",
                        }
                segments = parse_speechtypes_text(script)
                wav, sr = synthesize_segments(segments, voices, model_obj, vocoder,
                                              nfe_step=int(nfe_step))
                return (sr, wav)

            gr.Button("Synthesize script", variant="primary").click(
                multi_tts,
                [style_names, style_audios, style_texts, multi_text, multi_nfe],
                multi_out,
            )
        with gr.Tab("Voice Chat"):
            gr.Markdown("Voice chat needs a local chat LLM + ASR checkpoint; "
                        "unavailable in offline builds.")
    return app


def main(argv=None):  # pragma: no cover
    import argparse

    p = argparse.ArgumentParser(prog="f5-tts_infer-gradio")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--share", action="store_true")
    p.add_argument("--model", default=DEFAULT_TTS_MODEL)
    p.add_argument("--ckpt_file", default="")
    p.add_argument("--vocab_file", default="")
    args = p.parse_args(argv)
    app = build_app(args.model, args.ckpt_file, args.vocab_file)
    app.queue().launch(server_name=args.host, server_port=args.port,
                       share=args.share)


if __name__ == "__main__":
    main()
