"""Gradio web UI: basic TTS / multi-speech-type / voice-chat tabs.

Parity with reference `src/f5_tts/infer/infer_gradio.py` (3 tabs at
`:216,395,751`, custom model loader `:77-96`, cached infer `:131-215`).
gradio is not installed in this image, so the app builds lazily; the
tab logic (speech-type tag parser, VoiceChatSession pipeline) is importable
and tested without it. The voice-chat tab's LLM backend loads any local
transformers causal-LM checkpoint (reference hardcodes Qwen2.5-3B +
downloads Whisper; zero-egress builds inject backends).
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


def chat_model_inference(messages: list[dict], model, tokenizer,
                         max_new_tokens: int = 512, temperature: float = 0.7,
                         top_p: float = 0.95) -> str:
    """Chat-template generation with a transformers causal LM — the exact
    contract of the reference's Qwen2.5 path (infer_gradio.py:99-119)."""
    text = tokenizer.apply_chat_template(
        messages, tokenize=False, add_generation_prompt=True)
    inputs = tokenizer([text], return_tensors="pt").to(model.device)
    generated = model.generate(**inputs, max_new_tokens=max_new_tokens,
                               temperature=temperature, top_p=top_p)
    trimmed = [out[len(inp):] for inp, out in zip(inputs.input_ids, generated)]
    return tokenizer.batch_decode(trimmed, skip_special_tokens=True)[0]


def make_hf_chat_backend(model_name: str = "Qwen/Qwen2.5-3B-Instruct"):
    """messages -> reply via a local HF checkpoint (download/path required;
    zero-egress builds inject their own backend into VoiceChatSession)."""
    from transformers import AutoModelForCausalLM, AutoTokenizer

    model = AutoModelForCausalLM.from_pretrained(model_name, torch_dtype="auto",
                                                 device_map="auto")
    tokenizer = AutoTokenizer.from_pretrained(model_name)
    return lambda messages: chat_model_inference(messages, model, tokenizer)


class VoiceChatSession:
    """Voice-chat tab core (reference infer_gradio.py:751-961), UI-free.

    Pipeline per user turn: audio/text in -> ASR (set_asr_backend or typed
    text) -> chat LLM (injectable `chat_fn(messages) -> str`) -> TTS of the
    assistant reply in the reference voice. Conversation state is the
    message list the reference keeps in the gr.Chatbot.
    """

    DEFAULT_SYSTEM_PROMPT = (
        "You are not an AI assistant, you are whoever the user says you are. "
        "You must stay in character. Keep your responses concise since they "
        "will be spoken out loud."
    )

    def __init__(self, chat_fn, model_obj=None, vocoder=None,
                 system_prompt: str | None = None):
        self.chat_fn = chat_fn
        self.model_obj = model_obj
        self.vocoder = vocoder
        self.system_prompt = system_prompt or self.DEFAULT_SYSTEM_PROMPT
        self.conversation: list[dict] = []

    def process_audio_input(self, audio_path: str | None, text: str = "") -> str | None:
        """User turn: transcribe the clip (or take typed text) and append
        (infer_gradio.py:863-877)."""
        if audio_path:
            from korean_f5_tts_tpu.infer.utils_infer import preprocess_ref_audio_text

            text = preprocess_ref_audio_text(audio_path, text)[1]
        if not (text or "").strip():
            return None
        self.conversation.append({"role": "user", "content": text})
        return text

    def generate_text_response(self) -> str:
        """Assistant turn via the chat backend (infer_gradio.py:879-891)."""
        messages = [{"role": "system", "content": self.system_prompt}]
        messages += self.conversation
        reply = self.chat_fn(messages)
        self.conversation.append({"role": "assistant", "content": reply})
        return reply

    def generate_audio_response(self, ref_audio, ref_text: str,
                                seed: int | None = None, nfe_step: int = 32):
        """TTS of the last assistant reply in the reference voice
        (infer_gradio.py:893-917). Returns (wav, sr) or None."""
        if not self.conversation or self.conversation[-1]["role"] != "assistant":
            return None
        if self.model_obj is None:
            return None
        from korean_f5_tts_tpu.infer.utils_infer import infer_process

        wav, sr, _ = infer_process(
            ref_audio, ref_text, self.conversation[-1]["content"],
            self.model_obj, self.vocoder, nfe_step=nfe_step,
            show_info=lambda *a: None, seed=seed,
        )
        return wav, sr

    def clear(self) -> None:
        self.conversation = []


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
            gr.Markdown("Have a conversation with an AI using your reference "
                        "voice. Requires a local chat LLM checkpoint "
                        "(e.g. Qwen/Qwen2.5-3B-Instruct) and an ASR backend.")
            chat_model_name = gr.Textbox(label="Chat model (HF name or path)",
                                         value="Qwen/Qwen2.5-3B-Instruct")
            load_chat_btn = gr.Button("Load chat model", variant="primary")
            chat_status = gr.Markdown("*no chat model loaded*")
            chat_ref_audio = gr.Audio(label="Reference audio", type="filepath")
            chat_ref_text = gr.Textbox(label="Reference text")
            system_prompt = gr.Textbox(label="System prompt",
                                       value=VoiceChatSession.DEFAULT_SYSTEM_PROMPT,
                                       lines=2)
            chatbot = gr.Chatbot(label="Conversation", type="messages")
            chat_text = gr.Textbox(label="Type your message")
            chat_audio_in = gr.Microphone(label="Or speak", type="filepath")
            chat_out = gr.Audio(label="AI voice reply", autoplay=True)
            clear_btn = gr.Button("Clear conversation")
            session_state = gr.State(None)

            def load_chat(name, prompt):
                session = VoiceChatSession(
                    make_hf_chat_backend(name), model_obj=model_obj,
                    vocoder=vocoder, system_prompt=prompt)
                return session, f"chat model `{name}` loaded"

            def chat_turn(session, audio_path, text, ref_audio_path, ref_text_v):
                if session is None:
                    return session, [], None
                if session.process_audio_input(audio_path, text) is None:
                    return session, list(session.conversation), None
                session.generate_text_response()
                out = None
                if ref_audio_path:
                    res = session.generate_audio_response(ref_audio_path,
                                                          ref_text_v)
                    if res is not None:
                        wav, sr = res
                        out = (sr, wav)
                return session, list(session.conversation), out

            def clear_chat(session):
                if session is not None:
                    session.clear()
                return session, [], None

            load_chat_btn.click(load_chat, [chat_model_name, system_prompt],
                                [session_state, chat_status])
            for trigger in (chat_text.submit, chat_audio_in.stop_recording):
                trigger(chat_turn,
                        [session_state, chat_audio_in, chat_text,
                         chat_ref_audio, chat_ref_text],
                        [session_state, chatbot, chat_out])
            clear_btn.click(clear_chat, [session_state],
                            [session_state, chatbot, chat_out])
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
