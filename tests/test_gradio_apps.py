"""Execute both Gradio Blocks layouts headlessly via the gradio stub.

Round-3 VERDICT weak-point 4: `build_app()` in infer_gradio and
finetune_gradio was `pragma: no cover` (gradio absent in the image) — the
layout code could be broken without any test noticing. The stub
(utils/gradio_stub.py) supplies the component surface, records the tree, and
lets callbacks fire headlessly."""

import numpy as np
import pytest


@pytest.fixture
def gradio_stub():
    from korean_f5_tts_tpu.utils import gradio_stub as gs

    mod = gs.install(force=True)
    yield mod
    gs.uninstall()


class TestInferGradioApp:
    def test_build_app_executes_layout(self, gradio_stub, monkeypatch):
        import korean_f5_tts_tpu.infer.infer_gradio as ig

        class _TinyModel:
            pass

        monkeypatch.setattr(ig, "_load_model_cached",
                            lambda *a, **k: _TinyModel())
        import korean_f5_tts_tpu.api as api

        monkeypatch.setattr(api, "load_vocoder", lambda *a, **k: (lambda m: m))

        app = ig.build_app(model_name="tiny")
        assert type(app).__name__ == "Blocks"
        tabs = [c.label for c in app.walk() if type(c).__name__ == "Tab"]
        # 3-tab parity with the reference (infer_gradio.py:216,395,751)
        assert tabs == ["Basic TTS", "Multi-Speech-Type", "Voice Chat"]
        # wiring: the basic-TTS synthesize button drives 7 inputs -> audio out
        btn = app.find("Button", "Synthesize")
        assert btn is not None and btn.events
        ev = btn.events[0]
        assert len(ev.inputs) == 7
        assert type(ev.outputs[0]).__name__ == "Audio"
        # voice-chat wiring: text submit AND mic stop_recording both trigger
        triggers = {e.trigger for e in app.all_events}
        assert {"click", "submit", "stop_recording"} <= triggers

    def test_voice_chat_clear_fires(self, gradio_stub, monkeypatch):
        import korean_f5_tts_tpu.infer.infer_gradio as ig

        monkeypatch.setattr(ig, "_load_model_cached", lambda *a, **k: object())
        import korean_f5_tts_tpu.api as api

        monkeypatch.setattr(api, "load_vocoder", lambda *a, **k: (lambda m: m))
        app = ig.build_app(model_name="tiny")
        clear = app.find("Button", "Clear conversation")
        assert clear is not None
        session, conv, out = clear.events[0].fire(None)
        assert session is None and conv == [] and out is None


class TestFinetuneGradioApp:
    def test_build_app_executes_layout(self, gradio_stub, monkeypatch, tmp_path):
        monkeypatch.chdir(tmp_path)
        import korean_f5_tts_tpu.train.finetune_gradio as fg

        app = fg.build_app()
        assert type(app).__name__ == "Blocks"
        tab_items = [c.label for c in app.walk()
                     if type(c).__name__ == "TabItem"]
        assert len(tab_items) >= 3, tab_items
        assert app.find("Button", "Create / refresh") is not None
        assert app.all_events, "no callbacks wired"

    def test_create_project_callback_fires(self, gradio_stub, monkeypatch,
                                           tmp_path):
        monkeypatch.chdir(tmp_path)
        import korean_f5_tts_tpu.train.finetune_gradio as fg

        app = fg.build_app()
        btn = app.find("Button", "Create / refresh")
        upd, status = btn.events[0].fire("proj_x_pinyin")
        assert "ready:" in status
        assert upd.get("__type__") == "update"


class TestGradioStub:
    def test_event_fire_assigns_outputs(self, gradio_stub):
        gr = gradio_stub
        with gr.Blocks() as app:
            a = gr.Textbox(label="a", value="x")
            b = gr.Textbox(label="b")
            gr.Button("go").click(lambda v: v + "!", a, b)
        app.find("Button", "go").events[0].fire()
        assert b.value == "x!"

    def test_nested_containers_record_tree(self, gradio_stub):
        gr = gradio_stub
        with gr.Blocks() as app:
            with gr.Tab("t1"):
                with gr.Row():
                    gr.Slider(0, 10, 5, label="s")
        s = app.find("Slider", "s")
        assert s is not None and s.value == 5 and np.isfinite(s.value)
