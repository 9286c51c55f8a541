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

    def test_multistyle_control_inventory(self, gradio_stub, monkeypatch):
        """Tab-by-tab control parity with reference infer_gradio.py:395-749:
        per-type rows (name/insert/delete/audio/ref-text/seed/speed/file),
        add button, script textbox + file loader, cherry-pick panel."""
        import korean_f5_tts_tpu.infer.infer_gradio as ig

        monkeypatch.setattr(ig, "_load_model_cached", lambda *a, **k: object())
        import korean_f5_tts_tpu.api as api

        monkeypatch.setattr(api, "load_vocoder", lambda *a, **k: (lambda m: m))
        app = ig.build_app(model_name="tiny")
        tab = next(c for c in app.walk() if type(c).__name__ == "Tab"
                   and c.label == "Multi-Speech-Type")
        comps = list(tab.walk())

        def count(cls, label=None):
            return sum(1 for c in comps if type(c).__name__ == cls
                       and (label is None or c.label == label))

        n = ig.MAX_SPEECH_TYPES
        assert count("Textbox", "Speech Type Name") == n
        assert count("Button", "Insert Label") == n
        assert count("Button", "Delete Type") == n - 1  # Regular is mandatory
        assert count("Audio", "Reference Audio") == n
        assert count("Textbox", "Reference Text") == n
        assert count("File", "Load Reference Text from File (.txt)") == n
        assert count("Slider") >= 2 * n  # seed + speed per row
        assert count("Button", "Add Speech Type") == 1
        assert count("Button", "Generate Multi-Style Speech") == 1
        assert count("Textbox", "Cherry-pick Interface") == 1
        assert count("Checkbox", "Show Cherry-pick Interface") == 1
        assert count("Checkbox", "Remove Silences") == 1
        assert count("File", "Load Text to Generate from File (.txt)") == 1
        # per-row wiring: audio clear + ref-text-file upload registered
        triggers = {e.trigger for e in app.all_events}
        assert {"clear", "upload", "change"} <= triggers

    def test_multistyle_add_delete_insert(self, gradio_stub, monkeypatch):
        import korean_f5_tts_tpu.infer.infer_gradio as ig

        monkeypatch.setattr(ig, "_load_model_cached", lambda *a, **k: object())
        import korean_f5_tts_tpu.api as api

        monkeypatch.setattr(api, "load_vocoder", lambda *a, **k: (lambda m: m))
        app = ig.build_app(model_name="tiny")
        # Add Speech Type: row 1 becomes visible, count increments
        add = app.find("Button", "Add Speech Type")
        out = add.events[0].fire(1)
        assert out[0] == 2
        assert out[2] == {"__type__": "update", "visible": True}
        assert out[1] == {"__type__": "update"}  # row 0 untouched
        # Delete Type: hides the row and clears its fields
        delete = app.find("Button", "Delete Type")
        upd, name, audio, ref_text, ref_file = delete.events[0].fire()
        assert upd == {"__type__": "update", "visible": False}
        assert name is None and audio is None
        # Insert Label bakes name/seed/speed into a JSON tag
        insert = app.find("Button", "Insert Label")
        ev = insert.events[0]
        text = ev.fn("hello ", "Regular", -1, 1.0)
        assert text == 'hello {"name": "Regular", "seed": -1, "speed": 1.0} '
        # empty name warns and leaves text unchanged
        from korean_f5_tts_tpu.utils import gradio_stub as gs

        gs._WARNINGS.clear()
        assert ev.fn("abc", "", -1, 1.0) == "abc"
        assert gs._WARNINGS

    def test_finetune_stats_panel(self, gradio_stub, monkeypatch, tmp_path):
        """System Info tab parity (reference finetune_gradio.py:1833-1845):
        Update Stats -> combined accelerator+CPU report in the textbox."""
        monkeypatch.chdir(tmp_path)
        import korean_f5_tts_tpu.train.finetune_gradio as fg

        app = fg.build_app()
        box = app.find("Textbox", "GPU and CPU Information")
        btn = app.find("Button", "Update Stats")
        assert box is not None and btn is not None
        btn.events[0].fire()
        assert "### CPU Stats" in box.value
        assert "System Memory:" in box.value

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
