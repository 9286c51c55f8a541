"""Finetuning studio: project management, data prep, training control, test
inference — gradio UI over the pipeline pieces.

Parity with reference `src/f5_tts/train/finetune_gradio.py`: project dirs
(`data/<project>/...`), audio slicing (`:181-296` -> utils/slicer.py),
transcription (`:619-689`, gated offline), metadata -> arrow (`:728-838` ->
train/datasets/prepare.py), vocab check/extend (`:957-1062` ->
train/vocab_extend.py), training via a spawned subprocess with kill/restart
(`:326-450`, `:584-593`), checkpoint pruning (`:932-955`), resource stats
(`:1269-1348`). The functional core below is importable and tested without
gradio; `build_app` lazily builds the UI.
"""

from __future__ import annotations

import json
import os
import shlex
import signal
import subprocess
import sys


class FinetuneProject:
    """Filesystem layout + training-process lifecycle for one project."""

    def __init__(self, name: str, root: str = "data"):
        self.name = name
        self.root = root
        self.dir = os.path.join(root, f"{name}_pinyin")
        self.wavs_dir = os.path.join(self.dir, "wavs")
        self.ckpt_dir = os.path.join("ckpts", name)
        self._proc: subprocess.Popen | None = None

    def create(self) -> str:
        os.makedirs(self.wavs_dir, exist_ok=True)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        return self.dir

    # -- data prep ----------------------------------------------------------

    def slice_audio(self, wav_path: str, **slicer_kwargs) -> list[str]:
        import numpy as np

        from korean_f5_tts_tpu.utils.audio import load_wav, save_wav, to_mono
        from korean_f5_tts_tpu.utils.slicer import Slicer

        wav, sr = load_wav(wav_path)
        mono = to_mono(np.asarray(wav))
        clips = Slicer(sr, **slicer_kwargs).slice(mono)
        base = os.path.splitext(os.path.basename(wav_path))[0]
        out = []
        for i, clip in enumerate(clips):
            path = os.path.join(self.wavs_dir, f"{base}_{i:04d}.wav")
            save_wav(path, clip, sr)
            out.append(path)
        return out

    def transcribe_all(self, transcribe_fn=None) -> str:
        """Write metadata.csv from wavs via an injected ASR (offline-gated)."""
        if transcribe_fn is None:
            raise RuntimeError(
                "transcription needs an ASR backend (Whisper weights are not "
                "downloadable offline); write metadata.csv manually or pass "
                "transcribe_fn"
            )
        rows = []
        for f in sorted(os.listdir(self.wavs_dir)):
            if f.endswith(".wav"):
                rows.append(f"{f}|{transcribe_fn(os.path.join(self.wavs_dir, f))}")
        meta = os.path.join(self.dir, "metadata.csv")
        with open(meta, "w", encoding="utf-8") as fh:
            fh.write("\n".join(rows))
        return meta

    def prepare_arrow(self, tokenizer: str = "char", **kw) -> str:
        from korean_f5_tts_tpu.train.datasets.prepare import prepare

        return prepare(self.dir, self.name, tokenizer, corpus_format="csv",
                       data_dir=self.root, **kw)

    # -- training process (finetune_gradio.py:326-450 role) -----------------

    def start_training(self, exp_name: str = "F5TTS_v1_Base", extra_args: str = "",
                       tokenizer: str = "char") -> int:
        if self.is_training():
            raise RuntimeError("training already running")
        cmd = (
            f"{shlex.quote(sys.executable)} -m korean_f5_tts_tpu.train.finetune_cli "
            f"--exp_name {exp_name} --dataset_name {self.name} "
            f"--tokenizer {tokenizer} {extra_args}"
        )
        self._proc = subprocess.Popen(
            shlex.split(cmd), start_new_session=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        return self._proc.pid

    def is_training(self) -> bool:
        return self._proc is not None and self._proc.poll() is None

    def stop_training(self) -> None:
        if self._proc is not None and self._proc.poll() is None:
            os.killpg(os.getpgid(self._proc.pid), signal.SIGTERM)
        self._proc = None

    # -- checkpoints --------------------------------------------------------

    def prune_checkpoint(self, step: int | str = "last") -> str:
        from korean_f5_tts_tpu.train.vocab_extend import prune_checkpoint

        src = os.path.join(self.ckpt_dir, f"model_{step}.npz")
        dst = os.path.join(self.ckpt_dir, f"model_{step}_pruned.npz")
        prune_checkpoint(src, dst)
        return dst


def system_stats() -> dict:
    """CPU/memory (+ TPU device list) snapshot (finetune_gradio:1269-1348 role)."""
    stats = {}
    try:
        with open("/proc/meminfo") as f:
            mem = dict(line.split(":")[0:1] + [line.split()[1]] for line in f
                       if line.startswith(("MemTotal", "MemAvailable")))
        stats["mem_total_gb"] = round(int(mem.get("MemTotal", 0)) / 1e6, 1)
        stats["mem_available_gb"] = round(int(mem.get("MemAvailable", 0)) / 1e6, 1)
        stats["loadavg"] = open("/proc/loadavg").read().split()[0]
    except OSError:
        pass
    try:
        import jax

        stats["devices"] = [str(d) for d in jax.devices()]
    except Exception:
        pass
    return stats


def build_app():  # pragma: no cover - requires gradio
    try:
        import gradio as gr
    except ImportError as e:
        raise ImportError(
            "gradio is not installed in this image; use FinetuneProject "
            "programmatically or f5-tts_finetune-cli"
        ) from e

    with gr.Blocks(title="F5-TTS finetune studio (TPU)") as app:
        gr.Markdown("# Finetune studio")
        project_name = gr.Textbox(label="Project name", value="my_speak")
        state = gr.State({})

        def _create(name):
            proj = FinetuneProject(name)
            proj.create()
            return {"project": name}, f"created {proj.dir}"

        status = gr.Textbox(label="Status")
        gr.Button("Create project").click(_create, project_name, [state, status])
        gr.JSON(system_stats, label="System")
    return app


def main(argv=None):  # pragma: no cover
    app = build_app()
    app.queue().launch()


if __name__ == "__main__":
    main()
