"""Data layer: Arrow dataset reader, frame-budget batching, collate.

Capability parity with reference `src/f5_tts/model/dataset.py`:
  - CustomDataset: lazy wav -> log-mel with the 0.3-30 s duration filter and
    optional precomputed mels (`:110-190`)
  - DynamicBatchSampler: sort by frame length, pack batches under a frame
    budget and max_samples cap, per-epoch seeded shuffle, drop_residual
    (`:194-265`)
  - collate: pad mels/texts to the batch max (`:325-346`) — here additionally
    padded up to shape buckets so jit sees a bounded set of shapes (XLA
    recompiles per shape; the reference's ragged batches are free on GPU but
    not under jit)
  - load_dataset dispatch (`:271-319`)

All host-side (numpy); mel extraction itself runs through ops/mel on device
or CPU backend, batched by the caller.
"""

from __future__ import annotations

import json
import os
from typing import Any, Sequence

import numpy as np

from korean_f5_tts_tpu.ops.mel import MelConfig
from korean_f5_tts_tpu.text.vocab import list_str_to_idx
from korean_f5_tts_tpu.utils import audio as audio_utils


class CustomDataset:
    """Rows of {audio_path | mel_spec, text, duration} + frame-length oracle."""

    def __init__(
        self,
        rows: Sequence[dict[str, Any]],
        durations: Sequence[float] | None = None,
        mel: MelConfig = MelConfig(),
        preprocessed_mel: bool = False,
        mel_fn=None,
    ):
        self.rows = rows
        self.durations = durations
        self.mel = mel
        self.preprocessed_mel = preprocessed_mel
        self._mel_fn = mel_fn  # wav [1, n] -> [1, d, t]; default ops.mel

    def get_frame_len(self, index: int) -> float:
        if self.durations is not None:
            dur = self.durations[index]
        else:
            dur = self.rows[index]["duration"]
        return dur * self.mel.target_sample_rate / self.mel.hop_length

    def __len__(self) -> int:
        return len(self.rows)

    def _compute_mel(self, wav: np.ndarray) -> np.ndarray:
        if self._mel_fn is not None:
            return np.asarray(self._mel_fn(wav[None]))[0]
        import jax.numpy as jnp

        from korean_f5_tts_tpu.ops.mel import log_mel_spectrogram

        return np.asarray(log_mel_spectrogram(jnp.asarray(wav)[None], self.mel))[0]

    def __getitem__(self, index: int) -> dict[str, Any]:
        # skip out-of-range durations (0.3-30 s), like dataset.py:160-166
        while True:
            row = self.rows[index]
            if 0.3 <= row["duration"] <= 30:
                break
            index = (index + 1) % len(self.rows)

        if self.preprocessed_mel:
            mel_spec = np.asarray(row["mel_spec"], dtype=np.float32)
        else:
            wav, sr = audio_utils.load_wav(row["audio_path"])
            wav = audio_utils.to_mono(wav)
            if sr != self.mel.target_sample_rate:
                wav = audio_utils.resample(wav, sr, self.mel.target_sample_rate)
            mel_spec = self._compute_mel(wav.astype(np.float32))
        return {"mel_spec": mel_spec, "text": row["text"]}


class DynamicBatchSampler:
    """Frame-budgeted batch packing with seeded per-epoch shuffle.

    Parity: dataset.py:194-265. Indices are sorted by frame length, packed
    greedily under `frames_threshold` (and `max_samples`), over-long items
    dropped, optional residual batch kept; iteration order reshuffles with
    seed+epoch.
    """

    def __init__(self, dataset, frames_threshold: int, max_samples: int = 0,
                 random_seed: int | None = None, drop_residual: bool = False):
        self.frames_threshold = frames_threshold
        self.max_samples = max_samples
        self.random_seed = random_seed
        self.epoch = 0

        indices = sorted(
            ((i, dataset.get_frame_len(i)) for i in range(len(dataset))),
            key=lambda e: e[1],
        )
        batches, batch, batch_frames = [], [], 0.0
        for idx, frame_len in indices:
            fits = batch_frames + frame_len <= frames_threshold
            has_room = max_samples == 0 or len(batch) < max_samples
            if fits and has_room:
                batch.append(idx)
                batch_frames += frame_len
            else:
                if batch:
                    batches.append(batch)
                if frame_len <= frames_threshold:
                    batch, batch_frames = [idx], frame_len
                else:
                    batch, batch_frames = [], 0.0
        if not drop_residual and batch:
            batches.append(batch)
        self.batches = batches

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self):
        if self.random_seed is not None:
            rng = np.random.default_rng(self.random_seed + self.epoch)
            order = rng.permutation(len(self.batches))
            return iter([self.batches[i] for i in order])
        return iter(list(self.batches))

    def __len__(self) -> int:
        return len(self.batches)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def collate_batch(
    items: list[dict[str, Any]],
    vocab_char_map: dict[str, int] | None,
    tokenize_fn=None,
    frame_bucket: int = 128,
    text_bucket: int = 32,
) -> dict[str, np.ndarray]:
    """Pad a list of {mel_spec [d, t], text} into fixed arrays.

    Returns {mel [b, n, d], mel_lengths [b], text [b, nt], text_lengths [b]}
    (dataset.py:325-346 layout, transposed to channel-last for the model).
    Sequence dims round up to buckets to bound jit recompilation; the frame
    bucket is 128 so every training shape is eligible for the flash
    attention kernels (fwd + bwd need n % 128 == 0 — at 64 the whole
    fwd+bwd fell back to XLA's materialised-[n,n] path, ~48% of the step).
    """
    mel_lengths = np.array([it["mel_spec"].shape[-1] for it in items], np.int32)
    max_mel = _round_up(int(mel_lengths.max()), frame_bucket)
    d = items[0]["mel_spec"].shape[0]
    mel = np.zeros((len(items), max_mel, d), np.float32)
    for i, it in enumerate(items):
        m = it["mel_spec"]
        mel[i, : m.shape[-1], :] = m.T

    texts = [it["text"] for it in items]
    if tokenize_fn is not None:
        token_lists = tokenize_fn(texts)
    else:
        token_lists = [list(t) for t in texts]
    text_lengths = np.array([len(t) for t in token_lists], np.int32)
    max_text = _round_up(max(int(text_lengths.max()), 1), text_bucket)
    if vocab_char_map is not None:
        text_ids = list_str_to_idx(token_lists, vocab_char_map, pad_to=max_text)
    else:
        text_ids = np.full((len(items), max_text), -1, np.int32)
        for i, toks in enumerate(token_lists):
            # utf-8-byte fallback for str tokens; pre-tokenized int ids pass
            text_ids[i, : len(toks)] = [
                t if isinstance(t, (int, np.integer)) else ord(t) % 256
                for t in toks
            ]

    return {
        "mel": mel,
        "mel_lengths": mel_lengths,
        "text": text_ids,
        "text_lengths": text_lengths,
    }


class HFDataset:
    """HuggingFace-datasets-backed rows: {audio: {array, sampling_rate}, text}.

    Parity with reference HFDataset (dataset.py:45-107): frame length derived
    from the raw audio length, 0.3-30 s duration filter with skip-forward,
    host resample, lazy wav -> log-mel.
    """

    def __init__(self, hf_dataset, mel: MelConfig = MelConfig(), mel_fn=None):
        self.data = hf_dataset
        self.mel = mel
        self._mel_fn = mel_fn

    def get_frame_len(self, index: int) -> float:
        row = self.data[index]
        audio = np.asarray(row["audio"]["array"])
        sr = row["audio"]["sampling_rate"]
        return (audio.shape[-1] / sr) * self.mel.target_sample_rate / self.mel.hop_length

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, index: int) -> dict[str, Any]:
        while True:
            row = self.data[index]
            audio = np.asarray(row["audio"]["array"], dtype=np.float32)
            sr = row["audio"]["sampling_rate"]
            duration = audio.shape[-1] / sr
            if 0.3 <= duration <= 30:
                break
            index = (index + 1) % len(self.data)
        wav = audio_utils.to_mono(audio)
        if sr != self.mel.target_sample_rate:
            wav = audio_utils.resample(wav, sr, self.mel.target_sample_rate)
        if self._mel_fn is not None:
            mel_spec = np.asarray(self._mel_fn(wav[None]))[0]
        else:
            import jax.numpy as jnp

            from korean_f5_tts_tpu.ops.mel import log_mel_spectrogram

            mel_spec = np.asarray(
                log_mel_spectrogram(jnp.asarray(wav)[None], self.mel))[0]
        return {"mel_spec": mel_spec, "text": row["text"]}


def load_dataset(
    dataset_name: str,
    tokenizer: str = "pinyin",
    dataset_type: str = "CustomDataset",
    audio_type: str = "raw",
    mel_spec_kwargs: dict | None = None,
    data_dir: str | None = None,
) -> "CustomDataset | HFDataset":
    """Dataset dispatch (dataset.py:271-319):
      - CustomDataset:     data/{name}_{tokenizer}/raw.arrow + duration.json
      - CustomDatasetPath: `dataset_name` IS the directory (no tokenizer suffix)
      - HFDataset:         "<repo>_<split>" loaded via the `datasets` library
                           (local cache/disk path accepted; zero-egress images
                           need the dataset pre-downloaded or saved_to_disk)
    """
    mel = MelConfig(**(mel_spec_kwargs or {}))

    if dataset_type == "HFDataset":
        import datasets as hfds

        if os.path.isdir(dataset_name):  # a save_to_disk directory
            ds = hfds.load_from_disk(dataset_name)
            if not hasattr(ds, "__getitem__") or isinstance(ds, hfds.DatasetDict):
                ds = ds["train"]
        else:
            pre, _, post = dataset_name.partition("_")
            ds = hfds.load_dataset(
                f"{pre}/{pre}", split=f"train.{post}" if post else "train",
                cache_dir=os.environ.get("F5_TTS_DATA_DIR", "data"),
            )
        return HFDataset(ds, mel=mel)

    data_dir = data_dir or os.environ.get("F5_TTS_DATA_DIR", "data")
    if dataset_type == "CustomDatasetPath":
        base = dataset_name
    else:
        base = os.path.join(data_dir, f"{dataset_name}_{tokenizer}")

    preprocessed = False
    if audio_type == "raw":
        arrow_path = os.path.join(base, "raw.arrow")
        rows = _read_arrow_rows(arrow_path)
    else:
        arrow_path = os.path.join(base, "mel.arrow")
        rows = _read_arrow_rows(arrow_path)
        preprocessed = True

    durations = None
    dur_path = os.path.join(base, "duration.json")
    if os.path.exists(dur_path):
        with open(dur_path, "r", encoding="utf-8") as f:
            durations = json.load(f)["duration"]
    return CustomDataset(rows, durations=durations, mel=mel,
                         preprocessed_mel=preprocessed)


def _read_arrow_rows(path: str) -> list[dict]:
    import pyarrow as pa

    if not os.path.exists(path):
        raise FileNotFoundError(path)
    try:
        with pa.memory_map(path) as source:
            table = pa.ipc.open_stream(source).read_all()
    except pa.ArrowInvalid:
        with pa.memory_map(path) as source:
            table = pa.ipc.open_file(source).read_all()
    return table.to_pylist()
