"""Round-2 data-layer additions: HFDataset, corpus readers with Emilia
filter-list semantics, trainer prefetch overlap."""

import json
import os

import numpy as np
import pytest

from korean_f5_tts_tpu.train.datasets.prepare import (
    EMILIA_OUT_ZH,
    read_emilia_corpus,
    read_libritts_corpus,
    read_ljspeech_corpus,
    read_wenetspeech4tts_corpus,
    repetition_found,
)


class TestRepetitionFilter:
    def test_matches_reference_semantics(self):
        # parity: utils.py:524-532 (length-n substring count > tolerance)
        assert repetition_found("ab" * 12, length=2, tolerance=10)
        assert not repetition_found("ab" * 5, length=2, tolerance=10)
        assert repetition_found("x" * 13, length=2, tolerance=10)
        assert not repetition_found("the quick brown fox", length=4)


class TestEmiliaReader:
    @pytest.fixture()
    def emilia_root(self, tmp_path):
        zh = tmp_path / "ZH"
        zh.mkdir()
        lines = [
            {"wav": "ZH_B00000/ZH_B00000_S0001/x.mp3", "text": "你好,世界!",
             "language": "zh", "duration": 2.0},
            # filtered: bad-ID list
            {"wav": "ZH_B00041/ZH_B00041_S06226/y.mp3", "text": "嗯",
             "language": "zh", "duration": 1.0},
            # filtered: japanese char
            {"wav": "ZH_B00000/ZH_B00000_S0002/z.mp3", "text": "こ.い.",
             "language": "zh", "duration": 1.0},
            # filtered: repetition loop
            {"wav": "ZH_B00000/ZH_B00000_S0003/w.mp3", "text": "哈哈" * 20,
             "language": "zh", "duration": 1.0},
        ]
        with open(zh / "shard0.jsonl", "w", encoding="utf-8") as f:
            for d in lines:
                f.write(json.dumps(d, ensure_ascii=False) + "\n")
        return str(tmp_path)

    def test_filters_and_punctuation(self, emilia_root):
        assert "ZH_B00041_S06226" in EMILIA_OUT_ZH
        rows = read_emilia_corpus(emilia_root, langs=("ZH",))
        assert len(rows) == 1
        # ZH half-width punctuation normalized to full-width (not 。)
        assert rows[0]["text"] == "你好，世界！"
        assert rows[0]["duration"] == 2.0
        assert rows[0]["audio_path"].endswith("ZH/ZH_B00000/ZH_B00000_S0001/x.mp3")


class TestOtherReaders:
    def test_ljspeech(self, tmp_path):
        (tmp_path / "wavs").mkdir()
        (tmp_path / "metadata.csv").write_text(
            "LJ001-0001|raw one|Normalized one.\nLJ001-0002|raw2|Norm two.\n",
            encoding="utf-8")
        rows = read_ljspeech_corpus(str(tmp_path))
        assert [r["text"] for r in rows] == ["Normalized one.", "Norm two."]
        assert rows[0]["audio_path"].endswith("wavs/LJ001-0001.wav")

    def test_libritts(self, tmp_path):
        d = tmp_path / "train-clean" / "12" / "34"
        d.mkdir(parents=True)
        (d / "12_34_000001.normalized.txt").write_text("Hello there.",
                                                       encoding="utf-8")
        (d / "12_34_000001.wav").write_bytes(b"")
        (d / "orphan.normalized.txt").write_text("no wav", encoding="utf-8")
        rows = read_libritts_corpus(str(tmp_path))
        assert len(rows) == 1 and rows[0]["text"] == "Hello there."

    def test_wenetspeech4tts(self, tmp_path):
        d = tmp_path / "Premium" / "part1"
        d.mkdir(parents=True)
        (d / "manifest.txt").write_text("utt1\t你好。\nutt2.wav\t再见。\n",
                                        encoding="utf-8")
        rows = read_wenetspeech4tts_corpus(str(tmp_path))
        assert len(rows) == 2
        assert rows[0]["audio_path"].endswith("part1/utt1.wav")
        assert rows[1]["text"] == "再见。"


class TestHFDataset:
    def test_hf_rows(self):
        from korean_f5_tts_tpu.data.dataset import HFDataset
        from korean_f5_tts_tpu.ops.mel import MelConfig

        sr = 24_000
        rows = [
            {"audio": {"array": np.random.default_rng(0).standard_normal(sr),
                       "sampling_rate": sr}, "text": "one second"},
            # too short: skipped forward to the next row
            {"audio": {"array": np.zeros(100), "sampling_rate": sr},
             "text": "too short"},
        ]
        ds = HFDataset(rows, mel=MelConfig())
        assert len(ds) == 2
        assert ds.get_frame_len(0) == pytest.approx(sr / 256)
        item = ds[1]  # skips to row 0
        assert item["text"] == "one second"
        assert item["mel_spec"].shape[0] == 100  # [d, t]

    def test_load_dataset_dispatch_hf_from_disk(self, tmp_path):
        datasets = pytest.importorskip("datasets")
        from korean_f5_tts_tpu.data.dataset import HFDataset, load_dataset

        sr = 24_000
        ds = datasets.Dataset.from_dict({
            "audio": [{"array": np.zeros(sr).tolist(), "sampling_rate": sr}],
            "text": ["hi"],
        })
        path = str(tmp_path / "hfds")
        ds.save_to_disk(path)
        out = load_dataset(path, dataset_type="HFDataset")
        assert isinstance(out, HFDataset)
        assert len(out) == 1

    def test_load_dataset_custom_path(self, tmp_path):
        import pyarrow as pa

        from korean_f5_tts_tpu.data.dataset import CustomDataset, load_dataset

        base = tmp_path / "mycorpus"
        base.mkdir()
        table = pa.table({"audio_path": ["a.wav"], "text": ["x"],
                          "duration": [1.0]})
        with pa.OSFile(str(base / "raw.arrow"), "wb") as sink:
            with pa.ipc.new_stream(sink, table.schema) as w:
                w.write_table(table)
        (base / "duration.json").write_text(json.dumps({"duration": [1.0]}))
        out = load_dataset(str(base), dataset_type="CustomDatasetPath")
        assert isinstance(out, CustomDataset) and len(out) == 1


class TestPrefetcher:
    def test_yields_all_and_propagates_errors(self):
        from korean_f5_tts_tpu.train.trainer import _Prefetcher

        assert list(_Prefetcher(iter(range(7)), depth=2)) == list(range(7))

        def boom():
            yield 1
            raise ValueError("io fail")

        it = _Prefetcher(boom(), depth=2)
        assert next(it) == 1
        with pytest.raises(ValueError):
            next(it)

    def test_trainer_prefetch_matches_sync(self, tmp_path):
        """num_workers>0 must not change the training trajectory."""
        import jax

        from korean_f5_tts_tpu.config import DiTConfig
        from korean_f5_tts_tpu.models.dit import init_dit
        from korean_f5_tts_tpu.train.trainer import Trainer

        cfg = DiTConfig(dim=16, depth=1, heads=2, dim_head=8, ff_mult=2,
                        mel_dim=6, text_num_embeds=12, text_dim=8,
                        conv_layers=0, dropout=0.0)

        class DS:
            def __init__(self):
                rng = np.random.default_rng(0)
                self.items = [
                    {"mel_spec": rng.standard_normal((6, 20)).astype(np.float32),
                     "text": [1, 2, 3]} for _ in range(6)
                ]

            def __len__(self):
                return len(self.items)

            def get_frame_len(self, i):
                return 20

            def __getitem__(self, i):
                return self.items[i]

        def run(workers, path):
            params = init_dit(jax.random.PRNGKey(0), cfg)
            t = Trainer(params, cfg, epochs=1, batch_size_per_gpu=40,
                        batch_size_type="frame", checkpoint_path=path,
                        logger=None, tokenize_fn=lambda t: t)
            return t.train(DS(), num_workers=workers, resumable_with_seed=1,
                           max_updates=3)["losses"]

        a = run(0, str(tmp_path / "a"))
        b = run(2, str(tmp_path / "b"))
        assert a == b and len(a) == 3
