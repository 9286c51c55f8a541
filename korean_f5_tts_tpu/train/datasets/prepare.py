"""Dataset ETL: corpus -> raw.arrow + duration.json + vocab.txt.

Role parity with the reference's 32 `train/datasets/prepare_*.py` scripts
(SURVEY.md §2.4) — KSS grapheme/phoneme/allophone ± n2gk ± skipTC ± filter
modes (e.g. `prepare_kss_allophone.py:80-175`,
`prepare_kss_n2gk_inf.py:99-103`), CoreaSpeech "salt" variants, and the
generic `prepare_csv_wavs.py`. Re-designed as ONE parameterised pipeline: a
corpus reader (csv / kss transcript / jsonl) x a tokenizer mode (the same 13
modes as inference, `text/vocab.py`) x optional N2gk+ normalisation; the
writer emits the identical artefact triple the training data layer reads.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
from pathlib import Path

from korean_f5_tts_tpu.text.korean import KOREAN_CONVERTERS
from korean_f5_tts_tpu.text.normalization import normalize_n2gk_plus
from korean_f5_tts_tpu.text.vocab import KOREAN_TOKENIZER_NAMES
from korean_f5_tts_tpu.utils.audio import load_wav


# -- corpus readers ----------------------------------------------------------


def read_csv_corpus(root: str, metadata: str = "metadata.csv",
                    delimiter: str = "|") -> list[dict]:
    """metadata.csv rows `wav|text` with wavs under root/wavs (prepare_csv_wavs)."""
    rows = []
    path = os.path.join(root, metadata)
    with open(path, "r", encoding="utf-8-sig", newline="") as f:
        for rec in csv.reader(f, delimiter=delimiter):
            if len(rec) < 2:
                continue
            wav = rec[0] if rec[0].endswith(".wav") else rec[0] + ".wav"
            wav_path = os.path.join(root, "wavs", wav)
            if not os.path.exists(wav_path):
                wav_path = os.path.join(root, wav)
            rows.append({"audio_path": wav_path, "text": rec[1].strip()})
    return rows


def read_kss_corpus(root: str, transcript: str = "transcript.v.1.4.txt",
                    text_field: int = 2) -> list[dict]:
    """KSS transcript rows `path|orig|expanded|decomposed|en|duration`."""
    rows = []
    with open(os.path.join(root, transcript), "r", encoding="utf-8") as f:
        for line in f:
            rec = line.rstrip("\n").split("|")
            if len(rec) < 3:
                continue
            item = {"audio_path": os.path.join(root, rec[0]),
                    "text": rec[text_field].strip()}
            if len(rec) >= 6:
                try:
                    item["duration"] = float(rec[5])
                except ValueError:
                    pass
            rows.append(item)
    return rows


def read_jsonl_corpus(path: str, audio_key: str = "audio_path",
                      text_key: str = "text") -> list[dict]:
    rows = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            d = json.loads(line)
            rows.append({"audio_path": d[audio_key], "text": d[text_key],
                         **({"duration": d["duration"]} if "duration" in d else {})})
    return rows


READERS = {"csv": read_csv_corpus, "kss": read_kss_corpus, "jsonl": read_jsonl_corpus}


# -- tokenization ------------------------------------------------------------


def tokenize_rows(rows: list[dict], tokenizer: str, use_n2gk_plus: bool = False,
                  use_skip_tc: bool = False, legacy: bool = False) -> list[dict]:
    """Attach `tokens` per row; `char`/`pinyin` keep the raw text."""
    texts = [r["text"] for r in rows]
    if use_n2gk_plus:
        texts = [normalize_n2gk_plus(t) for t in texts]
    if tokenizer in KOREAN_TOKENIZER_NAMES:
        from korean_f5_tts_tpu.text.korean import (
            convert_char_to_allophone_skipTC,
            convert_char_to_grapheme_skipTC,
            convert_char_to_phoneme_skipTC,
        )

        if use_skip_tc and tokenizer == "kor_grapheme":
            token_lists = convert_char_to_grapheme_skipTC(texts, legacy=legacy)
        elif use_skip_tc and tokenizer == "kor_phoneme":
            token_lists = convert_char_to_phoneme_skipTC(texts, legacy=legacy)
        elif use_skip_tc and tokenizer == "kor_allophone":
            token_lists = convert_char_to_allophone_skipTC(texts, legacy=legacy)
        else:
            token_lists = KOREAN_CONVERTERS[tokenizer](texts)
    elif tokenizer == "char":
        token_lists = [list(t) for t in texts]
    elif tokenizer == "pinyin":
        from korean_f5_tts_tpu.text.pinyin import convert_char_to_pinyin

        token_lists = convert_char_to_pinyin(texts)
    else:
        raise ValueError(f"unknown tokenizer {tokenizer}")
    out = []
    for row, toks in zip(rows, token_lists):
        r = dict(row)
        r["tokens"] = toks
        r["text"] = "".join(toks) if tokenizer not in ("char", "pinyin") else row["text"]
        out.append(r)
    return out


def build_vocab(token_rows: list[dict]) -> list[str]:
    """Unique tokens, space forced to index 0 (get_tokenizer contract)."""
    seen = set()
    for r in token_rows:
        seen.update(r["tokens"])
    seen.discard(" ")
    seen.discard("")
    return [" "] + sorted(seen)


# -- writer ------------------------------------------------------------------


def measure_durations(rows: list[dict]) -> list[float]:
    out = []
    for r in rows:
        if "duration" in r:
            out.append(float(r["duration"]))
        else:
            wav, sr = load_wav(r["audio_path"])
            out.append(wav.shape[-1] / sr)
    return out


def write_dataset(rows: list[dict], durations: list[float], out_dir: str,
                  vocab: list[str] | None = None) -> None:
    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)
    table = pa.table({
        "audio_path": [r["audio_path"] for r in rows],
        "text": [r["text"] for r in rows],
        "duration": durations,
    })
    with pa.OSFile(os.path.join(out_dir, "raw.arrow"), "wb") as sink:
        with pa.ipc.new_stream(sink, table.schema) as writer:
            writer.write_table(table)
    with open(os.path.join(out_dir, "duration.json"), "w", encoding="utf-8") as f:
        json.dump({"duration": durations}, f)
    if vocab is not None:
        with open(os.path.join(out_dir, "vocab.txt"), "w", encoding="utf-8") as f:
            f.writelines(v + "\n" for v in vocab)


def prepare(
    corpus_root: str,
    dataset_name: str,
    tokenizer: str,
    corpus_format: str = "csv",
    use_n2gk_plus: bool = False,
    use_skip_tc: bool = False,
    legacy: bool = False,
    data_dir: str | None = None,
    pretrained_vocab: str | None = None,
    max_rows: int | None = None,
    subset_hours: float | None = None,
) -> str:
    """Full pipeline; returns the output dir data/{name}_{tokenizer}."""
    data_dir = data_dir or os.environ.get("F5_TTS_DATA_DIR", "data")
    rows = READERS[corpus_format](corpus_root)
    if max_rows:
        rows = rows[:max_rows]
    token_rows = tokenize_rows(rows, tokenizer, use_n2gk_plus=use_n2gk_plus,
                               use_skip_tc=use_skip_tc, legacy=legacy)
    durations = measure_durations(token_rows)
    if subset_hours is not None:
        token_rows, durations = subset_by_hours(token_rows, durations, subset_hours)
    if pretrained_vocab:
        # finetune flow: reuse (and verify coverage of) an existing vocab
        existing = [line.rstrip("\n") for line in
                    open(pretrained_vocab, "r", encoding="utf-8")]
        missing = sorted(
            {t for r in token_rows for t in r["tokens"]} - set(existing) - {""}
        )
        if missing:
            print(f"warning: {len(missing)} tokens missing from pretrained vocab: "
                  f"{missing[:20]}")
        vocab = existing
    else:
        vocab = build_vocab(token_rows)
    out_dir = os.path.join(data_dir, f"{dataset_name}_{tokenizer}")
    write_dataset(token_rows, durations, out_dir, vocab)
    print(f"{out_dir}: {len(token_rows)} rows, {sum(durations) / 3600:.2f} h, "
          f"vocab {len(vocab)}")
    return out_dir


def subset_by_hours(rows: list[dict], durations: list[float],
                    hours: float, seed: int = 666) -> tuple[list[dict], list[float]]:
    """Deterministic fixed-hour subset (split_kss_metadata.py role: build
    1h/3h/5h ablation splits)."""
    import numpy as np

    order = np.random.default_rng(seed).permutation(len(rows))
    out_rows, out_durs, acc = [], [], 0.0
    for i in order:
        if acc >= hours * 3600:
            break
        out_rows.append(rows[i])
        out_durs.append(durations[i])
        acc += durations[i]
    return out_rows, out_durs


def main(argv=None):
    p = argparse.ArgumentParser(prog="f5-tts_prepare-dataset")
    p.add_argument("--corpus_root", required=True)
    p.add_argument("--dataset_name", required=True)
    p.add_argument("--tokenizer", required=True,
                   help="char | pinyin | " + " | ".join(KOREAN_TOKENIZER_NAMES))
    p.add_argument("--format", default="csv", choices=sorted(READERS))
    p.add_argument("--n2gk_plus", action="store_true")
    p.add_argument("--skip_tc", action="store_true")
    p.add_argument("--legacy", action="store_true")
    p.add_argument("--pretrained_vocab", default=None)
    p.add_argument("--max_rows", type=int, default=None)
    p.add_argument("--subset_hours", type=float, default=None,
                   help="keep a deterministic N-hour subset (1h/3h/5h ablations)")
    args = p.parse_args(argv)
    prepare(args.corpus_root, args.dataset_name, args.tokenizer,
            corpus_format=args.format, use_n2gk_plus=args.n2gk_plus,
            use_skip_tc=args.skip_tc, legacy=args.legacy,
            pretrained_vocab=args.pretrained_vocab, max_rows=args.max_rows,
            subset_hours=args.subset_hours)


if __name__ == "__main__":
    main()
