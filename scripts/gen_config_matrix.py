"""Generate the full training-config matrix from the reference's configs.

The reference ships 63 Hydra YAMLs (/root/reference/src/f5_tts/configs/):
11 KSS tokenizer-mode LoRA recipes, 1h/3h/5h data-scale ablations,
CoreaSpeech salt hybrids, A100 vs RTX3090 batch budgets. This framework's
`f5-tts_train` reads the same schema minus Hydra (train/train.py docstring),
so each counterpart carries the reference's hyperparameters (they ARE the
recipe spec) with the Hydra-specific blocks translated:

  - `hydra:` run-dir interpolation  -> dropped (train.py derives save_dir)
  - `${...}` interpolated save_dir  -> dropped (same reason)
  - torch-only flags (bnb_optimizer, attn_backend) -> carried but ignored
    by the schema filter (config.py:_filter_kwargs), documented per file
  - `ckpts.pretrained_path: *.pt`   -> kept verbatim: train.py loads torch
    checkpoints through utils/torch_ckpt when the file exists

Run: python scripts/gen_config_matrix.py  (idempotent; writes configs/)
"""

from __future__ import annotations

import os

import yaml

REF = "/root/reference/src/f5_tts/configs"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "configs")

# configs this repo already maintains by hand (richer comments) — skip
HANDWRITTEN = {
    "E2TTS_Base.yaml", "F5TTS_v1_Base.yaml",
    "F5TTS_Base_train_KSS_Allophone.yaml",
    "F5TTS_Base_train_KSS_Grapheme.yaml",
    "F5TTS_Base_train_KSS_Phoneme.yaml",
}


def translate(name: str, cfg: dict) -> dict:
    out = {}
    for section in ("datasets", "optim", "model", "ckpts"):
        if section in cfg:
            out[section] = cfg[section]
    ck = out.get("ckpts", {})
    # drop Hydra interpolations; train.py derives the save dir
    if isinstance(ck.get("save_dir"), str) and "${" in ck["save_dir"]:
        ck.pop("save_dir")
    opt = out.get("optim", {})
    opt.pop("bnb_optimizer", None)  # bitsandbytes is torch-only
    m = out.get("model", {})
    m.pop("vocoder", None)  # vocoder locality is an inference concern here
    return out


def header(name: str) -> str:
    lora = "_ft_Lora" in name
    lines = [
        f"# Counterpart of reference configs/{name}",
        "# (hyperparameters are the published recipe; Hydra blocks translated",
        "#  per scripts/gen_config_matrix.py).",
    ]
    if lora:
        lines.append(
            "# LoRA recipe: run with f5-tts_train-lora --config <this file>"
            " (r=16 alpha=32\n#  + input-proj 64/128, train/train_lora.py);"
            " f5-tts_train uses it as a full-FT recipe.")
    return "\n".join(lines) + "\n"


def main() -> int:
    os.makedirs(OUT, exist_ok=True)
    made = []
    for fname in sorted(os.listdir(REF)):
        if not fname.endswith(".yaml") or fname in HANDWRITTEN:
            continue
        with open(os.path.join(REF, fname), encoding="utf-8") as f:
            cfg = yaml.safe_load(f)
        out = translate(fname, cfg)
        with open(os.path.join(OUT, fname), "w", encoding="utf-8") as f:
            f.write(header(fname))
            yaml.safe_dump(out, f, sort_keys=False, allow_unicode=True,
                           default_flow_style=False)
        made.append(fname)
    print(f"wrote {len(made)} configs to {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
