"""f5-tts_train: pretraining entry point (reference `train/train.py`).

Reads the same YAML schema as the reference's Hydra configs
(configs/*.yaml: model/arch, model/mel_spec, datasets, optim, ckpts) without
a Hydra dependency; dotted overrides may be passed as extra args
(`datasets.batch_size_per_gpu=4800`).
"""

from __future__ import annotations

import argparse
import os

import jax
import yaml

from korean_f5_tts_tpu.config import model_config_from_dict
from korean_f5_tts_tpu.data.dataset import load_dataset
from korean_f5_tts_tpu.infer.model import _INIT_FNS
from korean_f5_tts_tpu.parallel.mesh import make_mesh, shard_params
from korean_f5_tts_tpu.text.vocab import get_tokenizer
from korean_f5_tts_tpu.train.trainer import Trainer


def apply_overrides(cfg: dict, overrides: list[str]) -> dict:
    for ov in overrides:
        ov = ov.lstrip("+")
        key, _, val = ov.partition("=")
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        try:
            node[parts[-1]] = yaml.safe_load(val)
        except yaml.YAMLError:
            node[parts[-1]] = val
    return cfg


def main(argv=None):
    parser = argparse.ArgumentParser(prog="f5-tts_train")
    parser.add_argument("--config", "-c", required=True, help="training yaml")
    parser.add_argument("--max_updates", type=int, default=None)
    parser.add_argument("--n_model_shards", type=int, default=1,
                        help="tensor-parallel degree over the device mesh")
    parser.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = parser.parse_args(argv)
    from korean_f5_tts_tpu.parallel.distributed import maybe_initialize_distributed

    # multi-host: must run before any backend touch (the Accelerate-DDP
    # equivalent, reference trainer.py:59-70; env-triggered, see distributed.py)
    maybe_initialize_distributed()
    from korean_f5_tts_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()


    with open(args.config, "r", encoding="utf-8") as f:
        cfg = yaml.safe_load(f)
    cfg = apply_overrides(cfg, args.overrides)

    model_cfg = model_config_from_dict(cfg)
    ds_cfg = cfg.get("datasets", {})
    optim = cfg.get("optim", {})
    ckpts = cfg.get("ckpts", {})

    tokenizer = cfg.get("model", {}).get("tokenizer", "pinyin")
    dataset_name = ds_cfg.get("name", "Emilia_ZH_EN")
    if tokenizer == "custom":
        vocab_path = cfg["model"]["tokenizer_path"]
        vocab_char_map, vocab_size = get_tokenizer(vocab_path, "custom")
    else:
        vocab_char_map, vocab_size = get_tokenizer(dataset_name, tokenizer)

    import dataclasses

    arch = dataclasses.replace(model_cfg.arch, text_num_embeds=vocab_size + 1)

    mesh = make_mesh(n_model=args.n_model_shards) if len(jax.devices()) > 1 else None
    params = _INIT_FNS[model_cfg.backbone](jax.random.PRNGKey(666), arch)
    # finetune configs start from a pretrained checkpoint (reference
    # F5TTS_Base_ft_*.yaml ckpts.pretrained_path; trainer.py:197-220 load
    # precedence) — .npz native or torch .pt/.safetensors via the converter
    pretrained = ckpts.get("pretrained_path")
    if pretrained:
        if os.path.exists(pretrained):
            from korean_f5_tts_tpu.infer.model import load_checkpoint_into_pytree

            params = load_checkpoint_into_pytree(pretrained, arch,
                                                 model_cfg.backbone)
            print(f"loaded pretrained params from {pretrained}")
        else:
            print(f"WARNING: ckpts.pretrained_path {pretrained} not found; "
                  "training from scratch")
    if mesh is not None:
        params = shard_params(params, mesh)

    # datasets.load_path points at the dataset DIRECTORY itself (reference
    # train_lora.py:179-196 override semantics)
    load_path = ds_cfg.get("load_path")
    dataset = load_dataset(
        load_path or dataset_name, tokenizer,
        dataset_type="CustomDatasetPath" if load_path else "CustomDataset",
        mel_spec_kwargs=dict(
            n_fft=model_cfg.mel.n_fft,
            hop_length=model_cfg.mel.hop_length,
            win_length=model_cfg.mel.win_length,
            n_mel_channels=model_cfg.mel.n_mel_channels,
            target_sample_rate=model_cfg.mel.target_sample_rate,
            mel_spec_type=model_cfg.mel.mel_spec_type,
        ),
    )

    save_dir = ckpts.get(
        "save_dir",
        f"ckpts/{model_cfg.name}_{model_cfg.mel.mel_spec_type}_{tokenizer}_{dataset_name}",
    )
    trainer = Trainer(
        params, arch,
        epochs=optim.get("epochs", 1),
        learning_rate=optim.get("learning_rate", 7.5e-5),
        num_warmup_updates=optim.get("num_warmup_updates", 20_000),
        save_per_updates=ckpts.get("save_per_updates", 50_000),
        keep_last_n_checkpoints=ckpts.get("keep_last_n_checkpoints", -1),
        checkpoint_path=save_dir,
        batch_size_per_gpu=ds_cfg.get("batch_size_per_gpu", 38_400),
        batch_size_type=ds_cfg.get("batch_size_type", "frame"),
        max_samples=ds_cfg.get("max_samples", 64),
        grad_accumulation_steps=optim.get("grad_accumulation_steps", 1),
        max_grad_norm=optim.get("max_grad_norm", 1.0),
        last_per_updates=ckpts.get("last_per_updates", 5_000),
        logger=ckpts.get("logger", "tensorboard"),
        mesh=mesh,
        vocab_char_map=vocab_char_map,
    )
    os.makedirs(save_dir, exist_ok=True)
    result = trainer.train(
        dataset,
        num_workers=ds_cfg.get("num_workers", 0),
        resumable_with_seed=666,
        max_updates=args.max_updates,
    )
    print(f"done at update {result['updates']}")


if __name__ == "__main__":
    main()
