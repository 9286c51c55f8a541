"""LoRA finetuning entry point.

Parity with reference `src/f5_tts/train/train_lora.py`: adapters r=16 α=32 on
attention q/k/v/out plus rank-64/α-128 on the input projection (`:123-135`),
pretrained load with shape-mismatch skip (`:26-55`), optional text-encoder
unfreeze (`:138-142`), dataset override via --load_path (`:179-196`).

The functional twist: the base pytree is frozen; only the adapter pytree is
optimised, with `apply_lora` merging inside the jitted step.
"""

from __future__ import annotations

import argparse
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from korean_f5_tts_tpu.config import CFMConfig, PRESETS, preset_model_config
from korean_f5_tts_tpu.data.dataset import collate_batch, load_dataset
from korean_f5_tts_tpu.infer.model import _INIT_FNS, load_checkpoint_into_pytree
from korean_f5_tts_tpu.models.cfm import cfm_loss
from korean_f5_tts_tpu.models.lora import DEFAULT_TARGETS, apply_lora, init_lora, merge_lora
from korean_f5_tts_tpu.text.vocab import get_tokenizer
from korean_f5_tts_tpu.train.checkpoint import save_checkpoint
from korean_f5_tts_tpu.train.trainer import Trainer


@functools.partial(jax.jit, static_argnames=("arch", "optimizer", "train_text_embed"))
def lora_train_step(base_params, adapters, opt_state, batch, key, arch, optimizer,
                    train_text_embed: bool = False):
    def loss_fn(ad, text_embed_params):
        merged = apply_lora(base_params, ad)
        if train_text_embed:
            merged = dict(merged)
            merged["text_embed"] = text_embed_params
        loss, _, _ = cfm_loss(merged, arch, batch["mel"], batch["text"], batch["lens"],
                              key, CFMConfig())
        return loss

    trainable = (adapters, base_params["text_embed"]) if train_text_embed else (adapters,)
    if train_text_embed:
        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(*trainable)
        grads = {"adapters": grads[0], "text_embed": grads[1]}
        params_now = {"adapters": adapters, "text_embed": base_params["text_embed"]}
    else:
        loss, g = jax.value_and_grad(loss_fn)(adapters, base_params["text_embed"])
        grads = {"adapters": g}
        params_now = {"adapters": adapters}
    updates, opt_state = optimizer.update(grads, opt_state, params_now)
    new = optax.apply_updates(params_now, updates)
    new_base = base_params
    if train_text_embed:
        new_base = dict(base_params)
        new_base["text_embed"] = new["text_embed"]
    return new["adapters"], new_base, opt_state, loss


def apply_recipe_config(args, config_path: str) -> None:
    """Fill unset CLI args from a recipe YAML (configs/F5TTS_Base_ft_Lora_*):
    the reference's published hyperparameter matrix; explicit flags beat the
    file. Mutates `args` in place."""
    import yaml

    with open(config_path, encoding="utf-8") as f:
        cfg = yaml.safe_load(f)
    ds, opt, m, ck = (cfg.get(k, {}) for k in
                      ("datasets", "optim", "model", "ckpts"))
    args.dataset_name = args.dataset_name or ds.get("name")
    args.load_path = getattr(args, "load_path", None) or ds.get("load_path")
    args.pretrain = args.pretrain or ck.get("pretrained_path")
    if args.learning_rate is None:
        args.learning_rate = float(opt.get("learning_rate", 1e-4))
    if args.batch_size_per_gpu is None:
        args.batch_size_per_gpu = int(ds.get("batch_size_per_gpu", 9_600))
    if args.epochs is None:
        args.epochs = int(opt.get("epochs", 100))
    args.tokenizer = args.tokenizer or m.get("tokenizer")
    args.tokenizer_path = args.tokenizer_path or m.get("tokenizer_path")
    if m.get("name") in PRESETS:
        args.exp_name = m["name"]


def main(argv=None):
    p = argparse.ArgumentParser(prog="f5-tts_train-lora")
    p.add_argument("--config", default=None,
                   help="recipe YAML (configs/F5TTS_Base_ft_Lora_*.yaml); "
                        "explicit flags override its values")
    p.add_argument("--exp_name", default="F5TTS_Base", choices=sorted(PRESETS))
    p.add_argument("--dataset_name", default=None)
    p.add_argument("--pretrain", default=None)
    p.add_argument("--load_path", default=None,
                   help="dataset directory override (train_lora.py:179-196)")
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--batch_size_per_gpu", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--train_text_embed", action="store_true",
                   help="also unfreeze the text encoder (CoreaSpeech hybrid)")
    p.add_argument("--max_updates", type=int, default=None)
    p.add_argument("--save_every", type=int, default=5000)
    p.add_argument("--device", default=None)
    args = p.parse_args(argv)
    if args.config:
        apply_recipe_config(args, args.config)
    if not args.dataset_name or not args.pretrain:
        p.error("--dataset_name and --pretrain are required "
                "(directly or via --config)")
    args.learning_rate = 1e-4 if args.learning_rate is None else args.learning_rate
    args.batch_size_per_gpu = args.batch_size_per_gpu or 9_600
    args.epochs = args.epochs or 100
    args.tokenizer = args.tokenizer or "pinyin"
    if args.device:
        jax.config.update("jax_platforms", args.device)
    from korean_f5_tts_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    model_cfg = preset_model_config(args.exp_name)
    if args.tokenizer == "custom":
        vocab_char_map, vocab_size = get_tokenizer(args.tokenizer_path, "custom")
    else:
        vocab_char_map, vocab_size = get_tokenizer(args.dataset_name, args.tokenizer)

    import dataclasses

    arch = dataclasses.replace(model_cfg.arch, text_num_embeds=vocab_size + 1)

    # pretrained load with shape-mismatch skip (train_lora.py:26-55): keep
    # randomly-initialised leaves where the checkpoint shape differs (e.g.
    # extended vocab embedding)
    init_params = _INIT_FNS[model_cfg.backbone](jax.random.PRNGKey(666), arch)
    loaded = load_checkpoint_into_pytree(args.pretrain, arch, model_cfg.backbone)

    def take(init_leaf, path_loaded):
        return path_loaded if (
            path_loaded is not None and np.shape(path_loaded) == np.shape(init_leaf)
        ) else init_leaf

    base_params = jax.tree_util.tree_map(
        lambda a, b: jnp.asarray(take(a, b)), init_params, loaded
    )

    adapters = init_lora(jax.random.PRNGKey(0), base_params, DEFAULT_TARGETS)
    optimizer = optax.adamw(args.learning_rate)
    trainable0 = {"adapters": adapters}
    if args.train_text_embed:
        trainable0["text_embed"] = base_params["text_embed"]
    opt_state = optimizer.init(trainable0)

    dataset = load_dataset(
        args.load_path or args.dataset_name, args.tokenizer,
        dataset_type="CustomDatasetPath" if args.load_path else "CustomDataset")
    from korean_f5_tts_tpu.data.dataset import DynamicBatchSampler

    sampler = DynamicBatchSampler(dataset, args.batch_size_per_gpu, max_samples=64,
                                  random_seed=666)
    ckpt_dir = os.path.join("ckpts", f"lora_{args.exp_name}_{args.dataset_name}")
    os.makedirs(ckpt_dir, exist_ok=True)

    update = 0
    key = jax.random.PRNGKey(666)
    for epoch in range(args.epochs):
        sampler.set_epoch(epoch)
        for batch_idx in sampler:
            items = [dataset[i] for i in batch_idx]
            b = collate_batch(items, vocab_char_map)
            batch = {"mel": b["mel"], "text": b["text"], "lens": b["mel_lengths"]}
            adapters, base_params, opt_state, loss = lora_train_step(
                base_params, adapters, opt_state, batch,
                jax.random.fold_in(key, update), arch, optimizer,
                train_text_embed=args.train_text_embed,
            )
            update += 1
            if update % 10 == 0:
                print(f"update {update} loss {float(loss):.4f}")
            if update % args.save_every == 0 or (
                args.max_updates and update >= args.max_updates
            ):
                merged = merge_lora(base_params, adapters)
                save_checkpoint(os.path.join(ckpt_dir, "model_last.npz"),
                                jax.tree_util.tree_map(np.asarray, merged),
                                update=update)
            if args.max_updates and update >= args.max_updates:
                print(f"lora done at update {update}")
                return
    merged = merge_lora(base_params, adapters)
    save_checkpoint(os.path.join(ckpt_dir, "model_last.npz"),
                    jax.tree_util.tree_map(np.asarray, merged), update=update)
    print(f"lora done at update {update}")


if __name__ == "__main__":
    main()
