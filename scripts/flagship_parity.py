"""Flagship-architecture parity artifact (answers round-2 VERDICT items 1-2).

Measures, at the PRODUCTION architecture (F5TTS_Base: dim 1024 / depth 22 /
heads 16 / ff_mult 2 / text_dim 512 / text_mask_padding False / conv_layers 4 /
pe_attn_head 1 — /root/reference/src/f5_tts/configs/F5TTS_Base.yaml:25-36):

  --mode fp32          CPU: the ACTUAL torch reference CFM.sample (stubs as in
                       tests/test_reference_oracle.py) vs this framework's
                       cfm_sample, fp32, reduced NFE / short duration.
  --mode tpu           real TPU: bf16 / int8 / int8-ff-only sampler deviation
                       vs the fp32 sampler, SAME flagship weights (identical
                       torch-generated state dict via the converter), headline
                       shapes (n=1536, 16 NFE).
  --mode trained_int8  CPU: overfit-train a small model to realistic weight
                       scales (the tests/test_learning.py recipe), then int8 vs
                       fp32 sample MAE on trained weights.

Every mode merges its result into PARITY_FLAGSHIP.json at the repo root.
The chain torch==fp32 (cpu) -> fp32 vs {bf16,int8} (tpu) bounds every fast
mode's deviation from the torch oracle.
"""

import argparse
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "PARITY_FLAGSHIP.json")

FLAGSHIP = dict(dim=1024, depth=22, heads=16, dim_head=64, ff_mult=2,
                mel_dim=100, text_num_embeds=256, text_dim=512,
                text_mask_padding=False, conv_layers=4, pe_attn_head=1)


def _merge(entry: dict):
    data = {}
    if os.path.exists(OUT):
        data = json.load(open(OUT))
    data.update(entry)
    with open(OUT, "w") as f:
        json.dump(data, f, indent=2, sort_keys=True)
    print(json.dumps(entry))


def _flagship_torch(seed=0):
    """Reference DiT with default torch init + seeded randomisation of the
    AdaLN-zero (and proj_out) layers so blocks aren't gated off. Deterministic:
    the tpu mode regenerates the identical state dict."""
    import torch

    sys.path.insert(0, os.path.join(ROOT, "tests"))
    from test_reference_oracle import _install_stubs

    _install_stubs()
    from f5_tts.model.backbones.dit import DiT as RefDiT

    torch.manual_seed(seed)
    ref = RefDiT(**FLAGSHIP)
    g = torch.Generator().manual_seed(seed + 1)
    sd = ref.state_dict()
    for k, v in sd.items():
        if v.numel() and float(v.abs().max()) == 0.0:
            sd[k] = 0.05 * torch.randn(v.shape, generator=g)
    ref.load_state_dict(sd)
    ref.eval()
    return ref


def _flagship_jax_params(ref):
    from korean_f5_tts_tpu.utils.torch_ckpt import convert_dit_state_dict

    return convert_dit_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()},
        FLAGSHIP["heads"], FLAGSHIP["dim_head"], FLAGSHIP["depth"],
        FLAGSHIP["conv_layers"],
    )


def _our_cfg():
    from korean_f5_tts_tpu.config import DiTConfig

    return DiTConfig(dim=1024, depth=22, heads=16, dim_head=64, ff_mult=2,
                     mel_dim=100, text_num_embeds=256, text_dim=512,
                     text_mask_padding=False, conv_layers=4, pe_attn_head=1)


def mode_fp32():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    from korean_f5_tts_tpu.models.cfm import cfm_sample

    ref = _flagship_torch()
    params = _flagship_jax_params(ref)
    cfg = _our_cfg()

    from torch import nn

    from f5_tts.model.cfm import CFM as RefCFM

    class DummyMel(nn.Module):
        n_mel_channels = 100

    ref_cfm = RefCFM(transformer=ref, mel_spec_module=DummyMel(), num_channels=100)

    rng = np.random.default_rng(3)
    duration, cond_len, steps, seed = 64, 24, 4, 11
    cond = rng.standard_normal((1, cond_len, 100)).astype(np.float32)
    text = np.array([[3, 1, 4, 1, 5, 9, 2, 6]], dtype=np.int32)
    ref.clear_cache()
    with torch.no_grad():
        want, _ = ref_cfm.sample(
            cond=torch.from_numpy(cond), text=torch.from_numpy(text.astype(np.int64)),
            duration=duration, steps=steps, cfg_strength=2.0,
            sway_sampling_coef=-1.0, seed=seed, use_epss=True,
        )
    want = want.numpy()
    torch.manual_seed(seed)
    y0 = torch.randn(duration, 100).numpy()[None]
    got, _ = cfm_sample(params, cfg, cond, text, duration, steps=steps,
                        cfg_strength=2.0, sway_sampling_coef=-1.0,
                        use_epss=True, y0=y0, duration_bucket=1)
    got = np.asarray(got)
    mae = float(np.mean(np.abs(got - want)))
    mx = float(np.max(np.abs(got - want)))
    _merge({"flagship_fp32_cpu_vs_torch": {
        "mel_mae": mae, "mel_max": mx, "nfe": steps, "duration": duration,
        "arch": "F5TTS_Base dim1024/depth22/conv4/pe_attn_head1",
        "north_star": 1e-2, "pass": mae < 1e-2}})


def mode_tpu():
    # real TPU; fp32 reference sampler vs bf16 / int8 / int8-ff variants,
    # identical weights + noise. (Run with nothing CPU-heavy in parallel.)
    import jax
    import jax.numpy as jnp

    from korean_f5_tts_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    import torch

    from korean_f5_tts_tpu.models.cfm import cfm_sample
    from korean_f5_tts_tpu.models.quant import quantize_params

    ref = _flagship_torch()
    params32 = _flagship_jax_params(ref)
    del ref
    cfg = _our_cfg()

    n, cond_len, steps, seed = 1536, 432, 16, 11
    rng = np.random.default_rng(3)
    cond = rng.standard_normal((1, cond_len, 100)).astype(np.float32)
    text = np.array([np.arange(2, 2 + 180) % 250], dtype=np.int32)
    torch.manual_seed(seed)
    y0 = torch.randn(n, 100).numpy()[None]

    def run(params, tag):
        got, _ = cfm_sample(params, cfg, cond, text, n, steps=steps,
                            cfg_strength=2.0, sway_sampling_coef=-1.0,
                            use_epss=True, y0=y0, duration_bucket=512)
        got = np.asarray(jax.device_get(got)).astype(np.float32)
        print(f"{tag} done", flush=True)
        return got

    base = run(params32, "fp32")
    scale = float(np.mean(np.abs(base))) or 1.0

    params_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == np.float32 else x,
        jax.tree_util.tree_map(jnp.asarray, params32))
    out = {}
    bf16 = run(params_bf16, "bf16")
    out["bf16_vs_fp32"] = {"mel_mae": float(np.mean(np.abs(bf16 - base))),
                           "rel": float(np.mean(np.abs(bf16 - base))) / scale}
    q = quantize_params(params_bf16)
    int8 = run(q, "int8")
    out["int8_vs_fp32"] = {"mel_mae": float(np.mean(np.abs(int8 - base))),
                           "rel": float(np.mean(np.abs(int8 - base))) / scale}
    out["int8_vs_bf16"] = {"mel_mae": float(np.mean(np.abs(int8 - bf16))),
                           "rel": float(np.mean(np.abs(int8 - bf16))) / scale}
    _merge({"flagship_tpu_fast_modes": {
        "n": n, "nfe": steps, "cond_len": cond_len,
        "mean_abs_mel_fp32": scale, **out}})


def mode_tpu_int8attn():
    # real TPU; int8 weights + int8 QK/PV attention dots (F5_TTS_INT8_ATTN=1)
    # vs the fp32 reference sampler. Separate process from mode_tpu because
    # the env gate is read at trace time; the fp32 base trace replays from the
    # persistent compile cache.
    import jax
    import jax.numpy as jnp

    from korean_f5_tts_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    import torch

    from korean_f5_tts_tpu.models.cfm import cfm_sample
    from korean_f5_tts_tpu.models.quant import quantize_params

    ref = _flagship_torch()
    params32 = _flagship_jax_params(ref)
    del ref
    cfg = _our_cfg()

    n, cond_len, steps, seed = 1536, 432, 16, 11
    rng = np.random.default_rng(3)
    cond = rng.standard_normal((1, cond_len, 100)).astype(np.float32)
    text = np.array([np.arange(2, 2 + 180) % 250], dtype=np.int32)
    torch.manual_seed(seed)
    y0 = torch.randn(n, 100).numpy()[None]

    def run(params, tag):
        got, _ = cfm_sample(params, cfg, cond, text, n, steps=steps,
                            cfg_strength=2.0, sway_sampling_coef=-1.0,
                            use_epss=True, y0=y0, duration_bucket=512)
        got = np.asarray(jax.device_get(got)).astype(np.float32)
        print(f"{tag} done", flush=True)
        return got

    os.environ["F5_TTS_INT8_ATTN"] = "0"
    base = run(params32, "fp32")
    scale = float(np.mean(np.abs(base))) or 1.0
    params_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == np.float32 else x,
        jax.tree_util.tree_map(jnp.asarray, params32))
    q = quantize_params(params_bf16)
    os.environ["F5_TTS_INT8_ATTN"] = "1"
    got = run(q, "int8+attn")
    _merge({"flagship_tpu_int8_attn": {
        "n": n, "nfe": steps, "cond_len": cond_len,
        "mel_mae": float(np.mean(np.abs(got - base))),
        "rel": float(np.mean(np.abs(got - base))) / scale,
        "note": "int8 weights AND int8 QK/PV attention dots vs fp32 sampler"}})


def mode_trained_flagship(steps_trained: int = 1000):
    """Real TPU: train the FLAGSHIP arch (dim 1024 / depth 22) on synthetic
    structured data until the AdaLN-zero gates open and weights reach trained
    magnitudes, then measure bf16/int8 sampler deviation vs fp32 on the SAME
    trained weights at headline shapes (n=1536, 16 NFE).

    Answers the round-3 VERDICT gap: the 1e-2 north star was formally met only
    on a dim-64 overfit toy; random-init flagship weights (AdaLN gates near
    zero, activations untrained) over-state fast-mode deviation. Weight-SCALE
    realism is what matters here, not audio quality (real ckpts don't ship in
    the image: /root/reference/ckpts/ is a README)."""
    import jax
    import jax.numpy as jnp

    from korean_f5_tts_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    from korean_f5_tts_tpu.config import CFMConfig
    from korean_f5_tts_tpu.models.cfm import cfm_sample
    from korean_f5_tts_tpu.models.quant import quantize_params
    from korean_f5_tts_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from korean_f5_tts_tpu.train.step import (
        init_train_state,
        make_optimizer,
        train_step,
    )

    cfg = _our_cfg()
    ckpt_path = os.path.join(ROOT, "ckpts", "flagship_parity_trained.npz")

    # synthetic-but-structured corpus: per-sample mixtures of slow sinusoids
    # scaled to the SAME mel magnitude the established parity protocol runs at
    # (mode_tpu's mean|mel| ~1.3) so the absolute-MAE north star is comparable
    rng = np.random.default_rng(7)
    b, n_frames, n_pad = 8, 1200, 1280
    t = np.arange(n_frames, dtype=np.float32)[None, :, None] / 100.0
    freqs = rng.uniform(0.2, 3.0, (b, 1, 100)).astype(np.float32)
    phase = rng.uniform(0, 2 * np.pi, (b, 1, 100)).astype(np.float32)
    amp = rng.uniform(0.5, 2.0, (b, 1, 100)).astype(np.float32)
    mel_np = (amp * np.sin(freqs * t + phase)
              + 0.7 * amp * np.sin(2.3 * freqs * t + 1.7 * phase)).astype(np.float32)
    mel = np.zeros((b, n_pad, 100), np.float32)
    mel[:, :n_frames] = mel_np
    text_np = rng.integers(2, 250, (b, 128)).astype(np.int32)

    l0 = l_end = None
    if os.path.exists(ckpt_path):
        params = load_checkpoint(ckpt_path)["params"]
        print(f"loaded trained flagship params from {ckpt_path}", flush=True)
    else:
        params = None

    if params is None:
        import dataclasses

        from korean_f5_tts_tpu.models.dit import init_dit

        train_cfg = dataclasses.replace(_our_cfg(), checkpoint_activations=True,
                                        remat_policy="dots")
        params = init_dit(jax.random.PRNGKey(0), train_cfg)
        opt = make_optimizer(learning_rate=1e-4, warmup_updates=50,
                             total_updates=max(steps_trained, 200) * 4)
        state = init_train_state(params, opt, use_ema=False)
        batch = {"mel": jnp.asarray(mel), "text": jnp.asarray(text_np),
                 "lens": jnp.asarray(np.full((b,), n_frames, np.int32))}
        cfm = CFMConfig()

        def step(state, i):
            return train_step(state, batch, jax.random.PRNGKey(i), train_cfg,
                              opt, cfm, compute_dtype=jnp.bfloat16)

        import time
        tstart = time.perf_counter()
        for i in range(steps_trained):
            state, loss = step(state, i)
            if i == 0:
                l0 = float(loss)  # fences the compile
                print(f"step 0 loss {l0:.4f} "
                      f"({time.perf_counter() - tstart:.0f}s incl. compile)",
                      flush=True)
            elif i % 100 == 0 or i == steps_trained - 1:
                l_end = float(loss)
                print(f"step {i} loss {l_end:.4f}", flush=True)
        params = jax.tree_util.tree_map(
            lambda x: np.asarray(jax.device_get(x)), state.params)
        del state
        os.makedirs(os.path.dirname(ckpt_path), exist_ok=True)
        save_checkpoint(ckpt_path, params, update=steps_trained)
        print(f"saved {ckpt_path}", flush=True)

    # evidence the AdaLN-zero gates actually opened: the per-block AdaLN
    # modulation projection is zero-init (dit.py init); trained weights must
    # have moved away from zero for any block output to be un-gated
    gate_scale = float(np.mean(
        [np.abs(np.asarray(bl["attn_norm"]["linear"]["w"])).mean()
         for bl in params["blocks"]]))

    # headline-shape sampling, identical protocol to mode_tpu; cond drawn
    # from the TRAINING distribution so activations are in-distribution
    n, cond_len, steps, seed = 1536, 432, 16, 11
    cond = mel_np[0:1, :cond_len, :]
    text = np.array([np.arange(2, 2 + 180) % 250], dtype=np.int32)
    import torch

    torch.manual_seed(seed)
    y0 = torch.randn(n, 100).numpy()[None]

    def run(pp, tag):
        got, _ = cfm_sample(pp, cfg, cond, text, n, steps=steps,
                            cfg_strength=2.0, sway_sampling_coef=-1.0,
                            use_epss=True, y0=y0, duration_bucket=512)
        got = np.asarray(jax.device_get(got)).astype(np.float32)
        print(f"{tag} done", flush=True)
        return got

    params32 = jax.tree_util.tree_map(jnp.asarray, params)
    base = run(params32, "fp32")
    scale = float(np.mean(np.abs(base))) or 1.0
    params_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params32)
    bf16 = run(params_bf16, "bf16")
    int8 = run(quantize_params(params_bf16), "int8")
    entry = {
        "arch": "F5TTS_Base dim1024/depth22/conv4/pe_attn_head1",
        "n": n, "nfe": steps, "cond_len": cond_len,
        "steps_trained": steps_trained,
        "mean_abs_mel_fp32": scale,
        "adaln_attn_mod_w_mean_abs": gate_scale,
        "bf16": {"mel_mae": float(np.mean(np.abs(bf16 - base))),
                 "rel": float(np.mean(np.abs(bf16 - base))) / scale},
        "int8": {"mel_mae": float(np.mean(np.abs(int8 - base))),
                 "rel": float(np.mean(np.abs(int8 - base))) / scale},
        "north_star": 1e-2,
        "note": "flagship dims, weights TRAINED on-TPU to open AdaLN gates; "
                "replaces the dim-64 overfit toy as the trained-scale "
                "fast-mode evidence",
    }
    if l0 is not None:
        entry["loss_first"], entry["loss_last"] = l0, l_end
    _merge({"flagship_trained_fast_modes_vs_fp32": entry})

    # the EXACT shipping headline stack (bench.py F5_TTS_BENCH_INT8=2
    # defaults): int8 weights + whatever softmax/kernel defaults are live in
    # THIS build — recorded separately so the headline's correctness chain
    # has one committed number measured under the configuration bench.py
    # actually runs (round-4 VERDICT item 1)
    staticmax = os.environ.get("F5_TTS_FLASH_STATICMAX", "1") != "0"
    # the kernel's own resolution, so the recorded stack matches what ran
    # (the folded head count 2*heads divides nh=8 for the flagship, so the
    # H % nh fallback does not engage at these shapes)
    from korean_f5_tts_tpu.ops.flash_prefix import resolve_flash_heads
    heads_per = resolve_flash_heads(n) if staticmax else 1
    int8_entry = entry["int8"]
    _merge({"flagship_trained_headline_mode": {
        "arch": entry["arch"], "n": n, "nfe": steps, "cond_len": cond_len,
        "stack": {"weights": "int8 (quantize_params, all block linears)",
                  "softmax": "static-max single-pass" if staticmax
                             else "online-max",
                  "heads_per_instance": heads_per},
        "mean_abs_mel_fp32": scale,
        "mel_mae_vs_fp32": int8_entry["mel_mae"],
        "rel": int8_entry["rel"],
        "north_star": 1e-2,
        "pass": int8_entry["mel_mae"] < 1e-2,
    }})


def mode_trained_int8():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from korean_f5_tts_tpu.config import CFMConfig, DiTConfig
    from korean_f5_tts_tpu.models.cfm import cfm_sample
    from korean_f5_tts_tpu.models.dit import init_dit
    from korean_f5_tts_tpu.models.quant import quantize_params
    from korean_f5_tts_tpu.train.step import init_train_state, make_optimizer, train_step

    # the tests/test_learning.py overfit recipe: weights end up at genuinely
    # trained scales/distributions (incl. nonzero AdaLN gates)
    cfg = DiTConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=8,
                    text_num_embeds=12, text_dim=32, conv_layers=1, dropout=0.0)
    t = np.linspace(0, 4 * np.pi, 64)
    target = np.stack([np.sin(t + k) for k in range(8)], axis=-1).astype(np.float32)
    mel = jnp.asarray(target[None])
    text = jnp.asarray(np.arange(1, 9, dtype=np.int32)[None])
    params = init_dit(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(learning_rate=2e-3, warmup_updates=20, total_updates=2000)
    state = init_train_state(params, opt, use_ema=False)
    cfm = CFMConfig(audio_drop_prob=0.0, cond_drop_prob=0.0)
    batch = {"mel": jnp.tile(mel, (8, 1, 1)), "text": jnp.tile(text, (8, 1)),
             "lens": jnp.full((8,), 64)}
    l0 = l_end = None
    for i in range(400):
        state, loss = train_step(state, batch, jax.random.PRNGKey(i), cfg, opt, cfm)
        l0 = l0 if l0 is not None else float(loss)
        l_end = float(loss)
    params = state.params

    rng = np.random.default_rng(0)
    y0 = rng.standard_normal((1, 64, 8)).astype(np.float32)

    def sample_with(pp):
        out, _ = cfm_sample(pp, cfg, mel[:, :32, :], text, 64,
                            lens=np.array([32]), steps=8, cfg_strength=2.0,
                            sway_sampling_coef=-1.0, y0=y0, duration_bucket=1)
        return np.asarray(out, np.float32)

    base = sample_with(params)
    scale = float(np.mean(np.abs(base))) or 1.0
    bf16 = sample_with(jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params))
    got = sample_with(quantize_params(params))
    mae = float(np.mean(np.abs(got - base)))
    mae_bf16 = float(np.mean(np.abs(bf16 - base)))
    _merge({"trained_weights_fast_modes_vs_fp32": {
        "int8": {"mel_mae": mae, "rel": mae / scale},
        "bf16": {"mel_mae": mae_bf16, "rel": mae_bf16 / scale},
        "loss_first": l0, "loss_last": l_end, "steps_trained": 400,
        "north_star": 1e-2,
        "note": "weights trained to overfit (loss must drop); deviations on "
                "trained, not random, weight scales"}})


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", required=True,
                    choices=["fp32", "tpu", "trained_int8", "tpu_int8attn",
                             "trained_flagship"])
    ap.add_argument("--steps_trained", type=int, default=1000)
    a = ap.parse_args()
    if a.mode == "trained_flagship":
        mode_trained_flagship(a.steps_trained)
    else:
        {"fp32": mode_fp32, "tpu": mode_tpu,
         "trained_int8": mode_trained_int8,
         "tpu_int8attn": mode_tpu_int8attn}[a.mode]()
