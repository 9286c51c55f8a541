"""Static-max flash softmax quality gate: mel deviation on TRAINED weights.

Compares the bf16 sampler with F5_TTS_FLASH_STATICMAX=1 against the default
online-max kernel on the trained flagship checkpoint
(ckpts/flagship_parity_trained.npz — produced by
`flagship_parity.py --mode trained_flagship`), at headline shapes
(n=1536, 16 NFE). The env gate is read at kernel trace time, so each arm
runs in its own subprocess.

Expected: ~0 deviation (the two softmaxes are the same math at different
f32 rounding) as long as trained logits respect the +-~88 raw-logit
contract. Merges the result into PARITY_FLAGSHIP.json.
"""

import json
import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys
import numpy as np
import jax, jax.numpy as jnp
from korean_f5_tts_tpu.utils.jax_cache import enable_compilation_cache
enable_compilation_cache()
import torch
from korean_f5_tts_tpu.models.cfm import cfm_sample
from korean_f5_tts_tpu.train.checkpoint import load_checkpoint

sys.path.insert(0, os.path.join(%(root)r, "scripts"))
from flagship_parity import _our_cfg

params = load_checkpoint(os.path.join(%(root)r, "ckpts",
                                      "flagship_parity_trained.npz"))["params"]
params = jax.tree_util.tree_map(
    lambda x: jnp.asarray(x).astype(jnp.bfloat16)
    if np.asarray(x).dtype == np.float32 else jnp.asarray(x), params)
cfg = _our_cfg()
n, cond_len, steps, seed = 1536, 432, 16, 11
rng = np.random.default_rng(7)
t = np.arange(1200, dtype=np.float32)[None, :, None] / 100.0
freqs = rng.uniform(0.2, 3.0, (8, 1, 100)).astype(np.float32)
phase = rng.uniform(0, 2 * np.pi, (8, 1, 100)).astype(np.float32)
amp = rng.uniform(0.5, 2.0, (8, 1, 100)).astype(np.float32)
mel_np = (amp * np.sin(freqs * t + phase)
          + 0.7 * amp * np.sin(2.3 * freqs * t + 1.7 * phase)).astype(np.float32)
cond = mel_np[0:1, :cond_len, :]
text = np.array([np.arange(2, 2 + 180) %% 250], dtype=np.int32)
torch.manual_seed(seed)
y0 = torch.randn(n, 100).numpy()[None]
got, _ = cfm_sample(params, cfg, cond, text, n, steps=steps, cfg_strength=2.0,
                    sway_sampling_coef=-1.0, use_epss=True, y0=y0,
                    duration_bucket=512)
np.save(sys.argv[1], np.asarray(jax.device_get(got)).astype(np.float32))
"""


def run_arm(staticmax: bool, out: str) -> None:
    env = dict(os.environ)
    env["F5_TTS_FLASH_STATICMAX"] = "1" if staticmax else "0"
    code = _CHILD % {"root": ROOT}
    subprocess.run([sys.executable, "-u", "-c", code, out], check=True,
                   env=env, cwd=ROOT)


def main() -> None:
    base, sm = "/tmp/staticmax_base.npy", "/tmp/staticmax_on.npy"
    run_arm(False, base)
    run_arm(True, sm)
    a, b = np.load(base), np.load(sm)
    scale = float(np.mean(np.abs(a))) or 1.0
    mae = float(np.mean(np.abs(a - b)))
    entry = {"staticmax_vs_onlinemax_bf16": {
        "mel_mae": mae, "rel": mae / scale, "mean_abs_mel": scale,
        "n": 1536, "nfe": 16,
        "note": "trained flagship weights; same softmax math, different "
                "f32 rounding — gates F5_TTS_FLASH_STATICMAX as a default"}}
    out_path = os.path.join(ROOT, "PARITY_FLAGSHIP.json")
    data = json.load(open(out_path)) if os.path.exists(out_path) else {}
    data.update(entry)
    json.dump(data, open(out_path, "w"), indent=2, sort_keys=True)
    print(json.dumps(entry))


if __name__ == "__main__":
    main()
