"""End-to-end learning proof: overfit one sample, then reproduce it by
sampling — validates the loss/optimizer/sampler stack jointly (the strongest
automated check available without pretrained checkpoints)."""

import numpy as np

import jax
import jax.numpy as jnp

from korean_f5_tts_tpu.config import CFMConfig, DiTConfig
from korean_f5_tts_tpu.models.cfm import cfm_sample
from korean_f5_tts_tpu.models.dit import init_dit
from korean_f5_tts_tpu.train.step import init_train_state, make_optimizer, train_step


def test_overfit_one_sample_then_sample_it_back():
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
    first_loss, last = None, None
    for i in range(400):
        state, loss = train_step(state, batch, jax.random.PRNGKey(i), cfg, opt, cfm)
        if first_loss is None:
            first_loss = float(loss)
        last = float(loss)
    assert last < 0.15 * first_loss, (first_loss, last)

    # condition on the first half; the generated second half must match the
    # memorized target far better than the signal scale
    out, _ = cfm_sample(state.params, cfg, mel[:, :32, :], text, duration=64,
                        lens=np.array([32]), steps=16, cfg_strength=0.0, seed=0,
                        duration_bucket=8)
    gen = np.asarray(out)[0, 32:64]
    err = np.abs(gen - target[32:64]).mean()
    signal = np.abs(target[32:64]).mean()
    assert err < 0.4 * signal, (err, signal)
