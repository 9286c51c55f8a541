"""Conditional flow matching: training loss + ODE sampler.

Capability parity with reference `src/f5_tts/model/cfm.py`:
  - forward/loss (cfm.py:231-302): random time, φ=(1−t)x0+t·x1, random span
    infill mask, CFG drops, masked MSE.
  - sample (cfm.py:83-229): duration floor/clamp, cond padding + mask,
    shared-seed noise, EPSS/sway timesteps, Euler ODE with CFG-doubled
    forward, cond splice-back, optional vocoder.

TPU-first design: the whole sampler — text embedding (hoisted out of the
loop), NFE Euler integration as `lax.scan`, CFG-packed backbone — is ONE
jittable function over static-shape buffers; the host wrapper buckets the
dynamic max-duration to limit recompiles (replacing both torchdiffeq and the
TRT-engine + host-Euler split at `f5_tts_trtllm.py:296-372`).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from korean_f5_tts_tpu.config import CFMConfig, DiTConfig, MMDiTConfig, UNetTConfig
from korean_f5_tts_tpu.models import dit as dit_mod
from korean_f5_tts_tpu.utils.misc import lens_to_mask, mask_from_frac_lengths
from korean_f5_tts_tpu.utils.timesteps import make_schedule

def _default_duration_bucket() -> int:
    """512-frame duration buckets on TPU (F5_TTS_DURATION_BUCKET overrides).

    In-model A/B on v5e (BUCKET x attention backend, 16 NFE headline): the
    shared-segment splash path at n=1536 (RTF 0.0235) beats every finer-
    bucket config — n=1408 pays XLA-masked attention (0.0256) or the
    prefix-flash kernel at bq=128 (0.0310), losing more than the 8% padding
    saves. Finer buckets only pay off once a masked kernel matches splash at
    n % 512 != 0; until then 512 on TPU, 128 on CPU (XLA path scales fine)."""
    import os as _os

    env = _os.environ.get("F5_TTS_DURATION_BUCKET")
    if env:
        try:
            v = int(env)
        except ValueError as e:  # fail at config time, not deep inside sampling
            raise ValueError(f"F5_TTS_DURATION_BUCKET must be an integer, got {env!r}") from e
        if v < 1:
            raise ValueError(f"F5_TTS_DURATION_BUCKET must be >= 1, got {v}")
        return v
    import jax as _jax

    return 512 if _jax.default_backend() not in ("cpu", "gpu") else 128


DEFAULT_DURATION_BUCKET = 128  # frames; pad max_duration up to a multiple (CPU)


def _backbone_fns(arch):
    """Dispatch (forward, forward_cfg, text_embedding) on the arch config type."""
    if isinstance(arch, UNetTConfig):
        from korean_f5_tts_tpu.models import unett as unett_mod

        return unett_mod.unett_forward, unett_mod.unett_forward_cfg, dit_mod.text_embedding
    if isinstance(arch, MMDiTConfig):
        from korean_f5_tts_tpu.models import mmdit as mmdit_mod

        def mmdit_text(p, a, text, seq_len, drop_text=False, pad_mask=None):
            # MMDiT embeds text at its own length, not the mel length
            return mmdit_mod.mmdit_text_embedding(p, a, text, drop_text=drop_text)

        return mmdit_mod.mmdit_forward, mmdit_mod.mmdit_forward_cfg, mmdit_text
    if isinstance(arch, DiTConfig):
        return dit_mod.dit_forward, dit_mod.dit_forward_cfg, dit_mod.text_embedding
    raise TypeError(f"unsupported backbone config: {type(arch)}")


# ---------------------------------------------------------------------------
# training loss
# ---------------------------------------------------------------------------


def cfm_loss(
    params: dict,
    arch: DiTConfig,
    mel: jax.Array,          # [b, n, d] target mel (x1)
    text: jax.Array,         # [b, nt] token ids, pad=-1
    lens: jax.Array,         # [b]
    key: jax.Array,
    cfm: CFMConfig = CFMConfig(),
    forward_fn=None,
    use_dropout: bool = True,
):
    """Flow-matching loss; returns (loss, cond, pred). Parity: cfm.py:231-302."""
    b, n, _ = mel.shape
    k_frac, k_span, k_x0, k_time, k_drop1, k_drop2, k_dropout = jax.random.split(key, 7)

    mask = lens_to_mask(lens, length=n)
    frac_lengths = jax.random.uniform(
        k_frac, (b,), minval=cfm.frac_lengths_mask[0], maxval=cfm.frac_lengths_mask[1]
    )
    rand_span_mask = mask_from_frac_lengths(lens, frac_lengths, k_span, n) & mask

    x1 = mel
    x0 = jax.random.normal(k_x0, x1.shape, x1.dtype)
    time = jax.random.uniform(k_time, (b,), dtype=x1.dtype)
    t = time[:, None, None]
    phi = (1.0 - t) * x0 + t * x1
    flow = x1 - x0

    cond = jnp.where(rand_span_mask[..., None], 0.0, x1)

    # CFG drops: scalar per batch, as in the reference (host random there)
    drop_audio = jax.random.bernoulli(k_drop1, cfm.audio_drop_prob).astype(x1.dtype)
    drop_both = jax.random.bernoulli(k_drop2, cfm.cond_drop_prob)
    drop_audio = jnp.where(drop_both, 1.0, drop_audio)
    drop_text = drop_both.astype(x1.dtype)

    fwd = forward_fn or _backbone_fns(arch)[0]
    pred = fwd(
        params, arch, phi, cond, text, time, mask=mask,
        drop_audio_cond=drop_audio, drop_text=drop_text,
        dropout_key=k_dropout if use_dropout else None,
    )

    se = (pred - flow) ** 2
    denom = jnp.maximum(rand_span_mask.sum(), 1) * mel.shape[-1]
    loss = jnp.where(rand_span_mask[..., None], se, 0.0).sum() / denom
    return loss, cond, pred


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SampleConfig:
    steps: int = 32
    cfg_strength: float = 1.0
    sway_sampling_coef: float | None = None
    use_epss: bool = True
    max_duration: int = 4096
    duration_bucket: int | None = None


@functools.partial(
    jax.jit,
    static_argnames=(
        "arch", "vcfg", "steps", "use_cfg", "use_sway", "use_epss", "t_start",
    ),
)
def _sample_core_vocos(
    params: dict,
    voc_params: dict,
    arch: DiTConfig,
    step_cond: jax.Array,
    text: jax.Array,
    mask: jax.Array | None,
    pad_mask: jax.Array | None,
    y0: jax.Array,
    cond_mask: jax.Array,    # [b, N] conditioning region (spliced back)
    cfg_strength: jax.Array,
    sway_coef: jax.Array,
    *,
    vcfg,
    steps: int,
    use_cfg: bool,
    use_sway: bool,
    use_epss: bool,
    t_start: float = 0.0,
):
    """ONE device program: DiT Euler scan + cond splice + in-graph Vocos.

    The serving single-request path used to run two programs with two fenced
    relay readbacks (DiT then vocoder, ~30 ms roundtrip each); fusing them is
    the role the reference's single TRT engine + vocoder plan played
    (runtime/triton_trtllm/f5_tts_trtllm.py:155-477). Returns (mel, wav)."""
    from korean_f5_tts_tpu.models.vocos import vocos_decode

    mel = _sample_core.__wrapped__(
        params, arch, step_cond, text, mask, pad_mask, y0,
        cfg_strength, sway_coef, steps=steps, use_cfg=use_cfg,
        use_sway=use_sway, use_epss=use_epss, t_start=t_start,
    )
    out = jnp.where(cond_mask[..., None], step_cond, mel)
    # one replicated trailing frame: istft(center=True) over N frames yields
    # (N-1)*hop samples, so full-bucket durations would lose their final
    # frame; the replicate pad makes duration*hop samples always available
    # (same trick as the server's padded-fallback decode)
    out_v = jnp.concatenate([out, out[:, -1:, :]], axis=1)
    wav = vocos_decode(voc_params, jnp.swapaxes(out_v, 1, 2), vcfg)
    return out, wav


@functools.partial(
    jax.jit,
    static_argnames=(
        "arch", "vcfg", "N", "steps", "use_cfg", "use_sway", "use_epss",
        "canon", "single",
    ),
)
def _serve_core_vocos(
    params: dict,
    voc_params: dict,
    arch: DiTConfig,
    cond_b: jax.Array,       # [b, Bc, d] bucketed ref mel (rows >= lens: garbage)
    lens: jax.Array,         # [b] true ref frame counts
    duration: jax.Array,     # [b] total frames (already floored/clamped on host)
    text: jax.Array,         # [b, nt] ids, pad=-1 (host-bucketed)
    seeds: jax.Array,        # [b] uint32 noise seeds (identical rows = shared noise)
    cfg_strength: jax.Array,
    sway_coef: jax.Array,
    wav_scale: jax.Array,    # [b] per-item output gain (RMS restore), in-graph
    *,
    vcfg,
    N: int,
    steps: int,
    use_cfg: bool,
    use_sway: bool,
    use_epss: bool,
    canon: int,
    single: bool,
):
    """Serving fast path: the ENTIRE request-side device work as ONE program.

    `cfm_sample` keeps its prologue (cond pad, masks, noise, splice) in eager
    jnp ops — harmless locally, but through the TPU relay every eager op is a
    separate ~25 ms dispatch, which dominated served latency (the profile in
    scripts/profile_serving_request.py measured 383 ms for the eager mel
    front-end alone). Here masks, cond padding, seeded noise, the Euler scan,
    the cond splice, the Vocos decode, the RMS restore, and the int16
    quantization all live in one jitted graph: one dispatch, one int16
    readback (half the f32 relay transfer). Role parity: the reference's
    single TRT engine execution per request (f5_tts_trtllm.py:296-372).

    Semantics match cfm_sample exactly FOR MATCHING DTYPES (tests/
    test_serving.py pins fp32-model parity; a bf16-closeness test bounds the
    rest): noise is drawn per item at `canon` length and sliced to N
    (cfm.py:194-201 parity — identical seeds give the batch one shared noise
    tensor), masks derive from lens/duration like the host prologue, and the
    int16 conversion mirrors serving/native.py f32_to_i16. When params
    contain bf16 leaves the WHOLE graph (cond cast + noise draw included)
    runs in bf16 — the serving headline mode — so served audio differs from
    an f32-cond cfm_sample call at the bf16 level, not bit-exactly.
    """
    from korean_f5_tts_tpu.models.vocos import vocos_decode

    b, Bc, d = cond_b.shape
    # run the sampler at the model's compute dtype (the bf16 headline path,
    # bench.py:63-108): a bf16-weighted model with f32 cond would keep fp32
    # attention logits and lose the headline RTF. Param dtypes are static at
    # trace time, so f32 (parity) models keep the exact fp32 path.
    leaves = jax.tree_util.tree_leaves(params)
    cdt = (jnp.bfloat16 if any(x.dtype == jnp.bfloat16 for x in leaves)
           else cond_b.dtype)
    cond_b = cond_b.astype(cdt)
    ar = jnp.arange(N)
    cond_mask = ar[None, :] < lens[:, None]
    cond_p = cond_b[:, :N] if Bc >= N else jnp.pad(
        cond_b, ((0, 0), (0, N - Bc), (0, 0)))
    step_cond = jnp.where(cond_mask[..., None], cond_p, 0.0)
    dur_mask = ar[None, :] < duration[:, None]
    # reference-semantics duration mask only for b > 1 (cfm.py:156-158);
    # bucket-tail pad mask always (traced: all-true when max_dur == N)
    mask = None if single else dur_mask
    pad_mask = (ar[None, :] < jnp.max(duration)).reshape(1, N)
    y0 = jax.vmap(
        lambda s: jax.random.normal(jax.random.PRNGKey(s), (canon, d),
                                    dtype=step_cond.dtype)
    )(seeds)[:, :N]
    y0 = jnp.where(dur_mask[..., None], y0, 0.0)

    mel = _sample_core.__wrapped__(
        params, arch, step_cond, text, mask, pad_mask, y0,
        cfg_strength, sway_coef, steps=steps, use_cfg=use_cfg,
        use_sway=use_sway, use_epss=use_epss, t_start=0.0,
    )
    out = jnp.where(cond_mask[..., None], step_cond, mel)
    # replicate-pad one frame so duration*hop samples exist even at
    # full-bucket durations (istft over N frames gives only (N-1)*hop)
    out_v = jnp.concatenate([out, out[:, -1:, :]], axis=1)
    wav = vocos_decode(voc_params, jnp.swapaxes(out_v, 1, 2), vcfg)
    wav = wav.astype(jnp.float32) * wav_scale[:, None]
    return jnp.round(jnp.clip(wav, -1.0, 1.0) * 32767.0).astype(jnp.int16)


def serve_sample(
    params: dict,
    arch: DiTConfig,
    cond_b,                  # [b, Bc, d] device (or host) bucketed ref mels
    text,                    # [b, nt] ids, pad=-1
    duration,                # [b] host ints: requested total frames
    lens,                    # [b] host ints: true ref frame counts
    *,
    vocoder_fused: tuple,    # (voc_params, VocosConfig)
    steps: int = 16,
    cfg_strength: float = 2.0,
    sway_sampling_coef: float | None = -1.0,
    seed: int | None = None,
    wav_scale=None,          # [b] host floats; None = 1.0
    max_duration: int = 4096,
    duration_bucket: int | None = None,
    use_epss: bool = True,
):
    """Host wrapper for the serving fast path. Returns (wav_i16 device array
    [b, N*hop], duration[b]) — the caller materializes and slices per item.

    Host side is numpy-only (duration floor/clamp per cfm.py:135-139, text
    64-token bucketing, noise seeds); every device op lives in the single
    jitted _serve_core_vocos program.
    """
    text_host = np.asarray(text)
    lens = np.asarray(lens)
    duration = np.asarray(duration)
    text_lens = (text_host != -1).sum(axis=-1)
    duration = np.maximum(np.maximum(text_lens, lens) + 1, duration)
    duration = np.clip(duration, None, max_duration)
    max_dur = int(duration.max())
    if duration_bucket is None:
        duration_bucket = _default_duration_bucket()
    N = min(int(np.ceil(max_dur / duration_bucket)) * duration_bucket, max_duration)
    N = max(N, max_dur)
    b = text_host.shape[0]
    import os as _os

    tb = int(_os.environ.get("F5_TTS_TEXT_BUCKET", "64"))
    if tb > 0 and not isinstance(arch, MMDiTConfig):
        nt = text_host.shape[1]
        ntb = max(tb, int(np.ceil(nt / tb)) * tb)
        if ntb != nt:
            text_host = np.pad(text_host, ((0, 0), (0, ntb - nt)),
                               constant_values=-1)
    if seed is None:
        import secrets

        seeds = np.asarray([secrets.randbits(31) for _ in range(b)], np.uint32)
    else:
        # & 0xFFFFFFFF: in-graph PRNGKey takes a 32-bit operand; matches
        # cfm_sample's PRNGKey(seed) for all seeds < 2**32
        seeds = np.full((b,), int(seed) & 0xFFFFFFFF, np.uint32)
    if wav_scale is None:
        wav_scale = np.ones((b,), np.float32)
    voc_params, vcfg = vocoder_fused
    wav_i16 = _serve_core_vocos(
        params, voc_params, arch, cond_b,
        np.asarray(lens, np.int32), np.asarray(duration, np.int32),
        text_host, seeds,
        np.float32(cfg_strength), np.float32(sway_sampling_coef or 0.0),
        np.asarray(wav_scale, np.float32),
        vcfg=vcfg, N=int(N), steps=int(steps),
        use_cfg=float(cfg_strength) > 1e-5,
        use_sway=sway_sampling_coef is not None,
        use_epss=bool(use_epss), canon=max(int(max_duration), int(N)),
        single=b == 1,
    )
    return wav_i16, duration


@functools.partial(
    jax.jit,
    static_argnames=(
        "arch", "steps", "use_cfg", "use_sway", "use_epss", "t_start",
    ),
)
def _sample_core(
    params: dict,
    arch: DiTConfig,
    step_cond: jax.Array,    # [b, N, d] cond already masked to cond region
    text: jax.Array,         # [b, nt]
    mask: jax.Array | None,  # [b, N] duration mask (None for b==1)
    pad_mask: jax.Array | None,  # [1, N] bucket-tail mask (None if no padding)
    y0: jax.Array,           # [b, N, d] initial noise (zeroed past duration)
    cfg_strength: jax.Array,  # traced scalar: no recompile per guidance value
    sway_coef: jax.Array,     # traced scalar: no recompile per sway value
    steps: int,
    use_cfg: bool,
    use_sway: bool,
    use_epss: bool,
    t_start: float = 0.0,
) -> jax.Array:
    """jit core: text embed (once) + lax.scan Euler over the NFE schedule.

    cfg_strength and sway_coef are traced operands — only the branch structure
    (use_cfg/use_sway) is static, so changing guidance or sway values reuses
    the same compiled program (the scalars enter fused multiplies).
    """
    N = step_cond.shape[1]
    base = make_schedule(steps, use_epss=use_epss, sway_sampling_coef=None,
                         t_start=t_start)
    ts = jnp.asarray(base, dtype=step_cond.dtype)
    if use_sway:
        c = sway_coef.astype(ts.dtype)
        ts = ts + c * (jnp.cos(jnp.pi / 2.0 * ts) - 1.0 + ts)

    forward, forward_cfg, text_embedding = _backbone_fns(arch)
    text_emb_cond = text_embedding(params["text_embed"], arch, text, N,
                                   drop_text=False, pad_mask=pad_mask)
    if use_cfg:
        text_emb_uncond = text_embedding(params["text_embed"], arch, text, N,
                                         drop_text=True, pad_mask=pad_mask)
    dts = ts[1:] - ts[:-1]

    if use_cfg and isinstance(arch, DiTConfig):
        # hoist ALL time-dependent modulations out of the scan: they are
        # batch-independent functions of the schedule
        mods, mod_final, _ = dit_mod.precompute_step_modulations(params, arch, ts[:-1])
        # ... and the cond/text part of the input projection (loop-invariant)
        static_inp = dit_mod.precompute_input_static(
            params, arch, step_cond, text_emb_cond, text_emb_uncond)

        def step_premod(x, xs):
            dt, mods_s, mod_final_s = xs
            pred = dit_mod.dit_forward_cfg_premod(
                params, arch, x, step_cond, text_emb_cond, text_emb_uncond,
                mods_s, mod_final_s, cfg_strength, mask=mask, pad_mask=pad_mask,
                static_inp=static_inp,
            )
            return (x + dt * pred).astype(y0.dtype), None

        x_final, _ = jax.lax.scan(step_premod, y0, (dts, mods, mod_final))
        return x_final

    def step(x, tt):
        t_i, dt = tt
        time = jnp.full((x.shape[0],), t_i, dtype=x.dtype)
        if use_cfg:
            pred = forward_cfg(
                params, arch, x, step_cond, text_emb_cond, text_emb_uncond,
                time, cfg_strength, mask=mask, pad_mask=pad_mask,
            )
        else:
            pred = forward(params, arch, x, step_cond, text, time, mask=mask,
                           drop_audio_cond=False, drop_text=False,
                           pad_mask=pad_mask)
        return (x + dt * pred).astype(y0.dtype), None

    x_final, _ = jax.lax.scan(step, y0, (ts[:-1], dts))
    return x_final


def cfm_sample(
    params: dict,
    arch: DiTConfig,
    cond: np.ndarray | jax.Array,   # [b, n_cond, d] reference mel
    text: np.ndarray | jax.Array,   # [b, nt] ids (pad=-1)
    duration: int | np.ndarray,
    *,
    lens: np.ndarray | None = None,
    steps: int = 32,
    cfg_strength: float = 1.0,
    sway_sampling_coef: float | None = None,
    seed: int | None = None,
    y0: jax.Array | None = None,
    max_duration: int = 4096,
    duration_bucket: int | None = None,
    use_epss: bool = True,
    no_ref_audio: bool = False,
    duplicate_test: bool = False,
    t_inter: float = 0.1,
    edit_mask: np.ndarray | None = None,
    vocoder=None,
    vocoder_fused: tuple | None = None,  # (voc_params, VocosConfig): ONE program
    split_by_bucket: bool = True,
):
    """Zero-shot sampling. Host wrapper: duration semantics, bucketing, noise.

    Returns (out, None): [b, max_dur, d] mel with the conditioning region
    spliced back (cfm.py:221-223), trimmed to the padded bucket length.

    split_by_bucket: mixed-duration batches are regrouped so each item runs at
    ITS OWN duration bucket instead of the batch max — masked rows are
    invisible to attention either way (identical output), but the dense ops
    (qkv/FF/LN) pay for every padded row, so a 50%-duration item in a
    max-duration batch wastes half its FLOPs. Groups recur on the same
    bucketed shapes, so no new compile shapes are introduced.
    """
    # host copy of text BEFORE the device upload: text_lens and the split
    # regrouping below stay host-side (np.asarray on a device array would be
    # a blocking relay readback per call)
    text_host = np.asarray(text)
    cond = jnp.asarray(cond)
    text = jnp.asarray(text)
    b, cond_seq_len, d = cond.shape
    if lens is None:
        lens = np.full((b,), cond_seq_len, dtype=np.int64)
    lens = np.asarray(lens)

    if isinstance(duration, int):
        duration = np.full((b,), duration, dtype=np.int64)
    duration = np.asarray(duration)
    text_lens = (text_host != -1).sum(axis=-1)
    # at least prompt length + 1 so something is generated (cfm.py:135-139)
    duration = np.maximum(np.maximum(text_lens, lens) + 1, duration)
    duration = np.clip(duration, None, max_duration)
    max_dur = int(duration.max())
    # bucket to limit distinct compiled shapes (512 on TPU for splash attn)
    if duration_bucket is None:
        duration_bucket = _default_duration_bucket()
    N = min(int(np.ceil(max_dur / duration_bucket)) * duration_bucket, max_duration)
    N = max(N, max_dur)

    if split_by_bucket and b > 1 and edit_mask is None and not duplicate_test:
        Ns = np.minimum(
            np.maximum(np.ceil(duration / duration_bucket).astype(np.int64), 1)
            * duration_bucket, max_duration)
        Ns = np.maximum(Ns, duration)
        if len(np.unique(Ns)) > 1:
            # dispatch ALL groups before materialising any: the jitted
            # samplers return asynchronously, so the device runs groups
            # back-to-back instead of idling through a host readback (a
            # ~30 ms relay roundtrip each) between groups. Big tensors
            # (cond, y0) are gathered ON DEVICE — slicing host copies would
            # re-upload each group's rows through the relay.
            y0_dev = None if y0 is None else jnp.asarray(y0)
            pend: list[tuple[np.ndarray, object, object]] = []
            for N_g in np.unique(Ns):
                idx = np.where(Ns == N_g)[0]
                sub_out, sub_wav = cfm_sample(
                    params, arch, cond[idx], text_host[idx], duration[idx],
                    lens=lens[idx], steps=steps, cfg_strength=cfg_strength,
                    sway_sampling_coef=sway_sampling_coef, seed=seed,
                    y0=None if y0_dev is None else y0_dev[idx, : int(N_g)],
                    max_duration=max_duration, duration_bucket=duration_bucket,
                    use_epss=use_epss, no_ref_audio=no_ref_audio,
                    vocoder=vocoder, vocoder_fused=vocoder_fused,
                    split_by_bucket=False,
                )
                pend.append((idx, sub_out, sub_wav))
            subs = [(idx, np.asarray(so, np.float32),
                     None if sw is None else np.asarray(sw, np.float32))
                    for idx, so, sw in pend]
            n1 = max(s[1].shape[1] for s in subs)
            out = np.zeros((b, n1) + subs[0][1].shape[2:], np.float32)
            wav = None
            if subs[0][2] is not None:
                nw = max(s[2].shape[1] for s in subs)
                wav = np.zeros((b, nw), np.float32)
            for idx, so, sw in subs:
                out[idx, : so.shape[1]] = so
                if wav is not None:
                    wav[idx, : sw.shape[1]] = sw
            return out, wav

    cond_mask = np.arange(N)[None, :] < lens[:, None]
    if edit_mask is not None:
        em = np.asarray(edit_mask)
        em = np.pad(em, ((0, 0), (0, N - em.shape[1])), constant_values=False)
        cond_mask = cond_mask & em

    cond_p = jnp.pad(cond, ((0, 0), (0, N - cond_seq_len), (0, 0)))
    if no_ref_audio:
        cond_p = jnp.zeros_like(cond_p)
    step_cond = jnp.where(jnp.asarray(cond_mask)[..., None], cond_p, 0.0)

    dur_mask = np.arange(N)[None, :] < duration[:, None]
    # two distinct masks (reference cfm.py:156-158 + bucketing):
    #   mask      — the reference-semantics duration mask: present only for
    #               b > 1 (the reference never masks single-item inference);
    #               gated by attn_mask_enabled inside attention, applied to
    #               attention outputs / conv-pos always, like the reference.
    #   pad_mask  — [1, N] bucket-tail mask covering rows >= max_dur that this
    #               framework's shape bucketing adds but the reference run
    #               never has. ALWAYS masked at every sequence-mixing op
    #               (attention logits, conv boundaries, GRN stats) so bucketed
    #               output == exact-length output on the valid region.
    mask = jnp.asarray(dur_mask) if b > 1 else None
    pad_mask = (
        jnp.asarray(np.arange(N)[None, :] < max_dur) if N > max_dur else None
    )

    # Bucket the text axis too: every novel token count would otherwise be a
    # fresh jit shape (a full sampler recompile, minutes on TPU). Padding with
    # -1 is exact for DiT/UNetT: text_embedding shifts ids +1 and pads with 0
    # internally, so -1 -> 0 = the same filler token (dit.py:142-147). MMDiT
    # embeds text at its own length (its attention sees the text stream), so
    # it keeps exact shapes. F5_TTS_TEXT_BUCKET=0 disables.
    if not isinstance(arch, MMDiTConfig):
        import os as _os

        tb = int(_os.environ.get("F5_TTS_TEXT_BUCKET", "64"))
        if tb > 0:
            nt = text.shape[1]
            ntb = max(tb, int(np.ceil(nt / tb)) * tb)
            if ntb != nt:
                text = jnp.pad(text, ((0, 0), (0, ntb - nt)), constant_values=-1)

    if y0 is None:
        # Noise parity with cfm.py:194-201: with a seed, the reference reseeds
        # EVERY item with the same seed, so all items share one noise tensor
        # and batched output == the same request run alone; with seed=None it
        # draws fresh noise per item from the global RNG. Draw at a canonical
        # length (>= max_duration) and slice so the noise for frame k does not
        # depend on the bucket size N (JAX keys are not prefix-stable across
        # shapes).
        canon = max(int(max_duration), N)
        if seed is None:
            import secrets

            base = jax.random.PRNGKey(secrets.randbits(63))
            keys = jax.random.split(base, b)
            y0 = jax.vmap(
                lambda k: jax.random.normal(k, (canon, d), dtype=step_cond.dtype)
            )(keys)[:, :N]
        else:
            key = jax.random.PRNGKey(seed)
            noise = jax.random.normal(key, (canon, d), dtype=step_cond.dtype)[:N]
            y0 = jnp.broadcast_to(noise[None], (b, N, d))
    y0 = jnp.where(jnp.asarray(dur_mask)[..., None], y0, 0.0)

    t_start = 0.0
    if duplicate_test:
        # inner-timestep observation mode (cfm.py:141-143, 205-209): start the
        # ODE at t_inter from a cond-shifted state instead of pure noise
        test_cond = np.zeros((b, N, d), np.float32)
        span = min(cond_seq_len, max(N - cond_seq_len, 0))
        test_cond[:, cond_seq_len: cond_seq_len + span] = np.asarray(cond)[:, :span]
        t_start = t_inter
        y0 = (1.0 - t_start) * y0 + t_start * jnp.asarray(test_cond, y0.dtype)
        steps = int(steps * (1.0 - t_start))

    if vocoder_fused is not None:
        voc_params, vcfg = vocoder_fused
        out, wav = _sample_core_vocos(
            params, voc_params, arch, step_cond, text, mask, pad_mask, y0,
            jnp.asarray(cond_mask),
            jnp.asarray(float(cfg_strength), dtype=step_cond.dtype),
            jnp.asarray(float(sway_sampling_coef or 0.0), dtype=step_cond.dtype),
            vcfg=vcfg,
            steps=int(steps),
            use_cfg=float(cfg_strength) > 1e-5,
            use_sway=sway_sampling_coef is not None,
            use_epss=bool(use_epss),
            t_start=float(t_start),
        )
        return out, wav

    sampled = _sample_core(
        params, arch, step_cond, text, mask, pad_mask, y0,
        jnp.asarray(float(cfg_strength), dtype=step_cond.dtype),
        jnp.asarray(float(sway_sampling_coef or 0.0), dtype=step_cond.dtype),
        steps=int(steps),
        use_cfg=float(cfg_strength) > 1e-5,
        use_sway=sway_sampling_coef is not None,
        use_epss=bool(use_epss),
        t_start=float(t_start),
    )

    out = jnp.where(jnp.asarray(cond_mask)[..., None], cond_p, sampled)
    if vocoder is not None:
        out = vocoder(jnp.swapaxes(out, 1, 2))
    return out, None
