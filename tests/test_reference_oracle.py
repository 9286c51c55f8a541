"""Reference-oracle parity: run the ACTUAL reference implementation
(/root/reference/src/f5_tts, torch CPU) against this framework through the
checkpoint converter, and pin the mel-MAE < 1e-2 north star (BASELINE.md).

The reference's unavailable deps are stubbed with faithful minimal
implementations before import:
  - x_transformers.x_transformers.RotaryEmbedding / apply_rotary_pos_emb —
    the interleaved-pair rotary convention (rotate pairs (2i, 2i+1), freqs
    duplicated per pair), which is exactly what utils/torch_ckpt.py's q/k
    column permutation converts FROM;
  - torchdiffeq.odeint — fixed-grid Euler (the reference always runs
    method="euler", cfm.py:40);
  - torchaudio / librosa / rjieba / pypinyin — import-time placeholders; the
    test passes mel features directly (mel_spec_module) so none execute.

Oracle: random-weight torch CFM(DiT) (dit.py:160-224, cfm.py:34-77) vs this
framework's cfm_sample after convert_dit_state_dict, identical noise/schedule.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_SRC = "/root/reference/src"


def _install_stubs():
    from torch import nn

    if "x_transformers" not in sys.modules:
        xt = types.ModuleType("x_transformers")
        xtx = types.ModuleType("x_transformers.x_transformers")

        def rotate_half(x):
            shp = x.shape
            x = x.reshape(*shp[:-1], shp[-1] // 2, 2)
            x1, x2 = x.unbind(-1)
            return torch.stack((-x2, x1), -1).reshape(shp)

        def apply_rotary_pos_emb(t, freqs, scale=1):
            rot_dim, seq_len, orig = freqs.shape[-1], t.shape[-2], t.dtype
            freqs = freqs[-seq_len:, :]
            t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
            t_rot = (t_rot * freqs.cos() * scale) + (
                rotate_half(t_rot) * freqs.sin() * scale
            )
            return torch.cat((t_rot, t_pass), dim=-1).to(orig)

        class RotaryEmbedding(nn.Module):
            def __init__(self, dim, base=10000.0, **kw):
                super().__init__()
                inv_freq = 1.0 / (
                    base ** (torch.arange(0, dim, 2).float() / dim)
                )
                self.register_buffer("inv_freq", inv_freq, persistent=False)

            def forward_from_seq_len(self, seq_len):
                t = torch.arange(seq_len, device=self.inv_freq.device).float()
                freqs = torch.einsum("i,j->ij", t, self.inv_freq)
                # interleaved duplication: [f0, f0, f1, f1, ...]
                freqs = torch.stack((freqs, freqs), dim=-1).reshape(seq_len, -1)
                return freqs, None

        class RMSNorm(nn.Module):
            # x_transformers convention: l2-normalize * sqrt(dim) * g
            def __init__(self, dim):
                super().__init__()
                self.scale = dim ** 0.5
                self.g = nn.Parameter(torch.ones(dim))

            def forward(self, x):
                return torch.nn.functional.normalize(x, dim=-1) * self.scale * self.g

        xtx.RotaryEmbedding = RotaryEmbedding
        xtx.apply_rotary_pos_emb = apply_rotary_pos_emb
        xtx.rotate_half = rotate_half
        xtx.RMSNorm = RMSNorm
        xt.RMSNorm = RMSNorm
        xt.x_transformers = xtx
        sys.modules["x_transformers"] = xt
        sys.modules["x_transformers.x_transformers"] = xtx

    if "torchdiffeq" not in sys.modules:
        td = types.ModuleType("torchdiffeq")

        def odeint(fn, y0, t, **kwargs):
            ys = [y0]
            y = y0
            for i in range(t.shape[0] - 1):
                y = y + (t[i + 1] - t[i]) * fn(t[i], y)
                ys.append(y)
            return torch.stack(ys)

        td.odeint = odeint
        sys.modules["torchdiffeq"] = td

    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        tat = types.ModuleType("torchaudio.transforms")

        class MelSpectrogram(nn.Module):
            def __init__(self, **kw):
                super().__init__()

            def forward(self, x):  # never called: mel passed directly
                raise NotImplementedError

        tat.MelSpectrogram = MelSpectrogram
        ta.transforms = tat
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = tat

    if "librosa" not in sys.modules:
        lb = types.ModuleType("librosa")
        lbf = types.ModuleType("librosa.filters")
        lbf.mel = lambda **kw: (_ for _ in ()).throw(NotImplementedError)
        lb.filters = lbf
        sys.modules["librosa"] = lb
        sys.modules["librosa.filters"] = lbf

    for name in ("rjieba",):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)

    if "pypinyin" not in sys.modules:
        pp = types.ModuleType("pypinyin")
        pp.Style = types.SimpleNamespace(TONE3=None)
        pp.lazy_pinyin = lambda *a, **k: []
        sys.modules["pypinyin"] = pp

    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)

    # bypass f5_tts package __init__s (they chain-import wandb/accelerate/
    # datasets which aren't in the image): pre-register namespace packages
    # whose __path__ points at the reference dirs, so only the leaf modules
    # under test execute
    for name, path in (
        ("f5_tts", f"{REF_SRC}/f5_tts"),
        ("f5_tts.model", f"{REF_SRC}/f5_tts/model"),
        ("f5_tts.model.backbones", f"{REF_SRC}/f5_tts/model/backbones"),
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = [path]
            sys.modules[name] = mod


ARCH = dict(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2, mel_dim=12,
            text_num_embeds=30, text_dim=32, conv_layers=2)


@pytest.fixture(scope="module")
def oracle():
    """Random-weight reference CFM(DiT) + converted JAX params."""
    _install_stubs()
    from torch import nn

    from f5_tts.model.backbones.dit import DiT as RefDiT
    from f5_tts.model.cfm import CFM as RefCFM

    from korean_f5_tts_tpu.config import DiTConfig
    from korean_f5_tts_tpu.utils.torch_ckpt import convert_dit_state_dict

    torch.manual_seed(0)
    ref_dit = RefDiT(**ARCH)
    # randomize ALL weights (AdaLN-zero init would otherwise null the blocks)
    sd = ref_dit.state_dict()
    g = torch.Generator().manual_seed(1)
    sd = {k: torch.randn(v.shape, generator=g) * 0.1 for k, v in sd.items()}
    ref_dit.load_state_dict(sd)
    ref_dit.eval()

    class DummyMel(nn.Module):
        n_mel_channels = ARCH["mel_dim"]

    ref_cfm = RefCFM(transformer=ref_dit, mel_spec_module=DummyMel(),
                     num_channels=ARCH["mel_dim"])

    cfg = DiTConfig(dim=64, depth=2, heads=2, dim_head=32, ff_mult=2,
                    mel_dim=12, text_num_embeds=30, text_dim=32, conv_layers=2)
    params = convert_dit_state_dict(
        {k: v.numpy() for k, v in ref_dit.state_dict().items()},
        cfg.heads, cfg.dim_head, cfg.depth, cfg.conv_layers,
    )
    return {"ref_dit": ref_dit, "ref_cfm": ref_cfm, "cfg": cfg, "params": params}


class TestModuleForwardParity:
    def test_dit_forward_matches_reference(self, oracle):
        """Full DiT forward (train path, no CFG) <= 1e-4 vs torch fp32."""
        import jax.numpy as jnp

        from korean_f5_tts_tpu.models.dit import dit_forward

        rng = np.random.default_rng(0)
        b, n = 2, 24
        x = rng.standard_normal((b, n, 12)).astype(np.float32)
        cond = rng.standard_normal((b, n, 12)).astype(np.float32)
        text = np.array([[1, 5, 9, -1, -1], [2, 3, 4, 5, -1]], dtype=np.int32)
        time = np.array([0.3, 0.7], dtype=np.float32)

        with torch.no_grad():
            want = oracle["ref_dit"](
                x=torch.from_numpy(x), cond=torch.from_numpy(cond),
                text=torch.from_numpy(text.astype(np.int64)),
                time=torch.from_numpy(time),
                drop_audio_cond=False, drop_text=False,
            ).numpy()
        got = np.asarray(dit_forward(
            oracle["params"], oracle["cfg"], jnp.asarray(x), jnp.asarray(cond),
            jnp.asarray(text), jnp.asarray(time),
        ))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def test_dit_forward_drop_branches(self, oracle):
        import jax.numpy as jnp

        from korean_f5_tts_tpu.models.dit import dit_forward

        rng = np.random.default_rng(1)
        x = rng.standard_normal((1, 16, 12)).astype(np.float32)
        cond = rng.standard_normal((1, 16, 12)).astype(np.float32)
        text = np.array([[7, 8, -1]], dtype=np.int32)
        time = np.array([0.5], dtype=np.float32)
        for da, dt in ((True, False), (False, True), (True, True)):
            with torch.no_grad():
                want = oracle["ref_dit"](
                    x=torch.from_numpy(x), cond=torch.from_numpy(cond),
                    text=torch.from_numpy(text.astype(np.int64)),
                    time=torch.from_numpy(time),
                    drop_audio_cond=da, drop_text=dt,
                ).numpy()
            got = np.asarray(dit_forward(
                oracle["params"], oracle["cfg"], jnp.asarray(x),
                jnp.asarray(cond), jnp.asarray(text), jnp.asarray(time),
                drop_audio_cond=da, drop_text=dt,
            ))
            np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


class TestSampleParity:
    def _run_pair(self, oracle, steps, cfg_strength, sway, use_epss,
                  duration=40, cond_len=14, seed=5):
        """Reference CFM.sample vs cfm_sample on identical noise/schedule."""
        from korean_f5_tts_tpu.models.cfm import cfm_sample

        rng = np.random.default_rng(7)
        cond = rng.standard_normal((1, cond_len, 12)).astype(np.float32)
        text = np.array([[3, 1, 4, 1, 5, 9, 2, 6]], dtype=np.int32)

        oracle["ref_dit"].clear_cache()
        with torch.no_grad():
            want, _ = oracle["ref_cfm"].sample(
                cond=torch.from_numpy(cond),
                text=torch.from_numpy(text.astype(np.int64)),
                duration=duration, steps=steps, cfg_strength=cfg_strength,
                sway_sampling_coef=sway, seed=seed, use_epss=use_epss,
            )
        want = want.numpy()

        # reproduce the reference's exact noise draw (torch RNG) and inject it
        torch.manual_seed(seed)
        y0 = torch.randn(duration, 12).numpy()[None]
        got, _ = cfm_sample(
            oracle["params"], oracle["cfg"], cond, text, duration,
            steps=steps, cfg_strength=cfg_strength, sway_sampling_coef=sway,
            use_epss=use_epss, y0=np.repeat(y0, 1, axis=0),
            duration_bucket=1,
        )
        got = np.asarray(got)
        assert got.shape == want.shape
        return got, want

    def test_mel_mae_north_star_16nfe(self, oracle):
        """The driver's headline claim: mel MAE < 1e-2 vs the torch reference
        at the production sampling config (16 NFE, CFG 2.0, sway -1, EPSS)."""
        got, want = self._run_pair(oracle, steps=16, cfg_strength=2.0,
                                   sway=-1.0, use_epss=True)
        mae = float(np.mean(np.abs(got - want)))
        assert mae < 1e-2, f"mel MAE {mae} vs north star 1e-2"
        # fp32 end-to-end should in fact be far tighter
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)

    def test_sample_no_cfg_linspace(self, oracle):
        got, want = self._run_pair(oracle, steps=8, cfg_strength=0.0,
                                   sway=None, use_epss=False)
        mae = float(np.mean(np.abs(got - want)))
        assert mae < 1e-2, mae

    def test_sample_bucketed_against_reference(self, oracle):
        """Bucketed (padded) sampling must ALSO hit the north star — the
        reference never pads, so this pins the pad-mask machinery end to end."""
        from korean_f5_tts_tpu.models.cfm import cfm_sample

        rng = np.random.default_rng(9)
        duration, cond_len = 40, 14
        cond = rng.standard_normal((1, cond_len, 12)).astype(np.float32)
        text = np.array([[2, 7, 1, 8]], dtype=np.int32)
        oracle["ref_dit"].clear_cache()
        with torch.no_grad():
            want, _ = oracle["ref_cfm"].sample(
                cond=torch.from_numpy(cond),
                text=torch.from_numpy(text.astype(np.int64)),
                duration=duration, steps=6, cfg_strength=2.0,
                sway_sampling_coef=-1.0, seed=11, use_epss=True,
            )
        want = want.numpy()
        torch.manual_seed(11)
        y0 = torch.randn(duration, 12).numpy()[None]
        y0_padded = np.zeros((1, 64, 12), np.float32)
        y0_padded[:, :duration] = y0
        got, _ = cfm_sample(
            oracle["params"], oracle["cfg"], cond, text, duration,
            steps=6, cfg_strength=2.0, sway_sampling_coef=-1.0,
            use_epss=True, y0=y0_padded, duration_bucket=64,
        )
        got = np.asarray(got)[:, :duration]
        mae = float(np.mean(np.abs(got - want)))
        assert mae < 1e-2, mae
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


class TestEpssParity:
    def test_epss_tables_match_reference(self, oracle):
        """utils/timesteps.py EPSS knots == reference get_epss_timesteps."""
        from f5_tts.model.utils import get_epss_timesteps as ref_epss

        from korean_f5_tts_tpu.utils.timesteps import get_epss_timesteps

        for n in (5, 6, 7, 10, 12, 16, 32):
            want = ref_epss(n, device="cpu", dtype=torch.float32).numpy()
            got = get_epss_timesteps(n)
            np.testing.assert_allclose(got, want, atol=1e-7)
