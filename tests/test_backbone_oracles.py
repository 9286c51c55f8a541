"""UNetT / MMDiT oracle parity vs the ACTUAL reference backbones.

Round-2 VERDICT: test_unett_converter.py / test_backbones.py round-trip
synthetic state dicts — converters validated against themselves. These tests
instantiate the real torch backbones (/root/reference/src/f5_tts/model/
backbones/unett.py:107-280, mmdit.py:85-214) under the same stubs as the DiT
oracle, convert their state dicts, and pin forward parity <= 1e-4 plus a short
CFM.sample pair for UNetT.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_reference_oracle import _install_stubs  # noqa: E402

UNETT_ARCH = dict(dim=64, depth=4, heads=2, dim_head=32, ff_mult=2, mel_dim=12,
                  text_num_embeds=30, text_dim=32, conv_layers=2)
MMDIT_ARCH = dict(dim=64, depth=3, heads=2, dim_head=32, ff_mult=2, mel_dim=12,
                  text_num_embeds=30)


def _randomize(module, seed):
    g = torch.Generator().manual_seed(seed)
    sd = {k: torch.randn(v.shape, generator=g) * 0.1
          for k, v in module.state_dict().items()}
    module.load_state_dict(sd)
    module.eval()
    return module


@pytest.fixture(scope="module")
def unett_oracle():
    _install_stubs()
    from f5_tts.model.backbones.unett import UNetT as RefUNetT

    from korean_f5_tts_tpu.config import UNetTConfig
    from korean_f5_tts_tpu.utils.torch_ckpt import convert_unett_state_dict

    torch.manual_seed(0)
    ref = _randomize(RefUNetT(**UNETT_ARCH), seed=21)
    cfg = UNetTConfig(dim=64, depth=4, heads=2, dim_head=32, ff_mult=2,
                      mel_dim=12, text_num_embeds=30, text_dim=32,
                      conv_layers=2, dropout=0.0)
    params = convert_unett_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()},
        cfg.heads, cfg.dim_head, cfg.depth, cfg.conv_layers,
        skip_connect_type=cfg.skip_connect_type,
    )
    return {"ref": ref, "cfg": cfg, "params": params}


@pytest.fixture(scope="module")
def mmdit_oracle():
    _install_stubs()
    from f5_tts.model.backbones.mmdit import MMDiT as RefMMDiT

    from korean_f5_tts_tpu.config import MMDiTConfig
    from korean_f5_tts_tpu.utils.torch_ckpt import convert_mmdit_state_dict

    torch.manual_seed(0)
    ref = _randomize(RefMMDiT(**MMDIT_ARCH), seed=22)
    cfg = MMDiTConfig(dim=64, depth=3, heads=2, dim_head=32, ff_mult=2,
                      mel_dim=12, text_num_embeds=30, dropout=0.0)
    params = convert_mmdit_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()},
        cfg.heads, cfg.dim_head, cfg.depth,
    )
    return {"ref": ref, "cfg": cfg, "params": params}


class TestUNetTOracle:
    def test_forward_matches_reference(self, unett_oracle):
        import jax.numpy as jnp

        from korean_f5_tts_tpu.models.unett import unett_forward

        rng = np.random.default_rng(0)
        b, n = 2, 24
        x = rng.standard_normal((b, n, 12)).astype(np.float32)
        cond = rng.standard_normal((b, n, 12)).astype(np.float32)
        text = np.array([[1, 5, 9, -1, -1], [2, 3, 4, 5, -1]], dtype=np.int32)
        time = np.array([0.3, 0.7], dtype=np.float32)
        with torch.no_grad():
            want = unett_oracle["ref"](
                x=torch.from_numpy(x), cond=torch.from_numpy(cond),
                text=torch.from_numpy(text.astype(np.int64)),
                time=torch.from_numpy(time),
            ).numpy()
        got = np.asarray(unett_forward(
            unett_oracle["params"], unett_oracle["cfg"], jnp.asarray(x),
            jnp.asarray(cond), jnp.asarray(text), jnp.asarray(time),
        ))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def test_forward_drop_branches(self, unett_oracle):
        import jax.numpy as jnp

        from korean_f5_tts_tpu.models.unett import unett_forward

        rng = np.random.default_rng(1)
        x = rng.standard_normal((1, 16, 12)).astype(np.float32)
        cond = rng.standard_normal((1, 16, 12)).astype(np.float32)
        text = np.array([[7, 8, -1]], dtype=np.int32)
        time = np.array([0.5], dtype=np.float32)
        for da, dt in ((True, False), (False, True), (True, True)):
            with torch.no_grad():
                want = unett_oracle["ref"](
                    x=torch.from_numpy(x), cond=torch.from_numpy(cond),
                    text=torch.from_numpy(text.astype(np.int64)),
                    time=torch.from_numpy(time),
                    drop_audio_cond=da, drop_text=dt,
                ).numpy()
            got = np.asarray(unett_forward(
                unett_oracle["params"], unett_oracle["cfg"], jnp.asarray(x),
                jnp.asarray(cond), jnp.asarray(text), jnp.asarray(time),
                drop_audio_cond=da, drop_text=dt,
            ))
            np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def test_forward_masked(self, unett_oracle):
        import jax.numpy as jnp

        from korean_f5_tts_tpu.models.unett import unett_forward

        rng = np.random.default_rng(2)
        b, n = 2, 20
        x = rng.standard_normal((b, n, 12)).astype(np.float32)
        cond = rng.standard_normal((b, n, 12)).astype(np.float32)
        text = np.array([[1, 2, 3, -1], [4, 5, -1, -1]], dtype=np.int32)
        time = np.array([0.4, 0.6], dtype=np.float32)
        mask = (np.arange(n)[None, :] < np.array([[14], [20]])).astype(bool)
        with torch.no_grad():
            want = unett_oracle["ref"](
                x=torch.from_numpy(x), cond=torch.from_numpy(cond),
                text=torch.from_numpy(text.astype(np.int64)),
                time=torch.from_numpy(time), mask=torch.from_numpy(mask),
            ).numpy()
        got = np.asarray(unett_forward(
            unett_oracle["params"], unett_oracle["cfg"], jnp.asarray(x),
            jnp.asarray(cond), jnp.asarray(text), jnp.asarray(time),
            mask=jnp.asarray(mask),
        ))
        # reference rows beyond the mask are garbage-in-garbage-out on both
        # sides; compare valid rows
        np.testing.assert_allclose(got[0, :14], want[0, :14], atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(got[1], want[1], atol=1e-4, rtol=1e-4)

    def test_sample_pair(self, unett_oracle):
        """Short CFM.sample parity through the ODE loop (reference CFM wraps
        any backbone; cfm.py:83-229)."""
        from torch import nn

        from f5_tts.model.cfm import CFM as RefCFM

        from korean_f5_tts_tpu.models.cfm import cfm_sample

        class DummyMel(nn.Module):
            n_mel_channels = 12

        ref_cfm = RefCFM(transformer=unett_oracle["ref"],
                         mel_spec_module=DummyMel(), num_channels=12)
        rng = np.random.default_rng(7)
        duration, cond_len, steps, seed = 32, 12, 4, 5
        cond = rng.standard_normal((1, cond_len, 12)).astype(np.float32)
        text = np.array([[3, 1, 4, 1, 5]], dtype=np.int32)
        with torch.no_grad():
            want, _ = ref_cfm.sample(
                cond=torch.from_numpy(cond),
                text=torch.from_numpy(text.astype(np.int64)),
                duration=duration, steps=steps, cfg_strength=2.0,
                sway_sampling_coef=-1.0, seed=seed, use_epss=False,
            )
        want = want.numpy()
        torch.manual_seed(seed)
        y0 = torch.randn(duration, 12).numpy()[None]
        got, _ = cfm_sample(
            unett_oracle["params"], unett_oracle["cfg"], cond, text, duration,
            steps=steps, cfg_strength=2.0, sway_sampling_coef=-1.0,
            use_epss=False, y0=y0, duration_bucket=1,
        )
        got = np.asarray(got)
        mae = float(np.mean(np.abs(got - want)))
        assert mae < 1e-2, mae
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


class TestMMDiTOracle:
    def test_forward_matches_reference(self, mmdit_oracle):
        import jax.numpy as jnp

        from korean_f5_tts_tpu.models.mmdit import mmdit_forward

        rng = np.random.default_rng(0)
        b, n = 2, 24
        x = rng.standard_normal((b, n, 12)).astype(np.float32)
        cond = rng.standard_normal((b, n, 12)).astype(np.float32)
        text = np.array([[1, 5, 9, -1, -1], [2, 3, 4, 5, -1]], dtype=np.int32)
        time = np.array([0.3, 0.7], dtype=np.float32)
        with torch.no_grad():
            want = mmdit_oracle["ref"](
                x=torch.from_numpy(x), cond=torch.from_numpy(cond),
                text=torch.from_numpy(text.astype(np.int64)),
                time=torch.from_numpy(time),
            ).numpy()
        got = np.asarray(mmdit_forward(
            mmdit_oracle["params"], mmdit_oracle["cfg"], jnp.asarray(x),
            jnp.asarray(cond), jnp.asarray(text), jnp.asarray(time),
        ))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def test_forward_drop_branches(self, mmdit_oracle):
        import jax.numpy as jnp

        from korean_f5_tts_tpu.models.mmdit import mmdit_forward

        rng = np.random.default_rng(1)
        x = rng.standard_normal((1, 16, 12)).astype(np.float32)
        cond = rng.standard_normal((1, 16, 12)).astype(np.float32)
        text = np.array([[7, 8, -1]], dtype=np.int32)
        time = np.array([0.5], dtype=np.float32)
        for da, dt in ((True, False), (False, True), (True, True)):
            with torch.no_grad():
                want = mmdit_oracle["ref"](
                    x=torch.from_numpy(x), cond=torch.from_numpy(cond),
                    text=torch.from_numpy(text.astype(np.int64)),
                    time=torch.from_numpy(time),
                    drop_audio_cond=da, drop_text=dt,
                ).numpy()
            got = np.asarray(mmdit_forward(
                mmdit_oracle["params"], mmdit_oracle["cfg"], jnp.asarray(x),
                jnp.asarray(cond), jnp.asarray(text), jnp.asarray(time),
                drop_audio_cond=da, drop_text=dt,
            ))
            np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
