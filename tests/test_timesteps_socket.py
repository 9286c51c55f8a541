"""EPSS/sway schedule golden tests + socket server end-to-end."""

import socket
import threading
import time

import numpy as np
import pytest

from korean_f5_tts_tpu.utils.timesteps import get_epss_timesteps, make_schedule, sway_warp


class TestSchedules:
    def test_epss_16_table(self):
        # reference table for 16 NFE (model/utils.py:546)
        t = get_epss_timesteps(16)
        expected = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 20, 24, 28, 32]) / 32
        np.testing.assert_allclose(t, expected)
        assert t.dtype == np.float32

    @pytest.mark.parametrize("n,length", [(5, 6), (6, 7), (7, 8), (10, 11),
                                          (12, 13), (16, 17)])
    def test_epss_lengths(self, n, length):
        assert len(get_epss_timesteps(n)) == length

    def test_epss_fallback_linspace(self):
        t = get_epss_timesteps(9)
        np.testing.assert_allclose(t, np.linspace(0, 1, 10, dtype=np.float32))

    def test_sway_warp_formula(self):
        t = np.linspace(0, 1, 5)
        out = sway_warp(t, -1.0)
        ref = t + -1.0 * (np.cos(np.pi / 2 * t) - 1 + t)
        np.testing.assert_allclose(out, ref)
        # endpoints preserved
        assert out[0] == pytest.approx(0.0) and out[-1] == pytest.approx(1.0)

    def test_make_schedule_epss_plus_sway(self):
        s = make_schedule(16, use_epss=True, sway_sampling_coef=-1.0)
        assert len(s) == 17
        assert s[0] == pytest.approx(0.0) and s[-1] == pytest.approx(1.0)
        assert (np.diff(s) > 0).all()
        # sway with negative coef front-loads small steps
        assert np.diff(s)[0] < 1 / 32

    def test_t_start_disables_epss(self):
        s = make_schedule(16, use_epss=True, t_start=0.1)
        np.testing.assert_allclose(s, np.linspace(0.1, 1.0, 17, dtype=np.float32),
                                   atol=1e-7)


@pytest.fixture(scope="module")
def socket_setup(tmp_path_factory):
    import jax

    from korean_f5_tts_tpu.config import DiTConfig, ModelConfig
    from korean_f5_tts_tpu.infer.model import load_model
    from korean_f5_tts_tpu.socket_server import TTSStreamingProcessor, start_server
    from korean_f5_tts_tpu.utils.audio import save_wav

    tmp = tmp_path_factory.mktemp("sock")
    arch = DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, mel_dim=100,
                     text_num_embeds=40, text_dim=16, conv_layers=1)
    model = load_model(ModelConfig(name="tiny", backbone="DiT", arch=arch,
                                   tokenizer="custom"), use_n2gk_plus=False)
    model.vocab_char_map = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.,!")}
    sr = 24000
    ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
    ref_path = str(tmp / "ref.wav")
    save_wav(ref_path, ref, sr)

    processor = TTSStreamingProcessor(model, None, ref_path, "hello there",
                                      nfe_step=2)
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(2)
    port = srv.getsockname()[1]

    from korean_f5_tts_tpu.socket_server import handle_client

    def accept_loop():
        while True:
            try:
                conn, _ = srv.accept()
            except OSError:
                return
            threading.Thread(target=handle_client, args=(conn, processor),
                             daemon=True).start()

    threading.Thread(target=accept_loop, daemon=True).start()
    yield {"port": port}
    srv.close()


class TestSocketServer:
    def test_stream_roundtrip(self, socket_setup):
        from korean_f5_tts_tpu.socket_client import request_tts

        wav = request_tts("127.0.0.1", socket_setup["port"], "a socket test.")
        assert len(wav) > 1000
        assert np.isfinite(wav).all()

    def test_two_requests_same_connection_protocol(self, socket_setup):
        from korean_f5_tts_tpu.socket_client import request_tts

        w1 = request_tts("127.0.0.1", socket_setup["port"], "first.")
        w2 = request_tts("127.0.0.1", socket_setup["port"], "second one here.")
        assert len(w1) > 0 and len(w2) > 0


class TestWriterThread:
    def test_writer_collects_chunks(self, tmp_path):
        from korean_f5_tts_tpu.socket_server import AudioFileWriterThread
        from korean_f5_tts_tpu.utils.audio import load_wav

        out = str(tmp_path / "w.wav")
        writer = AudioFileWriterThread(out, 24000)
        writer.start()
        for _ in range(3):
            writer.add_chunk(np.ones(1000, np.float32) * 0.1)
        time.sleep(0.3)
        writer.stop()
        writer.join(timeout=5)
        wav, sr = load_wav(out)
        assert wav.shape[-1] == 3000
