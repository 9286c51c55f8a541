"""Slicer, vocab extension, gRPC service, batch_infer, epoch-math tests."""

import base64
import io
import threading

import numpy as np
import pytest


class TestSlicer:
    def test_splits_at_silence(self):
        from korean_f5_tts_tpu.utils.slicer import Slicer

        sr = 24000
        voiced = 0.3 * np.sin(2 * np.pi * 220 * np.arange(6 * sr) / sr)
        silence = np.zeros(sr)
        wav = np.concatenate([voiced, silence, voiced]).astype(np.float32)
        slicer = Slicer(sr, threshold=-40.0, min_length=3000, min_interval=300,
                        hop_size=20, max_sil_kept=200)
        clips = slicer.slice(wav)
        assert len(clips) == 2
        assert all(len(c) > 3 * sr for c in clips)

    def test_short_audio_single_clip(self):
        from korean_f5_tts_tpu.utils.slicer import Slicer

        sr = 24000
        wav = 0.3 * np.ones(sr, np.float32)
        clips = Slicer(sr).slice(wav)
        assert len(clips) == 1 and len(clips[0]) == sr

    def test_param_validation(self):
        from korean_f5_tts_tpu.utils.slicer import Slicer

        with pytest.raises(ValueError):
            Slicer(24000, min_length=100, min_interval=300)


class TestVocabExtend:
    def test_extend_and_expand(self, tmp_path):
        import jax

        from korean_f5_tts_tpu.config import DiTConfig
        from korean_f5_tts_tpu.models.dit import init_dit
        from korean_f5_tts_tpu.train.checkpoint import load_checkpoint, save_checkpoint
        from korean_f5_tts_tpu.train.vocab_extend import extend_checkpoint, prune_checkpoint

        cfg = DiTConfig(dim=16, depth=1, heads=1, dim_head=16, ff_mult=2, mel_dim=4,
                        text_num_embeds=5, text_dim=8, conv_layers=0)
        params = init_dit(jax.random.PRNGKey(0), cfg)
        ckpt = str(tmp_path / "m.npz")
        save_checkpoint(ckpt, params, ema_params=params, update=7)
        base_vocab = str(tmp_path / "v.txt")
        with open(base_vocab, "w", encoding="utf-8") as f:
            f.writelines(c + "\n" for c in [" ", "a", "b", "c"])

        out_ckpt = str(tmp_path / "m2.npz")
        new_vocab = str(tmp_path / "v2.txt")
        n = extend_checkpoint(ckpt, out_ckpt, base_vocab, ["d", "e", "a"], new_vocab)
        assert n == 6  # 'a' deduplicated
        data = load_checkpoint(out_ckpt)
        assert data["params"]["text_embed"]["embed"]["w"].shape[0] == 7
        # original rows preserved
        np.testing.assert_array_equal(
            data["params"]["text_embed"]["embed"]["w"][:6],
            np.asarray(params["text_embed"]["embed"]["w"]),
        )

        pruned = str(tmp_path / "m3.npz")
        prune_checkpoint(ckpt, pruned)
        pd = load_checkpoint(pruned)
        assert "opt_leaves" not in pd and "params" in pd


class TestEpochMath:
    def test_reference_scale(self):
        from korean_f5_tts_tpu.scripts.count_max_epoch import max_epochs, updates_per_epoch

        upe = updates_per_epoch(95_000, 307_200)
        # ~95k h at 8x38400 frames -> ~104k updates/epoch; 1.2M updates ~ 11.5 epochs
        assert 90_000 < upe < 120_000
        assert 10 < max_epochs(1_200_000, 95_000, 307_200) < 14


@pytest.fixture(scope="module")
def tiny_grpc():
    import jax

    from korean_f5_tts_tpu.config import DiTConfig, ModelConfig
    from korean_f5_tts_tpu.infer.model import load_model
    from korean_f5_tts_tpu.models.vocos import VocosConfig, init_vocos, vocos_decode
    from korean_f5_tts_tpu.serving.grpc_server import make_grpc_server
    from korean_f5_tts_tpu.serving.server import TTSService

    arch = DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, mel_dim=100,
                     text_num_embeds=40, text_dim=16, conv_layers=1)
    model = load_model(ModelConfig(name="tiny", backbone="DiT", arch=arch,
                                   tokenizer="custom"), use_n2gk_plus=False)
    model.vocab_char_map = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.,!")}
    vcfg = VocosConfig(dim=16, intermediate_dim=32, num_layers=1)
    vp = init_vocos(jax.random.PRNGKey(0), vcfg)
    vocoder = jax.jit(lambda m: vocos_decode(vp, m, vcfg))
    service = TTSService(model, vocoder, max_batch=2, max_wait_us=2000, nfe_step=2)
    server = make_grpc_server(service, host="127.0.0.1", port=0)
    port = server.add_insecure_port("127.0.0.1:0")
    server.start()

    sr = 24000
    ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
    from scipy.io import wavfile

    buf = io.BytesIO()
    wavfile.write(buf, sr, (ref * 32767).astype(np.int16))
    yield {"port": port, "wav_bytes": buf.getvalue()}
    server.stop(0)


class TestGrpc:
    def test_health_and_synthesize(self, tiny_grpc, tmp_path):
        from korean_f5_tts_tpu.serving.grpc_server import GrpcTTSClient

        client = GrpcTTSClient(f"localhost:{tiny_grpc['port']}")
        assert client.health()["status"] == "ok"
        ref_path = str(tmp_path / "ref.wav")
        with open(ref_path, "wb") as f:
            f.write(tiny_grpc["wav_bytes"])
        audio, sr = client.synthesize(ref_path, "hello there", "a grpc test.",
                                      nfe_step=2)
        assert sr == 24000
        assert audio[:4] == b"RIFF" and len(audio) > 10_000

    def test_triton_protobuf_round_trip(self, tiny_grpc):
        """Real proto3 wire bytes through the inference.GRPCInferenceService
        endpoint — the reference client's protocol (client_grpc.py:273-295)."""
        from korean_f5_tts_tpu.serving.grpc_server import TritonGrpcClient

        client = TritonGrpcClient(f"localhost:{tiny_grpc['port']}")
        assert client.ready() is True
        sr = 24000
        ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
        wav, out_sr = client.synthesize(ref, "hello there", "a proto test.")
        assert out_sr == 24000
        assert wav.dtype == np.float32 and len(wav) > 4000
        assert np.isfinite(wav).all()


class TestProtoCodec:
    """Pure wire-format round-trips for the hand-rolled proto3 codec."""

    def test_request_round_trip_raw_contents(self):
        from korean_f5_tts_tpu.serving import proto as pb

        samples = np.linspace(-1, 1, 480, dtype=np.float32).reshape(1, -1)
        lens = np.array([[480]], np.int32)
        inputs = [
            pb.InferTensor("reference_wav", "FP32", samples.shape, samples),
            pb.InferTensor("reference_wav_len", "INT32", (1, 1), lens),
            pb.InferTensor("reference_text", "BYTES", (1, 1), ["안녕하세요"]),
            pb.InferTensor("target_text", "BYTES", (1, 1), ["ref parity"]),
        ]
        buf = pb.encode_model_infer_request("f5_tts", inputs,
                                            outputs=["waveform"],
                                            request_id="100000042")
        req = pb.decode_model_infer_request(buf)
        assert req["model_name"] == "f5_tts" and req["id"] == "100000042"
        assert req["outputs"] == ["waveform"]
        np.testing.assert_array_equal(req["inputs"]["reference_wav"], samples)
        assert int(np.asarray(req["inputs"]["reference_wav_len"]).reshape(-1)[0]) == 480
        assert req["inputs"]["reference_text"][0].decode() == "안녕하세요"
        assert req["inputs"]["target_text"][0].decode() == "ref parity"

    def test_response_round_trip(self):
        from korean_f5_tts_tpu.serving import proto as pb

        wav = np.sin(np.linspace(0, 30, 2400)).astype(np.float32)
        buf = pb.encode_model_infer_response(
            "f5_tts", [pb.InferTensor("waveform", "FP32", (1, len(wav)), wav)],
            request_id="7")
        resp = pb.decode_model_infer_response(buf)
        assert resp["id"] == "7"
        np.testing.assert_array_equal(
            np.asarray(resp["outputs"]["waveform"]).reshape(-1), wav)

    def test_varint_edge_cases(self):
        from korean_f5_tts_tpu.serving import proto as pb

        for v in (0, 1, 127, 128, 300, 2 ** 31 - 1, 2 ** 63 - 1):
            buf = pb._enc_varint(v)
            got, i = pb._dec_varint(buf, 0)
            assert got == v and i == len(buf)

    def test_decode_typed_contents_fallback(self):
        """Clients that ship data in InferTensorContents instead of raw."""
        from korean_f5_tts_tpu.serving import proto as pb

        # build a tensor header with packed fp32 contents (field 6)
        data = np.array([1.5, -2.25, 3.0], np.float32)
        contents = pb._tag(6, 2) + pb._enc_varint(data.nbytes) + data.tobytes()
        hdr = (pb.enc_str(1, "reference_wav") + pb.enc_str(2, "FP32")
               + pb.enc_packed_varints(3, (1, 3)) + pb.enc_msg(5, contents))
        buf = pb.enc_str(1, "m") + pb.enc_msg(5, hdr)
        req = pb.decode_model_infer_request(buf)
        np.testing.assert_array_equal(
            np.asarray(req["inputs"]["reference_wav"]).reshape(-1), data)


class TestBatchInfer:
    def test_batch_generate(self, tmp_path):
        import jax

        from korean_f5_tts_tpu.config import DiTConfig, ModelConfig
        from korean_f5_tts_tpu.infer.batch_infer import batch_generate
        from korean_f5_tts_tpu.infer.model import load_model
        from korean_f5_tts_tpu.utils.audio import save_wav

        arch = DiTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2,
                         mel_dim=100, text_num_embeds=40, text_dim=16, conv_layers=1)
        model = load_model(ModelConfig(name="tiny", backbone="DiT", arch=arch,
                                       tokenizer="custom"), use_n2gk_plus=False)
        model.vocab_char_map = {c: i for i, c in enumerate(" abcdefg.,")}
        sr = 24000
        ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
        ref_path = str(tmp_path / "ref.wav")
        save_wav(ref_path, ref, sr)
        rows = [{"utt": "u1", "text": "abc."}, {"utt": "u2", "text": "def."}]
        written = batch_generate(model, None, rows, str(tmp_path / "out"),
                                 ref_audio=ref_path, ref_text="abc abc",
                                 nfe_step=2, seed=0)
        assert len(written) == 2
        # idempotent: second run skips existing
        again = batch_generate(model, None, rows, str(tmp_path / "out"),
                               ref_audio=ref_path, ref_text="abc abc",
                               nfe_step=2, seed=0)
        assert again == []
