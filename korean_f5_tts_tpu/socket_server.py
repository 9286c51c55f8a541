"""Raw-TCP streaming TTS server + wav-writing worker.

Parity with reference `src/f5_tts/socket_server.py`: warm-up pass at startup
(`:122-136`), first-chunk shrinking for low first-byte latency (`:138-143`),
float32 PCM streamed over the socket with a b"END" sentinel (`:163-174`),
and a thread-safe queue worker that persists generated audio (`:32-69`).
"""

from __future__ import annotations

import argparse
import logging
import queue
import socket
import threading

import numpy as np

from korean_f5_tts_tpu.infer.utils_infer import infer_batch_process, preprocess_ref_audio_text
from korean_f5_tts_tpu.utils.audio import save_wav

logger = logging.getLogger(__name__)


class AudioFileWriterThread(threading.Thread):
    """Background thread draining audio chunks into a wav file (`:32-69`)."""

    def __init__(self, output_file: str, sample_rate: int):
        super().__init__(daemon=True)
        self.output_file = output_file
        self.sample_rate = sample_rate
        self.queue: queue.Queue = queue.Queue()
        self.stop_event = threading.Event()
        self.chunks: list[np.ndarray] = []

    def add_chunk(self, chunk: np.ndarray) -> None:
        self.queue.put(chunk)

    def run(self):
        while not self.stop_event.is_set() or not self.queue.empty():
            try:
                self.chunks.append(self.queue.get(timeout=0.1))
            except queue.Empty:
                continue
        if self.chunks:
            save_wav(self.output_file, np.concatenate(self.chunks), self.sample_rate)

    def stop(self):
        self.stop_event.set()


class TTSStreamingProcessor:
    def __init__(self, model_obj, vocoder, ref_audio: str, ref_text: str,
                 nfe_step: int = 16, sample_rate: int = 24_000):
        self.model = model_obj
        self.vocoder = vocoder
        self.nfe_step = nfe_step
        self.sample_rate = sample_rate
        (self.ref_wav, self.ref_sr), self.ref_text = preprocess_ref_audio_text(
            ref_audio, ref_text
        )
        self._warm_up()

    def _warm_up(self):
        """Compile + prime caches so first request is fast (`:122-136`)."""
        logger.info("warming up...")
        for _ in self.generate_stream("warm up text for the model."):
            pass
        logger.info("warm-up done")

    def generate_stream(self, text: str):
        """Yield (float32 pcm bytes) chunks; first chunks shrunk (`:138-143`)."""
        stream = infer_batch_process(
            (self.ref_wav, self.ref_sr), self.ref_text, [text], self.model,
            self.vocoder, nfe_step=self.nfe_step, streaming=True, chunk_size=2048,
        )
        first = True
        for chunk, _sr in stream:
            if first and len(chunk) > 512:
                # shrink the first package for faster playback start
                for j in range(0, len(chunk), 512):
                    yield np.asarray(chunk[j:j + 512], np.float32).tobytes()
                first = False
            else:
                yield np.asarray(chunk, np.float32).tobytes()


def handle_client(conn: socket.socket, processor: TTSStreamingProcessor):
    try:
        with conn:
            while True:
                data = conn.recv(1024)
                if not data:
                    break
                text = data.decode("utf-8").strip()
                if not text:
                    continue
                for pcm in processor.generate_stream(text):
                    conn.sendall(pcm)
                conn.sendall(b"END")
    except Exception:
        logger.exception("client handler failed")


def start_server(processor: TTSStreamingProcessor, host: str = "0.0.0.0",
                 port: int = 9998):
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(5)
    logger.info("socket server on %s:%d", host, port)
    try:
        while True:
            conn, _ = srv.accept()
            threading.Thread(target=handle_client, args=(conn, processor),
                             daemon=True).start()
    finally:
        srv.close()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=9998)
    p.add_argument("--model", default="F5TTS_v1_Base")
    p.add_argument("--ckpt_file", default=None)
    p.add_argument("--vocab_file", default=None)
    p.add_argument("--ref_audio", required=True)
    p.add_argument("--ref_text", required=True)
    p.add_argument("--nfe_step", type=int, default=16)
    p.add_argument("--device", default=None)
    args = p.parse_args(argv)
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)
    from korean_f5_tts_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    logging.basicConfig(level=logging.INFO)

    from korean_f5_tts_tpu.api import load_vocoder
    from korean_f5_tts_tpu.config import preset_model_config
    from korean_f5_tts_tpu.infer.model import load_model

    model_obj = load_model(preset_model_config(args.model), ckpt_path=args.ckpt_file,
                           vocab_file=args.vocab_file)
    vocoder = load_vocoder("vocos")
    processor = TTSStreamingProcessor(model_obj, vocoder, args.ref_audio,
                                      args.ref_text, nfe_step=args.nfe_step)
    start_server(processor, args.host, args.port)


if __name__ == "__main__":
    main()
