"""ctypes bindings for the native C++ serving runtime (native/f5_runtime.cpp).

Builds on first use (make -C native) and falls back to a pure-Python batcher
with identical semantics when a toolchain is unavailable — same API either
way, so the server code has one path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import time
from collections import deque

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libf5runtime.so"))

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.f5rt_batcher_create.restype = ctypes.c_void_p
    lib.f5rt_batcher_create.argtypes = [ctypes.c_int, ctypes.c_int64]
    lib.f5rt_batcher_destroy.argtypes = [ctypes.c_void_p]
    lib.f5rt_batcher_submit.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
    lib.f5rt_batcher_next.restype = ctypes.c_int
    lib.f5rt_batcher_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int64,
    ]
    lib.f5rt_batcher_close.argtypes = [ctypes.c_void_p]
    lib.f5rt_f32_to_i16.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
    ]
    lib.f5rt_rms.restype = ctypes.c_double
    lib.f5rt_rms.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.f5rt_crossfade.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return lib


class NativeBatcher:
    """Dynamic batching queue: groups request ids by duration bucket under
    (max_batch, max_wait_us) — Triton dynamic_batching parity."""

    def __init__(self, max_batch: int = 8, max_wait_us: int = 5_000):
        lib = _load_lib()
        self._lib = lib
        self.max_batch = max_batch
        if lib is not None:
            self._h = lib.f5rt_batcher_create(max_batch, max_wait_us)
        else:  # pure-python fallback
            self._h = None
            self._max_wait = max_wait_us / 1e6
            self._queues: dict[int, deque] = {}
            self._lock = threading.Condition()

    @property
    def is_native(self) -> bool:
        return self._h is not None

    def submit(self, request_id: int, bucket: int) -> None:
        if self._h is not None:
            self._lib.f5rt_batcher_submit(self._h, request_id, bucket)
            return
        with self._lock:
            self._queues.setdefault(bucket, deque()).append((request_id, time.monotonic()))
            self._lock.notify_all()

    def next_batch(self, timeout_us: int = 100_000):
        """-> (bucket, [request_ids]) or (None, []) on timeout / close."""
        if self._h is not None:
            ids = (ctypes.c_int64 * self.max_batch)()
            bucket = ctypes.c_int(0)
            n = self._lib.f5rt_batcher_next(self._h, ids, ctypes.byref(bucket),
                                            timeout_us)
            if n <= 0:
                return None, []
            return bucket.value, [ids[i] for i in range(n)]
        deadline = time.monotonic() + timeout_us / 1e6
        with self._lock:
            while True:
                best, oldest = None, None
                for b, q in self._queues.items():
                    if q and (oldest is None or q[0][1] < oldest):
                        best, oldest = b, q[0][1]
                if best is not None:
                    q = self._queues[best]
                    waited = time.monotonic() - q[0][1]
                    if len(q) >= self.max_batch or waited >= self._max_wait:
                        n = min(self.max_batch, len(q))
                        return best, [q.popleft()[0] for _ in range(n)]
                    self._lock.wait(min(deadline, q[0][1] + self._max_wait)
                                    - time.monotonic())
                    continue
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    return None, []
                self._lock.wait(remaining)

    def close(self):
        if self._h is not None:
            self._lib.f5rt_batcher_close(self._h)

    def __del__(self):
        try:
            if self._h is not None and self._lib is not None:
                self._lib.f5rt_batcher_destroy(self._h)
        except Exception:
            pass


def f32_to_i16(wav: np.ndarray) -> np.ndarray:
    lib = _load_lib()
    wav = np.ascontiguousarray(wav, dtype=np.float32)
    if lib is None:
        return (np.clip(wav, -1, 1) * 32767.0).round().astype(np.int16)
    out = np.empty(wav.shape, np.int16)
    lib.f5rt_f32_to_i16(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        wav.size,
    )
    return out


def crossfade(a: np.ndarray, b: np.ndarray, n_fade: int) -> np.ndarray:
    lib = _load_lib()
    a = np.ascontiguousarray(a, dtype=np.float32)
    b = np.ascontiguousarray(b, dtype=np.float32)
    n_fade = min(n_fade, len(a), len(b))
    if lib is None:
        if n_fade <= 0:
            return np.concatenate([a, b])
        t = np.linspace(0.0, 1.0, n_fade, dtype=np.float32)
        mid = a[-n_fade:] * (1 - t) + b[:n_fade] * t
        return np.concatenate([a[:-n_fade], mid, b[n_fade:]])
    out = np.empty(len(a) + len(b) - n_fade, np.float32)
    lib.f5rt_crossfade(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(a),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(b),
        n_fade, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
