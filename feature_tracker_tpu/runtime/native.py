"""ctypes bindings for the native host runtime (native/ftk_runtime.cpp).

The shared library is built on demand with ``build_native()`` (plain
``make`` in native/). Every entry point has a numpy fallback so the
Python package works without a compiler; the native path is the
production one (no GIL-bound per-pixel work, reusable across processes).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libftk_runtime.so")

_lock = threading.Lock()
_runtime = None


def build_native(force: bool = False) -> bool:
    """Build libftk_runtime.so with make; returns True on success."""
    if os.path.exists(_SO_PATH) and not force:
        return True
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR],
                       check=True, capture_output=True, timeout=120)
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def _load_lib():
    if not os.path.exists(_SO_PATH) and not build_native():
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.ftk_now_ns.restype = ctypes.c_uint64
    lib.ftk_ring_create.restype = ctypes.c_void_p
    lib.ftk_ring_create.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
    lib.ftk_ring_destroy.argtypes = [ctypes.c_void_p]
    lib.ftk_ring_size.restype = ctypes.c_size_t
    lib.ftk_ring_size.argtypes = [ctypes.c_void_p]
    lib.ftk_ring_push.restype = ctypes.c_int
    lib.ftk_ring_push.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_uint8),
                                  ctypes.c_size_t]
    lib.ftk_ring_pop.restype = ctypes.c_int
    lib.ftk_ring_pop.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_uint8),
                                 ctypes.c_size_t]
    lib.ftk_u8_to_f32.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                                  ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_size_t]
    lib.ftk_pyramid_down.argtypes = [ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_int64, ctypes.c_int64,
                                     ctypes.POINTER(ctypes.c_float)]
    lib.ftk_convert_and_pyramid.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.POINTER(ctypes.c_float))]
    return lib


class RingBuffer:
    """SPSC frame queue. Native-backed when available, else a deque."""

    def __init__(self, capacity: int, frame_bytes: int, lib=None):
        self._lib = lib
        self._frame_bytes = frame_bytes
        if lib is not None:
            self._handle = lib.ftk_ring_create(capacity, frame_bytes)
            if not self._handle:
                raise MemoryError("ftk_ring_create failed")
        else:
            from collections import deque
            self._capacity = capacity
            self._dq = deque()

    def push(self, frame: np.ndarray) -> bool:
        buf = np.ascontiguousarray(frame, dtype=np.uint8)
        assert buf.nbytes == self._frame_bytes
        if self._lib is not None:
            ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
            return bool(self._lib.ftk_ring_push(self._handle, ptr,
                                                buf.nbytes))
        if len(self._dq) >= self._capacity:
            return False
        self._dq.append(buf.copy())
        return True

    def pop(self, shape) -> np.ndarray | None:
        if self._lib is not None:
            out = np.empty(self._frame_bytes, np.uint8)
            ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
            if not self._lib.ftk_ring_pop(self._handle, ptr, out.nbytes):
                return None
            return out.reshape(shape)
        if not self._dq:
            return None
        return self._dq.popleft().reshape(shape)

    def __len__(self):
        if self._lib is not None:
            return int(self._lib.ftk_ring_size(self._handle))
        return len(self._dq)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and self._handle:
            self._lib.ftk_ring_destroy(self._handle)
            self._handle = None


class NativeRuntime:
    """Facade over the native library with numpy fallbacks."""

    def __init__(self):
        self.lib = _load_lib()

    @property
    def is_native(self) -> bool:
        return self.lib is not None

    def now_ns(self) -> int:
        if self.lib is not None:
            return int(self.lib.ftk_now_ns())
        import time
        return time.monotonic_ns()

    def ring_buffer(self, capacity: int, frame_bytes: int) -> RingBuffer:
        return RingBuffer(capacity, frame_bytes, self.lib)

    def convert_and_pyramid(self, frame_u8: np.ndarray, levels: int):
        """uint8 [H, W] -> tuple of float32 pyramid levels, half
        resolution per level with integer truncation (identical to
        ops.pyramid.build_pyramid(quantize=True))."""
        h, w = frame_u8.shape
        shapes = [(h, w)]
        for _ in range(levels - 1):
            h, w = h // 2, w // 2
            shapes.append((h, w))
        if self.lib is None:
            out = [np.asarray(frame_u8, np.float32)]
            for _ in range(levels - 1):
                a = out[-1]
                h2, w2 = (a.shape[0] // 2) * 2, (a.shape[1] // 2) * 2
                down = (a[0:h2:2, 0:w2:2] + a[1:h2:2, 0:w2:2]
                        + a[0:h2:2, 1:w2:2] + a[1:h2:2, 1:w2:2]) * 0.25
                out.append(np.floor(down))
            return tuple(out)

        buf = np.ascontiguousarray(frame_u8, np.uint8)
        outs = [np.empty(s, np.float32) for s in shapes]
        ptrs = (ctypes.POINTER(ctypes.c_float) * levels)(
            *[o.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
              for o in outs])
        self.lib.ftk_convert_and_pyramid(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            buf.shape[0], buf.shape[1], levels, ptrs)
        return tuple(outs)


def get_runtime() -> NativeRuntime:
    global _runtime
    with _lock:
        if _runtime is None:
            _runtime = NativeRuntime()
        return _runtime
