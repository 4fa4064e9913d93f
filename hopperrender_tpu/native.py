"""ctypes bindings to the C++ native runtime (native/frame_ring.cpp).

The native layer covers the roles the reference implements in C++ around its GPU
engine: the fixed-size sample pool + transport (ref: CustomAllocator.cpp:23-113,
HopperRender.cpp:529-541) and CPU-side stride compaction (ref:
HopperRender.cpp:740-758,851-865). Pure-NumPy fallbacks keep everything working
when no C++ toolchain is available; `is_native()` reports which path is active.

Builds lazily with `make -C native` on first use (g++ is in the image).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from hopperrender_tpu.utils.logging import get_logger

log = get_logger("native")

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO_ROOT = os.path.dirname(_PKG_DIR)
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_NAME = "libhrt_native.so"
_SO_PATH = os.path.join(_NATIVE_DIR, _SO_NAME)


def _find_so() -> str | None:
    """Locate the native library: explicit override, the pip-installed copy
    (setup.py bundles it into the package dir), then the repo-layout build
    output. Returns None if none exists yet (the caller may then build)."""
    for cand in (os.environ.get("HRT_NATIVE_LIB"),
                 os.path.join(_PKG_DIR, _SO_NAME),
                 _SO_PATH):
        if cand and os.path.exists(cand):
            return cand
    return None

_lib = None
_lib_lock = threading.Lock()
_META_WORDS = 4


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True,
                       timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        log.warning("native build failed (%s); using NumPy fallbacks", e)
        return False


def _load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        so = _find_so()
        if so is None:
            if not _build():
                _lib = False
                return _lib
            so = _find_so()
            if so is None:
                log.warning("native build produced no %s; using NumPy "
                            "fallbacks", _SO_NAME)
                _lib = False
                return _lib
        try:
            lib = ctypes.CDLL(so)
        except OSError as e:
            log.warning("failed to load %s (%s); using NumPy fallbacks", so, e)
            _lib = False
            return _lib
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64 = ctypes.c_int64
        i64p = ctypes.POINTER(i64)
        lib.hrt_unpack.argtypes = [u8p, i64, i64, i64, i64, u8p, u8p]
        lib.hrt_pack.argtypes = [u8p, u8p, i64, i64, i64, i64, u8p]
        lib.hrt_ring_create.restype = ctypes.c_void_p
        lib.hrt_ring_create.argtypes = [i64, i64]
        lib.hrt_ring_destroy.argtypes = [ctypes.c_void_p]
        lib.hrt_ring_size.argtypes = [ctypes.c_void_p]
        lib.hrt_ring_size.restype = i64
        lib.hrt_ring_close.argtypes = [ctypes.c_void_p]
        lib.hrt_ring_closed.argtypes = [ctypes.c_void_p]
        lib.hrt_ring_closed.restype = ctypes.c_int
        lib.hrt_ring_push.argtypes = [ctypes.c_void_p, u8p, i64, i64p, i64]
        lib.hrt_ring_push.restype = ctypes.c_int
        lib.hrt_ring_pop.argtypes = [ctypes.c_void_p, u8p, i64p, i64]
        lib.hrt_ring_pop.restype = i64
        _lib = lib
        return _lib


def is_native() -> bool:
    return bool(_load())


def _u8view(a: np.ndarray):
    return a.view(np.uint8).ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def unpack(buf: np.ndarray | bytes, height: int, width: int,
           stride: int | None = None, *, is_hdr: bool = False):
    """Strided packed frame -> tight (y, uv) planes. Native memcpy when available."""
    stride = stride or width
    dtype = np.uint16 if is_hdr else np.uint8
    lib = _load()
    flat = np.frombuffer(buf, dtype=dtype) if not isinstance(buf, np.ndarray) \
        else np.ascontiguousarray(buf).view(dtype).ravel()
    need = height * stride + (height // 2) * stride
    if flat.size < need:
        raise ValueError(f"buffer too small: {flat.size} < {need} samples")
    if not lib:
        from hopperrender_tpu.vio import nv12

        return nv12.unpack(flat, height, width, stride, is_hdr=is_hdr)
    y = np.empty((height, width), dtype)
    uv = np.empty((height // 2, width), dtype)
    lib.hrt_unpack(_u8view(flat), height, width, stride, flat.itemsize,
                   _u8view(y), _u8view(uv))
    return y, uv


def pack(y: np.ndarray, uv: np.ndarray, stride: int | None = None) -> np.ndarray:
    """Tight planes -> packed frame with output stride."""
    height, width = y.shape
    stride = stride or width
    lib = _load()
    if not lib:
        from hopperrender_tpu.vio import nv12

        return nv12.pack(y, uv, stride)
    out = np.empty((height + height // 2) * stride, y.dtype)
    lib.hrt_pack(_u8view(np.ascontiguousarray(y)), _u8view(np.ascontiguousarray(uv)),
                 height, width, stride, y.dtype.itemsize, _u8view(out))
    return out


class FrameRing:
    """SPSC blocking frame queue backed by the native preallocated slab.

    The decode-thread -> engine-thread transport (sample-pool equivalent). Falls
    back to a Python deque + condition when the native library is unavailable.
    Payloads are opaque byte buffers + 4 int64 metadata words (pts, flags, ...).
    """

    def __init__(self, capacity: int, slot_bytes: int):
        self.capacity = capacity
        self.slot_bytes = slot_bytes
        lib = _load()
        self._lib = lib if lib else None
        if self._lib:
            self._ring = ctypes.c_void_p(lib.hrt_ring_create(capacity, slot_bytes))
            if not self._ring:
                raise MemoryError("hrt_ring_create failed")
        else:
            import collections

            self._dq = collections.deque()
            self._cond = threading.Condition()
            self._closed = False

    # timeout semantics: None = block forever, 0 = non-blocking, else seconds.
    def push(self, data: np.ndarray | bytes, meta: tuple[int, int, int, int] = (0, 0, 0, 0),
             timeout: float | None = None) -> bool:
        arr = np.frombuffer(data, np.uint8) if not isinstance(data, np.ndarray) \
            else np.ascontiguousarray(data).view(np.uint8).ravel()
        if self._lib:
            m = (ctypes.c_int64 * _META_WORDS)(*meta)
            tmo = -1 if timeout is None else int(timeout * 1000)
            rc = self._lib.hrt_ring_push(
                self._ring, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                arr.size, m, tmo)
            if rc == -3:
                raise ValueError(f"payload {arr.size} > slot {self.slot_bytes}")
            if rc == -2:
                raise RuntimeError("ring closed")
            return rc == 0
        with self._cond:
            if timeout == 0 and len(self._dq) >= self.capacity:
                return False
            ok = self._cond.wait_for(
                lambda: len(self._dq) < self.capacity or self._closed, timeout)
            if self._closed:
                raise RuntimeError("ring closed")
            if not ok:
                return False
            self._dq.append((bytes(arr.tobytes()), tuple(meta)))
            self._cond.notify_all()
            return True

    def pop(self, timeout: float | None = None):
        """Returns (payload bytes, meta tuple) or None on timeout / closed+drained."""
        if self._lib:
            buf = np.empty(self.slot_bytes, np.uint8)
            m = (ctypes.c_int64 * _META_WORDS)()
            tmo = -1 if timeout is None else int(timeout * 1000)
            size = self._lib.hrt_ring_pop(
                self._ring, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), m, tmo)
            if size < 0:
                return None
            return buf[:size].tobytes(), tuple(m)
        with self._cond:
            ok = self._cond.wait_for(lambda: self._dq or self._closed, timeout)
            if not ok or not self._dq:
                return None
            item = self._dq.popleft()
            self._cond.notify_all()
            return item

    def __len__(self) -> int:
        if self._lib:
            return int(self._lib.hrt_ring_size(self._ring))
        with self._cond:
            return len(self._dq)

    def close(self) -> None:
        if self._lib:
            self._lib.hrt_ring_close(self._ring)
        else:
            with self._cond:
                self._closed = True
                self._cond.notify_all()

    def is_closed(self) -> bool:
        if self._lib:
            return bool(self._lib.hrt_ring_closed(self._ring))
        with self._cond:
            return self._closed

    def __del__(self):
        try:
            if getattr(self, "_lib", None) and getattr(self, "_ring", None):
                self._lib.hrt_ring_destroy(self._ring)
                self._ring = None
        except Exception:
            pass
