"""ctypes bindings for the C++ runtime components (native/rama_native.cpp).

Build with `make -C native` (produces rama_tpu/_native.so). Everything here
degrades gracefully: `available()` is False when the library isn't built and
callers fall back to the pure-Python paths.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).parent / "_native.so"
_lib = None


def _try_build() -> bool:
    """Best-effort `make -C native` so fresh clones get the fast paths."""
    import subprocess

    src = Path(__file__).parent.parent / "native"
    if not (src / "Makefile").exists():
        return False
    try:
        subprocess.run(["make", "-C", str(src)], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        return False
    return _LIB_PATH.exists()


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _try_build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))

    lib.tokenizer_create.restype = ctypes.c_void_p
    lib.tokenizer_create.argtypes = [ctypes.c_char_p, ctypes.c_int32]
    lib.tokenizer_free.argtypes = [ctypes.c_void_p]
    lib.tokenizer_encode.restype = ctypes.c_int32
    lib.tokenizer_encode.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                     ctypes.c_int32,
                                     ctypes.POINTER(ctypes.c_int32),
                                     ctypes.c_int32]

    for name, ctype in (("transpose_f32", ctypes.c_float),
                        ("transpose_i8", ctypes.c_int8)):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [ctypes.POINTER(ctype), ctypes.POINTER(ctype),
                       ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                       ctypes.c_int32]

    lib.pages_create.restype = ctypes.c_void_p
    lib.pages_create.argtypes = [ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
    lib.pages_free.argtypes = [ctypes.c_void_p]
    lib.pages_available.restype = ctypes.c_int32
    lib.pages_available.argtypes = [ctypes.c_void_p]
    lib.pages_reserve.restype = ctypes.c_int32
    lib.pages_reserve.argtypes = [ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32]
    lib.pages_release.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.pages_table.restype = ctypes.c_int32
    lib.pages_table.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeTokenizer:
    """Heap-based BPE encoder with reference merge semantics (O(n log n))."""

    def __init__(self, path: str | Path, vocab_size: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not built (make -C native)")
        self._lib = lib
        self._h = lib.tokenizer_create(str(path).encode(), vocab_size)
        if not self._h:
            raise IOError(f"failed to parse tokenizer file {path}")

    def encode(self, s: str, strict: bool = True) -> list[int]:
        data = s.encode("utf-8")
        cap = max(16, len(data) + 8)
        buf = (ctypes.c_int32 * cap)()
        n = self._lib.tokenizer_encode(self._h, data, int(strict), buf, cap)
        if n < 0:
            raise KeyError("character not in vocabulary")
        return list(buf[:n])

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.tokenizer_free(self._h)
            self._h = None


def transpose_batched(src: np.ndarray, n_threads: int | None = None) -> np.ndarray:
    """(L, R, C) (or (R, C)) -> contiguous (.., C, R) via the threaded C++
    blocked transpose; falls back to numpy when the library is missing."""
    lib = _load()
    squeeze = src.ndim == 2
    a = src[None] if squeeze else src
    if lib is None or a.dtype not in (np.float32, np.int8):
        out = np.ascontiguousarray(a.transpose(0, 2, 1))
        return out[0] if squeeze else out
    a = np.ascontiguousarray(a)
    l, r, c = a.shape
    out = np.empty((l, c, r), dtype=a.dtype)
    nt = n_threads or min(os.cpu_count() or 1, 8)
    fn = lib.transpose_f32 if a.dtype == np.float32 else lib.transpose_i8
    ptr = ctypes.POINTER(ctypes.c_float if a.dtype == np.float32 else ctypes.c_int8)
    fn(a.ctypes.data_as(ptr), out.ctypes.data_as(ptr), l, r, c, nt)
    return out[0] if squeeze else out


class PageAllocator:
    """Free-list page allocator + per-slot page tables for the paged KV cache."""

    def __init__(self, num_pages: int, page_size: int, max_slots: int):
        lib = _load()
        self._lib = lib
        if lib is None:
            # pure-python fallback with identical behavior
            self._h = None
            self._free = list(range(num_pages - 1, -1, -1))
            self._tables = [[] for _ in range(max_slots)]
            self.page_size = page_size
        else:
            self._h = lib.pages_create(num_pages, page_size, max_slots)
            self.page_size = page_size

    def available(self) -> int:
        if self._h is None:
            return len(self._free)
        return self._lib.pages_available(self._h)

    def reserve(self, slot: int, seq_len: int) -> int:
        """Grow slot to >= seq_len positions. Returns page count or -1."""
        if self._h is None:
            need = -(-seq_len // self.page_size)
            have = len(self._tables[slot])
            if need <= have:
                return have
            if len(self._free) < need - have:
                return -1
            for _ in range(need - have):
                self._tables[slot].append(self._free.pop())
            return need
        return self._lib.pages_reserve(self._h, slot, seq_len)

    def release(self, slot: int) -> None:
        if self._h is None:
            self._free.extend(reversed(self._tables[slot]))
            self._tables[slot].clear()
            return
        self._lib.pages_release(self._h, slot)

    def table(self, slot: int) -> list[int]:
        if self._h is None:
            return list(self._tables[slot])
        cap = 4096
        buf = (ctypes.c_int32 * cap)()
        n = self._lib.pages_table(self._h, slot, buf, cap)
        return list(buf[:n])

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.pages_free(self._h)
            self._h = None
