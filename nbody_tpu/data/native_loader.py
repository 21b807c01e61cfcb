"""ctypes binding for the native mmap .npy loader (native/npy_loader.cc).

Provides NpyLoader (mmap + multithreaded row gather) and PrefetchingSampler
(background-thread prefetch of the next minibatch while the device computes
the current step) — the native replacement for the reference's
np.load-everything + per-step fancy-index host copies (utils.py:559-621).

The shared library is auto-built with `make` on first use if g++ is
available; callers should catch NativeLoaderUnavailable and fall back to
numpy — `data.dataset.make_dataset` does exactly that when `--streaming`
is requested but the library or a real cube file is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libnpy_loader.so")


class NativeLoaderUnavailable(RuntimeError):
    pass


_lib = None


def _build_library():
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "libnpy_loader.so"],
                       check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", str(e))
        raise NativeLoaderUnavailable(f"cannot build native loader: {detail}")


def _load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        _build_library()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.npy_open.restype = ctypes.c_void_p
    lib.npy_open.argtypes = [ctypes.c_char_p]
    lib.npy_ndim.restype = ctypes.c_int
    lib.npy_ndim.argtypes = [ctypes.c_void_p]
    lib.npy_shape.restype = None
    lib.npy_shape.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
    lib.npy_gather.restype = ctypes.c_int
    lib.npy_gather.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
                               ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                               ctypes.c_int]
    lib.npy_prefetch.restype = ctypes.c_int
    lib.npy_prefetch.argtypes = lib.npy_gather.argtypes
    lib.npy_prefetch_wait.restype = ctypes.c_int
    lib.npy_prefetch_wait.argtypes = [ctypes.c_void_p]
    lib.npy_close.restype = None
    lib.npy_close.argtypes = [ctypes.c_void_p]
    lib.npy_last_error.restype = ctypes.c_char_p
    lib.npy_last_error.argtypes = []
    _lib = lib
    return lib


class NpyLoader:
    """mmap-backed float32 .npy file with native row gather."""

    def __init__(self, path: str, num_threads: int = 4):
        self._lib = _load_library()
        self._handle = self._lib.npy_open(path.encode())
        if not self._handle:
            raise NativeLoaderUnavailable(
                self._lib.npy_last_error().decode() or f"cannot open {path}")
        self.num_threads = num_threads
        nd = self._lib.npy_ndim(self._handle)
        buf = (ctypes.c_int64 * nd)()
        self._lib.npy_shape(self._handle, buf)
        self.shape = tuple(int(x) for x in buf)
        self._row_shape = self.shape[1:]

    def _check(self, rc: int):
        if rc != 0:
            raise RuntimeError(self._lib.npy_last_error().decode())

    def _idx_array(self, indices) -> np.ndarray:
        return np.ascontiguousarray(np.asarray(indices, dtype=np.int64))

    def gather(self, indices: Sequence[int]) -> np.ndarray:
        """Rows at `indices` -> (len(indices), *shape[1:]) float32."""
        idx = self._idx_array(indices)
        out = np.empty((len(idx),) + self._row_shape, np.float32)
        self._check(self._lib.npy_gather(
            self._handle, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.num_threads))
        return out

    def prefetch(self, indices: Sequence[int]) -> np.ndarray:
        """Start a background gather; returns the buffer being filled —
        do not read it before prefetch_wait()."""
        idx = self._idx_array(indices)
        out = np.empty((len(idx),) + self._row_shape, np.float32)
        self._check(self._lib.npy_prefetch(
            self._handle, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.num_threads))
        self._pending = out
        return out

    def prefetch_wait(self) -> np.ndarray:
        self._check(self._lib.npy_prefetch_wait(self._handle))
        out = self._pending
        self._pending = None
        return out

    def close(self):
        if self._handle:
            self._lib.npy_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class PrefetchingSampler:
    """Random minibatch stream with one-batch-ahead native prefetch.

    Usage:
        sampler = PrefetchingSampler(loader, train_indices, batch, seed)
        for _ in range(steps):
            batch = sampler.next()      # already in RAM: prefetched during
                                        # the previous device step
    """

    def __init__(self, loader: NpyLoader, indices: np.ndarray, batch_size: int,
                 seed: int = 0):
        self.loader = loader
        self.indices = np.asarray(indices, np.int64)
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.loader.prefetch(self._draw())

    def _draw(self) -> np.ndarray:
        return self.rng.choice(self.indices, self.batch_size, replace=False)

    def next(self) -> np.ndarray:
        batch = self.loader.prefetch_wait()
        self.loader.prefetch(self._draw())
        return batch
