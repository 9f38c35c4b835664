"""ctypes bindings for the native host components (csrc/).

* :class:`HostReplayStore` — unbounded host-side archive of training
  examples with the reference's binary dataset format
  (csrc/replay_store.cc; role of prioritized_replay.h:319-354).
* :class:`ReferenceRng` — the reference's exact ``std::mt19937`` +
  libstdc++ distributions (csrc/refrng.cc) for fixed-seed parity.

The shared library is built on demand with ``make`` (g++ only, no
external deps).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_CSRC = pathlib.Path(__file__).resolve().parents[2] / "csrc"
_LIB_PATH = _CSRC / "librebel_host.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        # Serialize the on-demand build across processes (pytest-xdist,
        # the multi-process launcher): the loser of the race must not
        # dlopen a half-written .so.
        import fcntl

        lock_path = _CSRC / ".build.lock"
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            try:
                if not _LIB_PATH.exists():
                    subprocess.run(
                        ["make", "-C", str(_CSRC)], check=True,
                        capture_output=True,
                    )
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)
    lib = ctypes.CDLL(str(_LIB_PATH))
    # replay store
    lib.replay_store_create.restype = ctypes.c_void_p
    lib.replay_store_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.replay_store_destroy.argtypes = [ctypes.c_void_p]
    lib.replay_store_size.restype = ctypes.c_int64
    lib.replay_store_size.argtypes = [ctypes.c_void_p]
    lib.replay_store_append.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.replay_store_read.restype = ctypes.c_int64
    lib.replay_store_read.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.replay_store_save.restype = ctypes.c_int64
    lib.replay_store_save.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
    ]
    lib.replay_store_load.restype = ctypes.c_int64
    lib.replay_store_load.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
    ]
    # refrng
    lib.refrng_create.restype = ctypes.c_void_p
    lib.refrng_create.argtypes = [ctypes.c_uint]
    lib.refrng_destroy.argtypes = [ctypes.c_void_p]
    lib.refrng_uniform_int.restype = ctypes.c_int
    lib.refrng_uniform_int.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    lib.refrng_uniform_float.restype = ctypes.c_float
    lib.refrng_uniform_float.argtypes = [ctypes.c_void_p]
    lib.refrng_discrete.restype = ctypes.c_int
    lib.refrng_discrete.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int,
    ]
    lib.refrng_raw.restype = ctypes.c_uint
    lib.refrng_raw.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class HostReplayStore:
    def __init__(self, query_size: int, num_hands: int):
        self._lib = _load()
        self.query_size = query_size
        self.num_hands = num_hands
        self._h = self._lib.replay_store_create(query_size, num_hands)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.replay_store_destroy(self._h)
            self._h = None

    def __len__(self) -> int:
        return int(self._lib.replay_store_size(self._h))

    def append(self, queries: np.ndarray, values: np.ndarray) -> None:
        q = np.ascontiguousarray(queries, np.float32)
        v = np.ascontiguousarray(values, np.float32)
        assert q.shape[1] == self.query_size and v.shape[1] == self.num_hands
        assert q.shape[0] == v.shape[0]
        self._lib.replay_store_append(self._h, _fptr(q), _fptr(v), q.shape[0])

    def read(self, start: int, n: int) -> tuple[np.ndarray, np.ndarray]:
        q = np.empty((n, self.query_size), np.float32)
        v = np.empty((n, self.num_hands), np.float32)
        got = self._lib.replay_store_read(self._h, start, n, _fptr(q), _fptr(v))
        return q[:got], v[:got]

    def save(self, path: str, stride: int = 1) -> int:
        n = self._lib.replay_store_save(
            self._h, str(path).encode(), stride
        )
        if n < 0:
            raise IOError(f"failed to save {path}")
        return int(n)

    def load(self, path: str, max_rows: int = 0, stride: int = 1) -> int:
        n = self._lib.replay_store_load(
            self._h, str(path).encode(), max_rows, stride
        )
        if n < 0:
            raise IOError(f"failed to load {path} (missing or wrong sizes)")
        return int(n)


class ReferenceRng:
    """Bit-exact ``std::mt19937`` + libstdc++ distributions."""

    def __init__(self, seed: int):
        self._lib = _load()
        self._h = self._lib.refrng_create(seed)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.refrng_destroy(self._h)
            self._h = None

    def uniform_int(self, lo: int, hi: int) -> int:
        """uniform_int_distribution<>(lo, hi) — inclusive."""
        return int(self._lib.refrng_uniform_int(self._h, lo, hi))

    def uniform_float(self) -> float:
        return float(self._lib.refrng_uniform_float(self._h))

    def discrete(self, weights) -> int:
        w = np.ascontiguousarray(weights, np.float64)
        return int(
            self._lib.refrng_discrete(
                self._h, w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                w.size,
            )
        )

    def raw(self) -> int:
        return int(self._lib.refrng_raw(self._h))
