"""ctypes bindings for the native C++ packed-dataset reader.

TPU-native answer to the reference's multi-worker ``DataLoader`` feeding
``PackedDataset`` (``lit_gpt/packed_dataset.py:28-212`` + worker sharding
``:41-58``): instead of forked Python workers, one C++ producer thread
(``native/packed_reader.cpp``) mmaps LITPKDS chunk files, samples shuffled
blocks, and assembles ready ``[batch, block]`` int32 batches behind a bounded
queue. The host Python loop only memcpys the next batch — tokenization-free
pretraining input never touches the GIL.

No pybind11 in this environment; the C ABI (``ppd_open/ppd_next/ppd_close``)
is consumed via ctypes. ``build()`` compiles the shared library on demand with
the repo Makefile; callers fall back to the pure-Python iterator when neither
the library nor a toolchain is present.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libpacked_reader.so"

_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.ppd_open.restype = ctypes.c_void_p
    lib.ppd_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),  # paths
        ctypes.c_int,                     # n_files
        ctypes.c_long,                    # block_size
        ctypes.c_int,                     # n_chunks
        ctypes.c_int,                     # batch_size
        ctypes.c_ulong,                   # seed
        ctypes.c_int,                     # shuffle
        ctypes.c_int,                     # wrap
        ctypes.c_int,                     # prefetch_depth
    ]
    lib.ppd_next.restype = ctypes.c_int
    lib.ppd_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32)]
    lib.ppd_block_size.restype = ctypes.c_long
    lib.ppd_block_size.argtypes = [ctypes.c_void_p]
    lib.ppd_close.restype = None
    lib.ppd_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def is_available() -> bool:
    """True when the shared library exists and loads."""
    return _load() is not None


def build() -> bool:
    """Compile ``native/libpacked_reader.so`` via make; True on success."""
    try:
        proc = subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            capture_output=True, text=True, timeout=120,
        )
    except (OSError, subprocess.TimeoutExpired):
        return False
    if proc.returncode != 0:
        return False
    return is_available()


class NativePackedReader:
    """Iterator over prefetched ``[batch_size, block_size]`` int32 batches.

    Mirrors ``PackedDataset(files, n_chunks, block_size, shuffle, wrap, seed)``
    batched ``batch_size`` blocks at a time; iteration ends (StopIteration)
    when the corpus is exhausted and ``wrap`` is False.
    """

    def __init__(
        self,
        files: Sequence[str],
        block_size: int,
        batch_size: int,
        n_chunks: int = 10,
        shuffle: bool = True,
        wrap: bool = False,
        seed: int = 12345,
        prefetch_depth: int = 4,
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native packed reader not built; call native_reader.build()"
            )
        if not files:
            raise RuntimeError("no packed chunk files given")
        self._lib = lib
        self.block_size = int(block_size)
        self.batch_size = int(batch_size)
        encoded = [str(f).encode() for f in files]
        arr = (ctypes.c_char_p * len(encoded))(*encoded)
        self._handle = lib.ppd_open(
            arr, len(encoded), self.block_size, int(n_chunks),
            self.batch_size, int(seed) & 0xFFFFFFFFFFFFFFFF,
            1 if shuffle else 0, 1 if wrap else 0, int(prefetch_depth),
        )
        if not self._handle:
            raise RuntimeError(f"failed to open packed corpus: {files[0]}")
        self._buf = np.empty((self.batch_size, self.block_size), dtype=np.int32)

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._handle is None:
            raise StopIteration
        ok = self._lib.ppd_next(
            self._handle, self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        )
        if not ok:
            self.close()
            raise StopIteration
        return self._buf.copy()

    def close(self) -> None:
        if self._handle is not None:
            self._lib.ppd_close(self._handle)
            self._handle = None

    def __del__(self):  # best-effort; close() is the real API
        try:
            self.close()
        except Exception:
            pass
