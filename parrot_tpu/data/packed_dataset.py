"""Packed pretraining dataset — byte-compatible with the reference's LITPKDS
binary format, torch-free.

This module is the *format spec* plus idiomatic generator-based readers; the
hot path for training is the C++ prefetching reader
(``native/packed_reader.cpp`` via :mod:`parrot_tpu.data.native_reader`),
which assembles batches off the Python thread. What is intentionally shared
with the reference is only the on-disk contract
(``lit_gpt/packed_dataset.py:24-25,83-97``):

    b"LITPKDS" | u64 version (=1) | u8 dtype code | u64 chunk_size
    | chunk_size tokens of the coded dtype

Files written here are interchangeable with reference-written corpora, and
per-host striping (``num_processes``/``process_rank``) assigns files the same
way the reference stripes across (process, dataloader-worker) shards — a
converted corpus shards identically.

TPU-first shape: readers are plain generators yielding numpy blocks; batching
is a host-side generator feeding fixed-shape ``[B, block]`` int32 arrays that
the training loop ``device_put``s against the mesh's batch sharding.
"""

from __future__ import annotations

import random
import struct
from pathlib import Path
from typing import Iterable, Iterator, Optional, Sequence

import numpy as np

dtypes = {1: np.uint8, 2: np.int8, 3: np.int16, 4: np.int32, 5: np.int64,
          6: np.float32, 7: np.float64, 8: np.uint16}

HDR_MAGIC = b"LITPKDS"
HDR_SIZE = 24  # bytes


def code(dtype) -> int:
    for k, v in dtypes.items():
        if v == dtype:
            return k
    raise ValueError(dtype)


def write_header(f, version: int, dtype, chunk_size: int) -> None:
    f.write(HDR_MAGIC)
    f.write(struct.pack("<Q", version))
    f.write(struct.pack("<B", code(dtype)))
    f.write(struct.pack("<Q", chunk_size))


def read_header(path) -> tuple[np.dtype, int]:
    with open(path, "rb") as f:
        magic = f.read(len(HDR_MAGIC))
        if magic != HDR_MAGIC:
            raise ValueError(f"{path}: not a LITPKDS file")
        (version,) = struct.unpack("<Q", f.read(8))
        if version != 1:
            raise ValueError(f"{path}: unsupported version {version}")
        (dtype_code,) = struct.unpack("<B", f.read(1))
        (chunk_size,) = struct.unpack("<Q", f.read(8))
    return dtypes[dtype_code], chunk_size


def write_chunk(path, tokens: np.ndarray, chunk_size: int, sep_token: int) -> None:
    """Write one LITPKDS file: ``tokens`` padded with ``sep_token`` to
    ``chunk_size``."""
    assert tokens.ndim == 1 and len(tokens) <= chunk_size
    with open(path, "wb") as f:
        write_header(f, 1, tokens.dtype, chunk_size)
        f.write(tokens.tobytes(order="C"))
        pad = chunk_size - len(tokens)
        if pad:
            f.write(np.full(pad, sep_token, tokens.dtype).tobytes(order="C"))


def read_chunk(path) -> np.ndarray:
    """Read one LITPKDS file's payload as a numpy array (mmap-backed)."""
    dtype, chunk_size = read_header(path)
    return np.memmap(path, mode="r", dtype=dtype, offset=HDR_SIZE, shape=(chunk_size,))


class PackedDatasetBuilder:
    """Token stream -> fixed-size chunk files.

    Appended arrays accumulate in a pending list; every full ``chunk_size``
    span is flushed to its own numbered file, and :meth:`write_reminder` pads
    the tail with ``sep_token``. Output bytes match the reference builder
    file-for-file (a chunk is held until the stream strictly exceeds it, so
    exact-fill + reminder produces the same file count).
    """

    def __init__(self, outdir, prefix, chunk_size, sep_token, dtype="auto",
                 vocab_size: Optional[int] = None):
        if dtype == "auto":
            if vocab_size is None:
                raise ValueError("vocab_size cannot be None when dtype='auto'")
            self._dtype = np.uint16 if vocab_size < 65500 else np.int32
        else:
            self._dtype = dtype
        self._outdir = Path(outdir)
        self._prefix = prefix
        self._chunk_size = chunk_size
        self._sep_token = sep_token
        self._pending: list[np.ndarray] = []
        self._pending_len = 0
        self._filenames: list[str] = []

    @property
    def dtype(self):
        return self._dtype

    @property
    def filenames(self) -> list[str]:
        return self._filenames.copy()

    def _flush(self, tokens: np.ndarray) -> None:
        path = self._outdir / f"{self._prefix}_{len(self._filenames):010d}.bin"
        write_chunk(path, tokens, self._chunk_size, self._sep_token)
        self._filenames.append(str(path))

    def add_array(self, arr: np.ndarray) -> None:
        self._pending.append(np.asarray(arr, dtype=self._dtype))
        self._pending_len += len(self._pending[-1])
        if self._pending_len <= self._chunk_size:
            return
        flat = np.concatenate(self._pending)
        n_full = len(flat) // self._chunk_size
        # hold an exactly-full chunk for the next add (or the reminder)
        if len(flat) % self._chunk_size == 0:
            n_full -= 1
        for i in range(n_full):
            self._flush(flat[i * self._chunk_size:(i + 1) * self._chunk_size])
        tail = flat[n_full * self._chunk_size:]
        self._pending = [tail]
        self._pending_len = len(tail)

    def write_reminder(self) -> None:
        flat = (np.concatenate(self._pending) if self._pending
                else np.empty(0, self._dtype))
        self._flush(flat[: self._chunk_size])
        self._pending, self._pending_len = [], 0


# ---------------------------------------------------------------------------
# Readers (generators)
# ---------------------------------------------------------------------------


def shard_filenames(filenames: Sequence, num_shards: int, shard_id: int) -> list[str]:
    """Striped file assignment; drops the ragged tail so every shard sees the
    same file count (matches the reference's worker striping)."""
    files = [str(f) for f in filenames]
    usable = len(files) // num_shards * num_shards
    return files[shard_id:usable:num_shards]


def iter_blocks(
    filenames: Sequence,
    n_chunks: int,
    block_size: int,
    *,
    seed: int = 12345,
    shuffle: bool = True,
    wrap: bool = False,
) -> Iterator[np.ndarray]:
    """Yield ``[block_size]`` int64 blocks from LITPKDS files.

    ``n_chunks`` files are mmapped at a time and their blocks yielded in a
    seeded random order (or sequentially); ``wrap=True`` restarts from the
    first file for infinite epochs.
    """
    files = [str(f) for f in filenames]
    if not files:
        return
    dtype, chunk_size = read_header(files[0])
    blocks_per_chunk = chunk_size // block_size
    rng = np.random.default_rng(seed) if shuffle else None
    n_chunks = min(n_chunks, len(files))

    start = 0
    while True:
        if start + n_chunks > len(files):
            if not wrap:
                return
            start = 0
        group = files[start : start + n_chunks]
        start += n_chunks
        maps = [np.memmap(f, mode="r", dtype=dtype, offset=HDR_SIZE,
                          shape=(chunk_size,)) for f in group]
        n = len(group) * blocks_per_chunk
        order = rng.permutation(n) if rng is not None else np.arange(n)
        for b in order:
            c, o = divmod(int(b), blocks_per_chunk)
            lo = o * block_size
            yield np.asarray(maps[c][lo : lo + block_size]).astype(np.int64)
        for m in maps:
            if hasattr(m, "_mmap"):
                m._mmap.close()


def iter_mixture(datasets: Sequence[Iterable], seed: int,
                 weights: Optional[Sequence[float]] = None) -> Iterator:
    """Weighted random mixture of block iterators — e.g. the LLaMA-1
    RedPajama source proportions (``pretrain/redpajama.py:48-56``)."""
    iters = [iter(d) for d in datasets]
    if weights is None:
        weights = [1.0 / len(iters)] * len(iters)
    rng = random.Random(seed)
    while True:
        (chosen,) = rng.choices(iters, weights=weights, k=1)
        try:
            yield next(chosen)
        except StopIteration:
            # a finite (wrap=False) source ran dry: end the mixture cleanly
            # instead of letting PEP 479 turn this into a RuntimeError
            return


def batch_iterator(
    dataset, batch_size: int, *, drop_last: bool = True
) -> Iterator[np.ndarray]:
    """Group per-block samples into fixed-shape ``[B, block]`` int32 batches —
    the static-shape feed XLA requires (``finetune/full.py:247-248``)."""
    batch = []
    for sample in dataset:
        batch.append(sample)
        if len(batch) == batch_size:
            yield np.stack(batch).astype(np.int32)
            batch = []
    if batch and not drop_last:
        yield np.stack(batch).astype(np.int32)


# ---------------------------------------------------------------------------
# Thin re-iterable views over the generators (API-compat surface)
# ---------------------------------------------------------------------------


class PackedDataset:
    """Re-iterable view: each ``iter()`` restarts :func:`iter_blocks` over
    this host's file stripe."""

    def __init__(self, filenames: Sequence, n_chunks: int, block_size: int,
                 seed: int = 12345, shuffle: bool = True, wrap: bool = False,
                 num_processes: int = 1, process_rank: int = 0):
        self._files = shard_filenames(filenames, num_processes, process_rank)
        self._kw = dict(n_chunks=n_chunks, block_size=block_size, seed=seed,
                        shuffle=shuffle, wrap=wrap)

    def __iter__(self) -> Iterator[np.ndarray]:
        return iter_blocks(self._files, **self._kw)


class CombinedDataset:
    """Re-iterable weighted mixture (each ``iter()`` restarts the sources)."""

    def __init__(self, datasets, seed, weights=None):
        self._datasets = datasets
        self._seed = seed
        self._weights = weights

    def __iter__(self) -> Iterator:
        return iter_mixture(self._datasets, self._seed, self._weights)
