"""Packed pretraining dataset — byte-compatible with the reference's LITPKDS
binary format (``lit_gpt/packed_dataset.py``), torch-free.

Format (``packed_dataset.py:24-25,83-97``): ``b"LITPKDS"`` magic, u64 version
(=1), u8 dtype code, u64 chunk_size, then ``chunk_size`` tokens; files written
by :class:`PackedDatasetBuilder` are interchangeable with reference files.

TPU-first differences from the reference:
- plain numpy iterators (no torch ``IterableDataset``/DataLoader); batching is
  a host-side generator feeding fixed-shape ``[B, block]`` int32 arrays, which
  the training loop ``device_put``s against the mesh's batch sharding;
- per-host sharding via ``num_processes``/``process_rank`` keeps the
  reference's striped assignment (``packed_dataset.py:41-58``) so a converted
  corpus shards identically.
"""

from __future__ import annotations

import os
import random
import struct
from pathlib import Path
from typing import Iterator, Optional, Sequence

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


class PackedDatasetBuilder:
    """Token stream -> fixed-size chunk files (``packed_dataset.py:61-119``)."""

    def __init__(self, outdir, prefix, chunk_size, sep_token, dtype="auto",
                 vocab_size: Optional[int] = None):
        if dtype == "auto":
            if vocab_size is None:
                raise ValueError("vocab_size cannot be None when dtype='auto'")
            self._dtype = np.uint16 if vocab_size < 65500 else np.int32
        else:
            self._dtype = dtype
        self._counter = 0
        self._chunk_size = chunk_size
        self._outdir = outdir
        self._prefix = prefix
        self._sep_token = sep_token
        self._arr = np.full(chunk_size, sep_token, dtype=self._dtype)
        self._idx = 0
        self._version = 1
        self._filenames: list[str] = []

    def _write_chunk(self) -> None:
        filename = os.path.join(self._outdir, f"{self._prefix}_{self._counter:010d}.bin")
        with open(filename, "wb") as f:
            write_header(f, self._version, self._dtype, self._chunk_size)
            f.write(self._arr.tobytes(order="C"))
        self._filenames.append(filename)
        self._counter += 1
        self._arr.fill(self._sep_token)
        self._idx = 0

    @property
    def dtype(self):
        return self._dtype

    @property
    def filenames(self) -> list[str]:
        return self._filenames.copy()

    def add_array(self, arr: np.ndarray) -> None:
        while self._idx + arr.shape[0] > self._chunk_size:
            part_len = self._chunk_size - self._idx
            self._arr[self._idx : self._idx + part_len] = arr[:part_len]
            self._write_chunk()
            arr = arr[part_len:]
        self._arr[self._idx : self._idx + arr.shape[0]] = arr
        self._idx += arr.shape[0]

    def write_reminder(self) -> None:
        self._write_chunk()


class PackedDataset:
    """Iterable over ``[block_size]`` int arrays from LITPKDS chunk files.

    ``num_processes``/``process_rank`` stripe files across hosts exactly like
    the reference stripes across (process, dataloader-worker) shards.
    """

    def __init__(self, filenames: Sequence, n_chunks: int, block_size: int,
                 seed: int = 12345, shuffle: bool = True, wrap: bool = False,
                 num_processes: int = 1, process_rank: int = 0):
        self._filenames = [str(f) for f in filenames]
        self._n_chunks = n_chunks
        self._block_size = block_size
        self._seed = seed
        self._shuffle = shuffle
        self._wrap = wrap
        self._num_processes = num_processes
        self._process_rank = process_rank

    def __iter__(self) -> "PackedDatasetIterator":
        num_shards = self._num_processes
        shard_id = self._process_rank
        max_num_files = len(self._filenames) // num_shards * num_shards
        filenames = self._filenames[shard_id:max_num_files:num_shards]
        return PackedDatasetIterator(
            filenames=filenames, n_chunks=self._n_chunks,
            block_size=self._block_size, seed=self._seed,
            shuffle=self._shuffle, wrap=self._wrap,
        )


class PackedDatasetIterator:
    """mmap ``n_chunks`` files at a time; yield shuffled blocks
    (``packed_dataset.py:122-212``)."""

    def __init__(self, filenames, n_chunks, block_size, seed, shuffle, wrap):
        self._filenames = filenames
        self._n_chunks = n_chunks
        self._block_size = block_size
        self._rng = np.random.default_rng(seed) if shuffle else None
        self._shuffle = shuffle
        self._wrap = wrap
        self._file_idx = 0
        self._dtype: Optional[np.dtype] = None
        self._chunk_size = 0
        self._n_blocks = 0
        self._mmaps: list[np.memmap] = []
        self._block_idxs = []
        self._curr_idx = 0
        self._load_n_chunks()

    def _close_mmaps(self) -> None:
        for m in self._mmaps:
            if hasattr(m, "_mmap"):
                m._mmap.close()
        self._mmaps = []

    def _load_n_chunks(self) -> None:
        self._close_mmaps()
        if self._n_chunks > len(self._filenames[self._file_idx:]):
            if not self._wrap:
                raise StopIteration
            self._file_idx = 0
        for i in range(self._n_chunks):
            filename = self._filenames[self._file_idx + i]
            if self._dtype is None:
                self._dtype, self._chunk_size = read_header(filename)
                self._n_blocks = self._chunk_size // self._block_size
            self._mmaps.append(np.memmap(filename, mode="r", dtype=self._dtype,
                                         offset=HDR_SIZE, shape=(self._chunk_size,)))
        self._file_idx += self._n_chunks
        n_all_blocks = self._n_chunks * self._n_blocks
        self._block_idxs = (
            self._rng.permutation(n_all_blocks) if self._shuffle else np.arange(n_all_blocks)
        )
        self._curr_idx = 0

    def __del__(self):
        self._close_mmaps()

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._curr_idx >= len(self._block_idxs):
            self._load_n_chunks()
        block_idx = int(self._block_idxs[self._curr_idx])
        chunk_id = block_idx // self._n_blocks
        elem_id = (block_idx % self._n_blocks) * self._block_size
        arr = np.asarray(self._mmaps[chunk_id][elem_id : elem_id + self._block_size])
        self._curr_idx += 1
        return arr.astype(np.int64)


class CombinedDataset:
    """Weighted random mixture of datasets (``packed_dataset.py:215-236``),
    e.g. the LLaMA-1 RedPajama proportions (``pretrain/redpajama.py:48-56``)."""

    def __init__(self, datasets, seed, weights=None):
        self._datasets = datasets
        self._seed = seed
        n = len(datasets)
        self._weights = weights if weights is not None else [1 / n] * n

    def __iter__(self):
        return CombinedDatasetIterator(self._datasets, self._seed, self._weights)


class CombinedDatasetIterator:
    def __init__(self, datasets, seed, weights):
        self._datasets = [iter(d) for d in datasets]
        self._weights = weights
        self._rng = random.Random(seed)

    def __iter__(self):
        return self

    def __next__(self):
        (dataset,) = self._rng.choices(self._datasets, weights=self._weights, k=1)
        return next(dataset)


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
