"""Native C++ packed reader vs the Python iterator."""

import numpy as np
import pytest

from parrot_tpu.data import native_reader
from parrot_tpu.data import packed_dataset as pd


@pytest.fixture(scope="module")
def built():
    if not native_reader.is_available() and not native_reader.build():
        pytest.skip("g++/make unavailable")
    return True


def corpus(tmp_path, n_chunks=3, chunk_size=64):
    builder = pd.PackedDatasetBuilder(
        outdir=str(tmp_path), prefix="c", chunk_size=chunk_size,
        sep_token=0, dtype="auto", vocab_size=1000,
    )
    rng = np.random.RandomState(0)
    for _ in range(n_chunks):
        builder.add_array(rng.randint(1, 1000, size=chunk_size).astype(np.uint16))
    builder.write_reminder()
    return builder.filenames


def test_native_reader_matches_python_unshuffled(tmp_path, built):
    files = corpus(tmp_path)
    reader = native_reader.NativePackedReader(
        files, block_size=16, batch_size=2, n_chunks=3, shuffle=False,
    )
    native_batches = list(reader)
    py_blocks = list(pd.PackedDataset(files, n_chunks=3, block_size=16, shuffle=False))
    py_batches = [np.stack(py_blocks[i : i + 2]) for i in range(0, len(py_blocks) - 1, 2)]
    assert len(native_batches) == len(py_batches)
    for nb, pb in zip(native_batches, py_batches):
        np.testing.assert_array_equal(nb, pb.astype(np.int32))


def test_native_reader_shuffle_covers_all_blocks(tmp_path, built):
    files = corpus(tmp_path)
    reader = native_reader.NativePackedReader(
        files, block_size=16, batch_size=3, n_chunks=3, shuffle=True, seed=7,
    )
    batches = list(reader)
    got = sorted(tuple(row) for b in batches for row in b)
    py = sorted(
        tuple(b.astype(np.int32)) for b in
        pd.PackedDataset(files, n_chunks=3, block_size=16, shuffle=False)
    )
    assert got == py


def test_native_reader_wrap(tmp_path, built):
    files = corpus(tmp_path)
    reader = native_reader.NativePackedReader(
        files, block_size=16, batch_size=2, n_chunks=3, shuffle=False, wrap=True,
    )
    taken = [next(reader) for _ in range(20)]  # several epochs
    assert len(taken) == 20
    reader.close()


def test_native_reader_n_chunks_exceeding_corpus(tmp_path, built):
    """n_chunks > number of chunk files must clamp (parity with the Python
    reader's min() — this used to read past the file list and crash)."""
    files = corpus(tmp_path)
    reader = native_reader.NativePackedReader(
        files, block_size=16, batch_size=2, n_chunks=10, shuffle=True,
        wrap=True, seed=3,
    )
    taken = [next(reader) for _ in range(12)]
    assert all(b.shape == (2, 16) for b in taken)
    reader.close()
