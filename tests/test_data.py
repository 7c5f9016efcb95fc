"""Data pipeline tests (reference analogue: tests/test_packed_dataset.py
build/read/shuffle/wrap + sharding)."""

import struct

import numpy as np
import pytest

from parrot_tpu.data import packed_dataset as pd
from parrot_tpu.data import sft


def build_corpus(tmp_path, n_chunks=4, chunk_size=24, sep=0, prefix="corpus"):
    builder = pd.PackedDatasetBuilder(
        outdir=str(tmp_path), prefix=prefix, chunk_size=chunk_size,
        sep_token=sep, dtype="auto", vocab_size=100,
    )
    rng = np.random.RandomState(0)
    for _ in range(n_chunks):
        builder.add_array(rng.randint(1, 100, size=chunk_size).astype(np.uint16))
    builder.write_reminder()
    return builder.filenames


def test_header_matches_reference_format(tmp_path):
    files = build_corpus(tmp_path, n_chunks=1)
    with open(files[0], "rb") as f:
        raw = f.read(pd.HDR_SIZE)
    assert raw[:7] == b"LITPKDS"
    version, = struct.unpack("<Q", raw[7:15])
    dtype_code, = struct.unpack("<B", raw[15:16])
    chunk_size, = struct.unpack("<Q", raw[16:24])
    assert version == 1 and pd.dtypes[dtype_code] == np.uint16 and chunk_size == 24


def test_roundtrip_and_block_content(tmp_path):
    files = build_corpus(tmp_path, n_chunks=2, chunk_size=24)
    ds = pd.PackedDataset(files, n_chunks=2, block_size=8, shuffle=False)
    blocks = list(ds)
    assert len(blocks) == 6 and all(b.shape == (8,) for b in blocks)
    # unshuffled blocks reproduce the written stream
    with open(files[0], "rb") as f:
        f.seek(pd.HDR_SIZE)
        raw = np.frombuffer(f.read(), dtype=np.uint16)
    np.testing.assert_array_equal(np.concatenate(blocks[:3]), raw.astype(np.int64))


def test_shuffle_is_seeded_permutation(tmp_path):
    files = build_corpus(tmp_path, n_chunks=2)
    a = [b.tolist() for b in pd.PackedDataset(files, 2, 8, seed=7, shuffle=True)]
    b = [b.tolist() for b in pd.PackedDataset(files, 2, 8, seed=7, shuffle=True)]
    c = [b.tolist() for b in pd.PackedDataset(files, 2, 8, seed=8, shuffle=True)]
    assert a == b
    assert sorted(map(tuple, a)) == sorted(map(tuple, c))


def test_wrap_and_no_wrap(tmp_path):
    files = build_corpus(tmp_path, n_chunks=2)
    no_wrap = pd.PackedDataset(files, n_chunks=2, block_size=8, shuffle=False, wrap=False)
    assert len(list(no_wrap)) == 6
    wrapped = iter(pd.PackedDataset(files, n_chunks=2, block_size=8, shuffle=False, wrap=True))
    taken = [next(wrapped) for _ in range(15)]  # > one epoch
    assert len(taken) == 15


def test_process_sharding(tmp_path):
    files = build_corpus(tmp_path, n_chunks=4)
    shard0 = pd.PackedDataset(files, 1, 8, shuffle=False, num_processes=2, process_rank=0)
    shard1 = pd.PackedDataset(files, 1, 8, shuffle=False, num_processes=2, process_rank=1)
    b0 = [tuple(b) for b in shard0]
    b1 = [tuple(b) for b in shard1]
    assert b0 and b1 and not (set(b0) & set(b1))


def test_combined_dataset_weights(tmp_path):
    files_a = build_corpus(tmp_path, n_chunks=2, prefix="a")
    files_b = build_corpus(tmp_path / "..", n_chunks=2, prefix="b") if False else build_corpus(tmp_path, n_chunks=2, prefix="b")
    ds_a = pd.PackedDataset(files_a, 1, 8, shuffle=False, wrap=True)
    ds_b = pd.PackedDataset(files_b, 1, 8, shuffle=False, wrap=True)
    combined = pd.CombinedDataset([ds_a, ds_b], seed=0, weights=[1.0, 0.0])
    it = iter(combined)
    only_a = [next(it) for _ in range(5)]
    ref_a = list(pd.PackedDataset(files_a, 1, 8, shuffle=False))[:5]
    for x, y in zip(only_a, ref_a):
        np.testing.assert_array_equal(x, y)


def test_batch_iterator(tmp_path):
    files = build_corpus(tmp_path, n_chunks=2)
    ds = pd.PackedDataset(files, 2, 8, shuffle=False)
    batches = list(pd.batch_iterator(ds, batch_size=2))
    assert all(b.shape == (2, 8) and b.dtype == np.int32 for b in batches)


class FakeTokenizer:
    eos_id = 99

    def encode(self, text, bos=False, eos=False, max_length=-1):
        toks = [ord(c) % 50 for c in text]
        if eos:
            toks.append(self.eos_id)
        if max_length > 0:
            toks = toks[:max_length]
        return np.asarray(toks, np.int32)


def test_sft_sample_masks_prompt():
    tok = FakeTokenizer()
    example = {"instruction": "add", "input": "1+1", "output": "2"}
    s = sft.prepare_sample(example, tok, max_length=512)
    prompt_len = len(tok.encode(sft.generate_prompt(example)))
    assert (s["labels"][:prompt_len] == sft.IGNORE_INDEX).all()
    assert (s["labels"][prompt_len:] != sft.IGNORE_INDEX).all()
    assert s["input_ids"][-1] == tok.eos_id
    # no input -> shorter template
    s2 = sft.prepare_sample({"instruction": "hi", "input": "", "output": "yo"}, tok, 512)
    assert len(s2["input_ids"]) < len(s["input_ids"]) + 40


def test_sft_get_batch_shapes_and_padding():
    tok = FakeTokenizer()
    data = sft.prepare_dataset(
        [{"instruction": f"i{i}", "input": "", "output": "x" * (i + 1)} for i in range(5)],
        tok, max_length=256,
    )
    longest, ix = sft.longest_seq_info(data)
    rng = np.random.default_rng(0)
    batch = sft.get_batch(rng, data, 4, seq_length=longest, longest_seq_ix=ix)
    assert batch["input_ids"].shape == (4, longest)
    assert batch["labels"].shape == (4, longest)
    assert (batch["labels"][batch["input_ids"] == 0] == sft.IGNORE_INDEX).all()


def test_sft_dataset_save_load(tmp_path):
    tok = FakeTokenizer()
    data = sft.prepare_dataset(
        [{"instruction": "a", "input": "", "output": "b"}], tok, max_length=64
    )
    sft.save_dataset(data, tmp_path / "train.npz")
    loaded = sft.load_dataset(tmp_path / "train.npz")
    np.testing.assert_array_equal(loaded[0]["input_ids"], data[0]["input_ids"])
    np.testing.assert_array_equal(loaded[0]["labels"], data[0]["labels"])
