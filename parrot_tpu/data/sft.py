"""Instruction-tuning (alpaca-style) data pipeline.

Covers the reference's SFT data path: prompt templating + tokenize + prompt
masking (``scripts/prepare_alpaca.py:100-155``) and the fixed-shape batch
collation its training loops use on XLA (``finetune/full.py:236-262`` — "it's
better to pad to a fixed seq length with XLA to avoid recompilation", which
here is simply the only mode: every batch is ``[B, max_seq_length]``).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

IGNORE_INDEX = -1


def generate_prompt(example: dict) -> str:
    """The alpaca instruction template (``prepare_alpaca.py:141-155``)."""
    if example.get("input"):
        return (
            "Below is an instruction that describes a task, paired with an input that "
            "provides further context. "
            "Write a response that appropriately completes the request.\n\n"
            f"### Instruction:\n{example['instruction']}\n\n"
            f"### Input:\n{example['input']}\n\n### Response:"
        )
    return (
        "Below is an instruction that describes a task. "
        "Write a response that appropriately completes the request.\n\n"
        f"### Instruction:\n{example['instruction']}\n\n### Response:"
    )


def prepare_sample(
    example: dict,
    tokenizer,
    max_length: int,
    mask_inputs: bool = True,
    ignore_index: int = IGNORE_INDEX,
) -> dict:
    """Template + tokenize one example; labels mask the prompt when
    ``mask_inputs`` (``prepare_alpaca.py:100-138``)."""
    full_prompt = generate_prompt(example)
    encoded_prompt = tokenizer.encode(full_prompt, max_length=max_length)
    encoded_all = tokenizer.encode(
        full_prompt + example["output"], eos=True, max_length=max_length
    )
    labels = encoded_all.copy()
    if mask_inputs:
        labels[: len(encoded_prompt)] = ignore_index
    return {
        "input_ids": encoded_all.astype(np.int32),
        "labels": labels.astype(np.int32),
    }


def prepare_dataset(
    examples: Sequence[dict],
    tokenizer,
    max_length: int,
    mask_inputs: bool = True,
) -> list[dict]:
    return [prepare_sample(e, tokenizer, max_length, mask_inputs) for e in examples]


def save_dataset(samples: list[dict], path: Path) -> None:
    """Persist as npz (the reference pickles torch tensors, ``:89-92``)."""
    flat = {}
    for i, s in enumerate(samples):
        flat[f"input_ids_{i}"] = s["input_ids"]
        flat[f"labels_{i}"] = s["labels"]
    np.savez_compressed(path, n=np.asarray(len(samples)), **flat)


def load_dataset(path: Path) -> list[dict]:
    with np.load(path) as z:
        n = int(z["n"])
        return [
            {"input_ids": z[f"input_ids_{i}"], "labels": z[f"labels_{i}"]}
            for i in range(n)
        ]


def longest_seq_info(data: list[dict]) -> tuple[int, int]:
    lengths = [len(s["input_ids"]) for s in data]
    ix = int(np.argmax(lengths))
    return lengths[ix], ix


def get_batch(
    rng: np.random.Generator,
    data: list[dict],
    micro_batch_size: int,
    seq_length: int,
    longest_seq_ix: Optional[int] = None,
    ignore_index: int = IGNORE_INDEX,
) -> dict:
    """Random fixed-shape batch: inputs right-padded with 0, labels with
    ``ignore_index`` (``finetune/full.py:236-262``). Pass ``longest_seq_ix``
    on the first batch so potential OOMs happen right away."""
    ix = rng.integers(len(data), size=micro_batch_size)
    if longest_seq_ix is not None:
        ix[0] = longest_seq_ix
    x = np.zeros((micro_batch_size, seq_length), np.int32)
    y = np.full((micro_batch_size, seq_length), ignore_index, np.int32)
    for row, i in enumerate(ix):
        ids = data[int(i)]["input_ids"][:seq_length]
        lab = data[int(i)]["labels"][:seq_length]
        x[row, : len(ids)] = ids
        y[row, : len(lab)] = lab
    return {"input_ids": x, "labels": y}


def load_alpaca_json(path: Path) -> list[dict]:
    with open(path) as f:
        return json.load(f)


def train_test_split(
    examples: list[dict], test_size: int, seed: int = 42
) -> tuple[list[dict], list[dict]]:
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(examples))
    test_ix = set(perm[:test_size].tolist())
    train = [e for i, e in enumerate(examples) if i not in test_ix]
    test = [e for i, e in enumerate(examples) if i in test_ix]
    return train, test
