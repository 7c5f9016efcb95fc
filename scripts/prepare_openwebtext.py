#!/usr/bin/env python
"""Tokenize OpenWebText into packed bins (counterpart of
``scripts/prepare_openwebtext.py``; emits LITPKDS chunks rather than raw
memmap bins so one reader serves every corpus)."""

import sys
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))


def main(
    destination_path: Path = Path("data/openwebtext"),
    checkpoint_dir: Path = Path("checkpoints/stabilityai/stablelm-base-alpha-3b"),
    chunk_size: int = 2049 * 1024,
    test_size: float = 0.0005,
    seed: int = 2357,
    num_proc: int = 8,
) -> None:
    """Tokenizes the HF openwebtext dataset into train/val LITPKDS bins.

    Args:
        destination_path: Output directory.
        checkpoint_dir: Checkpoint dir providing the tokenizer.
        chunk_size: Tokens per output chunk file.
        test_size: Validation fraction.
        seed: Split seed.
        num_proc: Dataset map worker count.
    """
    import numpy as np
    from datasets import load_dataset

    from parrot_tpu.data.packed_dataset import PackedDatasetBuilder
    from parrot_tpu.utils.tokenizer import Tokenizer

    destination_path = Path(destination_path)
    tokenizer = Tokenizer(checkpoint_dir)
    dataset = load_dataset("openwebtext", num_proc=num_proc, trust_remote_code=True)
    split_dataset = dataset["train"].train_test_split(
        test_size=test_size, seed=seed, shuffle=True
    )
    split_dataset["val"] = split_dataset.pop("test")

    for split, dset in split_dataset.items():
        out_dir = destination_path / split
        out_dir.mkdir(parents=True, exist_ok=True)
        builder = PackedDatasetBuilder(
            outdir=str(out_dir), prefix=split, chunk_size=chunk_size,
            sep_token=tokenizer.eos_id or 0, dtype="auto",
            vocab_size=tokenizer.vocab_size,
        )
        for sample in dset:
            ids = tokenizer.encode(sample["text"], eos=True)
            builder.add_array(np.asarray(ids))
        builder.write_reminder()
        print(f"{split}: wrote {len(builder.filenames)} chunks to {out_dir}", file=sys.stderr)


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
