#!/usr/bin/env python
"""Prepare the Alpaca instruction dataset (counterpart of
``scripts/prepare_alpaca.py``)."""

import json
import sys
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

DATA_FILE_URL = "https://raw.githubusercontent.com/tloen/alpaca-lora/main/alpaca_data_cleaned_archive.json"
DATA_FILE_NAME = "alpaca_data_cleaned_archive.json"


def main(
    destination_path: Path = Path("data/alpaca"),
    checkpoint_dir: Path = Path("checkpoints/stabilityai/stablelm-base-alpha-3b"),
    test_split_size: int = 2000,
    max_seq_length: int = 256,
    seed: int = 42,
    mask_inputs: bool = True,
    data_file_name: str = DATA_FILE_NAME,
) -> None:
    """Tokenizes the Alpaca json into train.npz / test.npz.

    Args:
        destination_path: Output directory (also where the json is expected).
        checkpoint_dir: Checkpoint dir providing the tokenizer.
        test_split_size: Held-out sample count.
        max_seq_length: Truncation length.
        seed: Split seed.
        mask_inputs: Mask the prompt tokens out of the labels.
        data_file_name: Json file name inside destination_path.
    """
    from parrot_tpu.data import sft
    from parrot_tpu.utils.tokenizer import Tokenizer

    destination_path = Path(destination_path)
    destination_path.mkdir(parents=True, exist_ok=True)
    file_path = destination_path / data_file_name
    if not file_path.exists():
        print(f"Downloading {DATA_FILE_URL} ...", file=sys.stderr)
        import urllib.request

        urllib.request.urlretrieve(DATA_FILE_URL, file_path)

    tokenizer = Tokenizer(checkpoint_dir)
    with open(file_path) as f:
        data = json.load(f)
    train_set, test_set = sft.train_test_split(data, test_split_size, seed=seed)
    print(f"train has {len(train_set):,} samples, test has {len(test_set):,} samples")

    print("Processing train split ...", file=sys.stderr)
    train = sft.prepare_dataset(train_set, tokenizer, max_seq_length, mask_inputs)
    sft.save_dataset(train, destination_path / "train.npz")
    print("Processing test split ...", file=sys.stderr)
    test = sft.prepare_dataset(test_set, tokenizer, max_seq_length, mask_inputs)
    sft.save_dataset(test, destination_path / "test.npz")


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
