#!/usr/bin/env python
"""Tokenize RedPajama jsonl sources into packed bins (counterpart of
``scripts/prepare_redpajama.py``)."""

import glob
import json
import os
import sys
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

# per-source glob patterns: sample release vs full release
# (reference prepare_redpajama.py:18-40)
FILENAMES_SAMPLE = {
    "arxiv": "arxiv_sample.jsonl",
    "book": "book_sample.jsonl",
    "c4": "c4_sample.jsonl",
    "cc": "cc_*_sample.jsonl",
    "github": "github_sample.jsonl",
    "stackexchange": "stackexchange_sample.jsonl",
    "wikipedia": "wikipedia_sample.jsonl",
}
FILENAME_SETS_FULL = {
    "arxiv": "arxiv/arxiv*",
    "book": "book/book*",
    "c4": "c4/c4-train*",
    "cc": "common_crawl/*",
    "github": "github/filtered*",
    "stackexchange": "stackexchange/stackexchange*",
    "wikipedia": "wikipedia/wiki*",
}


def main(
    source_path: Path = Path("data/RedPajama-Data-1T-Sample"),
    destination_path: Path = Path("data/redpajama_sample"),
    checkpoint_dir: Path = Path("checkpoints/meta-llama/Llama-2-7b-hf"),
    chunk_size: int = 2049 * 1024,
    sample: bool = True,
    match: str = "",
) -> None:
    """Tokenizes RedPajama jsonl files into per-source LITPKDS bins.

    Args:
        source_path: Directory with the downloaded jsonl source files.
        destination_path: Output directory for the packed bins.
        checkpoint_dir: Checkpoint dir providing the tokenizer.
        chunk_size: Tokens per output chunk file.
        sample: Whether source_path holds the 1T-Sample release layout.
        match: Only process sources whose name contains this substring.
    """
    import numpy as np

    from parrot_tpu.data.packed_dataset import PackedDatasetBuilder
    from parrot_tpu.utils.tokenizer import Tokenizer

    source_path, destination_path = Path(source_path), Path(destination_path)
    destination_path.mkdir(parents=True, exist_ok=True)
    tokenizer = Tokenizer(checkpoint_dir)
    patterns = FILENAMES_SAMPLE if sample else FILENAME_SETS_FULL

    for prefix, pattern in patterns.items():
        if match and match not in prefix:
            continue
        files = sorted(glob.glob(str(source_path / pattern)))
        if not files:
            print(f"{prefix}: no files match {pattern}, skipping", file=sys.stderr)
            continue
        builder = PackedDatasetBuilder(
            outdir=str(destination_path), prefix=prefix, chunk_size=chunk_size,
            sep_token=tokenizer.bos_id if tokenizer.bos_id not in (None, -1) else 0,
            dtype="auto", vocab_size=tokenizer.vocab_size,
        )
        for filepath in files:
            print(f"Processing {filepath}", file=sys.stderr)
            with open(filepath, encoding="utf-8") as f:
                for line in f:
                    text = json.loads(line)["text"]
                    ids = tokenizer.encode(text, bos=True)
                    builder.add_array(np.asarray(ids))
        builder.write_reminder()
        print(f"{prefix}: wrote {len(builder.filenames)} chunks", file=sys.stderr)


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
