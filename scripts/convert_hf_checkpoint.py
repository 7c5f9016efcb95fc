#!/usr/bin/env python
"""Convert a HuggingFace checkpoint directory into the parrot-tpu format
(counterpart of ``scripts/convert_hf_checkpoint.py``)."""

import sys
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))


def main(
    checkpoint_dir: Path = Path("checkpoints/stabilityai/stablelm-base-alpha-3b"),
    model_name: Optional[str] = None,
    dtype: Optional[str] = None,
    max_shard_gb: float = 2.0,
) -> None:
    """Converts HF ``.bin``/``.safetensors`` shards to the parrot format
    (``lit_model*.safetensors`` + ``lit_config.json``) with bounded host RAM:
    tensors stream shard-at-a-time through the sharded writer, so 40B-class
    models convert without holding the full tree (≙ ``incremental_save``).

    Args:
        checkpoint_dir: Directory holding the downloaded HF shards.
        model_name: Registry name (default: the directory name).
        dtype: Optional cast (float32 | float16 | bfloat16).
        max_shard_gb: Output shard size cap in GiB.
    """
    import ml_dtypes
    import numpy as np

    from parrot_tpu.config import Config
    from parrot_tpu.utils.hf_convert import convert_hf_checkpoint_streaming

    checkpoint_dir = Path(checkpoint_dir)
    if model_name is None:
        model_name = checkpoint_dir.name
    config = Config.from_name(model_name)
    print(f"Model config {config.to_dict()}", file=sys.stderr)

    np_dtype = None if dtype is None else (
        ml_dtypes.bfloat16 if dtype == "bfloat16" else np.dtype(dtype)
    )
    out = convert_hf_checkpoint_streaming(
        config, checkpoint_dir, dtype=np_dtype,
        max_shard_bytes=int(max_shard_gb * (1 << 30)),
    )
    print(f"Saved {out}", file=sys.stderr)


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
