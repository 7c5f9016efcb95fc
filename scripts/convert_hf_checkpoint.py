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
) -> None:
    """Converts HF ``.bin``/``.safetensors`` shards to
    ``lit_model.safetensors`` + ``lit_config.json``.

    Args:
        checkpoint_dir: Directory holding the downloaded HF shards.
        model_name: Registry name (default: the directory name).
        dtype: Optional cast (float32 | float16 | bfloat16).
    """
    import numpy as np

    from parrot_tpu.config import Config
    from parrot_tpu.utils import checkpoint as ckpt
    from parrot_tpu.utils.hf_convert import convert_hf_state_dict, iter_hf_shards

    checkpoint_dir = Path(checkpoint_dir)
    if model_name is None:
        model_name = checkpoint_dir.name
    config = Config.from_name(model_name)
    print(f"Model config {config.to_dict()}", file=sys.stderr)

    np_dtype = None if dtype is None else np.dtype(dtype if dtype != "bfloat16" else "float32")
    params = convert_hf_state_dict(config, iter_hf_shards(checkpoint_dir), dtype=np_dtype)
    if dtype == "bfloat16":
        import jax.numpy as jnp
        import jax

        params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    ckpt.save_checkpoint(checkpoint_dir, params, config=config)
    print(f"Saved {checkpoint_dir / ckpt.MODEL_FILE}", file=sys.stderr)


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
