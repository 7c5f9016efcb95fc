#!/usr/bin/env python
"""Convert a parrot-tpu checkpoint back to HuggingFace format (counterpart of
``scripts/convert_lit_checkpoint.py``; also supports the llama direction the
reference leaves unimplemented)."""

import sys
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))


def main(
    checkpoint_dir: Path = Path("checkpoints/stabilityai/stablelm-base-alpha-3b"),
    output_path: Optional[Path] = None,
    model_name: Optional[str] = None,
) -> None:
    """Writes an HF-layout ``model.safetensors`` from a parrot checkpoint.

    Args:
        checkpoint_dir: Directory with lit_model.safetensors + lit_config.json.
        output_path: Output file (default: hf_model.safetensors inside the dir).
        model_name: Override the registry name (default: from lit_config.json).
    """
    from safetensors.numpy import save_file

    from parrot_tpu.config import Config
    from parrot_tpu.utils import checkpoint as ckpt
    from parrot_tpu.utils.hf_convert import convert_to_hf_state_dict

    checkpoint_dir = Path(checkpoint_dir)
    config = (
        Config.from_name(model_name) if model_name
        else Config.from_json(checkpoint_dir / "lit_config.json")
    )
    params = ckpt.load_checkpoint(checkpoint_dir)
    sd = convert_to_hf_state_dict(config, params)
    output_path = output_path or (checkpoint_dir / "hf_model.safetensors")
    save_file(sd, str(output_path))
    print(f"Saved {len(sd)} tensors to {output_path}", file=sys.stderr)


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
