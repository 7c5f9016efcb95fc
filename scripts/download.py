#!/usr/bin/env python
"""Download HF checkpoint shards (counterpart of ``scripts/download.py``)."""

import os
import sys
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))


def main(
    repo_id: Optional[str] = None,
    access_token: Optional[str] = None,
) -> None:
    """Downloads model weights and tokenizer files from the HF hub into
    ``checkpoints/<repo_id>``.

    Args:
        repo_id: HF repository, e.g. stabilityai/stablelm-base-alpha-3b.
            Omit to list the supported checkpoints.
        access_token: HF token (needed for the meta-llama repos); defaults to
            the HF_TOKEN environment variable.
    """
    if repo_id is None:
        from parrot_tpu.config import name_to_config

        options = [
            f"{conf['org']}/{name}" for name, conf in name_to_config.items()
        ]
        print("Please specify --repo_id <repo_id>. Available values:")
        print("\n".join(sorted(options)))
        return

    from huggingface_hub import snapshot_download

    access_token = access_token or os.getenv("HF_TOKEN")
    if "meta-llama" in repo_id and access_token is None:
        raise ValueError(
            "meta-llama repos require authentication: pass --access_token or set HF_TOKEN"
        )
    snapshot_download(
        repo_id,
        local_dir=f"checkpoints/{repo_id}",
        allow_patterns=["*.bin*", "*.safetensors*", "*.json", "tokenizer*"],
        token=access_token,
    )
    print(f"Now run: python scripts/convert_hf_checkpoint.py --checkpoint_dir checkpoints/{repo_id}")


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
