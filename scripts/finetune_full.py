#!/usr/bin/env python
"""Full-parameter finetuning on an instruction dataset (counterpart of
``finetune/full.py``)."""

import sys
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))


def main(
    data_dir: Path = Path("data/alpaca"),
    checkpoint_dir: Path = Path("checkpoints/stabilityai/stablelm-base-alpha-3b"),
    out_dir: Path = Path("out/full/alpaca"),
    precision: str = "bf16-true",
    learning_rate: float = 3e-3,
    batch_size: int = 64,
    micro_batch_size: int = 4,
    max_iters: int = 1000,
    max_seq_length: Optional[int] = None,
    mesh: Optional[str] = None,
    pipeline_microbatches: int = 1,
) -> None:
    """Full-parameter supervised finetuning; saves the whole model.

    Args:
        data_dir: Directory with train.npz/test.npz from prepare_alpaca.
        checkpoint_dir: Base model checkpoint directory.
        out_dir: Where checkpoints and logs go.
        precision: bf16-true or 32-true.
        learning_rate: Peak learning rate.
        batch_size: Global batch size (gradient accumulation over micro batches).
        micro_batch_size: Per-step batch size.
        max_iters: Number of optimizer iterations.
        max_seq_length: Truncate samples to this length.
        mesh: Device mesh "data,fsdp,tensor[,pipe[,context]]".
        pipeline_microbatches: Microbatches per pipeline step (pipe > 1).
    """
    from parrot_tpu.parallel.mesh import parse_mesh
    from parrot_tpu.training.finetune import finetune

    finetune(
        "full", data_dir, checkpoint_dir, out_dir, precision=precision,
        learning_rate=learning_rate, batch_size=batch_size,
        micro_batch_size=micro_batch_size, max_iters=max_iters,
        max_seq_length=max_seq_length,
        mesh_shape=parse_mesh(mesh) if mesh else (1, 1, 1),
        pipeline_microbatches=pipeline_microbatches,
    )


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
