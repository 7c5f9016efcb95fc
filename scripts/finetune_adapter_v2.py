#!/usr/bin/env python
"""Adapter-v2 finetuning (counterpart of ``finetune/adapter_v2.py``)."""

import sys
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))


def main(
    data_dir: Path = Path("data/alpaca"),
    checkpoint_dir: Path = Path("checkpoints/stabilityai/stablelm-base-alpha-3b"),
    out_dir: Path = Path("out/adapter_v2/alpaca"),
    precision: str = "bf16-true",
    learning_rate: float = 3e-3,
    batch_size: int = 64,
    micro_batch_size: int = 4,
    max_iters: int = 1000,
    adapter_prompt_length: int = 10,
    adapter_start_layer: int = 2,
    max_seq_length: Optional[int] = None,
    mesh: Optional[str] = None,
    pipeline_microbatches: int = 1,
) -> None:
    """Adapter-v2 finetuning (prefix attention + per-linear scale/bias +
    trainable norms); saves only the adapter deltas.

    Args:
        data_dir: Directory with train.npz/test.npz from prepare_alpaca.
        checkpoint_dir: Base model checkpoint directory.
        out_dir: Where checkpoints and logs go.
        precision: bf16-true or 32-true.
        learning_rate: Peak learning rate.
        batch_size: Global batch size.
        micro_batch_size: Per-step batch size.
        max_iters: Number of optimizer iterations.
        adapter_prompt_length: Learnable prompt prefix length.
        adapter_start_layer: First layer that receives the adapter.
        max_seq_length: Truncate samples to this length.
        mesh: Device mesh "data,fsdp,tensor[,pipe[,context]]".
        pipeline_microbatches: Microbatches per pipeline step (pipe > 1).
    """
    from parrot_tpu.parallel.mesh import parse_mesh
    from parrot_tpu.training.finetune import finetune

    finetune(
        "adapter_v2", data_dir, checkpoint_dir, out_dir, precision=precision,
        learning_rate=learning_rate, batch_size=batch_size,
        micro_batch_size=micro_batch_size, max_iters=max_iters,
        max_seq_length=max_seq_length,
        mesh_shape=parse_mesh(mesh) if mesh else (1, 1, 1),
        pipeline_microbatches=pipeline_microbatches,
        adapter_prompt_length=adapter_prompt_length,
        adapter_start_layer=adapter_start_layer,
    )


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
