#!/usr/bin/env python
"""LoRA finetuning on an instruction dataset (counterpart of
``finetune/lora.py``)."""

import sys
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))


def main(
    data_dir: Path = Path("data/alpaca"),
    checkpoint_dir: Path = Path("checkpoints/stabilityai/stablelm-base-alpha-3b"),
    out_dir: Path = Path("out/lora/alpaca"),
    precision: str = "bf16-true",
    learning_rate: float = 3e-4,
    batch_size: int = 128,
    micro_batch_size: int = 4,
    max_iters: int = 1000,
    lora_r: int = 8,
    lora_alpha: int = 16,
    lora_dropout: float = 0.05,
    lora_query: bool = True,
    lora_key: bool = False,
    lora_value: bool = True,
    lora_projection: bool = False,
    lora_mlp: bool = False,
    lora_head: bool = False,
    max_seq_length: Optional[int] = None,
    mesh: Optional[str] = None,
    pipeline_microbatches: int = 1,
) -> None:
    """Finetune with LoRA; saves only the LoRA deltas (filtered checkpoint).

    Args:
        data_dir: Directory with train.npz/test.npz from prepare_alpaca.
        checkpoint_dir: Base model checkpoint directory.
        out_dir: Where checkpoints and logs go.
        precision: bf16-true or 32-true.
        learning_rate: Peak learning rate.
        batch_size: Global batch size (gradient accumulation over micro batches).
        micro_batch_size: Per-step batch size.
        max_iters: Number of optimizer iterations.
        lora_r: LoRA rank.
        lora_alpha: LoRA alpha scaling numerator.
        lora_dropout: Dropout on the LoRA branch input.
        lora_query: Apply LoRA to the query projection.
        lora_key: Apply LoRA to the key projection.
        lora_value: Apply LoRA to the value projection.
        lora_projection: Apply LoRA to the attention output projection.
        lora_mlp: Apply LoRA to the MLP linears.
        lora_head: Apply LoRA to the LM head.
        max_seq_length: Truncate samples to this length.
        mesh: Device mesh "data,fsdp,tensor[,pipe[,context]]".
        pipeline_microbatches: Microbatches per pipeline step (pipe > 1).
    """
    from parrot_tpu.parallel.mesh import parse_mesh
    from parrot_tpu.training.finetune import finetune

    if not any((lora_query, lora_key, lora_value, lora_projection, lora_mlp, lora_head)):
        raise ValueError("enable at least one LoRA target")
    finetune(
        "lora", data_dir, checkpoint_dir, out_dir, precision=precision,
        learning_rate=learning_rate, batch_size=batch_size,
        micro_batch_size=micro_batch_size, max_iters=max_iters,
        max_seq_length=max_seq_length,
        mesh_shape=parse_mesh(mesh) if mesh else (1, 1, 1),
        pipeline_microbatches=pipeline_microbatches,
        lora_r=lora_r, lora_alpha=lora_alpha, lora_dropout=lora_dropout,
        lora_query=lora_query, lora_key=lora_key, lora_value=lora_value,
        lora_projection=lora_projection, lora_mlp=lora_mlp, lora_head=lora_head,
    )


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
