#!/usr/bin/env python
"""Pretrain on OpenWebText bins (counterpart of ``pretrain/openwebtext.py``)."""

import sys
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))


def main(
    model_name: str = "pythia-1b",
    train_data_dir: Path = Path("data/openwebtext"),
    val_data_dir: Optional[Path] = None,
    out_dir: Path = Path("out/openwebtext"),
    precision: str = "bf16-true",
    learning_rate: float = 6e-4,
    batch_size: int = 8,
    gradient_accumulation: int = 1,
    max_iters: int = 600000,
    warmup_iters: int = 2000,
    resume: bool = False,
    mesh: Optional[str] = None,
    pipeline_microbatches: int = 1,
) -> None:
    """Pretrains on a single packed-dataset corpus.

    Args:
        model_name: Architecture name from the config registry.
        train_data_dir: Directory of LITPKDS bins from prepare_openwebtext.
        val_data_dir: Optional validation bins directory.
        out_dir: Output directory for checkpoints and logs.
        precision: bf16-true or 32-true.
        learning_rate: Peak learning rate (cosine decay).
        batch_size: Per-step batch size.
        gradient_accumulation: Microbatches per optimizer step.
        max_iters: Total optimizer iterations.
        warmup_iters: Linear warmup iterations.
        resume: Resume from the latest checkpoint in out_dir.
        mesh: Device mesh "data,fsdp,tensor[,pipe[,context]]".
        pipeline_microbatches: Microbatches per pipeline step (pipe > 1).
    """
    from parrot_tpu.parallel.mesh import parse_mesh
    from parrot_tpu.training.pretrain import pretrain

    pretrain(
        model_name, train_data_dir, out_dir, val_data_dir=val_data_dir,
        precision=precision, learning_rate=learning_rate, batch_size=batch_size,
        gradient_accumulation=gradient_accumulation, max_iters=max_iters,
        warmup_iters=warmup_iters, resume=resume,
        mesh_shape=parse_mesh(mesh) if mesh else (1, 1, 1),
        pipeline_microbatches=pipeline_microbatches,
    )


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
