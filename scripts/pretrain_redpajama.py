#!/usr/bin/env python
"""Pretrain on the RedPajama mixture (counterpart of
``pretrain/redpajama.py``)."""

import sys
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))


def main(
    model_name: str = "Llama-2-7b-hf",
    train_data_dir: Path = Path("data/redpajama_sample"),
    val_data_dir: Optional[Path] = None,
    out_dir: Path = Path("out/redpajama"),
    precision: str = "bf16-true",
    learning_rate: float = 6e-4,
    batch_size: int = 8,
    gradient_accumulation: int = 6,
    max_iters: int = 600000,
    warmup_iters: int = 2000,
    resume: bool = False,
    mesh: Optional[str] = None,
    pipeline_microbatches: int = 1,
    profile_dir: Optional[Path] = None,
) -> None:
    """Pretrains on the weighted RedPajama source mixture (LLaMA-1
    proportions).

    Args:
        model_name: Architecture name from the config registry.
        train_data_dir: Directory of LITPKDS bins from prepare_redpajama.
        val_data_dir: Optional validation bins directory.
        out_dir: Output directory for checkpoints and logs.
        precision: bf16-true or 32-true.
        learning_rate: Peak learning rate (cosine decay to min_lr).
        batch_size: Per-step batch size.
        gradient_accumulation: Microbatches accumulated per optimizer step.
        max_iters: Total optimizer iterations.
        warmup_iters: Linear warmup iterations.
        resume: Resume from the latest checkpoint in out_dir.
        mesh: Device mesh "data,fsdp,tensor[,pipe[,context]]",
            e.g. "1,8,1" for ZeRO-3 over 8 chips or "1,2,1,4" for 4 GPipe
            stages x fsdp=2.
        pipeline_microbatches: Microbatches per pipeline step (pipe > 1).
        profile_dir: Capture a jax.profiler trace of a 3-step window here.
    """
    from parrot_tpu.parallel.mesh import parse_mesh
    from parrot_tpu.training.pretrain import REDPAJAMA_DATA_CONFIG, pretrain

    pretrain(
        model_name, train_data_dir, out_dir, val_data_dir=val_data_dir,
        data_config=REDPAJAMA_DATA_CONFIG, precision=precision,
        learning_rate=learning_rate, batch_size=batch_size,
        gradient_accumulation=gradient_accumulation, max_iters=max_iters,
        warmup_iters=warmup_iters, resume=resume, profile_dir=profile_dir,
        mesh_shape=parse_mesh(mesh) if mesh else (1, 1, 1),
        pipeline_microbatches=pipeline_microbatches,
    )


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
