#!/usr/bin/env python
"""Trainer-style pretraining on OpenWebText bins (counterpart of the
reference's ``pretrain/openwebtext_trainer.py``: LightningModule + Trainer
with ModelCheckpoint / SpeedMonitor callbacks and ``ckpt_path="last"``
auto-resume)."""

import sys
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))


def main(
    model_name: str = "pythia-70m",
    train_data_dir: Path = Path("data/openwebtext"),
    val_data_dir: Optional[Path] = None,
    out_dir: Path = Path("out/openwebtext-trainer"),
    precision: str = "bf16-true",
    learning_rate: float = 6e-4,
    batch_size: int = 8,
    gradient_accumulation: int = 1,
    max_iters: int = 600000,
    warmup_iters: int = 2000,
    save_interval: int = 1000,
    eval_interval: int = 1000,
    eval_iters: int = 100,
    log_interval: int = 1,
    resume: bool = True,
    seed: int = 1337,
) -> None:
    """Pretrains via the callback Trainer; auto-resumes from 'last'.

    Args:
        model_name: Architecture name from the config registry.
        train_data_dir: Directory of LITPKDS bins from prepare_openwebtext.
        val_data_dir: Optional validation bins directory.
        out_dir: Output directory for checkpoints and logs.
        precision: bf16-true or 32-true.
        learning_rate: Peak learning rate (cosine decay to min_lr).
        batch_size: Per-step batch size.
        gradient_accumulation: Microbatches per optimizer step.
        max_iters: Total optimizer iterations.
        warmup_iters: Linear warmup iterations.
        save_interval: Steps between ModelCheckpoint saves.
        eval_interval: Steps between validation passes.
        eval_iters: Batches per validation pass.
        log_interval: Steps between loss log lines.
        resume: Auto-resume from the latest checkpoint (ckpt_path='last').
        seed: Init/data seed.
    """
    import jax.numpy as jnp
    import numpy as np

    from parrot_tpu.config import Config
    from parrot_tpu.training.pretrain import create_dataset
    from parrot_tpu.training.trainer import (
        GPTModule, ModelCheckpoint, SpeedMonitorCallback, Trainer,
    )
    from parrot_tpu.utils.csv_logger import StepCSVLogger

    config = Config.from_name(model_name)
    module = GPTModule(
        config, learning_rate=learning_rate, warmup_iters=warmup_iters,
        max_iters=max_iters, precision=precision,
    )

    data_config = [("", 1.0)]
    train_iter = iter(create_dataset(
        train_data_dir, config.block_size + 1, data_config, seed=seed,
    ))

    def batches():
        while True:
            blocks = np.stack([
                next(train_iter)
                for _ in range(batch_size * gradient_accumulation)
            ]).astype(np.int32)
            inputs, targets = blocks[:, :-1], blocks[:, 1:]
            if gradient_accumulation > 1:
                inputs = inputs.reshape(gradient_accumulation, batch_size, -1)
                targets = targets.reshape(gradient_accumulation, batch_size, -1)
            yield {"input_ids": jnp.asarray(inputs), "labels": jnp.asarray(targets)}

    val_batches = None
    if val_data_dir is not None:
        def val_batches():
            val_iter = iter(create_dataset(
                val_data_dir, config.block_size + 1, data_config,
                shuffle=False, seed=seed,
            ))
            while True:
                blocks = np.stack([
                    next(val_iter) for _ in range(batch_size)
                ]).astype(np.int32)
                yield {
                    "input_ids": jnp.asarray(blocks[:, :-1]),
                    "labels": jnp.asarray(blocks[:, 1:]),
                }

    logger = StepCSVLogger(out_dir, name="logs")
    trainer = Trainer(
        out_dir, max_iters=max_iters, gradient_accumulation=gradient_accumulation,
        callbacks=[
            ModelCheckpoint(out_dir, every_n_train_steps=save_interval),
            SpeedMonitorCallback(logger),
        ],
        eval_interval=eval_interval, eval_iters=eval_iters,
        log_interval=log_interval,
    )
    trainer.fit(module, batches(), val_batches,
                ckpt_path="last" if resume else None, seed=seed)
    logger.finalize()


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
