"""Callback-driven Trainer (the reference's third pretrain style).

``pretrain/openwebtext_trainer.py`` wraps the same training math in a
``lightning.Trainer`` + ``LightningModule`` with ``ModelCheckpoint`` /
``SpeedMonitorCallback`` callbacks and ``ckpt_path="last"`` auto-resume
(``openwebtext_trainer.py:51-98,121-138,159``). The TPU-native shape: the
module owns config + optax optimizer, the Trainer owns the jitted step and
the loop, and callbacks observe it — no framework classes to subclass, no
lazy-tensor hooks; every step is the same ``train.make_train_step`` program
the plain drivers run.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from parrot_tpu.config import Config
from parrot_tpu.models import gpt
from parrot_tpu.training import optim, train
from parrot_tpu.training.pretrain import (
    latest_checkpoint, load_train_state, save_train_state,
)
from parrot_tpu.utils.csv_logger import StepCSVLogger
from parrot_tpu.utils.speed_monitor import (
    SpeedMonitor, estimate_flops, get_flops_available,
)


class Callback:
    """Observer hooks, mirroring the Lightning callbacks the reference uses."""

    def on_fit_start(self, trainer: "Trainer") -> None: ...

    def on_train_batch_end(self, trainer: "Trainer", loss: float, step: int) -> None: ...

    def on_validation_end(self, trainer: "Trainer", val_loss: float, step: int) -> None: ...

    def on_fit_end(self, trainer: "Trainer") -> None: ...


class ModelCheckpoint(Callback):
    """Periodic train-state checkpoints + a rolling ``last`` copy
    (≙ ``lightning.pytorch.callbacks.ModelCheckpoint(save_last=True)``)."""

    def __init__(self, dirpath: Path, every_n_train_steps: int = 1000):
        self.dirpath = Path(dirpath)
        self.every = every_n_train_steps

    def on_train_batch_end(self, trainer, loss, step):
        # the state saved here is AFTER iteration ``step`` ran, so record
        # iter_num = step + 1: resume continues at the NEXT iteration instead
        # of re-applying an already-taken optimizer step
        if step > 0 and (step + 1) % self.every == 0:
            self._save(trainer, step + 1)

    def on_fit_end(self, trainer):
        self._save(trainer, trainer.iter_num)

    def _save(self, trainer, step):
        self.dirpath.mkdir(parents=True, exist_ok=True)
        path = self.dirpath / f"iter-{step:06d}-ckpt.safetensors"
        save_train_state(path, trainer.params, trainer.opt_state, step,
                         trainer.module.config)
        print(f"Saved {path}", file=sys.stderr)


class SpeedMonitorCallback(Callback):
    """≙ ``lit_gpt.speed_monitor.SpeedMonitorCallback``: throughput + MFU."""

    def __init__(self, logger: Optional[StepCSVLogger] = None, window_size: int = 50):
        self.logger = logger
        self.monitor: Optional[SpeedMonitor] = None
        self.window_size = window_size
        self._t0: Optional[float] = None

    def on_fit_start(self, trainer):
        sink = self.logger.log_dict if self.logger else (lambda *_a, **_k: None)
        self.monitor = SpeedMonitor(get_flops_available(), sink,
                                    window_size=self.window_size)
        self._t0 = time.perf_counter()

    def on_train_batch_end(self, trainer, loss, step):
        # count from THIS fit's start: after ckpt_path='last' resume the
        # global step is large but the clock started at resume
        done = step - trainer.iter_start + 1
        self.monitor.on_train_batch_end(
            samples=done * trainer.batch_size,
            train_elapsed=time.perf_counter() - self._t0,
            world_size=max(jax.device_count(), 1),
            flops_per_batch=trainer.flops_per_batch,
            lengths=done * trainer.batch_size * trainer.seq_length,
        )


class GPTModule:
    """Model + optimization recipe (≙ ``LightningGPTModule``,
    ``openwebtext_trainer.py:51-98``)."""

    def __init__(
        self,
        config: Config,
        *,
        learning_rate: float = 6e-4,
        weight_decay: float = 1e-1,
        beta1: float = 0.9,
        beta2: float = 0.95,
        warmup_iters: int = 2000,
        max_iters: int = 600000,
        min_lr: float = 6e-5,
        grad_clip: float = 1.0,
        precision: str = "bf16-true",
    ):
        self.config = config
        self.dtype = jnp.bfloat16 if "bf16" in precision else jnp.float32
        self.hparams = dict(
            learning_rate=learning_rate, weight_decay=weight_decay,
            beta1=beta1, beta2=beta2, warmup_iters=warmup_iters,
            max_iters=max_iters, min_lr=min_lr, grad_clip=grad_clip,
        )

    def configure_model(self, rng) -> dict:
        return gpt.init_params(self.config, rng, dtype=self.dtype)

    def configure_optimizers(self):
        h = self.hparams
        return optim.adamw(
            optim.warmup_cosine(h["learning_rate"], h["warmup_iters"],
                                h["max_iters"], h["min_lr"]),
            weight_decay=h["weight_decay"], beta1=h["beta1"], beta2=h["beta2"],
            grad_clip=h["grad_clip"],
        )


class Trainer:
    """The loop: jit one train step, iterate batches, fire callbacks.

    ``fit(..., ckpt_path="last")`` resumes from the newest checkpoint in
    ``out_dir`` (≙ ``trainer.fit(ckpt_path="last")``,
    ``openwebtext_trainer.py:159``).
    """

    def __init__(
        self,
        out_dir: Path,
        *,
        max_iters: int,
        gradient_accumulation: int = 1,
        callbacks: Optional[list] = None,
        eval_interval: int = 1000,
        eval_iters: int = 100,
        log_interval: int = 10,
    ):
        self.out_dir = Path(out_dir)
        self.max_iters = max_iters
        self.accum = gradient_accumulation
        self.callbacks = callbacks or []
        self.eval_interval = eval_interval
        self.eval_iters = eval_iters
        self.log_interval = log_interval
        self.iter_num = 0

    def _fire(self, hook: str, *args) -> None:
        for cb in self.callbacks:
            getattr(cb, hook)(self, *args)

    def fit(
        self,
        module: GPTModule,
        train_batches: Iterator[dict],
        val_batches=None,  # callable () -> iterator, or None
        ckpt_path: Optional[str] = None,
        seed: int = 1337,
    ) -> dict:
        self.module = module
        self.out_dir.mkdir(parents=True, exist_ok=True)

        params = module.configure_model(jax.random.PRNGKey(seed))
        optimizer = module.configure_optimizers()
        step = train.make_train_step(
            module.config, optimizer, accumulate_steps=self.accum, remat=True,
            shift=False,
        )
        opt_state = step.optimizer.init(params)
        iter_start = 0
        if ckpt_path == "last" and (latest := latest_checkpoint(self.out_dir)) is not None:
            print(f"Resuming from {latest}", file=sys.stderr)
            params, opt_state, iter_start = load_train_state(latest)
        elif ckpt_path not in (None, "last"):
            params, opt_state, iter_start = load_train_state(Path(ckpt_path))
        step_fn = jax.jit(step, donate_argnums=(0, 1))
        eval_fn = jax.jit(train.make_eval_step(module.config, shift=False))

        self.params, self.opt_state = params, opt_state
        self.iter_start = iter_start
        first = None
        loss_dev = None
        for it in range(iter_start, self.max_iters):
            self.iter_num = it
            batch = next(train_batches)
            if first is None:
                first = batch
                self.batch_size = int(np.prod(batch["input_ids"].shape[:-1]))
                self.seq_length = int(batch["input_ids"].shape[-1])
                self.flops_per_batch = (
                    estimate_flops(gpt.num_params(self.params), module.config)
                    / module.config.block_size * self.seq_length * self.batch_size
                )
                self._fire("on_fit_start")
            t0 = time.perf_counter()
            self.params, self.opt_state, loss_dev = step_fn(
                self.params, self.opt_state, batch
            )
            dt = time.perf_counter() - t0
            # loss stays on device between log points: a host sync per step
            # would drain the dispatch pipeline (~25 ms each on the relay —
            # PERF.md); callbacks get the device scalar
            self._fire("on_train_batch_end", loss_dev, it)
            if it % self.log_interval == 0:
                print(f"iter {it}: loss {float(loss_dev):.4f}, "
                      f"{dt * 1000:.1f} ms/iter", file=sys.stderr)
            if val_batches is not None and it > 0 and it % self.eval_interval == 0:
                losses = [
                    float(eval_fn(self.params, vb))
                    for vb, _ in zip(val_batches(), range(self.eval_iters))
                ]
                val_loss = float(np.mean(losses)) if losses else float("nan")
                print(f"iter {it}: val loss {val_loss:.4f}", file=sys.stderr)
                self._fire("on_validation_end", val_loss, it)
        self.iter_num = self.max_iters
        self._fire("on_fit_end")
        final_loss = float(loss_dev) if loss_dev is not None else float("nan")
        return {"final_loss": final_loss, "params": self.params}
