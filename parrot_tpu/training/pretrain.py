"""Pretraining driver: packed-dataset causal LM training with cosine schedule
and full train-state resume (counterpart of ``pretrain/redpajama.py`` /
``pretrain/openwebtext.py``).

Structure mirrors the reference: weighted CombinedDataset over per-source
PackedDatasets (LLaMA-1 proportions, ``redpajama.py:48-56``), inputs/targets
sliced from ``block_size + 1`` token blocks (``:179-180``), AdamW with linear
warmup + cosine decay (``:307-319``), grad clipping, interval checkpoints of
the full ``{model, optimizer, iter_num}`` state and ``--resume`` picking up
the latest one (``:131-137``).
"""

from __future__ import annotations

import glob
import pickle
import sys
import threading
import time
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from parrot_tpu.config import Config
from parrot_tpu.data import packed_dataset as pd
from parrot_tpu.models import gpt
from parrot_tpu.parallel import mesh as mesh_lib
from parrot_tpu.parallel import sharding
from parrot_tpu.training import optim, train
from parrot_tpu.utils import checkpoint as ckpt
from parrot_tpu.utils.csv_logger import StepCSVLogger
from parrot_tpu.utils.speed_monitor import (
    SpeedMonitor, estimate_flops, get_flops_available,
)

# RedPajama source mixture, LLaMA-1 proportions (redpajama.py:48-56)
REDPAJAMA_DATA_CONFIG = [
    ("arxiv", 2.5), ("book", 4.5), ("c4", 15.0), ("cc", 67.0),
    ("github", 4.5), ("stackexchange", 2.0), ("wikipedia", 4.5),
]


def create_dataset(
    data_dir: Path,
    block_size: int,
    data_config: Sequence[tuple[str, float]] = (("", 1.0),),
    *,
    n_chunks: int = 4,
    shuffle: bool = True,
    seed: int = 12345,
    num_processes: int = 1,
    process_rank: int = 0,
):
    datasets = []
    weights = []
    for prefix, weight in data_config:
        filenames = sorted(glob.glob(str(Path(data_dir) / f"{prefix}*")))
        if not filenames:
            continue
        datasets.append(pd.PackedDataset(
            filenames, n_chunks=min(n_chunks, len(filenames)), block_size=block_size,
            shuffle=shuffle, seed=seed, wrap=True,
            num_processes=num_processes, process_rank=process_rank,
        ))
        weights.append(weight)
    if not datasets:
        raise RuntimeError(f"No data found at {data_dir} for prefixes {data_config}")
    total = sum(weights)
    return pd.CombinedDataset(datasets, seed=seed, weights=[w / total for w in weights])


# -- train-state persistence ------------------------------------------------


def save_train_state(path: Path, params, opt_state, iter_num: int, config: Config) -> None:
    leaves, treedef = jax.tree.flatten(opt_state)
    state = {
        "model": params,
        "opt": {str(i): np.asarray(leaf) for i, leaf in enumerate(leaves)},
    }
    ckpt.save_checkpoint(path, state)
    with open(Path(str(path)).with_suffix(".meta.pkl"), "wb") as f:
        pickle.dump({"iter_num": iter_num, "treedef": treedef, "config": config.to_dict()}, f)


def load_train_state(path: Path):
    state = ckpt.load_checkpoint(path)
    with open(Path(str(path)).with_suffix(".meta.pkl"), "rb") as f:
        meta = pickle.load(f)
    leaves = [state["opt"][str(i)] for i in range(len(state["opt"]))]
    opt_state = jax.tree.unflatten(meta["treedef"], leaves)
    return state["model"], opt_state, meta["iter_num"]


def latest_checkpoint(out_dir: Path) -> Optional[Path]:
    candidates = sorted(Path(out_dir).glob("iter-*-ckpt.safetensors"))
    return candidates[-1] if candidates else None


# -- the loop ---------------------------------------------------------------


def pretrain(
    model_name: str,
    train_data_dir: Path,
    out_dir: Path,
    *,
    val_data_dir: Optional[Path] = None,
    data_config: Sequence[tuple[str, float]] = (("", 1.0),),
    precision: str = "bf16-true",
    learning_rate: float = 6e-4,
    min_lr: float = 6e-5,
    weight_decay: float = 1e-1,
    beta1: float = 0.9,
    beta2: float = 0.95,
    grad_clip: float = 1.0,
    warmup_iters: int = 2000,
    max_iters: int = 10000,
    batch_size: int = 8,
    gradient_accumulation: int = 1,
    eval_interval: int = 1000,
    eval_iters: int = 100,
    save_interval: int = 1000,
    log_interval: int = 10,
    resume: bool = False,
    seed: int = 1337,
    mesh_shape: tuple[int, ...] = (1, 1, 1),
    pipeline_microbatches: int = 1,
    profile_dir: Optional[Path] = None,
) -> dict:
    from parrot_tpu.generate.loader import PRECISION_DTYPES

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    # preemption handling (beyond the reference, which has none — SURVEY §5):
    # TPU pods get SIGTERM on maintenance/preemption; finish the in-flight
    # step, save a resumable train state, then exit cleanly so `--resume`
    # continues from the boundary. Installed first so even a signal during
    # setup/compile lands on the flag, not the default handler.
    preempted = {"flag": False}

    def _request_stop(signum, frame):
        preempted["flag"] = True
        print(f"signal {signum}: checkpointing at next step boundary", file=sys.stderr)

    import signal as _signal

    old_handlers = {}
    if threading.current_thread() is threading.main_thread():
        for sig in (_signal.SIGTERM, _signal.SIGINT):
            try:
                old_handlers[sig] = _signal.signal(sig, _request_stop)
            except (ValueError, OSError):  # non-main context or unsupported
                pass

    config = Config.from_name(model_name)
    dtype = PRECISION_DTYPES[precision]

    # mesh_shape: (data, fsdp, tensor[, pipe[, context]])
    ms = tuple(mesh_shape)
    pipe = ms[3] if len(ms) > 3 else 1
    context = ms[4] if len(ms) > 4 else 1
    mesh = (
        mesh_lib.make_mesh(ms[0], ms[1], ms[2], pipe=pipe, context=context)
        if int(np.prod(ms)) > 1
        else None
    )
    pp = (mesh, pipeline_microbatches) if (mesh is not None and pipe > 1) else None
    cp = (mesh, "context", ("data", "fsdp")) if (mesh is not None and context > 1) else None
    num_processes = jax.process_count() if mesh is not None else 1
    process_rank = jax.process_index() if mesh is not None else 0

    train_iter = iter(create_dataset(
        train_data_dir, config.block_size + 1, data_config,
        num_processes=num_processes, process_rank=process_rank, seed=seed,
    ))
    val_iter = None
    if val_data_dir is not None:
        val_iter = iter(create_dataset(
            val_data_dir, config.block_size + 1, data_config,
            num_processes=num_processes, process_rank=process_rank,
            shuffle=False, seed=seed,
        ))

    params = gpt.init_params(config, jax.random.PRNGKey(seed), dtype=dtype)
    if mesh is not None:
        params = sharding.shard_params(mesh, params)

    optimizer = optim.adamw(
        optim.warmup_cosine(learning_rate, warmup_iters, max_iters, min_lr),
        weight_decay=weight_decay, beta1=beta1, beta2=beta2, grad_clip=grad_clip,
    )
    opt_state = optimizer.init(params)
    iter_start = 0
    if resume and (latest := latest_checkpoint(out_dir)) is not None:
        print(f"Resuming from {latest}", file=sys.stderr)
        params, opt_state, iter_start = load_train_state(latest)

    step_fn = jax.jit(train.make_train_step(
        config, optimizer, accumulate_steps=gradient_accumulation, remat=True,
        shift=False,  # the data pipeline pre-shifts targets below
        pipeline=pp, context_parallel=cp,
    ), donate_argnums=(0, 1))
    eval_fn = jax.jit(train.make_eval_step(config, shift=False, pipeline=pp,
                                           context_parallel=cp))

    logger = StepCSVLogger(out_dir, name="logs")
    monitor = SpeedMonitor(get_flops_available(), logger.log_dict, window_size=50)
    flops_per_batch = (
        estimate_flops(gpt.num_params(params), config)
        * batch_size * gradient_accumulation
    )

    # fast path: the native C++ prefetching reader when built and the corpus
    # is a single unweighted source (the mixture path stays in Python)
    native_iter = None
    if len(data_config) == 1 and not data_config[0][0]:
        from parrot_tpu.data import native_reader

        if native_reader.is_available():
            files = sorted(glob.glob(str(Path(train_data_dir) / "*")))
            try:
                native_iter = native_reader.NativePackedReader(
                    files, config.block_size + 1, batch_size * gradient_accumulation,
                    shuffle=True, wrap=True, seed=seed,
                )
                print("using native packed reader", file=sys.stderr)
            except RuntimeError:
                native_iter = None

    def next_batch():
        if native_iter is not None:
            blocks = next(native_iter)
        else:
            blocks = np.stack([
                next(train_iter) for _ in range(batch_size * gradient_accumulation)
            ]).astype(np.int32)
        # input = block[:-1], target = block[1:] (redpajama.py:179-180)
        inputs, targets = blocks[:, :-1], blocks[:, 1:]
        if gradient_accumulation > 1:
            inputs = inputs.reshape(gradient_accumulation, batch_size, -1)
            targets = targets.reshape(gradient_accumulation, batch_size, -1)
        return {"input_ids": jnp.asarray(inputs), "labels": jnp.asarray(targets)}

    from parrot_tpu.utils.profiling import StepProfiler

    profiler = StepProfiler(profile_dir, start_step=iter_start + 2)

    t_start = time.perf_counter()
    final_loss = float("nan")
    it = iter_start - 1
    for it in range(iter_start, max_iters):
        profiler.maybe_start(it)
        batch = next_batch()
        t0 = time.perf_counter()
        params, opt_state, loss = step_fn(params, opt_state, batch)
        final_loss = float(loss)
        dt = time.perf_counter() - t0
        profiler.maybe_stop(it)
        monitor.on_train_batch_end(
            samples=(it + 1) * batch_size * gradient_accumulation,
            train_elapsed=time.perf_counter() - t_start,
            world_size=jax.device_count() if mesh is not None else 1,
            flops_per_batch=flops_per_batch,
            lengths=(it + 1) * batch_size * gradient_accumulation * config.block_size,
        )
        if it % log_interval == 0:
            print(f"iter {it}: loss {final_loss:.4f}, {dt * 1000:.1f} ms/iter", file=sys.stderr)
            logger.log_dict({"loss": final_loss}, step=monitor.step)
        if val_iter is not None and it % eval_interval == 0 and it > 0:
            t0 = time.perf_counter()
            losses = []
            for _ in range(eval_iters):
                vb = np.stack([next(val_iter) for _ in range(batch_size)]).astype(np.int32)
                losses.append(float(eval_fn(params, {
                    "input_ids": jnp.asarray(vb[:, :-1]),
                    "labels": jnp.asarray(vb[:, 1:]),
                })))
            monitor.eval_end(time.perf_counter() - t0)
            val_loss = float(np.mean(losses))
            print(f"iter {it}: val loss {val_loss:.4f}", file=sys.stderr)
            logger.log_dict({"val_loss": val_loss}, step=monitor.step)
        if it % save_interval == 0 and it > 0:
            save_train_state(
                out_dir / f"iter-{it:06d}-ckpt.safetensors", params, opt_state, it, config
            )
        if preempted["flag"]:
            break

    for sig, h in old_handlers.items():
        _signal.signal(sig, h)

    profiler.close()
    if preempted["flag"]:
        # it < iter_start means the loop body never ran (e.g. resume at
        # max_iters, or a signal during setup) — nothing new to checkpoint
        if it >= iter_start:
            save_train_state(
                out_dir / f"iter-{it:06d}-ckpt.safetensors", params, opt_state, it, config
            )
            print(f"preemption checkpoint saved at iter {it}; resume with --resume true",
                  file=sys.stderr)
        logger.finalize()
        return {"final_loss": final_loss, "params": params, "config": config,
                "preempted_at": it}
    save_train_state(out_dir / "lit_model_final.safetensors", params, opt_state, max_iters, config)
    logger.finalize()
    return {"final_loss": final_loss, "params": params, "config": config}
