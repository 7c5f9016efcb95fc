"""Shared finetuning driver: the reference's training skeleton
(``finetune/full.py:45-233``: setup -> load -> train loop with grad
accumulation, periodic validate that also samples a generation, interval
checkpointing, speed monitoring) as one function parameterized by method.

Methods: ``full`` | ``lora`` | ``adapter`` | ``adapter_v2`` — each differing
only in how parameters are extended, which leaves train, and what gets saved
(full model vs filtered deltas, ``finetune/lora.py:307-309``).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from parrot_tpu.config import Config
from parrot_tpu.data import sft
from parrot_tpu.generate import engine
from parrot_tpu.models import adapter as adapter_lib
from parrot_tpu.models import adapter_v2 as adapter_v2_lib
from parrot_tpu.models import gpt
from parrot_tpu.models import lora as lora_lib
from parrot_tpu.parallel import mesh as mesh_lib
from parrot_tpu.parallel import sharding
from parrot_tpu.training import optim, train
from parrot_tpu.utils import checkpoint as ckpt
from parrot_tpu.utils.csv_logger import StepCSVLogger
from parrot_tpu.utils.speed_monitor import (
    SpeedMonitor, estimate_flops, get_flops_available,
)


def setup_method(method: str, base_config: Config, params, rng, **knobs):
    """Extend params per method; return (config, params, trainable_mask,
    save_filter)."""
    if method == "full":
        return base_config, params, None, None
    if method == "lora":
        config = lora_lib.LoRAConfig(
            **base_config.to_dict(),
            r=knobs.get("lora_r", 8), alpha=knobs.get("lora_alpha", 16),
            dropout=knobs.get("lora_dropout", 0.05),
            to_query=knobs.get("lora_query", True),
            to_key=knobs.get("lora_key", False),
            to_value=knobs.get("lora_value", True),
            to_projection=knobs.get("lora_projection", False),
            to_mlp=knobs.get("lora_mlp", False),
            to_head=knobs.get("lora_head", False),
        )
        params = lora_lib.add_lora_params(config, params, rng)
        return config, params, lora_lib.lora_trainable_mask(params), lora_lib.lora_filter
    if method in ("adapter", "adapter_v2"):
        config = adapter_lib.AdapterConfig(
            **base_config.to_dict(),
            adapter_prompt_length=knobs.get("adapter_prompt_length", 10),
            adapter_start_layer=knobs.get("adapter_start_layer", 2),
        )
        if method == "adapter":
            params = adapter_lib.add_adapter_params(config, params, rng)
            return (config, params, adapter_lib.adapter_trainable_mask(params),
                    adapter_lib.adapter_filter)
        params = adapter_v2_lib.add_adapter_v2_params(config, params, rng)
        return (config, params, adapter_v2_lib.adapter_v2_trainable_mask(params),
                adapter_v2_lib.adapter_v2_filter)
    raise ValueError(f"unknown finetune method {method!r}")


def finetune(
    method: str,
    data_dir: Path,
    checkpoint_dir: Path,
    out_dir: Path,
    *,
    precision: str = "bf16-true",
    learning_rate: float = 3e-3,
    batch_size: int = 64,
    micro_batch_size: int = 4,
    max_iters: int = 1000,
    weight_decay: float = 0.02,
    warmup_steps: int = 100,
    max_seq_length: Optional[int] = None,
    eval_interval: int = 100,
    eval_iters: int = 100,
    save_interval: int = 200,
    log_interval: int = 10,
    eval_max_new_tokens: int = 100,
    seed: int = 1337,
    mesh_shape: tuple[int, ...] = (1, 1, 1),
    pipeline_microbatches: int = 1,
    **method_knobs,
) -> dict:
    from parrot_tpu.generate.loader import PRECISION_DTYPES, load_model

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    gradient_accumulation = batch_size // micro_batch_size
    assert gradient_accumulation > 0

    base_config, params, tokenizer = load_model(checkpoint_dir, precision=precision)
    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    config, params, mask, save_filter = setup_method(
        method, base_config, params, init_rng, **method_knobs
    )

    train_data = sft.load_dataset(Path(data_dir) / "train.npz")
    val_data = sft.load_dataset(Path(data_dir) / "test.npz")
    longest, longest_ix = sft.longest_seq_info(train_data)
    seq_length = min(max_seq_length or longest, config.block_size, longest)

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
    # context parallelism: the token axis shards over 'context' and attention
    # runs as a ring (VERDICT r2 #6 — long-context training from the CLI)
    cp = (mesh, "context", ("data", "fsdp")) if (mesh is not None and context > 1) else None
    if mesh is not None:
        params = sharding.shard_params(mesh, params)
    if context > 1:
        # the ring shards the token axis: sequence length must divide evenly.
        # Round UP within the block-size/user caps, else DOWN (never exceed
        # either cap, and never end up non-divisible after clamping).
        up = ((seq_length + context - 1) // context) * context
        cap = min(config.block_size, max_seq_length or config.block_size)
        seq_length = up if up <= cap else (cap // context) * context
        if seq_length < context:
            raise ValueError(
                f"sequence cap {cap} is too small for context axis {context}"
            )

    optimizer = optim.adamw(
        optim.warmup_constant(learning_rate, warmup_steps), weight_decay=weight_decay
    )
    train_step = train.make_train_step(
        config, optimizer, accumulate_steps=gradient_accumulation,
        remat=True, trainable_mask=mask, pipeline=pp, context_parallel=cp,
    )
    # PEFT: the masked optimizer allocates moments only for trainable leaves
    opt_state = train_step.optimizer.init(params)
    step_fn = jax.jit(train_step, donate_argnums=(0, 1))
    eval_fn = jax.jit(train.make_eval_step(config, pipeline=pp, context_parallel=cp))

    logger = StepCSVLogger(out_dir, name="logs")
    monitor = SpeedMonitor(get_flops_available(), logger.log_dict, window_size=50)
    flops_per_batch = estimate_flops(gpt.num_params(params), config) / config.block_size \
        * seq_length * micro_batch_size * gradient_accumulation

    np_rng = np.random.default_rng(seed)

    def make_batch(first: bool = False):
        micro = [
            sft.get_batch(np_rng, train_data, micro_batch_size, seq_length,
                          longest_seq_ix=longest_ix if first and a == 0 else None)
            for a in range(gradient_accumulation)
        ]
        return {
            k: jnp.asarray(np.stack([m[k] for m in micro]))
            for k in ("input_ids", "labels")
        } if gradient_accumulation > 1 else {
            k: jnp.asarray(micro[0][k]) for k in ("input_ids", "labels")
        }

    def validate() -> float:
        losses = []
        for _ in range(min(eval_iters, max(1, len(val_data) // micro_batch_size))):
            batch = {
                k: jnp.asarray(v)
                for k, v in sft.get_batch(np_rng, val_data, micro_batch_size, seq_length).items()
            }
            losses.append(float(eval_fn(params, batch)))
        # sample a completion like the reference validate (finetune/full.py:211-219)
        instruction = "Recommend a movie for me to watch during the weekend and explain the reason."
        encoded = jnp.asarray(
            tokenizer.encode(sft.generate_prompt({"instruction": instruction, "input": ""})),
            jnp.int32,
        )
        toks, n = engine.generate(
            params, config, encoded, jax.random.PRNGKey(0),
            max_returned_tokens=min(int(encoded.shape[0]) + eval_max_new_tokens,
                                    config.block_size),
            temperature=0.8, top_k=200,
            cache_dtype=PRECISION_DTYPES[precision],
        )
        print(f"[eval sample] {tokenizer.decode(toks[:int(n)])}", file=sys.stderr)
        return float(np.mean(losses))

    t_start = time.perf_counter()
    final_loss = float("nan")
    for it in range(max_iters):
        batch = make_batch(first=(it == 0))
        t0 = time.perf_counter()
        params, opt_state, loss = step_fn(params, opt_state, batch)
        final_loss = float(loss)  # sync
        dt = time.perf_counter() - t0
        monitor.on_train_batch_end(
            samples=(it + 1) * batch_size,
            train_elapsed=time.perf_counter() - t_start,
            world_size=jax.device_count() if mesh is not None else 1,
            flops_per_batch=flops_per_batch,
            lengths=(it + 1) * batch_size * seq_length,
        )
        if it % log_interval == 0:
            print(f"iter {it}: loss {final_loss:.4f}, {dt * 1000:.1f} ms/iter", file=sys.stderr)
            logger.log_dict({"loss": final_loss}, step=monitor.step)
        if it % eval_interval == 0 and it > 0:
            t0 = time.perf_counter()
            val_loss = validate()
            monitor.eval_end(time.perf_counter() - t0)
            print(f"iter {it}: val loss {val_loss:.4f}", file=sys.stderr)
            logger.log_dict({"val_loss": val_loss}, step=monitor.step)
        if it % save_interval == 0 and it > 0:
            _save(out_dir / f"iter-{it:06d}-ckpt.safetensors", params, save_filter)

    _save(out_dir / f"lit_model_{method}_finetuned.safetensors", params, save_filter)
    logger.finalize()
    return {"final_loss": final_loss, "params": params, "config": config}


def _save(path: Path, params, save_filter) -> None:
    to_save = ckpt.filter_params(params, save_filter) if save_filter else params
    ckpt.save_checkpoint(path, to_save)
    print(f"Saved {path}", file=sys.stderr)
