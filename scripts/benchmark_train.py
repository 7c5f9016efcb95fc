"""Measure a real training step on the chip: ms/step, tokens/s, MFU, memory.

VERDICT r2 #2: the reference publishes finetune memory floors and runs its
SpeedMonitor in anger (``tutorials/finetune_lora.md:33,55``,
``lit_gpt/speed_monitor.py:121-275``); this is the TPU-side measurement.
Synthetic batches (throughput does not depend on token values); the step is
the production ``train.make_train_step`` — same loss, remat, optimizer as
``scripts/finetune_*.py`` / ``scripts/pretrain_*.py``.

Prints one JSON line:
  {"model", "method", "seq", "batch", "ms_per_step", "tok_s", "mfu",
   "peak_mem_gb", "device"}

Usage:
  python scripts/benchmark_train.py --model pythia-410m --method lora \
      --seq 1024 --micro_batch 4 --steps 12
"""

import json
import sys
import time
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).parent.parent.resolve()))

import jax
import jax.numpy as jnp
import numpy as np


def main(
    model: str = "pythia-410m",
    method: str = "lora",  # full | lora | adapter | adapter_v2
    seq: int = 1024,
    micro_batch: int = 4,
    accumulate: int = 1,
    steps: int = 12,
    warmup: int = 3,
    precision: str = "bf16-true",
    remat: bool = True,
    block_size: Optional[int] = None,
    lm_head_chunk_size: int = 0,
    watchdog_s: float = 0.0,
) -> dict:
    if watchdog_s:
        # the relay can hang a process indefinitely (stale claim / hung
        # compile); never kill it from outside — bound it from inside
        import os
        import threading

        def _die():
            time.sleep(watchdog_s)
            print(json.dumps({"error": "watchdog", "model": model}), flush=True)
            os._exit(0)

        threading.Thread(target=_die, daemon=True).start()

    from parrot_tpu.config import Config
    from parrot_tpu.models import gpt
    from parrot_tpu.training import optim, train
    from parrot_tpu.training.finetune import setup_method
    from parrot_tpu.utils.speed_monitor import estimate_flops, get_flops_available

    dtype = jnp.bfloat16 if "bf16" in precision else jnp.float32
    config = Config.from_name(model)
    if block_size:
        # Config is a frozen dataclass — attribute assignment raises
        config = config.replace(block_size=block_size)
    seq = min(seq, config.block_size)

    rng = jax.random.PRNGKey(0)
    params = gpt.init_params(config, rng, dtype=dtype)
    config, params, mask, _ = setup_method(method, config, params, rng)
    n_params = gpt.num_params(params)

    optimizer = optim.adamw(optim.warmup_constant(1e-4, 0), weight_decay=0.02)
    train_step = train.make_train_step(
        config, optimizer, accumulate_steps=accumulate, remat=remat,
        trainable_mask=mask, lm_head_chunk_size=lm_head_chunk_size,
    )
    opt_state = train_step.optimizer.init(params)
    step_fn = jax.jit(train_step, donate_argnums=(0, 1))

    np_rng = np.random.RandomState(0)
    shape = (accumulate, micro_batch, seq) if accumulate > 1 else (micro_batch, seq)
    batch = {
        "input_ids": jnp.asarray(
            np_rng.randint(0, config.padded_vocab_size, shape), jnp.int32),
        "labels": jnp.asarray(
            np_rng.randint(0, config.padded_vocab_size, shape), jnp.int32),
    }

    # static HBM footprint from XLA (the relay backend reports no runtime
    # memory_stats): program arguments + scratch. Donation aliases outputs
    # onto arguments, so args+temps IS the peak program footprint.
    prog_mem = None
    try:
        ma = step_fn.lower(params, opt_state, batch).compile().memory_analysis()
        prog_mem = (ma.argument_size_in_bytes + ma.temp_size_in_bytes) / 2**30
    except Exception:
        pass

    loss = None
    for _ in range(warmup):
        params, opt_state, loss = step_fn(params, opt_state, batch)
    assert np.isfinite(float(loss)), float(loss)  # sync: warmup finished

    # async step chain, one final barrier (PERF.md: every host sync on the
    # relay drains the dispatch pipeline at a ~25 ms round-trip)
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, loss = step_fn(params, opt_state, batch)
    final_loss = float(loss)
    elapsed = time.perf_counter() - t0
    assert np.isfinite(final_loss), final_loss

    ms_per_step = elapsed / steps * 1000.0
    tokens_per_batch = micro_batch * accumulate * seq
    tok_s = tokens_per_batch * steps / elapsed
    # estimate_flops at the ACTUAL sequence length (the attention term is
    # quadratic in it; scaling the block_size figure linearly overcounts)
    weight_flops = 2 * n_params * seq
    attn_flops = config.n_layer * 2 * 2 * config.n_embd * seq**2
    flops_per_batch = 3 * (weight_flops + attn_flops) * micro_batch * accumulate
    peak = get_flops_available(precision="bf16")
    mfu = (flops_per_batch * steps / elapsed / peak) if peak else None

    mem = prog_mem
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "peak_bytes_in_use" in stats:
            mem = stats["peak_bytes_in_use"] / 2**30
    except Exception:
        pass

    rec = {
        "model": model, "method": method, "seq": seq,
        "batch": micro_batch * accumulate, "ms_per_step": round(ms_per_step, 1),
        "tok_s": round(tok_s, 1), "mfu": round(mfu, 4) if mfu else None,
        "peak_mem_gb": round(mem, 2) if mem else None,
        "loss": round(final_loss, 4),
        "n_params": n_params,
        "device": jax.devices()[0].device_kind,
    }
    print(json.dumps(rec), flush=True)
    return rec


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    sys.exit(0 if cli(main) is not None else 1)
