#!/usr/bin/env python
"""On-chip MFU sweep over rematerialization policies (VERDICT r4 #7).

Round-4 recorded pythia-2.8b LoRA at 48% MFU with full per-block remat.
Full remat recomputes every block forward in the backward pass — executed
FLOPs ≈ 8ND against the analytic 6ND that MFU is scored on, capping MFU at
~75% before any inefficiency. The "dots" policy
(``dots_with_no_batch_dims_saveable``) keeps matmul outputs and only
recomputes the cheap elementwise/attention glue; "none" keeps everything.

    python scripts/sweep_mfu.py --model pythia-2.8b --method lora \
        --remats full,dots,none --steps 8

Prints one JSON line per policy: {"remat", "ms_per_step", "tok_s", "mfu"}.
MFU uses the analytic estimate (``speed_monitor.estimate_flops``, the same
6ND+attention formula the reference scores with) over the device's bf16
peak — NOT XLA cost analysis, which would count remat recompute as useful
work and flatter full-remat runs.
"""

import json
import sys
import time
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))


def main(
    model: str = "pythia-2.8b",
    method: str = "lora",
    batch_size: int = 4,
    seq_len: int = 1024,
    remats: str = "full,dots",
    steps: int = 8,
    warmup: int = 3,
) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from parrot_tpu.config import Config
    from parrot_tpu.models import gpt
    from parrot_tpu.training import optim, train
    from parrot_tpu.training.finetune import setup_method
    from parrot_tpu.utils import speed_monitor

    base_config = Config.from_name(model)
    flops_avail = speed_monitor.get_flops_available(precision="bf16")

    for remat_name in remats.split(","):
        remat_name = remat_name.strip()
        remat = {"full": True, "dots": "dots", "none": False}[remat_name]
        config = Config.from_name(model)
        params = gpt.init_params(config, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
        mask = None
        if method != "full":
            config, params, mask, _ = setup_method(
                method, config, params, jax.random.PRNGKey(1))
        optimizer = optim.adamw(optim.warmup_constant(1e-4, 0), weight_decay=0.02)
        train_step = train.make_train_step(
            config, optimizer, remat=remat, trainable_mask=mask)
        opt_state = train_step.optimizer.init(params)
        step_fn = jax.jit(train_step, donate_argnums=(0, 1))
        rng = np.random.RandomState(0)
        batch = {
            k: jnp.asarray(
                rng.randint(0, config.padded_vocab_size, (batch_size, seq_len)),
                jnp.int32)
            for k in ("input_ids", "labels")
        }
        try:
            loss = None
            for _ in range(warmup):
                params, opt_state, loss = step_fn(params, opt_state, batch)
            assert np.isfinite(float(loss))
            t0 = time.perf_counter()
            for _ in range(steps):
                params, opt_state, loss = step_fn(params, opt_state, batch)
            float(loss)
            dt = (time.perf_counter() - t0) / steps
        except Exception as e:  # OOM etc: report and continue the sweep
            print(json.dumps({
                "model": model, "method": method, "remat": remat_name,
                "error": str(e)[:160],
            }), flush=True)
            del params, opt_state
            continue
        # analytic FLOPs at the ACTUAL seq_len (estimate_flops assumes
        # config.block_size): 2*n_params per token + quadratic attention, x3
        # for fwd+bwd — the reference's own MFU formula
        flops_seq = 3 * (
            2 * n_params * seq_len
            + base_config.n_layer * 4 * base_config.n_embd * seq_len**2
        )
        flops_sec = flops_seq * batch_size / dt
        print(json.dumps({
            "model": model, "method": method, "remat": remat_name,
            "ms_per_step": round(dt * 1e3, 1),
            "tok_s": round(batch_size * seq_len / dt, 1),
            "mfu": round(flops_sec / flops_avail, 4) if flops_avail else None,
        }), flush=True)
        del params, opt_state


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
