#!/usr/bin/env python
"""Same-process A/B of the serving DECODE STEP: contiguous vs paged pool
(splash kernel and gather variants), no engine/admission overhead.

Isolates where the paged-vs-contiguous aggregate gap lives: if the pure
decode step ties but the engine numbers don't, the cost is admission /
allocator / host-side; if the step itself trails, it's the decode program.

    python scripts/probe_paged_step.py --model stablelm-base-alpha-3b \
        --slots 64 --seq_length 512 --fill 120

One JSON line per variant: {"variant", "tok_s", "ms_per_step"}. Fresh local
jit per variant (paged_attention.ENABLED is read at trace time).
"""

import json
import os
import sys
import time
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

import jax

os.makedirs(wd / ".jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(wd / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

if os.environ.get("SERVE_BENCH_BUDGET_S"):
    import threading

    def _watchdog():
        time.sleep(float(os.environ["SERVE_BENCH_BUDGET_S"]))
        print(json.dumps({"error": "watchdog", "mode": "probe_paged_step"}),
              flush=True)
        os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()


def main(
    model: str = "stablelm-base-alpha-3b",
    quantize: str = "gptq.int4",
    slots: int = 64,
    seq_length: int = 512,
    page_size: int = 64,
    fill: int = 120,          # live tokens per slot at measurement time
    burst: int = 16,
    rounds: int = 6,          # timed bursts per variant
    warmup: int = 2,
    total_pages: int = 0,     # 0 = full contiguous-equivalent pool
    variants: str = "contiguous,paged-kernel,paged-gather",
) -> None:
    import functools

    import jax.numpy as jnp
    import numpy as np

    from parrot_tpu.config import Config
    from parrot_tpu.models import gpt, paged_kv
    from parrot_tpu.ops import paged_attention as pa
    from parrot_tpu.ops.sampling import sample_per_slot
    from parrot_tpu.quantize import api

    config = Config.from_name(model)
    if quantize:
        params = api.init_quantized_params(config, jax.random.PRNGKey(0), quantize)
    else:
        params = gpt.init_params(config, jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    B, S, ps = slots, seq_length, page_size
    npp = S // ps
    positions0 = jnp.full((B,), fill, jnp.int32)
    cur0 = jnp.ones((B,), jnp.int32)
    samp = {"t": jnp.full((B,), 0.8, jnp.float32),
            "k": jnp.full((B,), 200, jnp.int32),
            "p": jnp.ones((B,), jnp.float32)}
    rng = jax.random.PRNGKey(0)

    def make_burst(paged):
        @functools.partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(1,))
        def run(params, cache, cur, positions, r, table=None, *, n_steps):
            def body(carry, _):
                cache, cur, positions, r = carry
                if paged:
                    logits, cache = gpt.forward_decode_batched(
                        params, config, cur[:, None], cache, positions, table)
                else:
                    logits, cache = gpt.forward_decode_batched(
                        params, config, cur[:, None], cache, positions)
                r, sr = jax.random.split(r)
                nxt = sample_per_slot(sr, logits[:, 0], samp["t"], samp["k"],
                                      samp["p"], use_top_k=True, use_top_p=False)
                return (cache, nxt, positions + 1, r), nxt

            (cache, cur, positions, r), toks = jax.lax.scan(
                body, (cache, cur, positions, r), None, length=n_steps)
            return toks, cache, cur, positions

        return run

    for variant in variants.split(","):
        variant = variant.strip()
        pa.ENABLED = variant != "paged-gather"
        paged = variant.startswith("paged")
        if paged:
            need = -(-(fill + burst * (warmup + rounds) + 1) // ps)
            P = total_pages or (B * npp + 1)
            assert P > B * min(need, npp), (P, B, need)
            cache = paged_kv.PagedKVCache.init(config, P, ps, dtype=jnp.int8)
            # disjoint live pages per slot (allocator layout, pages 1..)
            table = np.full((B, npp), -1, np.int32)
            nxt_page = 1
            for b in range(B):
                for j in range(min(need, npp)):
                    table[b, j] = nxt_page
                    nxt_page += 1
            table = jnp.asarray(table)
        else:
            cache = gpt.KVCache.init(config, B, S, dtype=jnp.int8)
            table = None

        run = make_burst(paged)
        positions, cur, r = positions0, cur0, rng
        args = (table,) if paged else ()
        for i in range(warmup):
            toks, cache, cur, positions = run(
                params, cache, cur, positions, jax.random.fold_in(r, i), *args,
                n_steps=burst)
        jax.block_until_ready(toks)
        t0 = time.perf_counter()
        for i in range(rounds):
            toks, cache, cur, positions = run(
                params, cache, cur, positions, jax.random.fold_in(r, 100 + i), *args,
                n_steps=burst)
        jax.block_until_ready(toks)
        dt = time.perf_counter() - t0
        n_tok = B * burst * rounds
        print(json.dumps({
            "variant": variant, "model": config.name, "slots": B, "S": S,
            "fill": fill, "burst": burst,
            "ms_per_step": round(dt / (burst * rounds) * 1e3, 3),
            "tok_s": round(n_tok / dt, 1),
        }), flush=True)


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
