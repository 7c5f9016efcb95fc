#!/usr/bin/env python
"""In-process A/B of decode kernel variants (one process, same minute —
relay throughput drifts run to run, so cross-process comparisons lie).

    python scripts/ab_decode.py --model falcon-7b --quantize gptq.int2 \
        --variants 2dot-f32,w8a8 --steps 64

Prints one JSON line per variant: {"variant", "tok_s", "ms_per_step"}.
A FRESH jit per variant (kernel choice is a module global read at trace
time). Async per-token dispatch, ONE final barrier.
"""

import json
import sys
import time
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))


def main(
    model: str = "falcon-7b",
    quantize: str = "gptq.int2",
    variants: str = "2dot-f32,w8a8",
    steps: int = 64,
    warmup: int = 8,
    max_seq_length: int = 512,
    repeats: int = 2,
    modes: str = "fitted",
) -> None:
    import functools

    import jax
    import jax.numpy as jnp

    from parrot_tpu.config import Config
    from parrot_tpu.models import gpt
    from parrot_tpu.ops import pallas_quant
    from parrot_tpu.ops.sampling import sample
    from parrot_tpu.quantize import api

    config = Config.from_name(model)
    combos = [
        (v.strip(), m.strip())
        for v in variants.split(",")
        for m in modes.split(",")
    ]
    for variant, n_tile_mode in combos:
        pallas_quant.set_int4_variant(variant)
        pallas_quant.N_TILE_MODE = n_tile_mode
        params = api.init_quantized_params(config, jax.random.PRNGKey(0), quantize)
        jax.block_until_ready(jax.tree.leaves(params)[0])

        @functools.partial(jax.jit, donate_argnums=(2,))
        def step_fn(params, tok, cache, pos, rng):
            logits, cache = gpt.forward_cached(
                params, config, tok[None, None], cache, pos)
            return sample(rng, logits[0, -1], 0.8, 200, None), cache

        best = None
        for rep in range(repeats):
            cache = gpt.KVCache.init(config, 1, max_seq_length, dtype=jnp.int8)
            tok = jnp.asarray(1, jnp.int32)
            rng = jax.random.PRNGKey(0)
            pos = 0
            for _ in range(warmup):
                rng, r = jax.random.split(rng)
                tok, cache = step_fn(params, tok, cache, jnp.asarray(pos, jnp.int32), r)
                pos += 1
            int(tok)
            t0 = time.perf_counter()
            for _ in range(steps):
                rng, r = jax.random.split(rng)
                tok, cache = step_fn(params, tok, cache, jnp.asarray(pos, jnp.int32), r)
                pos += 1
            int(tok)
            dt = time.perf_counter() - t0
            rate = steps / dt
            best = rate if best is None else max(best, rate)
        print(json.dumps({
            "model": model, "quantize": quantize, "variant": variant,
            "n_tile_mode": n_tile_mode,
            "tok_s": round(best, 2), "ms_per_step": round(1000 / best, 3),
        }), flush=True)
        del params


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
