"""Benchmark: the north-star serving path — falcon-7b GPTQ-int4 decode with
INT8 KV cache, single chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's published falcon-7b gptq.int4 decode — 6.48 tok/s
on an A100-40GB (tutorials/quantize.md:127-128, BASELINE.md). Weights are
random in quantized form (throughput does not depend on weight values; the
fp16 falcon-7b would not fit next to its int4 copy in 16 GB HBM anyway).

BENCH_MODE=bf16-3b selects the older StableLM-3B bf16 bench
(vs tutorials/tpus.md:55, 25 tok/s on a v4-8).
"""

import functools
import json
import os
import sys
import time

import jax

# persistent compilation cache: the falcon-7b decode program takes minutes to
# compile cold; cache it across bench invocations
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def bench_decode(config, params, cache_dtype, n_steps: int = 96) -> float:
    from parrot_tpu.models import gpt
    from parrot_tpu.ops.sampling import sample

    cache = gpt.KVCache.init(config, 1, 512, dtype=cache_dtype)

    # donate the cache: without donation every step round-trips the whole
    # cache through fresh HBM buffers
    @functools.partial(jax.jit, donate_argnums=(2,))
    def step(params, tok, cache, pos, rng):
        logits, cache = gpt.forward_cached(params, config, tok[None, None], cache, pos)
        return sample(rng, logits[0, -1], temperature=0.8, top_k=200), cache

    tok = jnp.asarray(1, jnp.int32)
    rng = jax.random.PRNGKey(0)
    pos = 0
    for _ in range(8):
        rng, r = jax.random.split(rng)
        tok, cache = step(params, tok, cache, jnp.asarray(pos, jnp.int32), r)
        pos += 1
    int(tok)  # device->host fetch: the only reliable barrier on lazy backends
    t0 = time.perf_counter()
    for _ in range(n_steps):
        rng, r = jax.random.split(rng)
        tok, cache = step(params, tok, cache, jnp.asarray(pos, jnp.int32), r)
        pos += 1
    int(tok)
    return n_steps / (time.perf_counter() - t0)


def main() -> None:
    from parrot_tpu.config import Config
    from parrot_tpu.models import gpt
    from parrot_tpu.quantize import api

    mode = os.environ.get("BENCH_MODE", "int4-7b")
    kind = jax.devices()[0].device_kind

    if mode == "bf16-3b":
        config = Config.from_name("stablelm-base-alpha-3b")
        params = gpt.init_params(config, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        tok_s = bench_decode(config, params, jnp.bfloat16)
        metric = f"stablelm-3b bf16 decode tok/s (1 chip, {kind})"
        baseline = 25.0  # v4-8 steady state, tutorials/tpus.md:55
    else:
        config = Config.from_name("falcon-7b")
        params = api.init_quantized_params(config, jax.random.PRNGKey(0), "gptq.int4")
        tok_s = bench_decode(config, params, jnp.int8)
        metric = f"falcon-7b gptq.int4 + int8-KV decode tok/s (1 chip, {kind})"
        baseline = 6.48  # A100 40GB, tutorials/quantize.md:127-128

    print(json.dumps({
        "metric": metric,
        "value": round(tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / baseline, 3),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # never leave the driver without a JSON line
        print(json.dumps(
            {"metric": "bench_error", "value": 0, "unit": str(e)[:200], "vs_baseline": 0}
        ))
        sys.exit(1)
