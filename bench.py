"""Benchmark: steady-state decode throughput on the flagship single-chip path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's published TPU number — StableLM-3B on a v4-8,
"~2 s / 50-token sample" steady state => 25 tok/s (tutorials/tpus.md:55,
BASELINE.md). We run the same model class (StableLM-3B architecture, bf16,
random weights — throughput does not depend on weight values) single-chip.
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_TOK_S = 25.0  # reference v4-8 steady state, tutorials/tpus.md:55


def main() -> None:
    from parrot_tpu.config import Config
    from parrot_tpu.models import gpt
    from parrot_tpu.ops.sampling import sample

    model_name = "stablelm-base-alpha-3b"
    config = Config.from_name(model_name)
    dtype = jnp.bfloat16

    params = gpt.init_params(config, jax.random.PRNGKey(0), dtype=dtype)
    S = 512
    cache = gpt.KVCache.init(config, 1, S, dtype=dtype)

    @jax.jit
    def decode_step(params, tok, cache, pos, rng):
        logits, cache = gpt.forward_cached(params, config, tok[None, None], cache, pos)
        nxt = sample(rng, logits[0, -1], temperature=0.8, top_k=200)
        return nxt, cache

    prefill = jax.jit(functools.partial(gpt.forward_cached, config=config))

    prompt = jnp.arange(1, 9, dtype=jnp.int32)[None, :]
    logits, cache = prefill(params, idx=prompt, cache=cache, input_pos=jnp.asarray(0, jnp.int32))
    tok = jnp.argmax(logits[0, -1]).astype(jnp.int32)
    rng = jax.random.PRNGKey(0)

    # warmup (compile + a few steps); int() forces a device->host fetch, the
    # only reliable barrier on backends whose block_until_ready is lazy
    pos = 8
    for _ in range(8):
        rng, step_rng = jax.random.split(rng)
        tok, cache = decode_step(params, tok, cache, jnp.asarray(pos, jnp.int32), step_rng)
        pos += 1
    int(tok)

    n_steps = 128
    t0 = time.perf_counter()
    for _ in range(n_steps):
        rng, step_rng = jax.random.split(rng)
        tok, cache = decode_step(params, tok, cache, jnp.asarray(pos, jnp.int32), step_rng)
        pos += 1
    int(tok)  # hard sync
    dt = time.perf_counter() - t0
    tok_s = n_steps / dt

    print(
        json.dumps(
            {
                "metric": f"{model_name} bf16 decode tokens/sec (1 chip, {jax.devices()[0].device_kind})",
                "value": round(tok_s, 2),
                "unit": "tok/s",
                "vs_baseline": round(tok_s / BASELINE_TOK_S, 3),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # never leave the driver without a JSON line
        print(json.dumps({"metric": "bench_error", "value": 0, "unit": str(e)[:200], "vs_baseline": 0}))
        sys.exit(1)
