"""Sweep int4 dequant-matmul kernel variants on real TPU.

Measures (a) standalone per-layer matmul bandwidth at decode shapes and
(b) in-model single-token decode tok/s on a registry model, across the
kernel variants in :mod:`parrot_tpu.ops.pallas_quant`:

  grouped     the general per-group kernel (round-1 baseline)
  2dot        packed-byte two-dot rewrite, bf16 MXU dots
  2dot-f32    same, f32 fed straight to the MXU (skips the bf16 cast pass)
  w8a8        two-dot on the int8 MXU (W8A8 numerics, opt-in path)

Run in the background and poll the log (never timeout-kill a TPU process):
    nohup python scripts/sweep_int4_kernel.py > /tmp/sweep_int4.log 2>&1 &

Context: round-1 measured the grouped kernel at 275-347 GB/s vs a 709 GB/s
demonstrated HBM roofline on the same chip; the gap is VPU elementwise
unpack/cast passes over weight-sized data, which the 2-dot variants cut
(see pallas_quant.py docstrings). The reference's analogous tuning surface
is its Triton autotune configs (``quantize/gptq.py:63-100``).
"""

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.resolve()))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from parrot_tpu.config import Config
from parrot_tpu.models import gpt
from parrot_tpu.ops import pallas_quant
from parrot_tpu.ops.sampling import sample
from parrot_tpu.quantize import api


def set_variant(name: str) -> str:
    """Returns the quantized-matmul mode string for init; sets kernel flags."""
    pallas_quant.set_int4_variant(name)
    return "gptq.int4"


def bench_layer(name: str, K: int, N: int, n_iter: int = 50) -> float:
    """Standalone decode-shape matmul; returns effective GB/s on packed bytes."""
    w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.float32) * 0.02
    from parrot_tpu.quantize import formats

    p = formats.quantize_int4(w, group_size=-1)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, K), jnp.bfloat16)

    if name == "w8a8":
        fn = jax.jit(lambda p, x: pallas_quant.int4_matmul_w8a8(p, x))
    else:
        fn = jax.jit(lambda p, x: pallas_quant.int4_matmul(p, x))
    y = fn(p, x)
    float(y.sum())  # barrier
    t0 = time.perf_counter()
    for _ in range(n_iter):
        y = fn(p, x)
    float(y.sum())
    dt = (time.perf_counter() - t0) / n_iter
    return (K // 2) * N / dt / 1e9


def bench_model(model_name: str, n_steps: int = 64) -> float:
    config = Config.from_name(model_name)
    params = api.init_quantized_params(config, jax.random.PRNGKey(0), "gptq.int4")
    jax.block_until_ready(params["lm_head"].qw)
    cache = gpt.KVCache.init(config, 1, 256, dtype=jnp.int8)

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
    int(tok)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        rng, r = jax.random.split(rng)
        tok, cache = step(params, tok, cache, jnp.asarray(pos, jnp.int32), r)
        pos += 1
    int(tok)
    return n_steps / (time.perf_counter() - t0)


def main() -> None:
    variants = ["grouped", "2dot", "2dot-f32", "w8a8"]
    # falcon-7b decode shapes: attn QKV / proj, mlp fc / proj
    shapes = [(4544, 4672), (4544, 4544), (4544, 18176), (18176, 4544)]
    results = {}
    for v in variants:
        set_variant(v)
        per_layer = {}
        for K, N in shapes:
            gbs = bench_layer(v, K, N)
            per_layer[f"{K}x{N}"] = round(gbs, 1)
            print(f"[layer] {v:10s} {K}x{N}: {gbs:7.1f} GB/s", flush=True)
        results[v] = {"layers_gbs": per_layer}
    model = "stablelm-base-alpha-3b"
    for v in variants:
        set_variant(v)
        tok_s = bench_model(model)
        results[v]["model_tok_s"] = round(tok_s, 1)
        print(f"[model] {v:10s} {model}: {tok_s:7.1f} tok/s", flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
