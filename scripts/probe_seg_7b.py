"""Segmented-stack falcon-7b probe: full model resident, blocks split into
segments so no single stacked buffer / scan carry exceeds SEG_LAYERS layers.

Discriminates the failure models from PERF.md round 4: if the trigger is the
SIZE of the stacked scan-carried weight buffers (not total residency), a
falcon-7b decode with blocks as two 16-layer stacks (each buffer <=660 MB,
total 3.84 GB resident) runs at FULL speed. Env: SEG_MODEL, SEG_LAYERS (16),
SEG_TOKENS (32), SEG_BUDGET_S (1200). One JSON line.
"""
import functools
import json
import os
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.resolve()))

STATE = {"stage": "import"}
T0 = time.monotonic()


def emit_and_exit():
    STATE["elapsed_s"] = round(time.monotonic() - T0, 1)
    print(json.dumps(STATE), flush=True)
    os._exit(0)


def watchdog():
    time.sleep(float(os.environ.get("SEG_BUDGET_S", "1200")))
    STATE.setdefault("result", "watchdog")
    emit_and_exit()


threading.Thread(target=watchdog, daemon=True).start()

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from parrot_tpu.config import Config
    from parrot_tpu.generate.swap import _tree_slice_layers
    from parrot_tpu.models import gpt
    from parrot_tpu.models.norms import apply_norm
    from parrot_tpu.ops.linear import apply_linear
    from parrot_tpu.ops.sampling import sample
    from parrot_tpu.quantize import api

    model = os.environ.get("SEG_MODEL", "falcon-7b")
    seg = int(os.environ.get("SEG_LAYERS", "16"))
    n_tok = int(os.environ.get("SEG_TOKENS", "32"))
    config = Config.from_name(model)
    L = config.n_layer
    assert L % seg == 0, (L, seg)
    STATE.update(model=model, seg_layers=seg, n_segments=L // seg)

    STATE["stage"] = "init_params"
    params = api.init_quantized_params(config, jax.random.PRNGKey(0), "gptq.int4")
    segments = [
        _tree_slice_layers(params["blocks"], lo, lo + seg)
        for lo in range(0, L, seg)
    ]
    head = {k: params[k] for k in ("wte", "ln_f", "lm_head")}
    del params
    jax.block_until_ready(jax.tree.leaves(segments))
    resident = sum(
        a.nbytes for a in jax.tree.leaves((segments, head))
        if hasattr(a, "nbytes")
    )
    STATE["resident_gb"] = round(resident / 2**30, 2)
    biggest = max(
        a.nbytes for a in jax.tree.leaves(segments) if hasattr(a, "nbytes")
    )
    STATE["biggest_buffer_mb"] = round(biggest / 2**20)

    S = 512
    full = gpt.KVCache.init(config, 1, S, dtype=jnp.int8)
    caches = [
        jax.tree.map(lambda a, lo=lo: a[lo : lo + seg], full)
        for lo in range(0, L, seg)
    ]

    @functools.partial(jax.jit, donate_argnums=(2,))
    def step(head, segments, caches, tok, pos, rng):
        x = jnp.take(head["wte"]["weight"], tok[None, None], axis=0)
        new_caches = []
        for i, (blk, cache) in enumerate(zip(segments, caches)):
            x, cache = gpt.forward_layers_cached(
                blk, config, x, cache, pos, layer_offset=i * seg
            )
            new_caches.append(cache)
        x = apply_norm(head["ln_f"], x, config.norm_class, config.norm_eps)
        logits = apply_linear(head["lm_head"], x[:, -1])
        return sample(rng, logits[0], 0.8, 200), new_caches

    tok = jnp.asarray(1, jnp.int32)
    rng = jax.random.PRNGKey(0)
    pos = 0
    STATE["stage"] = "compile+warmup"
    for _ in range(4):
        rng, r = jax.random.split(rng)
        tok, caches = step(head, segments, caches, tok, jnp.asarray(pos, jnp.int32), r)
        pos += 1
    int(tok)
    STATE["stage"] = "timed"
    t0 = time.perf_counter()
    for _ in range(n_tok):
        rng, r = jax.random.split(rng)
        tok, caches = step(head, segments, caches, tok, jnp.asarray(pos, jnp.int32), r)
        pos += 1
    int(tok)
    dt = time.perf_counter() - t0
    STATE.update(result="ok", tok_s=round(n_tok / dt, 1),
                 ms_per_tok=round(dt / n_tok * 1e3, 2))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        STATE.update(result="error", error=f"{type(e).__name__}: {str(e)[:300]}")
    emit_and_exit()
