"""7B-wall probe: run one decode configuration and print a JSON verdict.

VERDICT r3 #1: the relay rejects large quantized decode
programs (falcon-7b / pythia-6.9b int4 — Pallas AND pure-XLA paths) while a
4.6 GB training program and every synthetic reproduction pass. This script
changes the program's SHAPE rather than retrying the failing signature:

  PROBE7B_MODE=
    falcon7b-int8     falcon-7b bnb.int8 decode   (~7.2 GB resident)
    falcon7b-nf4      falcon-7b bnb.nf4 decode    (~3.9 GB resident)
    falcon7b-int4     the known-failing signature (control)
    falcon7b-int4-L<n>  falcon-7b int4 truncated to n layers (bisect)
    pythia28-int4     pythia-2.8b int4 (~1.5 GB: size ladder, NeoX geometry)
  PROBE7B_STEPS    timed steps (default 64)
  PROBE7B_BUDGET_S watchdog (default 900; falcon compiles are minutes cold)

Always exits on its own (killing a mid-op process wedges the relay); the
watchdog prints whatever stage it died in. One JSON line on stdout.
"""
import functools
import json
import os
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.resolve()))

STATE = {"mode": os.environ.get("PROBE7B_MODE", "falcon7b-int8"), "stage": "import"}
T0 = time.monotonic()


def emit_and_exit() -> None:
    STATE["elapsed_s"] = round(time.monotonic() - T0, 1)
    print(json.dumps(STATE), flush=True)
    os._exit(0)


def watchdog() -> None:
    time.sleep(float(os.environ.get("PROBE7B_BUDGET_S", "900")))
    STATE.setdefault("result", "watchdog")
    emit_and_exit()


threading.Thread(target=watchdog, daemon=True).start()

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402


def main() -> None:
    from parrot_tpu.config import Config
    from parrot_tpu.generate.engine import _decode_step
    from parrot_tpu.models import gpt
    from parrot_tpu.quantize import api

    mode = STATE["mode"]
    if mode.startswith("falcon7b"):
        config = Config.from_name("falcon-7b")
        qmode = {"int8": "bnb.int8", "nf4": "bnb.nf4", "int4": "gptq.int4"}[
            mode.split("-")[1]
        ]
        if "-L" in mode:
            config = config.replace(n_layer=int(mode.rsplit("-L", 1)[1]))
    elif mode.startswith("pythia28"):
        config = Config.from_name("pythia-2.8b")
        qmode = {"int4": "gptq.int4", "int8": "bnb.int8", "nf4": "bnb.nf4"}[
            mode.split("-")[1]
        ]
    elif mode.startswith("llama7b"):
        config = Config.from_name("Llama-2-7b-hf")
        qmode = {"int4": "gptq.int4", "int8": "bnb.int8", "nf4": "bnb.nf4"}[
            mode.split("-")[1]
        ]
        if "-L" in mode:
            config = config.replace(n_layer=int(mode.rsplit("-L", 1)[1]))
    elif mode.startswith("pythia69"):
        config = Config.from_name("pythia-6.9b")
        qmode = "gptq.int4"
        if "-L" in mode:
            config = config.replace(n_layer=int(mode.rsplit("-L", 1)[1]))
    else:
        raise ValueError(mode)

    STATE["stage"] = "init_params"
    params = api.init_quantized_params(config, jax.random.PRNGKey(0), qmode)

    # ablations (PROBE7B_ABLATION): name the trigger feature of the failing
    # decode-program signature by removing one component at a time from the
    # otherwise-identical program.
    ablation = os.environ.get("PROBE7B_ABLATION", "")
    STATE["ablation"] = ablation
    cache_dtype = jnp.int8
    temperature, top_k = 0.8, 200
    if ablation == "greedy":  # no top-k sort / categorical
        temperature, top_k = 0.0, None
    elif ablation == "bf16kv":  # no int8 KV quantize/scale machinery
        cache_dtype = jnp.bfloat16
    elif ablation == "smallhead":  # quantized lm_head (the largest single
        # kernel, K=n_embd x V~65k) replaced by a tiny bf16 dense head
        params["lm_head"] = {
            "w": jax.random.normal(
                jax.random.PRNGKey(9), (config.n_embd, 256), jnp.bfloat16
            ) * 0.02
        }
        config = config.replace(vocab_size=256, padded_vocab_size=256)
        params["wte"] = {"weight": jax.random.normal(
            jax.random.PRNGKey(10), (256, config.n_embd), jnp.bfloat16) * 0.02}
    elif ablation == "bf16head":  # lm_head dense bf16 at FULL vocab
        params["lm_head"] = {
            "w": jax.random.normal(
                jax.random.PRNGKey(9),
                (config.n_embd, config.padded_vocab_size), jnp.bfloat16,
            ) * 0.02
        }

    leaf = jax.tree.leaves(params)[0]
    jax.block_until_ready(leaf)
    resident = sum(
        a.nbytes for a in jax.tree.leaves(params) if hasattr(a, "nbytes")
    )
    STATE["resident_gb"] = round(resident / 2**30, 2)

    cache = gpt.KVCache.init(config, 1, 512, dtype=cache_dtype)
    step = functools.partial(
        _decode_step, config=config, temperature=temperature, top_k=top_k
    )

    tok = jnp.asarray(1, jnp.int32)
    rng = jax.random.PRNGKey(0)
    pos = 0
    STATE["stage"] = "compile+warmup"
    for _ in range(8):
        rng, r = jax.random.split(rng)
        tok, cache = step(params, tok, cache, jnp.asarray(pos, jnp.int32), r)
        pos += 1
    int(tok)
    STATE["stage"] = "timed"
    n_steps = int(os.environ.get("PROBE7B_STEPS", "64"))
    t0 = time.perf_counter()
    for _ in range(n_steps):
        rng, r = jax.random.split(rng)
        tok, cache = step(params, tok, cache, jnp.asarray(pos, jnp.int32), r)
        pos += 1
    int(tok)
    dt = time.perf_counter() - t0
    STATE.update(result="ok", tok_s=round(n_steps / dt, 1), ms_per_tok=round(dt / n_steps * 1e3, 2))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        STATE.update(result="error", error=f"{type(e).__name__}: {str(e)[:300]}")
    emit_and_exit()
