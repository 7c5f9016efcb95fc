"""Re-measure streaming chat through the copy-free kernels (VERDICT r3 #7).

Round 2 measured engine.generate_stream at 151.5 tok/s (burst 16) BEFORE the
scalar-prefetch stacked kernels landed; the round-3 re-measure died on a hung
compile service. Same protocol: 3B gptq.int4 + int8 KV, warm steady state,
96 streamed tokens, burst sweep. One JSON line per burst setting.

Env: STREAM_MODEL, STREAM_BUDGET_S (default 1200). Self-watchdogged.
"""
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
    time.sleep(float(os.environ.get("STREAM_BUDGET_S", "1200")))
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
    from parrot_tpu.generate import engine
    from parrot_tpu.quantize import api

    model = os.environ.get("STREAM_MODEL", "stablelm-base-alpha-3b")
    config = Config.from_name(model)
    STATE.update(model=model)
    STATE["stage"] = "init_params"
    params = api.init_quantized_params(config, jax.random.PRNGKey(0), "gptq.int4")
    jax.block_until_ready(params["lm_head"].qw)

    prompt = jnp.asarray(np.arange(1, 33, dtype=np.int32))
    n_tok = 96
    results = {}
    for burst in (1, 8, 16):
        STATE["stage"] = f"burst{burst}_warmup"
        # warm with the SAME budget (hence same cache bucket/programs) as the
        # timed stream — a different bucket would push prefill+decode
        # compiles into the timed loop
        list(engine.generate_stream(
            params, config, prompt, jax.random.PRNGKey(1),
            max_returned_tokens=32 + n_tok, temperature=0.8, top_k=200,
            cache_dtype=jnp.int8, burst=burst,
        ))
        STATE["stage"] = f"burst{burst}_timed"
        t0 = time.perf_counter()
        ttft = None
        n = 0
        for tok in engine.generate_stream(
            params, config, prompt, jax.random.PRNGKey(2),
            max_returned_tokens=32 + n_tok, temperature=0.8, top_k=200,
            cache_dtype=jnp.int8, burst=burst,
        ):
            if ttft is None:
                ttft = time.perf_counter() - t0
            n += 1
        dt = time.perf_counter() - t0
        results[f"burst{burst}"] = {
            "tok_s": round(n / dt, 1), "ttft_ms": round(ttft * 1e3, 1),
            "tokens": n,
        }
        STATE["results"] = results
    STATE["result"] = "ok"


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        STATE.update(result="error", error=f"{type(e).__name__}: {str(e)[:300]}")
    emit_and_exit()
