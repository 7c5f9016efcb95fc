"""Land a falcon-7b decode through the residency-capped swap executor.

The relay rejects decode programs whose stacked block weights exceed
~1.7 GB (PERF.md round 4); SwapDecoder keeps embedding + head +
SWAP_RESIDENT layers on device and streams the rest from host RAM
chunk-by-chunk. Env: SWAP_MODEL (falcon-7b), SWAP_RESIDENT (16),
SWAP_CHUNK (4), SWAP_TOKENS (8), SWAP_BUDGET_S (1500). One JSON line.
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
    time.sleep(float(os.environ.get("SWAP_BUDGET_S", "1500")))
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
    from parrot_tpu.generate.swap import SwapDecoder
    from parrot_tpu.quantize import api

    model = os.environ.get("SWAP_MODEL", "falcon-7b")
    R = int(os.environ.get("SWAP_RESIDENT", "16"))
    C = int(os.environ.get("SWAP_CHUNK", "4"))
    n_tok = int(os.environ.get("SWAP_TOKENS", "8"))
    config = Config.from_name(model)
    STATE.update(model=model, resident_layers=R, chunk_layers=C)

    STATE["stage"] = "host_init"
    params = api.init_quantized_params_host(config, "gptq.int4")

    def qbytes(tree):
        import jax as _j

        return sum(
            a.nbytes for a in _j.tree.leaves(tree) if hasattr(a, "nbytes")
        )

    per_layer = qbytes(params["blocks"]) / config.n_layer
    STATE["resident_quantized_gb"] = round(
        (qbytes(params["lm_head"]) + per_layer * (R + C)) / 2**30, 2
    )
    STATE["streamed_gb_per_token"] = round(
        per_layer * (config.n_layer - R) / 2**30, 2
    )

    STATE["stage"] = "build"
    dec = SwapDecoder(
        params, config, resident_layers=R, chunk_layers=C,
        max_seq_length=512, cache_dtype=jnp.int8, temperature=0.0,
    )
    STATE["stage"] = "prefill+decode"
    prompt = np.arange(1, 17, dtype=np.int32)
    t_start = time.perf_counter()
    toks = dec.generate(prompt, 2)  # compile (3 programs) + 2 tokens
    STATE["compile_plus_2tok_s"] = round(time.perf_counter() - t_start, 1)
    STATE["stage"] = "timed"
    t0 = time.perf_counter()
    toks = dec.generate(prompt, n_tok)
    dt = time.perf_counter() - t0
    STATE.update(
        result="ok", tokens=toks[:8],
        tok_s=round(n_tok / dt, 3), s_per_tok=round(dt / n_tok, 2),
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        STATE.update(result="error", error=f"{type(e).__name__}: {str(e)[:700]}")
    emit_and_exit()
