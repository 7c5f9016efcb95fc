"""TPU relay health probe: classify the device state without risking a wedge.

Checks, in order:
  1. backend init (hangs => stale claim / wedge)
  2. a tiny NEW-shape compile (hangs => hung remote-compile service)
  3. a cached-shape matmul execute (RESOURCE_EXHAUSTED => stale claim)

Never killed from outside: a watchdog thread prints a JSON verdict and
`os._exit(0)`s at PROBE_BUDGET_S (default 180 s). Safe to run under
run_in_background. Prints one JSON line:
  {"state": "healthy" | "init_hang" | "compile_hang" | "exec_fail" | ...}
"""
import json
import os
import sys
import threading
import time

STATE = {"state": "init_hang", "detail": "backend init never returned"}
T0 = time.monotonic()


def emit_and_exit() -> None:
    STATE["elapsed_s"] = round(time.monotonic() - T0, 1)
    print(json.dumps(STATE), flush=True)
    os._exit(0)


def watchdog() -> None:
    time.sleep(float(os.environ.get("PROBE_BUDGET_S", "180")))
    emit_and_exit()


threading.Thread(target=watchdog, daemon=True).start()

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp  # noqa: E402

try:
    dev = jax.devices()[0]
    STATE.update(state="compile_hang", detail=f"init ok ({dev.platform}); new-shape compile never returned")
    t_init = time.monotonic() - T0
    # odd shape: never in the persistent cache, so this exercises the remote
    # compile service (failure mode 3)
    odd = int(os.environ.get("PROBE_ODD", "37")) * 100 + 53
    x = jnp.ones((37, odd), jnp.float32)
    t0 = time.monotonic()
    y = jax.jit(lambda a: jnp.tanh(a) @ a.T)(x)
    float(y[0, 0])
    t_compile = time.monotonic() - t0
    STATE.update(state="exec_fail", detail="compile ok; cached exec failed")
    # bigger cached-shape execute (same shape every probe run -> persistent cache)
    t0 = time.monotonic()
    w = jnp.ones((2048, 2048), jnp.bfloat16)
    z = jax.jit(lambda a: a @ a)(w)
    float(z[0, 0].astype(jnp.float32))
    t_exec = time.monotonic() - t0
    STATE.update(
        state="healthy",
        detail=f"init {t_init:.1f}s, new-shape compile+run {t_compile:.1f}s, cached exec {t_exec:.1f}s",
        platform=dev.platform,
    )
except Exception as e:  # noqa: BLE001
    STATE.update(state="error", detail=f"{type(e).__name__}: {str(e)[:300]}")

emit_and_exit()
