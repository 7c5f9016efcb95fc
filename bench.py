"""Benchmark: the north-star serving path — falcon-7b GPTQ 2-bit decode with
INT8 KV cache, single chip (direct, no host swapping: 2-bit block weights are
~1.69 GB, under the relay's ~1.7 GB resident-blocks cap that int4's 3.4 GB
can never satisfy — measured 128.4 tok/s in round 5 vs 0.009 via the round-4
swap executor).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's published falcon-7b gptq decode — 6.48 tok/s
on an A100-40GB (tutorials/quantize.md:127-128, BASELINE.md). Weights are
random in quantized form (throughput does not depend on weight values; the
fp16 falcon-7b would not fit next to its int4 copy in 16 GB HBM anyway).
Param synthesis is fully on-device (quantize/api.init_quantized_params) —
the round-1 driver run timed out inside the old host-numpy init path.

A watchdog thread guarantees a JSON line is printed before the driver's
timeout: at BENCH_BUDGET_S (default 1380 s) it emits whatever has been
measured so far (partial tok/s if the timed loop started, else an error
line) and exits 0.

Run structure: the top-level process is a SUPERVISOR that spawns the real
bench as a child (BENCH_CHILD=1). If the child reports RESOURCE_EXHAUSTED —
the signature of a stale device claim left by a previously killed process on
the remote TPU relay, which clears on its own after tens of minutes — the
supervisor sleeps and retries while budget remains. Children always exit on
their own (never killed), so retries cannot extend the wedge.

BENCH_MODE=bf16-3b selects the older StableLM-3B bf16 bench
(vs tutorials/tpus.md:55, 25 tok/s on a v4-8).
"""

import functools
import json
import os
import subprocess
import sys
import threading
import time


def supervise() -> None:
    """Spawn bench children, retrying transient device-claim failures.

    Never kills a child: each child has its own watchdog and always exits by
    itself (killing a process mid-TPU-operation wedges the remote device).
    """
    budget = float(os.environ.get("BENCH_BUDGET_S", "1380"))
    t0 = time.monotonic()
    attempt = 0
    transient_fails = 0
    last_line = None
    while True:
        attempt += 1
        remaining = budget - (time.monotonic() - t0)
        env = dict(os.environ)
        env["BENCH_CHILD"] = "1"
        # early attempts get a capped budget so a child blocked on a stale
        # device claim (or a pathologically slow cold compile) leaves time to
        # retry / drop down the mode ladder; once the ladder has engaged, the
        # child gets everything that is left
        child_budget = max(60.0, remaining - 15.0)
        if transient_fails < 2:
            child_budget = min(child_budget, 480.0)
        env["BENCH_BUDGET_S"] = str(child_budget)
        # fallback ladder: if the 7B program keeps hitting ResourceExhausted
        # (the relay rejects ~4 GB-weight programs in some states even though
        # raw allocations of 12+ GB succeed), drop to the 3B int4 bench —
        # BASELINE.json config "StableLM-3B weight-only decode, single chip" —
        # rather than burn the whole budget and land an error line
        if "BENCH_MODE" not in os.environ and transient_fails >= 2:
            env["BENCH_MODE"] = "int4-3b"
        t_child = time.monotonic()
        with open(f"/tmp/bench_child_{attempt}.err", "w") as err_f:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                stdout=subprocess.PIPE, stderr=err_f, env=env, text=True,
            )
        child_s = time.monotonic() - t_child
        line = None
        stalled = False
        extra_lines = []
        for out in (proc.stdout or "").splitlines():
            out = out.strip()
            if out.startswith("{"):
                if line is None:
                    line = out
                else:
                    extra_lines.append(out)  # secondary metrics (TTFT, ...)
        if line is not None:
            last_line = line
            try:
                rec = json.loads(line)
            except ValueError:
                rec = {}
            metric = str(rec.get("metric", ""))
            unit = str(rec.get("unit", ""))
            transient = "RESOURCE_EXHAUSTED" in unit or "ResourceExhausted" in unit
            # a watchdog that fired before the timed loop started means the
            # child never got a working device (stale claim / endless
            # compile) — that is transient, not a result
            stalled = metric == "bench_watchdog" and (
                "stage=init_params" in unit or "stage=import" in unit
                or "stage=compile" in unit
            )
            if not (metric == "bench_error" and transient) and not stalled:
                print(line, flush=True)
                for extra in extra_lines:
                    print(extra, flush=True)
                return
            transient_fails += 1
        remaining = budget - (time.monotonic() - t0)
        if remaining < 240.0:
            print(last_line or json.dumps({
                "metric": "bench_error", "value": 0.0,
                "unit": "no attempt produced output", "vs_baseline": 0,
            }), flush=True)
            return
        # Two failure signatures, two cures. A child that dies within ~2 min
        # hit a stale device claim (wedge) — back off exponentially, since
        # every connection attempt re-extends the claim's idle window. A
        # child that ran for minutes before ResourceExhausted got the device
        # fine and lost on program memory — retrying the same program after a
        # long sleep is pointless; retry quickly so the mode ladder (above)
        # kicks in while budget remains.
        if child_s < 120.0 or stalled:
            backoff = min(900.0, 90.0 * (2.0 ** (attempt - 1)))
            why = "stale device claim"
        else:
            backoff = 15.0
            why = f"program ResourceExhausted after {child_s:.0f}s"
        print(f"# attempt {attempt}: {why}; "
              f"retrying in {backoff:.0f}s ({remaining:.0f}s budget left)",
              file=sys.stderr, flush=True)
        time.sleep(min(backoff, remaining - 180.0))


if os.environ.get("BENCH_CHILD") != "1" and __name__ == "__main__":
    supervise()
    sys.exit(0)

import jax

# persistent compilation cache: the falcon-7b decode program takes minutes to
# compile cold; cache it across bench invocations
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

# shared progress state the watchdog reads; only ever mutated by the main
# thread between device barriers
T_MAIN_START = time.monotonic()
STATE = {"printed": False, "stage": "import", "steps": 0, "t0": None, "t_last": None,
         "metric": "bench", "baseline": 1.0}
LOCK = threading.Lock()


def emit(value: float, unit: str = "tok/s") -> None:
    with LOCK:
        if STATE["printed"]:
            return
        STATE["printed"] = True
        STATE["primary_line"] = json.dumps({
            "metric": STATE["metric"],
            "value": round(value, 2),
            "unit": unit,
            "vs_baseline": round(value / STATE["baseline"], 3) if unit == "tok/s" else 0,
        })
        print(STATE["primary_line"], flush=True)


def emit_extra(metric: str, value: float, unit: str) -> None:
    """Secondary metric line (the primary line via emit() must come first)."""
    print(json.dumps({
        "metric": metric, "value": round(value, 3), "unit": unit,
        "vs_baseline": 0,
    }), flush=True)


def bench_serving_ttft(config, params, cache_dtype) -> None:
    """Continuous-batching TTFT p50 on the params already resident (the
    BASELINE metric 'p50 TTFT'; measured 530 ms at burst=8 in round 2)."""
    from parrot_tpu.generate.serving import ServingEngine

    STATE["stage"] = "serving_ttft"
    # sync_admission: TTFT is stamped at its own admission barrier — the
    # honest accounting (async burst mode would fold up to a burst of decode
    # into "TTFT"; scripts/benchmark_serving.ttft_accounting_label)
    eng = ServingEngine(
        params, config, slots=4, max_seq_length=512, cache_dtype=cache_dtype,
        temperature=0.8, top_k=200, sync_admission=True,
    )
    import numpy as np

    rng = np.random.RandomState(0)
    reqs = []
    n_reqs, burst = 12, 8
    next_arrival = time.perf_counter()  # 20 ms Poisson-ish arrivals
    while len(reqs) < n_reqs or eng.has_work():
        now = time.perf_counter()
        if len(reqs) < n_reqs and now >= next_arrival:
            reqs.append(eng.submit(
                rng.randint(1, config.vocab_size, 48).astype(np.int32),
                max_new_tokens=32,
            ))
            next_arrival = now + 0.02
            continue
        if eng.has_work():
            eng.step_burst(burst)
        elif len(reqs) < n_reqs:
            time.sleep(max(0.0, next_arrival - time.perf_counter()))
    ttfts = sorted(r.ttft for r in reqs if r.ttft is not None)
    if ttfts:
        p50 = ttfts[len(ttfts) // 2] * 1000.0
        emit_extra(
            f"{STATE.get('model', 'model')} serving TTFT p50 "
            f"(4 slots, burst {burst}, 12 reqs @20ms, sync accounting)",
            p50, "ms",
        )


def bench_train_metric() -> None:
    """Third metric line: a real training step on the chip (pythia-410m LoRA,
    seq 1024 — the production ``train.make_train_step``), so a training number
    driver-lands in BENCH_r*.json (VERDICT r3 #5)."""
    import numpy as np

    from parrot_tpu.config import Config
    from parrot_tpu.models import gpt
    from parrot_tpu.training import optim, train
    from parrot_tpu.training.finetune import setup_method

    STATE["stage"] = "train_bench"
    config = Config.from_name("pythia-410m")
    params = gpt.init_params(config, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    config, params, mask, _ = setup_method("lora", config, params, jax.random.PRNGKey(1))
    optimizer = optim.adamw(optim.warmup_constant(1e-4, 0), weight_decay=0.02)
    train_step = train.make_train_step(
        config, optimizer, remat=True, trainable_mask=mask
    )
    opt_state = train_step.optimizer.init(params)
    step_fn = jax.jit(train_step, donate_argnums=(0, 1))
    rng = np.random.RandomState(0)
    batch = {
        k: jnp.asarray(
            rng.randint(0, config.padded_vocab_size, (4, 1024)), jnp.int32)
        for k in ("input_ids", "labels")
    }
    loss = None
    for _ in range(3):  # compile + warmup
        params, opt_state, loss = step_fn(params, opt_state, batch)
    assert np.isfinite(float(loss))
    steps = 12
    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, loss = step_fn(params, opt_state, batch)
    float(loss)  # barrier
    dt = time.perf_counter() - t0
    emit_extra(
        "pythia-410m LoRA train throughput (seq 1024, batch 4)",
        steps * 4 * 1024 / dt, "tok/s",
    )


def bench_3b_int4_metric() -> None:
    """Secondary rung: the StableLM-3B gptq.int4 + int8-KV decode that was
    the round-2..4 primary — kept for round-over-round comparability now that
    the falcon-7b 2-bit DIRECT decode is the headline."""
    from parrot_tpu.config import Config
    from parrot_tpu.quantize import api

    STATE["stage"] = "int4_3b_secondary"
    config = Config.from_name("stablelm-base-alpha-3b")
    params = api.init_quantized_params(config, jax.random.PRNGKey(0), "gptq.int4")
    jax.block_until_ready(params["lm_head"].qw)
    tok_s = bench_decode(config, params, jnp.int8)
    emit_extra(
        "stablelm-3b gptq.int4 + int8-KV decode tok/s (1 chip, secondary rung)",
        tok_s, "tok/s",
    )


def bench_swap_7b_metric() -> None:
    """7B-class metric line: falcon-7b gptq.int4 + INT8 KV decoded through
    the residency-capped swap executor (generate/swap.py) — the relay rejects
    any direct decode program whose stacked block weights exceed ~1.7 GB
    (PERF.md round-4 bisect), so the 7B number rides host-staged chunks.
    Slow by construction (host-bandwidth-bound); the value is that a 7B
    decode LANDS at all. Reference: 6.48 tok/s, A100-40GB
    (tutorials/quantize.md:127-128)."""
    import numpy as np

    from parrot_tpu.config import Config
    from parrot_tpu.generate.swap import SwapDecoder
    from parrot_tpu.quantize import api

    STATE["stage"] = "swap_7b"
    config = Config.from_name("falcon-7b")
    params = api.init_quantized_params_host(config, "gptq.int4")
    # same shapes as the round-4 probe run (R=12, C=2, 16-token prompt,
    # S=512) so every program is already in the persistent compile cache
    dec = SwapDecoder(
        params, config, resident_layers=12, chunk_layers=2,
        max_seq_length=512, cache_dtype=jnp.int8, temperature=0.0,
    )
    prompt = np.arange(1, 17, dtype=np.int32)
    n = 2  # ~76 s/token (host-staged; the relay's in-context H2D is the wall)
    t0 = time.perf_counter()
    dec.generate(prompt, n)
    dt = time.perf_counter() - t0
    emit_extra(
        "falcon-7b gptq.int4+int8KV decode tok/s via residency-capped swap "
        "executor (relay blocks-cap workaround; ref 6.48 on A100)",
        n / dt, "tok/s",
    )


def early_wedge_watchdog(deadline_s: float = 150.0) -> None:
    """A wedged device hangs backend init indefinitely; burning the whole
    child budget on it starves later (post-recovery) attempts. If we are
    still stuck before the first device op after ``deadline_s``, emit the
    stall marker and exit so the supervisor's backoff clock starts sooner."""
    time.sleep(deadline_s)
    with LOCK:
        if STATE["printed"] or STATE["stage"] not in ("import", "init_params"):
            return
        STATE["printed"] = True
        print(json.dumps({
            "metric": "bench_watchdog", "value": 0.0,
            "unit": f"watchdog fired during stage={STATE['stage']}",
            "vs_baseline": 0,
        }), flush=True)
    os._exit(0)


def watchdog(budget_s: float) -> None:
    time.sleep(budget_s)
    with LOCK:
        if STATE["printed"]:
            os._exit(0)  # primary metric is out; bound the secondary phase
    if STATE["steps"] > 0 and STATE["t0"] is not None:
        # partial but real measurement from the timed loop
        emit(STATE["steps"] / (STATE["t_last"] - STATE["t0"]))
    else:
        STATE["metric"] = "bench_watchdog"
        emit(0.0, unit=f"watchdog fired during stage={STATE['stage']}")
    os._exit(0)  # rc 0: the JSON line above is the result


def bench_decode(config, params, cache_dtype, n_steps: int = 128) -> float:
    """Per-token async dispatch with ONE final barrier.

    Measured on the relay (PERF.md round-2 A/B): per-token dispatches
    pipeline (the host runs ahead; ~0.5 ms dispatch cost overlaps device
    compute) at 185 tok/s, while any host sync drains the pipeline at
    ~25 ms each — a scan-fused 16-token chunk with one sync per chunk
    measures 24% SLOWER (141 tok/s). So: no intermediate syncs; the timed
    loop is short (<2 s) compared to the watchdog horizon, and the stage
    marker tells the watchdog where we died if we die.
    """
    from parrot_tpu.generate.engine import _decode_step
    from parrot_tpu.models import gpt

    cache = gpt.KVCache.init(config, 1, 512, dtype=cache_dtype)
    # engine._decode_step is the module-level jitted program shared with the
    # chat/stream paths — same persistent-cache entry as production decode
    step = functools.partial(
        _decode_step, config=config, temperature=0.8, top_k=200
    )

    tok = jnp.asarray(1, jnp.int32)
    rng = jax.random.PRNGKey(0)
    pos = 0
    STATE["stage"] = "compile+warmup"
    for _ in range(8):
        rng, r = jax.random.split(rng)
        tok, cache = step(params, tok, cache, jnp.asarray(pos, jnp.int32), r)
        pos += 1
    int(tok)  # device->host fetch: the only reliable barrier on lazy backends
    STATE["stage"] = "timed"
    STATE["t0"] = STATE["t_last"] = time.perf_counter()
    for _ in range(n_steps):
        rng, r = jax.random.split(rng)
        tok, cache = step(params, tok, cache, jnp.asarray(pos, jnp.int32), r)
        pos += 1
    int(tok)
    STATE["steps"] = n_steps
    STATE["t_last"] = time.perf_counter()
    return n_steps / (STATE["t_last"] - STATE["t0"])


def main() -> None:
    global T_MAIN_START
    T_MAIN_START = time.monotonic()
    threading.Thread(
        target=watchdog,
        args=(float(os.environ.get("BENCH_BUDGET_S", "1380")),),
        daemon=True,
    ).start()
    threading.Thread(target=early_wedge_watchdog, daemon=True).start()

    from parrot_tpu.config import Config
    from parrot_tpu.models import gpt
    from parrot_tpu.quantize import api

    mode = os.environ.get("BENCH_MODE", "int2-7b")
    kind = jax.devices()[0].device_kind

    if mode == "bf16-3b":
        STATE["metric"] = f"stablelm-3b bf16 decode tok/s (1 chip, {kind})"
        STATE["model"] = "stablelm-3b bf16"
        STATE["baseline"] = 25.0  # v4-8 steady state, tutorials/tpus.md:55
        config = Config.from_name("stablelm-base-alpha-3b")
        STATE["stage"] = "init_params"
        params = gpt.init_params(config, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        tok_s = bench_decode(config, params, jnp.bfloat16)
    elif mode == "int4-3b":
        # fallback rung: BASELINE.json config "StableLM-3B weight-only
        # decode, single chip"; baseline = the reference's own TPU number
        # (bf16 v4-8 steady state, tutorials/tpus.md:55) since it publishes
        # no 3B quantized figure
        STATE["metric"] = f"stablelm-3b gptq.int4 + int8-KV decode tok/s (1 chip, {kind})"
        STATE["model"] = "stablelm-3b gptq.int4+int8KV"
        STATE["baseline"] = 25.0
        config = Config.from_name("stablelm-base-alpha-3b")
        STATE["stage"] = "init_params"
        params = api.init_quantized_params(config, jax.random.PRNGKey(0), "gptq.int4")
        jax.block_until_ready(params["lm_head"].qw)
        tok_s = bench_decode(config, params, jnp.int8)
    elif mode == "int2-7b":
        # the sub-4-bit rung: falcon-7b's stacked block weights at 2-bit are
        # ~1.68 GB — under the relay's ~1.7 GB resident-blocks cap where int4's
        # 3.4 GB never fits, so this is the DIRECT (non-swap) 7B decode.
        # Reference baseline: its own falcon-7b gptq decode, 6.48 tok/s on an
        # A100-40GB (tutorials/quantize.md:127-128).
        STATE["metric"] = f"falcon-7b gptq.int2 + int8-KV decode tok/s (1 chip, {kind})"
        STATE["model"] = "falcon-7b gptq.int2+int8KV"
        STATE["baseline"] = 6.48
        config = Config.from_name("falcon-7b")
        STATE["stage"] = "init_params"
        params = api.init_quantized_params(config, jax.random.PRNGKey(0), "gptq.int2")
        jax.block_until_ready(params["lm_head"].qw)
        tok_s = bench_decode(config, params, jnp.int8)
    else:
        STATE["metric"] = f"falcon-7b gptq.int4 + int8-KV decode tok/s (1 chip, {kind})"
        STATE["model"] = "falcon-7b gptq.int4+int8KV"
        STATE["baseline"] = 6.48  # A100 40GB, tutorials/quantize.md:127-128
        config = Config.from_name("falcon-7b")
        STATE["stage"] = "init_params"
        params = api.init_quantized_params(config, jax.random.PRNGKey(0), "gptq.int4")
        jax.block_until_ready(params["lm_head"].qw)
        tok_s = bench_decode(config, params, jnp.int8)

    emit(tok_s)
    # secondary metric: continuous-batching TTFT p50 on the same weights
    # (BASELINE 'p50 TTFT'); failures here must not cost the primary line
    try:
        bench_serving_ttft(config, params, jnp.int8 if mode != "bf16-3b" else jnp.bfloat16)
    except Exception as e:  # noqa: BLE001 — report, don't die
        emit_extra("serving_ttft_error", 0.0, str(e)[:120])
    # third metric: training throughput (decode weights freed first — the
    # params/cache above are donated or droppable; the train program is its
    # own 2.3 GB world)
    try:
        del params
        bench_train_metric()
    except Exception as e:  # noqa: BLE001
        emit_extra("train_bench_error", 0.0, str(e)[:120])
    # fourth metric: the 3B int4 rung (the former primary) for
    # round-over-round comparability; the 0.009 tok/s swap-executor row is
    # retired — the 2-bit format made DIRECT 7B decode possible (the swap
    # path remains available as generate/swap.py + BENCH_MODE=int4-7b ladder)
    budget = float(os.environ.get("BENCH_BUDGET_S", "1380"))
    if mode == "int2-7b" and budget - (time.monotonic() - T_MAIN_START) > 240:
        try:
            bench_3b_int4_metric()
        except Exception as e:  # noqa: BLE001
            emit_extra("int4_3b_error", 0.0, str(e)[:120])
    # re-emit the primary line LAST: the driver's metric-of-record is the
    # final JSON line, and it must stay the headline tok/s for round-over-
    # round comparability (round-3's record accidentally became the TTFT)
    if STATE.get("primary_line"):
        print(STATE["primary_line"], flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # never leave the driver without a JSON line
        STATE["metric"] = "bench_error"
        emit(0.0, unit=f"stage={STATE['stage']}: {str(e)[:170]}")
        sys.exit(1)
