#!/usr/bin/env python
"""Serving benchmark: TTFT, per-token decode latency, batched throughput.

Measures the BASELINE.json serving metrics (p50 TTFT; tokens/sec/chip) for
any checkpoint/quantization combination. Synthetic prompts; results as JSON.
"""

import json
import sys
import time
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

import os

import jax

# persistent compile cache: mid-run prefill-bucket compiles otherwise
# dominate TTFT tails on the relay (seconds per bucket)
os.makedirs(wd / ".jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(wd / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

if os.environ.get("SERVE_BENCH_BUDGET_S"):
    # the relay can hang a process indefinitely; bound from inside (killing
    # a TPU process from outside wedges the device)
    import threading

    def _watchdog():
        time.sleep(float(os.environ["SERVE_BENCH_BUDGET_S"]))
        print(json.dumps({"error": "watchdog", "mode": "serving_bench"}),
              flush=True)
        os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()


def main(
    checkpoint_dir: Optional[Path] = None,
    model_name: Optional[str] = None,
    quantize: Optional[str] = None,
    precision: str = "bf16-true",
    prompt_length: int = 128,
    max_new_tokens: int = 64,
    batch_size: int = 1,
    n_trials: int = 5,
    kv_cache: str = "bf16",
    seed: int = 0,
    continuous: bool = False,
    n_requests: int = 16,
    arrival_interval_ms: float = 50.0,
    burst: int = 1,
    sync_admission: bool = False,
    int4_kernel: Optional[str] = None,
    paged_kv: bool = False,
    page_size: int = 64,
    total_pages: Optional[int] = None,
    slo_sweep: bool = False,
    slo_tok_s: float = 100.0,
    slots_list: str = "1,2,4,8,16",
    seq_length: Optional[int] = None,
) -> None:
    """Benchmarks the serving path.

    Args:
        checkpoint_dir: Checkpoint to load (real weights).
        model_name: Registry name for random weights (bf16, or quantized via
            --quantize gptq.int4/bnb.int8) when no checkpoint_dir is given.
        quantize: Quantization mode.
        precision: bf16-true or 32-true.
        prompt_length: Synthetic prompt length (TTFT depends on it).
        max_new_tokens: Decode steps per trial.
        batch_size: Concurrent sequences (decode slots in continuous mode).
        n_trials: Timed repetitions (after a compile warmup).
        kv_cache: bf16 | int8.
        seed: PRNG seed.
        continuous: Continuous-batching mode: staggered request arrivals are
            admitted into free slots mid-decode; reports per-stream TTFT
            p50/p90 and aggregate throughput.
        n_requests: (continuous) total requests to serve.
        arrival_interval_ms: (continuous) wall-clock gap between arrivals.
        burst: (continuous) decode tokens per dispatch between
            admission/retirement checks (ServingEngine.step_burst);
            1 = per-token admission (lowest queueing delay), 8-16 =
            fewer dispatches + host syncs (highest throughput).
        int4_kernel: int4 decode kernel: 2dot-f32 (default), grouped,
            2dot, or w8a8 (fastest; activation-int8 numerics).
            See ops/pallas_quant.set_int4_variant.
        paged_kv: (continuous) use the block-paged KV pool instead of
            contiguous slot rows (models/paged_kv.py).
        page_size: (paged) tokens per page.
        total_pages: (paged) pool size; default = contiguous-equivalent.
        seq_length: (continuous) per-slot cache length override; default
            prompt_length + max_new_tokens. Lets A/Bs hold the KV footprint
            fixed while varying the live-token workload (PERF.md envelope).
        slo_sweep: sweep slot counts under saturated load and report the max
            slots sustaining per-stream p50 >= --slo_tok_s — the measured
            slots-vs-per-stream-latency curve (VERDICT r3 #9).
        slo_tok_s: per-stream p50 SLO target for the sweep.
        slots_list: comma-separated slot counts for the sweep.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from parrot_tpu.models import gpt
    from parrot_tpu.ops.sampling import sample

    if int4_kernel is not None:
        from parrot_tpu.ops import pallas_quant

        pallas_quant.set_int4_variant(int4_kernel)

    if checkpoint_dir is not None:
        from parrot_tpu.generate.loader import load_model

        config, params, _ = load_model(checkpoint_dir, quantize, precision)
    else:
        from parrot_tpu.config import Config
        from parrot_tpu.quantize import api

        assert model_name, "--model_name or --checkpoint_dir required"
        config = Config.from_name(model_name)
        if quantize in ("gptq.int4", "bnb.int8"):
            params = api.init_quantized_params(config, jax.random.PRNGKey(0), quantize)
        else:
            params = gpt.init_params(config, jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    cache_dtype = jnp.int8 if kv_cache == "int8" else jnp.bfloat16
    paged_kw = dict(paged_kv=paged_kv, page_size=page_size, total_pages=total_pages)

    if slo_sweep:
        slots_values = [int(v) for v in slots_list.split(",")]
        rows = []
        for s in slots_values:
            row = _run_continuous(
                config, params, cache_dtype, prompt_length=prompt_length,
                max_new_tokens=max_new_tokens, slots=s,
                n_requests=max(n_requests, 3 * s), arrival_interval_ms=0.0,
                quantize=quantize, kv_cache=kv_cache, seed=seed, burst=burst,
                sync_admission=sync_admission, seq_length=seq_length, **paged_kw,
            )
            rows.append(row)
        ok = [r for r in rows if (r["decode_tok_s_p50"] or 0) >= slo_tok_s]
        best = max(ok, key=lambda r: r["slots"], default=None)
        print(json.dumps({
            "mode": "slo_sweep", "slo_decode_tok_s": slo_tok_s,
            "max_slots_meeting_slo": best["slots"] if best else 0,
            "aggregate_at_that_point": best["aggregate_tok_s"] if best else 0,
        }))
        return

    if continuous:
        _run_continuous(
            config, params, cache_dtype, prompt_length=prompt_length,
            max_new_tokens=max_new_tokens, slots=batch_size,
            n_requests=n_requests, arrival_interval_ms=arrival_interval_ms,
            quantize=quantize, kv_cache=kv_cache, seed=seed, burst=burst,
            sync_admission=sync_admission, seq_length=seq_length, **paged_kw,
        )
        return

    S = min(prompt_length + max_new_tokens, config.block_size)
    B = batch_size
    rng = jax.random.PRNGKey(seed)
    prompt = jnp.asarray(
        np.random.RandomState(seed).randint(0, config.vocab_size, (B, prompt_length)),
        jnp.int32,
    )

    prefill = jax.jit(lambda p, idx, cache: gpt.forward_cached(
        p, config, idx, cache, jnp.asarray(0, jnp.int32), prefill=True
    ))

    import functools

    if B == 1:
        @functools.partial(jax.jit, donate_argnums=(2,))
        def decode_step(p, tok, cache, pos, r):
            logits, cache = gpt.forward_cached(p, config, tok[None, None], cache, pos)
            return sample(r, logits[0, -1], 0.8, 200), cache
    else:
        @functools.partial(jax.jit, donate_argnums=(2,))
        def decode_step(p, toks, cache, positions, r):
            logits, cache = gpt.forward_decode_batched(p, config, toks[:, None], cache, positions)
            return sample(r, logits[:, 0], 0.8, 200), cache

    ttfts, step_times = [], []
    for trial in range(n_trials + 1):  # first = compile warmup
        cache = gpt.KVCache.init(config, B, S, dtype=cache_dtype)
        t0 = time.perf_counter()
        logits, cache = prefill(params, prompt, cache)
        tok = sample(rng, logits[:, -1], 0.8, 200)
        first = int(tok[0] if B > 1 else tok[0])  # hard sync
        ttft = time.perf_counter() - t0
        pos = prompt_length
        t1 = time.perf_counter()
        for i in range(max_new_tokens):
            rng2 = jax.random.fold_in(rng, trial * 1000 + i)
            if B == 1:
                tok1, cache = decode_step(params, tok[0], cache, jnp.asarray(pos), rng2)
                tok = tok1[None]
            else:
                tok, cache = decode_step(
                    params, tok, cache, jnp.full((B,), pos, jnp.int32), rng2
                )
            pos += 1
        int(tok[0])  # hard sync
        dt = (time.perf_counter() - t1) / max_new_tokens
        if trial > 0:
            ttfts.append(ttft)
            step_times.append(dt)

    result = {
        "model": config.name,
        "quantize": quantize,
        "kv_cache": kv_cache,
        "batch_size": B,
        "prompt_length": prompt_length,
        "ttft_p50_ms": round(float(np.median(ttfts)) * 1e3, 2),
        "decode_ms_per_token": round(float(np.median(step_times)) * 1e3, 3),
        "decode_tok_s": round(B / float(np.median(step_times)), 2),
        "device": jax.devices()[0].device_kind,
    }
    print(json.dumps(result))


def ttft_accounting_label(sync_admission: bool, burst: int) -> str:
    """Name the barrier that stamps ``t_first_token`` (VERDICT r4 #10).

    - ``"sync"``: one host sync per admission — the honest latency number.
    - ``"step-barrier"``: async admission read at the next single-step
      barrier (adds at most one decode step to TTFT).
    - ``"burst-barrier(n)"``: async admission read at the burst-end barrier —
      TTFT includes up to ``n`` decode steps and MUST NOT be compared
      against the other two accountings.
    """
    if sync_admission:
        return "sync"
    return "step-barrier" if burst <= 1 else f"burst-barrier({burst})"


def _run_continuous(
    config, params, cache_dtype, *, prompt_length, max_new_tokens, slots,
    n_requests, arrival_interval_ms, quantize, kv_cache, seed, burst=1,
    sync_admission=False, paged_kv=False, page_size=64, total_pages=None,
    seq_length=None,
):
    """Concurrent-arrival benchmark over the continuous-batching engine:
    requests arrive on a wall-clock schedule, are admitted into free decode
    slots mid-flight, and report per-stream TTFT + throughput. Every result
    row carries ``ttft_accounting`` (see :func:`ttft_accounting_label`);
    rows with different accountings are not comparable."""
    import json as _json
    import time as _time

    import jax
    import numpy as np

    from parrot_tpu.generate.serving import ServingEngine

    rng = np.random.RandomState(seed)
    prompts = [
        rng.randint(0, config.vocab_size, size=rng.randint(
            max(1, prompt_length // 2), prompt_length + 1)).astype(np.int32)
        for _ in range(n_requests)
    ]

    S = min(config.block_size, seq_length or (prompt_length + max_new_tokens))
    if paged_kv and S % page_size:
        S = -(-S // page_size) * page_size
        if S > config.block_size:  # round DOWN instead of past block_size
            S = (config.block_size // page_size) * page_size
        assert S >= page_size, (config.block_size, page_size)
    eng = ServingEngine(
        params, config, slots=slots, cache_dtype=cache_dtype,
        max_seq_length=S,
        temperature=0.8, top_k=200, rng=jax.random.PRNGKey(seed),
        sync_admission=sync_admission,
        paged_kv=paged_kv, page_size=page_size, total_pages=total_pages,
    )
    # warmup: compile EVERY prefill bucket the workload can hit plus the
    # decode program — a cold bucket compile mid-run is seconds of fake TTFT
    from parrot_tpu.generate.engine import prompt_bucket

    buckets = sorted({
        prompt_bucket(len(pr), eng.S) for pr in prompts
    })
    for tb in buckets:
        w = eng.submit(np.ones(tb, np.int32), max_new_tokens=2)
        eng.run_until_drained(burst=burst)

    t_start = _time.perf_counter()
    next_arrival = t_start
    submitted = 0
    requests = []
    while submitted < n_requests or eng.has_work():
        now = _time.perf_counter()
        while submitted < n_requests and now >= next_arrival:
            requests.append(eng.submit(prompts[submitted], max_new_tokens))
            submitted += 1
            next_arrival += arrival_interval_ms / 1e3
        if eng.has_work():
            eng.step() if burst <= 1 else eng.step_burst(burst)
        else:
            _time.sleep(min(0.001, max(0.0, next_arrival - now)))
    t_total = _time.perf_counter() - t_start

    ttfts = np.asarray([r.ttft for r in requests]) * 1e3
    total_tokens = sum(len(r.produced) for r in requests)
    per_stream = [
        len(r.produced) / (r.t_done - r.t_submit) for r in requests if r.t_done
    ]
    # decode-phase rate (first token -> done): the in-flight service speed a
    # per-stream SLO constrains, independent of queueing delay
    decode_rate = [
        (len(r.produced) - 1) / (r.t_done - r.t_first_token)
        for r in requests
        if r.t_done and r.t_first_token and r.t_done > r.t_first_token
        and len(r.produced) > 1
    ]
    row = {
        "mode": "continuous",
        "model": config.name,
        "quantize": quantize,
        "kv_cache": kv_cache,
        "slots": slots,
        "n_requests": n_requests,
        "arrival_interval_ms": arrival_interval_ms,
        "burst": burst,
        "sync_admission": sync_admission,
        "paged_kv": paged_kv,
        # TTFT honesty label: which barrier stamped t_first_token. TTFTs from
        # different accountings are NOT comparable (async burst mode folds up
        # to a full burst of decode into "TTFT") — never mix rows whose
        # ttft_accounting differs in one table.
        "ttft_accounting": ttft_accounting_label(sync_admission, burst),
        "ttft_p50_ms": round(float(np.percentile(ttfts, 50)), 2),
        "ttft_p90_ms": round(float(np.percentile(ttfts, 90)), 2),
        "aggregate_tok_s": round(total_tokens / t_total, 2),
        "per_stream_tok_s_p50": round(float(np.percentile(per_stream, 50)), 2),
        "decode_tok_s_p50": round(float(np.percentile(decode_rate, 50)), 2)
        if decode_rate else None,
        "preemptions": sum(r.preemptions for r in requests),
        "device": jax.devices()[0].device_kind,
    }
    print(_json.dumps(row))
    return row


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
