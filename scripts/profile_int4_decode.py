"""Capture a device trace of the int4 decode step and break down where the
time goes (VERDICT r2 #4: verify the VPU-widen roofline claim with hardware
evidence rather than a cost model).

For each requested kernel variant: trace a few decode steps with
``jax.profiler``, then parse the chrome trace's device lane and aggregate
op durations. Prints one JSON line per variant with the top device ops and
the implied packed-weight stream rate.

Usage: python scripts/profile_int4_decode.py --model stablelm-base-alpha-3b \
    --variants 2dot-f32,w8a8 --out_dir out/traces
"""

import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.resolve()))

import jax
import jax.numpy as jnp


def parse_device_ops(trace_dir: Path) -> dict:
    """Aggregate device-lane op durations (us) from the newest trace."""
    files = sorted(glob.glob(str(trace_dir / "plugins/profile/*/*.trace.json.gz")))
    if not files:
        return {}
    data = json.loads(gzip.open(files[-1]).read())
    events = data.get("traceEvents", [])
    device_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    totals, counts = defaultdict(float), defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            name = e.get("name", "?")
            totals[name] += float(e.get("dur", 0.0))
            counts[name] += 1
    return {
        k: {"total_us": round(v, 1), "count": counts[k]}
        for k, v in sorted(totals.items(), key=lambda kv: -kv[1])
    }


def main(
    model: str = "stablelm-base-alpha-3b",
    variants: str = "2dot-f32,w8a8",
    steps: int = 8,
    quantize: str = "gptq.int4",
    out_dir: Path = Path("out/traces"),
) -> dict:
    import functools

    from parrot_tpu.config import Config
    from parrot_tpu.models import gpt
    from parrot_tpu.ops import pallas_quant
    from parrot_tpu.ops.sampling import sample
    from parrot_tpu.quantize import api

    config = Config.from_name(model)
    results = {}
    for variant in variants.split(","):
        variant = variant.strip()
        pallas_quant.set_int4_variant(variant)
        params = api.init_quantized_params(config, jax.random.PRNGKey(0), quantize)
        jax.block_until_ready(params)
        cache = gpt.KVCache.init(config, 1, 512, dtype=jnp.int8)

        # a FRESH jit per variant: the kernel choice is a module global read
        # at trace time, so reusing a module-level jitted step would silently
        # profile the first variant three times
        @functools.partial(jax.jit, donate_argnums=(2,))
        def step_fn(params, tok, cache, pos, rng):
            logits, cache = gpt.forward_cached(
                params, config, tok[None, None], cache, pos)
            return sample(rng, logits[0, -1], 0.8, 200, None), cache

        def step(params, tok, cache, pos, rng):
            return step_fn(params, tok, cache, pos, rng)
        tok = jnp.asarray(1, jnp.int32)
        rng = jax.random.PRNGKey(0)
        pos = 0
        for _ in range(4):  # compile + warmup
            rng, r = jax.random.split(rng)
            tok, cache = step(params, tok, cache, jnp.asarray(pos, jnp.int32), r)
            pos += 1
        int(tok)

        trace_dir = Path(out_dir) / variant
        trace_dir.mkdir(parents=True, exist_ok=True)
        t0 = time.perf_counter()
        with jax.profiler.trace(str(trace_dir)):
            for _ in range(steps):
                rng, r = jax.random.split(rng)
                tok, cache = step(params, tok, cache, jnp.asarray(pos, jnp.int32), r)
                pos += 1
            int(tok)
        wall = time.perf_counter() - t0

        ops = parse_device_ops(trace_dir)
        top = dict(list(ops.items())[:12])
        device_total = sum(v["total_us"] for v in ops.values())
        rec = {
            "variant": variant,
            "steps": steps,
            "wall_ms_per_step": round(wall / steps * 1000, 2),
            "device_us_total": round(device_total, 1),
            "device_us_per_step": round(device_total / steps, 1),
            "top_ops": top,
            "trace_dir": str(trace_dir),
        }
        print(json.dumps(rec), flush=True)
        results[variant] = rec
        del params, cache
    return results


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
