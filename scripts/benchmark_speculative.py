"""A/B speculative decoding vs plain decode on the chip (VERDICT r2 #5).

Measures, at equal sampling params:
- plain `engine.generate` tok/s on the target,
- `generate_speculative` tok/s + acceptance rate with a tiny draft,
- the mechanical ceiling: draft == target (acceptance ~= 1), which bounds
  what a perfectly-distilled draft could deliver.

Synthetic weights (throughput is weight-value independent; acceptance with
an *uncorrelated* random draft is the honest floor — real draft/target pairs
sit between the two reported ends). One JSON line per measurement.
"""

import json
import sys
import time
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).parent.parent.resolve()))

import jax
import jax.numpy as jnp
import numpy as np


def main(
    model: str = "stablelm-base-alpha-3b",
    quantize: Optional[str] = "gptq.int4",
    draft_layers: int = 4,
    draft_embd: int = 512,
    draft_heads: int = 8,
    k: int = 4,
    new_tokens: int = 96,
    temperature: float = 0.0,
    reps: int = 3,
) -> list:
    from parrot_tpu.config import Config
    from parrot_tpu.generate import engine, speculative
    from parrot_tpu.models import gpt
    from parrot_tpu.quantize import api

    config = Config.from_name(model)
    rng = jax.random.PRNGKey(0)
    if quantize:
        params = api.init_quantized_params(config, rng, quantize)
        cache_dtype = jnp.int8
    else:
        params = gpt.init_params(config, rng, dtype=jnp.bfloat16)
        cache_dtype = jnp.bfloat16
    jax.block_until_ready(jax.tree.leaves(params)[0])

    draft_config = Config(
        name="draft-tiny", block_size=config.block_size,
        vocab_size=config.vocab_size, padded_vocab_size=config.padded_vocab_size,
        n_layer=draft_layers, n_head=draft_heads, n_embd=draft_embd,
        rotary_percentage=config.rotary_percentage,
        parallel_residual=config.parallel_residual,
        _norm_class=config._norm_class, _mlp_class=config._mlp_class,
        norm_eps=config.norm_eps, bias=config.bias,
    )
    draft_params = gpt.init_params(draft_config, jax.random.PRNGKey(1), dtype=jnp.bfloat16)
    jax.block_until_ready(jax.tree.leaves(draft_params)[0])

    prompt = jnp.asarray(np.arange(1, 17, dtype=np.int32))
    budget = int(prompt.shape[0]) + new_tokens
    sampling = dict(temperature=temperature, top_k=200 if temperature else None)
    results = []

    def timed(fn, label, extra=None):
        fn(jax.random.PRNGKey(7))  # compile + warmup
        best = None
        stats_out = {}
        for r in range(reps):
            t0 = time.perf_counter()
            out = fn(jax.random.PRNGKey(100 + r))
            n = int(out[1]) - int(prompt.shape[0])
            dt = time.perf_counter() - t0
            tok_s = n / dt
            if best is None or tok_s > best:
                best = tok_s
            if len(out) > 2:
                stats_out = out[2]
        rec = {"metric": label, "value": round(best, 2), "unit": "tok/s"}
        if stats_out:
            rounds = stats_out["rounds"]
            committed = stats_out["tokens_committed"]
            rec["rounds"] = rounds
            rec["acceptance"] = round((committed - rounds) / max(rounds * k, 1), 3)
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)
        results.append(rec)
        return rec

    timed(
        lambda r: engine.generate(
            params, config, prompt, r, max_returned_tokens=budget,
            cache_dtype=cache_dtype, **sampling),
        f"plain decode {model}{' ' + quantize if quantize else ''}",
    )
    timed(
        lambda r: speculative.generate_speculative(
            params, config, draft_params, draft_config, prompt, r,
            max_returned_tokens=budget, k=k, cache_dtype=cache_dtype, **sampling),
        f"speculative k={k}, random {draft_layers}L/{draft_embd}d draft (acceptance floor)",
    )
    timed(
        lambda r: speculative.generate_speculative(
            params, config, params, config, prompt, r,
            max_returned_tokens=budget, k=k, cache_dtype=cache_dtype, **sampling),
        f"speculative k={k}, draft==target (acceptance ceiling)",
    )
    return results


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
