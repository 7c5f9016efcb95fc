"""Speculative decoding with a REAL distilled draft (VERDICT r3 #4).

Round 3 measured the endpoints only (random draft: alpha=0; draft==target:
alpha~0.95 at target price) and projected 2.3-2.9x from *published* alpha
ranges. This script measures an actual alpha in (0,1), with no egress:

1. train a target (pythia-410m geometry by default) on a synthetic corpus
   with long-range structure (next symbol mixes the last and the 32-back
   symbol, plus uniform noise) until it models the distribution;
2. sample a distillation set FROM THE TARGET (``generate_batch``);
3. distill a small draft (4L/512d default) on those samples — the draft
   approximates the target as far as its capacity + budget allow;
4. A/B on the same chip: plain decode vs ``generate_speculative`` with the
   distilled draft — tokens/s, measured acceptance, and the round-cost
   model's prediction ``(1 + k*alpha) / round_cost`` for comparison.

Everything runs in ONE process (the relay drifts run-to-run; PERF.md
measurement discipline). Prints one JSON line per phase/measurement.
"""

import json
import os
import sys
import threading
import time
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).parent.parent.resolve()))

import jax
import jax.numpy as jnp
import numpy as np


def make_corpus(
    n: int, vocab: int, rng: np.random.RandomState, dep: int = 32
) -> np.ndarray:
    """A second-order Markov source: a fixed random table maps the pair
    ``(s[t-1], s[t-dep])`` to the next symbol with prob 0.9 (uniform noise
    otherwise). Predicting well = memorizing the ``vocab x vocab`` table from
    context pairs — a capacity-bound task (unlike modular arithmetic, which
    tiny transformers fail to grok), so the big target learns it nearly fully
    while a small draft learns it partially: acceptance lands strictly inside
    (0, 1)."""
    table = rng.randint(0, vocab, size=(vocab, vocab))
    s = rng.randint(0, vocab, size=n).astype(np.int64)
    for t in range(dep, n):
        if rng.rand() < 0.9:
            s[t] = table[s[t - 1], s[t - dep]]
    return s.astype(np.int32)


def train_lm(config, corpus, *, steps, batch, seq, lr, seed, log_label, dtype,
             snapshot_at=()):
    """Train; optionally snapshot params at intermediate step counts (for
    measuring acceptance vs draft training budget in one run)."""
    from parrot_tpu.models import gpt
    from parrot_tpu.training import optim, train

    params = gpt.init_params(config, jax.random.PRNGKey(seed), dtype=dtype)
    optimizer = optim.adamw(optim.warmup_constant(lr, 10), weight_decay=0.0)
    opt_state = optimizer.init(params)
    step = jax.jit(
        train.make_train_step(config, optimizer, remat=True),
        donate_argnums=(0, 1),
    )
    rng = np.random.RandomState(seed)
    loss = None
    snapshots = {}
    seq = min(seq, corpus.shape[-1] - 2)  # a window must fit the corpus rows
    t0 = time.perf_counter()
    for it in range(steps):
        if it in snapshot_at:
            snapshots[it] = jax.tree.map(lambda a: a.copy(), params)
        ix = rng.randint(0, max(1, corpus.shape[-1] - seq - 1), size=batch)
        if corpus.ndim == 1:
            toks = np.stack([corpus[i : i + seq] for i in ix])
        else:  # distill set: sample rows, then a window
            rows = rng.randint(0, corpus.shape[0], size=batch)
            toks = np.stack([corpus[r, i : i + seq] for r, i in zip(rows, ix)])
        b = {"input_ids": jnp.asarray(toks), "labels": jnp.asarray(toks)}
        params, opt_state, loss = step(params, opt_state, b)
    final = float(loss)
    print(json.dumps({
        "phase": f"train {log_label}", "steps": steps, "final_loss": round(final, 4),
        "seconds": round(time.perf_counter() - t0, 1),
    }), flush=True)
    if snapshot_at:
        return params, final, snapshots
    return params, final


def main(
    target_model: str = "pythia-410m",
    draft_layers: int = 4,
    draft_embd: int = 512,
    draft_heads: int = 8,
    corpus_vocab: int = 256,
    corpus_len: int = 65536,
    corpus_dep: int = 32,
    target_steps: int = 300,
    draft_steps: int = 400,
    distill_seqs: int = 32,
    distill_len: int = 512,
    distill_temperature: float = 0.8,
    distill_batch: int = 0,  # 0 = all at once; >0 bounds the sampling
    # program's KV-cache footprint (big targets OOM at batch 96)
    seq: int = 256,
    batch: int = 8,
    k: int = 4,
    new_tokens: int = 96,
    temperature: float = 0.0,
    reps: int = 3,
    precision: str = "bf16-true",
    target_lr: float = 3e-4,
    draft_lr: float = 1e-3,
    watchdog_s: float = 0.0,
) -> list:
    if watchdog_s:
        def _die():
            time.sleep(watchdog_s)
            print(json.dumps({"phase": "watchdog", "error": "budget exceeded"}),
                  flush=True)
            os._exit(0)

        threading.Thread(target=_die, daemon=True).start()

    from parrot_tpu.config import Config
    from parrot_tpu.generate import engine, speculative
    from parrot_tpu.models import gpt

    dtype = jnp.bfloat16 if "bf16" in precision else jnp.float32
    config = Config.from_name(target_model)
    config = config.replace(block_size=min(config.block_size, 2048))

    np_rng = np.random.RandomState(0)
    corpus = make_corpus(corpus_len, corpus_vocab, np_rng, dep=corpus_dep)

    # 1. target learns the corpus
    params, target_loss = train_lm(
        config, corpus, steps=target_steps, batch=batch, seq=seq, lr=target_lr,
        seed=0, log_label=f"target {config.name}", dtype=dtype,
    )

    # 2. distillation set sampled FROM the target (the draft should match the
    # target's distribution, not the corpus's; sub-1 temperature reduces
    # sample noise — the standard distillation-set practice)
    prompts = np.stack([
        corpus[i : i + 32]
        for i in np_rng.randint(0, corpus_len - 33, size=distill_seqs)
    ])
    t0 = time.perf_counter()
    group = distill_batch or distill_seqs
    parts = []
    for g0 in range(0, distill_seqs, group):
        chunk = prompts[g0 : g0 + group]
        toks, _ = engine.generate_batch(
            params, config, jnp.asarray(chunk),
            jnp.full((chunk.shape[0],), 32, jnp.int32),
            jax.random.fold_in(jax.random.PRNGKey(11), g0),
            max_returned_tokens=distill_len,
            temperature=distill_temperature, cache_dtype=dtype,
        )
        parts.append(np.asarray(toks))
    distill = np.concatenate(parts, axis=0)
    print(json.dumps({
        "phase": "sample distill set", "seqs": int(distill_seqs),
        "len": int(distill_len), "seconds": round(time.perf_counter() - t0, 1),
    }), flush=True)

    # 3. distill the draft on the target's samples
    draft_config = Config(
        name="draft-distilled", block_size=config.block_size,
        vocab_size=config.vocab_size, padded_vocab_size=config.padded_vocab_size,
        n_layer=draft_layers, n_head=draft_heads, n_embd=draft_embd,
        rotary_percentage=config.rotary_percentage,
        parallel_residual=config.parallel_residual,
        _norm_class=config._norm_class, _mlp_class=config._mlp_class,
        norm_eps=config.norm_eps, bias=config.bias,
    )
    snap_at = (max(1, draft_steps // 8),)  # an UNDER-trained draft too:
    # acceptance vs draft quality is the curve of interest
    draft_params, draft_loss, snapshots = train_lm(
        draft_config, distill, steps=draft_steps, batch=batch,
        seq=min(seq, distill_len - 1), lr=draft_lr, seed=1,
        log_label=f"draft {draft_layers}L/{draft_embd}d (distilled)", dtype=dtype,
        snapshot_at=snap_at,
    )

    # 4. A/B on fresh corpus prompts
    prompt = jnp.asarray(corpus[1024 : 1024 + 32])
    budget = 32 + new_tokens
    sampling = dict(temperature=temperature,
                    top_k=200 if temperature else None)
    results = []

    def timed(fn, label):
        fn(jax.random.PRNGKey(7))  # compile + warmup
        best, stats_out = None, {}
        for r in range(reps):
            t0 = time.perf_counter()
            out = fn(jax.random.PRNGKey(100 + r))
            n = int(out[1]) - 32
            dt = time.perf_counter() - t0
            if best is None or n / dt > best:
                best = n / dt
            if len(out) > 2:
                stats_out = out[2]
        rec = {"metric": label, "value": round(best, 2), "unit": "tok/s"}
        if stats_out:
            rounds = int(stats_out["rounds"])
            committed = int(stats_out["tokens_committed"])
            rec["rounds"] = rounds
            rec["acceptance"] = round((committed - rounds) / max(rounds * k, 1), 3)
        print(json.dumps(rec), flush=True)
        results.append(rec)
        return rec

    plain = timed(
        lambda r: engine.generate(
            params, config, prompt, r, max_returned_tokens=budget,
            cache_dtype=dtype, **sampling),
        f"plain decode {config.name} (trained)",
    )
    for label, dp in [
        (f"DISTILLED {draft_layers}L/{draft_embd}d, {draft_steps} steps",
         draft_params),
    ] + [
        (f"DISTILLED {draft_layers}L/{draft_embd}d, {s} steps (under-trained)",
         p)
        for s, p in sorted(snapshots.items())
    ]:
        spec = timed(
            lambda r, dp=dp: speculative.generate_speculative(
                params, config, dp, draft_config, prompt, r,
                max_returned_tokens=budget, k=k, cache_dtype=dtype, **sampling),
            f"speculative k={k}, {label}",
        )
        alpha = spec.get("acceptance")
        if alpha is not None and plain["value"]:
            # round-cost model from the round-3 endpoint study: a k-round
            # costs round_cost target-steps and commits 1 + k*alpha tokens
            summary = {
                "phase": "summary", "draft": label, "alpha": alpha, "k": k,
                "measured_speedup": round(spec["value"] / plain["value"], 3),
                "model_speedup_at_round_cost_1.26": round((1 + k * alpha) / 1.26, 3),
                "target_loss": round(target_loss, 3),
                "draft_loss": round(draft_loss, 3),
            }
            print(json.dumps(summary), flush=True)
            results.append(summary)
    return results


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
