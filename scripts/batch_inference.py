#!/usr/bin/env python
"""Batched dataset inference: generate completions for a file of prompts.

Covers the capability the reference's research layer exercises
(``straight_inference.py`` / ``length_inference.py``: adapter-v2 checkpoints,
batched eos-terminated sampling over datasets) with the ragged batch engine —
prompts are bucketed by length, padded, and decoded B-at-a-time in lock-step.
"""

import json
import sys
import time
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))


def main(
    input_path: Path = Path("prompts.jsonl"),
    output_path: Path = Path("outputs.jsonl"),
    checkpoint_dir: Path = Path("checkpoints/stabilityai/stablelm-base-alpha-3b"),
    method: str = "none",
    peft_path: Optional[Path] = None,
    prompt_field: str = "prompt",
    template: str = "none",
    batch_size: int = 8,
    max_new_tokens: int = 128,
    temperature: float = 0.8,
    top_k: int = 200,
    quantize: Optional[str] = None,
    precision: str = "bf16-true",
    seed: int = 1234,
) -> None:
    """Generates a completion per input line and writes jsonl records.

    Args:
        input_path: jsonl (one object per line) or json list of objects.
        output_path: Output jsonl with {prompt, output} per line.
        checkpoint_dir: Base checkpoint directory.
        method: none | full | lora | adapter | adapter_v2 (PEFT assembly).
        peft_path: Filtered PEFT checkpoint (required unless method=none).
        prompt_field: Field holding the prompt text.
        template: none | alpaca (wrap prompts in the instruction template).
        batch_size: Sequences decoded in lock-step.
        max_new_tokens: Generation budget per sequence.
        temperature: Sampling temperature (0 = greedy).
        top_k: Top-k cutoff.
        quantize: Optional weight quantization mode (method=none only).
        precision: bf16-true or 32-true.
        seed: Sampling seed.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from parrot_tpu.data.sft import generate_prompt
    from parrot_tpu.generate import engine
    from parrot_tpu.generate.loader import load_model, load_peft_model

    if method == "none":
        config, params, tokenizer = load_model(checkpoint_dir, quantize, precision)
    else:
        assert peft_path is not None, "--peft_path required with a PEFT method"
        config, params, tokenizer = load_peft_model(
            checkpoint_dir, peft_path, method, precision=precision
        )

    raw = Path(input_path).read_text(encoding="utf-8")
    records = (
        json.loads(raw) if raw.lstrip().startswith("[")
        else [json.loads(l) for l in raw.splitlines() if l.strip()]
    )

    def to_prompt(rec: dict) -> str:
        text = rec[prompt_field]
        if template == "alpaca":
            return generate_prompt({"instruction": text, "input": rec.get("input", "")})
        return text

    encoded = [np.asarray(tokenizer.encode(to_prompt(r)), np.int32) for r in records]
    order = np.argsort([len(e) for e in encoded])  # length-bucketed batches

    rng = jax.random.PRNGKey(seed)
    results: dict[int, str] = {}
    t0 = time.perf_counter()
    n_generated = 0
    for start in range(0, len(order), batch_size):
        idxs = order[start : start + batch_size]
        batch = [encoded[i] for i in idxs]
        T_max = max(len(e) for e in batch)
        # round the bucket up so few distinct shapes compile
        T_pad = -(-T_max // 64) * 64
        prompts = np.zeros((len(batch), T_pad), np.int32)
        lengths = np.zeros((len(batch),), np.int32)
        for row, e in enumerate(batch):
            prompts[row, : len(e)] = e
            lengths[row] = len(e)
        rng, step_rng = jax.random.split(rng)
        toks, out_lens = engine.generate_batch(
            params, config, jnp.asarray(prompts), jnp.asarray(lengths), step_rng,
            max_returned_tokens=min(T_pad + max_new_tokens, config.block_size),
            temperature=temperature, top_k=top_k, eos_id=tokenizer.eos_id,
        )
        toks, out_lens = np.asarray(toks), np.asarray(out_lens)
        for row, i in enumerate(idxs):
            gen = toks[row, lengths[row] : out_lens[row]]
            results[int(i)] = tokenizer.decode(gen)
            n_generated += len(gen)
        done = min(start + batch_size, len(order))
        print(f"\r{done}/{len(order)} prompts", end="", file=sys.stderr, flush=True)
    dt = time.perf_counter() - t0
    print(f"\n{n_generated} tokens in {dt:.1f}s ({n_generated / dt:.1f} tok/s)",
          file=sys.stderr)

    with open(output_path, "w", encoding="utf-8") as f:
        for i, rec in enumerate(records):
            f.write(json.dumps({**rec, "output": results[i]}) + "\n")
    print(f"Wrote {output_path}", file=sys.stderr)


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
