#!/usr/bin/env python
"""Generate from a PEFT-finetuned checkpoint (counterpart of the reference's
``generate/lora.py`` / ``generate/adapter.py`` / ``generate/adapter_v2.py`` /
``generate/full.py`` family — one script, ``--method`` selects)."""

import sys
import time
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))


def main(
    prompt: str = "What food do llamas eat?",
    method: str = "lora",
    peft_path: Path = Path("out/lora/alpaca/lit_model_lora_finetuned.safetensors"),
    checkpoint_dir: Path = Path("checkpoints/stabilityai/stablelm-base-alpha-3b"),
    max_new_tokens: int = 100,
    top_k: int = 200,
    temperature: float = 0.8,
    precision: str = "bf16-true",
    lora_r: int = 8,
    lora_alpha: int = 16,
    lora_query: bool = True,
    lora_key: bool = False,
    lora_value: bool = True,
    lora_projection: bool = False,
    lora_mlp: bool = False,
    lora_head: bool = False,
    seed: int = 1234,
) -> None:
    """Generates a response from an instruction-tuned PEFT checkpoint,
    using the alpaca prompt template.

    Args:
        prompt: The instruction.
        method: full | lora | adapter | adapter_v2.
        peft_path: Filtered PEFT checkpoint produced by finetuning.
        checkpoint_dir: Base model checkpoint directory.
        max_new_tokens: Generation budget.
        top_k: Top-k sampling cutoff.
        temperature: Sampling temperature (0 = greedy).
        precision: bf16-true or 32-true.
        lora_r: LoRA rank used at finetune time.
        lora_alpha: LoRA alpha used at finetune time.
        lora_query: LoRA on query (must match finetune flags).
        lora_key: LoRA on key.
        lora_value: LoRA on value.
        lora_projection: LoRA on attention projection.
        lora_mlp: LoRA on MLP.
        lora_head: LoRA on LM head.
        seed: Sampling seed.
    """
    import jax
    import jax.numpy as jnp

    from parrot_tpu.data.sft import generate_prompt
    from parrot_tpu.generate import engine
    from parrot_tpu.generate.loader import load_peft_model

    knobs = {}
    if method == "lora":
        knobs = dict(r=lora_r, alpha=lora_alpha, to_query=lora_query, to_key=lora_key,
                     to_value=lora_value, to_projection=lora_projection,
                     to_mlp=lora_mlp, to_head=lora_head)
    config, params, tokenizer = load_peft_model(
        checkpoint_dir, peft_path, method, precision=precision, **knobs
    )

    templated = generate_prompt({"instruction": prompt, "input": ""})
    encoded = jnp.asarray(tokenizer.encode(templated), jnp.int32)
    t0 = time.perf_counter()
    tokens, n = engine.generate(
        params, config, encoded, jax.random.PRNGKey(seed),
        max_returned_tokens=int(encoded.shape[0]) + max_new_tokens,
        temperature=temperature, top_k=top_k, eos_id=tokenizer.eos_id,
    )
    n = int(n)
    t = time.perf_counter() - t0
    output = tokenizer.decode(tokens[:n])
    print(output.split("### Response:")[-1].strip())
    print(
        f"\nTime for inference: {t:.02f} sec total,"
        f" {(n - int(encoded.shape[0])) / t:.02f} tokens/sec",
        file=sys.stderr,
    )


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
