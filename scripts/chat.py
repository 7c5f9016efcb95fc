#!/usr/bin/env python
"""Interactive streaming chat REPL (counterpart of the reference's
``chat/base.py``)."""

import sys
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))


def main(
    checkpoint_dir: Path = Path("checkpoints/stabilityai/stablelm-tuned-alpha-3b"),
    top_k: int = 200,
    temperature: float = 0.8,
    quantize: Optional[str] = None,
    precision: str = "bf16-true",
    max_new_tokens: int = 256,
    draft_dir: Optional[Path] = None,
    speculative_k: int = 4,
    burst: int = 1,
    int4_kernel: Optional[str] = None,
) -> None:
    """Starts a conversation with a tuned model.

    Args:
        checkpoint_dir: The checkpoint directory to load.
        top_k: The number of top most probable tokens in sampling.
        temperature: Sampling temperature (0 = greedy).
        quantize: Quantization mode (bnb.* or gptq.int4).
        precision: bf16-true or 32-true.
        max_new_tokens: Per-reply generation budget.
        draft_dir: Checkpoint dir of a small same-tokenizer draft model;
            enables speculative decoding of each reply.
        speculative_k: Draft tokens proposed per verification pass.
        burst: Tokens generated per device round-trip (>1 multiplies
            streaming throughput on remote-runtime backends at the cost
            of burst-granular output; see engine.generate_stream).
        int4_kernel: int4 decode kernel: 2dot-f32 (default), grouped,
            2dot, or w8a8 (fastest; activation-int8 numerics).
            See ops/pallas_quant.set_int4_variant.
    """
    import jax
    import jax.numpy as jnp

    from parrot_tpu.generate import engine
    from parrot_tpu.generate.loader import load_model
    from parrot_tpu.generate.prompts import prompt_config

    if int4_kernel is not None:
        from parrot_tpu.ops import pallas_quant

        pallas_quant.set_int4_variant(int4_kernel)

    config, params, tokenizer = load_model(checkpoint_dir, quantize, precision)
    system_prompt, stop_tokens = prompt_config(checkpoint_dir, tokenizer)

    draft = None
    if draft_dir is not None:
        from parrot_tpu.generate.speculative import generate_stream_speculative

        draft_config, draft_params, _ = load_model(draft_dir, None, precision)
        draft = (draft_params, draft_config)

    rng = jax.random.PRNGKey(1234)
    print("Chat ready — empty prompt or Ctrl-C to exit.", file=sys.stderr)
    while True:
        try:
            prompt = input(">> Prompt: ")
        except (KeyboardInterrupt, EOFError):
            break
        if not prompt:
            break
        encoded = jnp.asarray(
            tokenizer.encode(system_prompt.format(prompt=prompt)), jnp.int32
        )
        rng, turn_rng = jax.random.split(rng)
        print(">> Reply: ", end="", flush=True)
        # stream tokens; decode incrementally by diffing the decoded prefix
        # (handles tokenizers whose pieces merge across boundaries,
        # chat/base.py:98-117)
        produced: list[int] = []
        printed = ""
        if draft is not None:
            stream = generate_stream_speculative(
                params, config, draft[0], draft[1], encoded, turn_rng,
                max_returned_tokens=int(encoded.shape[0]) + max_new_tokens,
                k=speculative_k, temperature=temperature, top_k=top_k,
                stop_tokens=stop_tokens, eos_id=tokenizer.eos_id,
            )
        else:
            stream = engine.generate_stream(
                params, config, encoded, turn_rng,
                max_returned_tokens=int(encoded.shape[0]) + max_new_tokens,
                temperature=temperature, top_k=top_k, stop_tokens=stop_tokens,
                burst=burst,
            )
        try:
            for tok in stream:
                produced.append(int(tok))
                text = tokenizer.decode(produced)
                print(text[len(printed):], end="", flush=True)
                printed = text
        except KeyboardInterrupt:
            pass
        print()


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
