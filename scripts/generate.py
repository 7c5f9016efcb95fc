#!/usr/bin/env python
"""Generate text samples from a checkpoint (counterpart of the reference's
``generate/base.py`` CLI)."""

import sys
import time
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))


def main(
    prompt: str = "Hello, my name is",
    num_samples: int = 1,
    max_new_tokens: int = 50,
    top_k: int = 200,
    temperature: float = 0.8,
    checkpoint_dir: Path = Path("checkpoints/stabilityai/stablelm-base-alpha-3b"),
    quantize: Optional[str] = None,
    precision: str = "bf16-true",
    kv_cache: str = "bf16",
    mesh: Optional[str] = None,
    draft_dir: Optional[Path] = None,
    speculative_k: int = 4,
    seed: int = 1234,
    profile: Optional[Path] = None,
    int4_kernel: Optional[str] = None,
    segment_layers: Optional[int] = None,
    swap_resident_layers: Optional[int] = None,
    swap_chunk_layers: int = 4,
) -> None:
    """Generates text samples based on a pre-trained model and tokenizer.

    Args:
        prompt: The prompt string to use for generating the samples.
        num_samples: The number of text samples to generate.
        max_new_tokens: The number of generation steps to take.
        top_k: The number of top most probable tokens to consider in the sampling process.
        temperature: Scales the predicted logits; 0 selects greedy decoding.
        checkpoint_dir: The checkpoint directory to load.
        quantize: Quantization mode: bnb.nf4, bnb.nf4-dq, bnb.fp4, bnb.fp4-dq,
            bnb.int8 (RTN at load time) or gptq.int4 (pre-calibrated file).
        int4_kernel: int4 decode kernel: 2dot-f32 (default), grouped,
            2dot, or w8a8 (fastest; activation-int8 numerics).
            See ops/pallas_quant.set_int4_variant.
        precision: bf16-true or 32-true.
        kv_cache: KV cache dtype: bf16 or int8.
        mesh: Shard the model over local devices, e.g. "1,1,4" for
            data=1,fsdp=1,tensor=4 (multi-chip serving).
        draft_dir: Checkpoint dir of a small same-tokenizer draft model;
            enables speculative decoding (e.g. pythia-70m drafting for
            pythia-6.9b). Greedy output is identical to normal decoding.
        speculative_k: Draft tokens proposed per verification pass.
        seed: Random seed for sampling.
        profile: Write a jax.profiler trace of the generation into this
            directory (view with tensorboard/xprof).
        segment_layers: Split the stacked layer weights into segments of at
            most this many layers (caps the size of any single stacked
            buffer/scan carry; full speed — see gpt.segment_blocks).
        swap_resident_layers: Decode through the residency-capped swap
            executor (generate/swap.py): keep this many layers on device and
            stream the rest from host RAM per token. For models whose packed
            weights exceed the backend's residency budget; slow
            (host-bandwidth-bound) but runs anything that fits host RAM.
        swap_chunk_layers: Swap-executor arena chunk size.
    """
    import jax
    import jax.numpy as jnp

    from parrot_tpu.generate import engine
    from parrot_tpu.generate.loader import device_memory_report, load_model

    if int4_kernel is not None:
        from parrot_tpu.ops import pallas_quant

        pallas_quant.set_int4_variant(int4_kernel)

    config, params, tokenizer = load_model(checkpoint_dir, quantize, precision)
    if mesh is not None:
        from parrot_tpu.parallel import mesh as mesh_lib
        from parrot_tpu.parallel import sharding

        ms = mesh_lib.parse_mesh(mesh)
        if len(ms) > 3 and ms[3] > 1:
            raise ValueError("pipeline stages apply to training; serve with data/fsdp/tensor")
        params = sharding.shard_params(mesh_lib.make_mesh(*ms[:3]), params)

    encoded = jnp.asarray(tokenizer.encode(prompt), jnp.int32)
    prompt_length = int(encoded.shape[0])
    max_returned_tokens = prompt_length + max_new_tokens
    assert max_returned_tokens <= config.block_size, (max_returned_tokens, config.block_size)

    from parrot_tpu.utils.profiling import profile_trace

    draft = None
    if draft_dir is not None:
        from parrot_tpu.generate.speculative import generate_speculative

        draft_config, draft_params, _ = load_model(draft_dir, None, precision)
        draft = (draft_params, draft_config)

    cache_dtype = jnp.int8 if kv_cache == "int8" else jnp.bfloat16
    rng = jax.random.PRNGKey(seed)

    if segment_layers is not None:
        from parrot_tpu.models import gpt as gpt_lib

        params = gpt_lib.segment_blocks(params, segment_layers)

    if swap_resident_layers is not None:
        if segment_layers is not None:
            raise ValueError(
                "--segment_layers and --swap_resident_layers are mutually "
                "exclusive (the swap executor slices the un-segmented stack)"
            )
        from parrot_tpu.generate.swap import SwapDecoder

        dec = SwapDecoder(
            params, config, resident_layers=swap_resident_layers,
            chunk_layers=swap_chunk_layers,
            max_seq_length=max_returned_tokens, cache_dtype=cache_dtype,
            temperature=temperature, top_k=top_k if temperature else None,
        )
        with profile_trace(profile):
            for i in range(num_samples):
                t0 = time.perf_counter()
                out = dec.generate(encoded, max_new_tokens)
                t = time.perf_counter() - t0
                print(tokenizer.decode(jnp.asarray(list(encoded) + out, jnp.int32)))
                print(
                    f"Time for inference {i + 1}: {t:.02f} sec total,"
                    f" {len(out) / t:.02f} tokens/sec",
                    file=sys.stderr,
                )
        if (report := device_memory_report()) is not None:
            print(report, file=sys.stderr)
        return

    with profile_trace(profile):
        for i in range(num_samples):
            rng, sample_rng = jax.random.split(rng)
            t0 = time.perf_counter()
            if draft is not None:
                tokens, n, stats = generate_speculative(
                    params, config, draft[0], draft[1], encoded, sample_rng,
                    max_returned_tokens=max_returned_tokens, k=speculative_k,
                    temperature=temperature, top_k=top_k, eos_id=tokenizer.eos_id,
                    cache_dtype=cache_dtype,
                )
            else:
                tokens, n = engine.generate(
                    params, config, encoded, sample_rng,
                    max_returned_tokens=max_returned_tokens,
                    temperature=temperature, top_k=top_k, eos_id=tokenizer.eos_id,
                    cache_dtype=cache_dtype,
                )
            n = int(n)  # device sync
            t = time.perf_counter() - t0
            print(tokenizer.decode(tokens[:n]))
            print(
                f"Time for inference {i + 1}: {t:.02f} sec total,"
                f" {(n - prompt_length) / t:.02f} tokens/sec",
                file=sys.stderr,
            )
            if draft is not None:
                r, c = stats["rounds"], stats["tokens_committed"]
                print(
                    f"speculative: {r} target passes for {c} tokens "
                    f"({(c - r) / max(r * speculative_k, 1):.0%} draft acceptance)",
                    file=sys.stderr,
                )
    if (report := device_memory_report()) is not None:
        print(report, file=sys.stderr)


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
