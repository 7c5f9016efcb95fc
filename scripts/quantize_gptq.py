#!/usr/bin/env python
"""Blockwise GPTQ calibration of a checkpoint (counterpart of
``quantize/gptq.py``'s ``main``): produces ``lit_model_gptq.4bit.safetensors``
next to the fp checkpoint."""

import sys
import time
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))


def get_sample_data(tokenizer, n_samples: int, block_size: int, seed: int = 0):
    """Calibration batch: C4-en samples like the reference (``gptq.py:448-453``)
    when the `datasets` cache is available, else a deterministic synthetic
    token stream (zero-egress environments)."""
    import numpy as np

    try:
        from datasets import load_dataset

        traindata = load_dataset(
            "allenai/c4",
            data_files={"train": "en/c4-train.00000-of-01024.json.gz"},
            split="train",
        )
        rng = np.random.RandomState(seed)
        text = "\n".join(
            traindata[int(i)]["text"]
            for i in rng.permutation(len(traindata))[:2000]
        )
        tokens = tokenizer.encode(text)
    except Exception as e:
        print(f"C4 unavailable ({e}); using synthetic calibration data", file=sys.stderr)
        rng = np.random.RandomState(seed)
        tokens = rng.randint(0, tokenizer.vocab_size, size=n_samples * block_size * 2)
    tokens = np.asarray(tokens)
    needed = n_samples * block_size
    if len(tokens) < needed:
        tokens = np.tile(tokens, needed // len(tokens) + 1)
    return tokens[:needed].reshape(n_samples, block_size).astype(np.int32)


def main(
    checkpoint_dir: Path = Path("checkpoints/stabilityai/stablelm-base-alpha-3b"),
    output_path: Optional[Path] = None,
    bits: int = 4,
    n_samples: int = 128,
    block_size: int = 2048,
    blocksize: int = 128,
    percdamp: float = 0.01,
    groupsize: int = -1,
    actorder: bool = False,
    batch_size: int = 8,
    precision: str = "bf16-true",
) -> None:
    """Runs blockwise GPTQ calibration over a checkpoint.

    Args:
        checkpoint_dir: Checkpoint directory with lit_model.safetensors.
        output_path: Output file (default: lit_model_gptq.{bits}bit.safetensors
            inside checkpoint_dir).
        bits: Quantized width — 2, 4, or 8 (the reference's
            ColBlockQuantizedLinear menu, quantize/gptq.py:205-213).
        n_samples: Number of calibration sequences.
        block_size: Calibration sequence length.
        blocksize: GPTQ error-feedback block width.
        percdamp: Hessian damping fraction.
        groupsize: Scale group size along input features (-1 = per channel).
        actorder: Quantize columns in decreasing Hessian-diagonal order.
        batch_size: Calibration forward batch size.
        precision: bf16-true or 32-true.
    """
    import jax.numpy as jnp

    from parrot_tpu.generate.loader import gptq_model_file, load_model
    from parrot_tpu.quantize.api import quantize_model_gptq
    from parrot_tpu.utils import checkpoint as ckpt

    import jax

    config, params, tokenizer = load_model(checkpoint_dir, precision=precision)
    # move the fp model to host and free its HBM: calibration streams one
    # block at a time to the device (reference gptq.py:488-529)
    host_params = jax.device_get(params)
    for leaf in jax.tree.leaves(params):
        if hasattr(leaf, "delete"):
            leaf.delete()
    params = host_params
    block_size = min(block_size, config.block_size)
    calib = jnp.asarray(get_sample_data(tokenizer, n_samples, block_size))

    t0 = time.time()
    qparams, stats = quantize_model_gptq(
        params, config, calib, bits=bits, blocksize=blocksize, percdamp=percdamp,
        groupsize=groupsize, actorder=actorder, batch_size=batch_size,
        log=lambda msg: print(msg, file=sys.stderr),
    )
    print(f"GPTQ calibration took {time.time() - t0:.1f}s", file=sys.stderr)
    print(f"total quantization error: {sum(stats.values()):.2f}", file=sys.stderr)

    output_path = output_path or (
        Path(checkpoint_dir) / gptq_model_file(f"gptq.int{bits}")
    )
    ckpt.save_checkpoint(output_path, qparams)
    print(f"Saved {output_path}", file=sys.stderr)


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
