#!/usr/bin/env python
"""Perplexity evaluation (WikiText-2-style) for fp and quantized checkpoints.

The reference publishes quantization quality as perplexity deltas vs fp16
(BASELINE.md); this is the measurement tool: token-level ppl over a text
corpus with non-overlapping (or strided) block_size windows.
"""

import json
import sys
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))


def main(
    checkpoint_dir: Path = Path("checkpoints/stabilityai/stablelm-base-alpha-3b"),
    data_path: Optional[Path] = None,
    dataset: str = "wikitext-2",
    quantize: Optional[str] = None,
    precision: str = "bf16-true",
    block_size: Optional[int] = None,
    stride: Optional[int] = None,
    batch_size: int = 4,
    max_tokens: int = 0,
) -> float:
    """Computes corpus perplexity.

    Args:
        checkpoint_dir: Checkpoint directory.
        data_path: Text file to evaluate on (takes precedence over dataset).
        dataset: HF dataset shorthand (wikitext-2) when data_path is unset.
        quantize: Optional quantization mode applied at load.
        precision: bf16-true or 32-true.
        block_size: Evaluation window (default: model block_size, max 2048).
        stride: Window stride (default: block_size, i.e. non-overlapping).
        batch_size: Windows evaluated per forward.
        max_tokens: Truncate the corpus (0 = use everything).
    """
    import jax.numpy as jnp
    import numpy as np

    from parrot_tpu.generate.loader import load_model
    from parrot_tpu.models import gpt
    from parrot_tpu.ops.cross_entropy import cross_entropy
    import jax

    config, params, tokenizer = load_model(checkpoint_dir, quantize, precision)
    block_size = block_size or min(config.block_size, 2048)
    stride = stride or block_size

    if data_path is not None:
        text = Path(data_path).read_text(encoding="utf-8")
    else:
        from datasets import load_dataset

        name = {"wikitext-2": ("wikitext", "wikitext-2-raw-v1")}[dataset]
        data = load_dataset(*name, split="test")
        text = "\n\n".join(r["text"] for r in data)

    tokens = np.asarray(tokenizer.encode(text), np.int32)
    if max_tokens:
        tokens = tokens[:max_tokens]
    n_windows = max(0, (len(tokens) - block_size) // stride + 1)
    if n_windows == 0:
        raise ValueError(f"corpus has {len(tokens)} tokens < block_size {block_size}")

    @jax.jit
    def window_nll(params, batch):
        logits = gpt.forward(params, config, batch)
        # sum over all next-token predictions in the window
        nll = cross_entropy(logits[:, :-1], batch[:, 1:])
        return nll

    total_nll, total_count = 0.0, 0
    batch = []
    for w in range(n_windows):
        batch.append(tokens[w * stride : w * stride + block_size])
        if len(batch) == batch_size or w == n_windows - 1:
            arr = jnp.asarray(np.stack(batch))
            nll = float(window_nll(params, arr))
            count = arr.shape[0] * (block_size - 1)
            total_nll += nll * count
            total_count += count
            batch = []
            done = (w + 1) / n_windows
            print(f"\r{done:6.1%}  ppl so far {np.exp(total_nll / total_count):8.3f}",
                  end="", file=sys.stderr, flush=True)
    print(file=sys.stderr)
    ppl = float(np.exp(total_nll / total_count))
    print(json.dumps({
        "perplexity": round(ppl, 4),
        "tokens": total_count,
        "block_size": block_size,
        "quantize": quantize,
        "model": config.name,
    }))
    return ppl


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
