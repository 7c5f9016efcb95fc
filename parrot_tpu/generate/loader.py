"""Shared checkpoint loading for the CLI entry points.

The functional analogue of the reference's per-script load sequence
(``generate/base.py:199-228``): validate the checkpoint directory, read
``lit_config.json``, load params (fp or quantized through the single
safetensors schema), optionally quantize on the fly (bnb.* RTN modes), and
build the tokenizer.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path
from typing import Optional

import jax.numpy as jnp

from parrot_tpu.config import Config
from parrot_tpu.quantize import api as quantize_api
from parrot_tpu.utils import checkpoint as ckpt
from parrot_tpu.utils.tokenizer import Tokenizer

GPTQ_MODEL_FILE = "lit_model_gptq.4bit.safetensors"


def gptq_model_file(mode: str) -> str:
    """``gptq.int4`` -> ``lit_model_gptq.4bit.safetensors`` etc. — same
    naming scheme as the reference (``quantize/gptq.py:550-556``)."""
    bits = int(mode.split("int")[1])
    return f"lit_model_gptq.{bits}bit.safetensors"

PRECISION_DTYPES = {
    "bf16-true": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "32-true": jnp.float32,
    "fp32": jnp.float32,
    "16-true": jnp.float16,
}


def load_model(
    checkpoint_dir: Path,
    quantize: Optional[str] = None,
    precision: str = "bf16-true",
    verbose: bool = True,
):
    """Returns ``(config, params, tokenizer)``."""
    checkpoint_dir = Path(checkpoint_dir)
    ckpt.check_valid_checkpoint_dir(checkpoint_dir)
    config = Config.from_json(checkpoint_dir / "lit_config.json")
    dtype = PRECISION_DTYPES[precision]

    is_gptq = quantize is not None and quantize.startswith("gptq.")
    if is_gptq:
        model_path = checkpoint_dir / gptq_model_file(quantize)
        if not model_path.is_file():
            bits = quantize.split("int")[1]
            raise ValueError(
                f"{model_path} not found: run `python scripts/quantize_gptq.py "
                f"--checkpoint_dir {checkpoint_dir} --bits {bits}` first"
            )
    else:
        model_path = checkpoint_dir / ckpt.MODEL_FILE

    t0 = time.time()
    params = ckpt.load_checkpoint(model_path)
    params = _cast_fp_leaves(params, dtype)
    if quantize is not None and not is_gptq:
        params = quantize_api.quantize_params(params, config, quantize)
    if verbose:
        print(
            f"Loaded {model_path.name} ({config.name}) in {time.time() - t0:.1f}s",
            file=sys.stderr,
        )

    tokenizer = Tokenizer(checkpoint_dir)
    return config, params, tokenizer


def _cast_fp_leaves(params, dtype):
    import jax

    def cast(x):
        if hasattr(x, "dtype") and x.dtype in (jnp.float32, jnp.float16, jnp.bfloat16):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, params)


def load_peft_model(
    checkpoint_dir: Path,
    peft_path: Path,
    method: str,
    precision: str = "bf16-true",
    **method_knobs,
):
    """Load base weights + a filtered PEFT checkpoint and assemble the
    inference model (``generate/lora.py:100-114``: base + delta merged before
    use; LoRA additionally folds the deltas into the dense weights).

    Returns ``(config, params, tokenizer)``.
    """
    import jax

    from parrot_tpu.models import adapter as adapter_lib
    from parrot_tpu.models import adapter_v2 as adapter_v2_lib
    from parrot_tpu.models import lora as lora_lib

    base_config, params, tokenizer = load_model(checkpoint_dir, precision=precision)
    delta = ckpt.load_checkpoint(peft_path)
    rng = jax.random.PRNGKey(0)

    if method == "lora":
        config = lora_lib.LoRAConfig(**base_config.to_dict(), **method_knobs)
        params = lora_lib.add_lora_params(config, params, rng)
        params = ckpt.merge_trees(params, delta)
        params = lora_lib.merge_lora_weights(config, params)  # fold for inference
        return base_config, params, tokenizer
    if method in ("adapter", "adapter_v2"):
        config = adapter_lib.AdapterConfig(**base_config.to_dict(), **method_knobs)
        add = (adapter_lib.add_adapter_params if method == "adapter"
               else adapter_v2_lib.add_adapter_v2_params)
        params = add(config, params, rng)
        params = ckpt.merge_trees(params, delta)
        return config, params, tokenizer
    if method == "full":
        params = ckpt.merge_trees(params, delta)
        return base_config, params, tokenizer
    raise ValueError(f"unknown PEFT method {method!r}")


def device_memory_report() -> Optional[str]:
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        peak = stats.get("peak_bytes_in_use", stats.get("bytes_in_use"))
        if peak is not None:
            return f"Memory used: {peak / 1e9:.02f} GB"
    except Exception:
        pass
    return None
