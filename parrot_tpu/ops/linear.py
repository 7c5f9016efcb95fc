"""Linear-layer application with dtype-polymorphic parameters.

The reference swaps quantized implementations in by monkey-patching
``torch.nn.Linear`` during model construction (``lit_gpt/utils.py:26-83``).
Here a linear's parameters are just a pytree leaf-group, and the *type* of that
group selects the implementation at trace time — no patching, and one model
definition serves fp32/bf16/int8/int4/NF4 checkpoints:

- ``{"w": [in, out], "b"?: [out]}``            -> plain dense matmul
- :class:`~parrot_tpu.quantize.formats.QuantizedLinear` -> fused dequant-matmul

Weights are stored ``[in_features, out_features]`` (transposed relative to
torch) so activations contract without a transpose: ``y = x @ w``; this is the
layout XLA prefers for MXU tiling on TPU.

Every leaf-group may carry a leading stacked-layer axis (used by the
scan-over-layers GPT forward); ``apply_linear`` only ever sees the per-layer
slice.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp


def dense(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    y = jnp.dot(x, w.astype(x.dtype))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def apply_linear(params: Any, x: jnp.ndarray) -> jnp.ndarray:
    """Apply a linear layer given its parameter group.

    Dispatch is structural and happens at trace time, so each variant
    compiles to its own fused XLA/Pallas computation.
    """
    # quantized formats register themselves here to avoid circular imports
    from parrot_tpu.quantize import formats

    if isinstance(params, formats.QuantizedLinear):
        return formats.apply_quantized_linear(params, x)
    if isinstance(params, dict) and "w" in params:
        return dense(x, params["w"], params.get("b"))
    raise TypeError(f"Unrecognized linear parameter group: {type(params)!r}")
