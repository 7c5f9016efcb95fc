"""Linear-layer application with dtype- and PEFT-polymorphic parameters.

The reference swaps quantized implementations in by monkey-patching
``torch.nn.Linear`` during model construction (``lit_gpt/utils.py:26-83``) and
adds Adapter-v2 scale/bias by monkey-patching ``forward`` per instance
(``lit_gpt/adapter_v2.py:34-53``). Here a linear's parameters are just a
pytree leaf-group, and the *contents* of that group select the implementation
at trace time — no patching, one model definition for every variant:

- ``{"w": [in, out], "b"?: [out]}``                      dense matmul
- ``+ {"lora": {"a": [in, r], "b": [r, out]}}``          + LoRA delta
  (``lit_gpt/lora.py:154-176``; dropout applied to the branch input)
- ``+ {"adapter_scale": [out], "adapter_bias": [out]}``  Adapter-v2:
  ``y = scale * (dense(x) + bias)`` (``adapter_v2.py:34-35``)
- :class:`~parrot_tpu.quantize.formats.QuantizedLinear`  fused dequant-matmul

Weights are stored ``[in_features, out_features]`` (transposed vs torch) so
activations contract without a transpose — the layout XLA tiles best on the
TPU MXU. Leaf-groups may carry a leading stacked-layer axis; ``apply_linear``
only ever sees the per-layer slice.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp


def dense(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    y = jnp.dot(x, w.astype(x.dtype))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def lora_delta(
    lora: dict,
    x: jnp.ndarray,
    scaling: float,
    rng: Optional[jax.Array] = None,
    dropout: float = 0.0,
) -> jnp.ndarray:
    if rng is not None and dropout > 0.0:
        keep = jax.random.bernoulli(rng, 1.0 - dropout, x.shape)
        x = jnp.where(keep, x / (1.0 - dropout), 0.0).astype(x.dtype)
    return ((x @ lora["a"].astype(x.dtype)) @ lora["b"].astype(x.dtype)) * scaling


def apply_linear(
    params: Any,
    x: jnp.ndarray,
    *,
    rng: Optional[jax.Array] = None,
    dropout: float = 0.0,
    lora_scaling: float = 1.0,
) -> jnp.ndarray:
    """Apply a linear layer given its parameter group. Dispatch is structural
    and happens at trace time, so each variant compiles to its own fused
    XLA/Pallas computation."""
    from parrot_tpu.quantize import formats

    if isinstance(params, formats.StackedQuantizedLinear):
        # stacked [L, ...] weights + traced layer index: the kernels index
        # the stacked arrays directly (no per-layer weight copy per step)
        return formats.apply_quantized_linear(params.p, x, layer=params.layer)
    if isinstance(params, formats.QuantizedLinear):
        return formats.apply_quantized_linear(params, x)
    if isinstance(params, dict) and "w" in params:
        y = dense(x, params["w"], params.get("b"))
        lora = params.get("lora")
        if lora is not None and "a" in lora:
            y = y + lora_delta(lora, x, lora_scaling, rng, dropout)
        if "adapter_scale" in params:
            y = params["adapter_scale"].astype(y.dtype) * (
                y + params["adapter_bias"].astype(y.dtype)
            )
        return y
    raise TypeError(f"Unrecognized linear parameter group: {type(params)!r}")
