"""Adapter v2: v1 prefix attention + per-linear scale/bias + trainable norms.

Functional counterpart of ``lit_gpt/adapter_v2.py``. The reference
monkey-patches every ``nn.Linear.forward`` to
``adapter_scale * (linear(x) + adapter_bias)`` (``adapter_v2.py:34-53``);
here the scale/bias are ordinary leaves inside each linear's parameter group
and :func:`parrot_tpu.ops.linear.apply_linear` applies them structurally.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from parrot_tpu.models.adapter import AdapterConfig, add_adapter_params

__all__ = ["AdapterConfig", "add_adapter_v2_params", "adapter_v2_filter",
           "adapter_v2_trainable_mask"]


def _extend_linear(group: dict, stacked: bool) -> dict:
    if not isinstance(group, dict) or "w" not in group:
        return group
    w = group["w"]
    out = w.shape[-1]
    shape = (w.shape[0], out) if stacked else (out,)
    return {
        **group,
        "adapter_scale": jnp.ones(shape, w.dtype),
        "adapter_bias": jnp.zeros(shape, w.dtype),
    }


def add_adapter_v2_params(config: AdapterConfig, params: dict, rng: jax.Array) -> dict:
    """v1 prefix params + scale/bias on every linear
    (``add_adapter_v2_parameters_to_linear_layers``, ``adapter_v2.py:50-53``)."""
    params = add_adapter_params(config, params, rng)
    attn = params["blocks"]["attn"]
    attn["qkv"] = _extend_linear(attn["qkv"], stacked=True)
    attn["proj"] = _extend_linear(attn["proj"], stacked=True)
    params["blocks"]["mlp"] = {
        k: _extend_linear(v, stacked=True) for k, v in params["blocks"]["mlp"].items()
    }
    params["lm_head"] = _extend_linear(params["lm_head"], stacked=False)
    return params


def adapter_v2_filter(path: str) -> bool:
    """Checkpoint filter (``adapter_v2.py:12-25``): v1 params, scale/bias,
    and all norm parameters."""
    substrings = (".adapter.wte", ".adapter.gate", "adapter_scale", "adapter_bias",
                  "norm_1", "norm_2", "ln_f")
    return any(s in path for s in substrings)


def adapter_v2_trainable_mask(params: Any) -> Any:
    from parrot_tpu.utils.checkpoint import mask_by_path

    return mask_by_path(params, adapter_v2_filter)
