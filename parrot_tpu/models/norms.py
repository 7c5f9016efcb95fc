"""Normalization layers as pure functions.

Matches the reference's two norms: ``torch.nn.LayerNorm`` and the
mean-of-squares RMSNorm of ``lit_gpt/rmsnorm.py:4-21`` (which deliberately
differs from the original-paper formulation — the reduction is ``mean(x^2)``
with eps added *inside* the rsqrt).

Reductions run in float32 regardless of the activation dtype (the standard TPU
bf16 discipline: VPU elementwise in bf16 is fine, but variance accumulation in
bf16 loses too much precision), then cast back.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    norm = xf * lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (norm * scale.astype(jnp.float32)).astype(x.dtype)


def layer_norm(
    x: jnp.ndarray, scale: jnp.ndarray, bias: Optional[jnp.ndarray], eps: float
) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def apply_norm(params: dict, x: jnp.ndarray, kind: str, eps: float) -> jnp.ndarray:
    if kind == "RMSNorm":
        return rms_norm(x, params["scale"], eps)
    if kind == "LayerNorm":
        return layer_norm(x, params["scale"], params.get("bias"), eps)
    raise ValueError(f"Unknown norm class {kind!r}")
