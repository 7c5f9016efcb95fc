"""Fused Pallas dequant-matmul kernels for TPU (int8 / int4 / NF4).

Placeholder dispatch for now: routes to the XLA reference path while the
Pallas kernels land. The public entry points keep their final signatures so
``quant_matmul`` callers never change.
"""

from __future__ import annotations

import jax.numpy as jnp

from parrot_tpu.quantize import formats


def int8_matmul(p: "formats.QuantizedLinear", x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.dot(x, p.qw.astype(x.dtype))
    return (y.astype(jnp.float32) * p.scales.astype(jnp.float32)).astype(x.dtype)


def int4_matmul(p: "formats.QuantizedLinear", x: jnp.ndarray) -> jnp.ndarray:
    w = formats.dequantize(p, dtype=x.dtype)
    return jnp.dot(x, w)
