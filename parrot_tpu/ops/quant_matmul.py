"""Quantized matmul dispatch: Pallas fused kernels on TPU, XLA fallback.

The XLA paths here are the correctness oracle (mirror of the reference's
"dequantize then F.linear" fallback, ``quantize/gptq.py:258-262``). On TPU the
hot cases route to fused Pallas dequant-matmul kernels
(:mod:`parrot_tpu.ops.pallas_quant`); the weight never materializes in
full precision in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from parrot_tpu.quantize import formats


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def quantized_matmul(p: "formats.QuantizedLinear", x: jnp.ndarray, layer=None) -> jnp.ndarray:
    """``y = x @ dequant(p)`` with shape ``x: [..., in] -> y: [..., out]``.

    ``layer``: traced index selecting a slab of stacked ``[L, ...]`` params —
    the Pallas kernels read it via scalar prefetch (no per-layer weight copy);
    the XLA oracle paths slice first (fused, also copy-free)."""
    if p.fmt == "int8-llm":
        # LLM.int8 (activation int8 + fp outlier columns above threshold 6.0,
        # reference quantize/bnb.py:38-44) — an XLA composition on every
        # backend: the decomposition is activation-dependent so there is no
        # weight-streaming win to chase with a dedicated kernel, and the
        # plain weight-only int8 path below is both faster AND more accurate
        # on TPU (kept for reference parity).
        if layer is not None:
            p = formats.take_layer(p, layer)
        return formats.llm_int8_matmul(p, x)
    if p.fmt == "int8":
        if _on_tpu():
            from parrot_tpu.ops import pallas_quant

            return pallas_quant.int8_matmul(p, x, layer=layer)
        if layer is not None:
            p = formats.take_layer(p, layer)
        # scales are per-output-channel, so they commute past the contraction:
        # contract against raw int8 weights (cast to activation dtype) and
        # rescale the [..., out] result — never materializes fp weights.
        Kp = p.qw.shape[0]
        if x.shape[-1] != Kp:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Kp - x.shape[-1])])
        y = jnp.dot(x, p.qw.astype(x.dtype))
        y = (y.astype(jnp.float32) * p.scales.astype(jnp.float32)).astype(x.dtype)
        return y[..., : p.out_features]
    if p.fmt in ("int4", "nf4", "fp4", "int2", "int8g"):
        if _on_tpu():
            from parrot_tpu.ops import pallas_quant

            if p.fmt == "int2":
                return pallas_quant.int2_matmul(p, x, layer=layer)
            if p.fmt == "int8g":
                return pallas_quant.uint8g_matmul(p, x, layer=layer)
            if p.fmt == "int4" and pallas_quant.W8A8:
                return pallas_quant.int4_matmul_w8a8(p, x, layer=layer)
            return pallas_quant.int4_matmul(p, x, layer=layer)
        if layer is not None:
            p = formats.take_layer(p, layer)
        w = formats.dequantize(p, dtype=x.dtype)
        return jnp.dot(x, w)
    raise ValueError(f"Unknown quantized format {p.fmt!r}")
