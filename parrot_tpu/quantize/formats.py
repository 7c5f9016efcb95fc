"""Packed quantized-weight formats and their matmul implementations.

Replaces the reference's three quantized-linear families with one parameter
type selected by metadata instead of monkey-patched module classes
(``lit_gpt/utils.py:26-83``):

- ``int8``  — LLM.int8-style weight-only absmax per output channel
  (``quantize/bnb.py:38-60``); scales fold in *after* the matmul so the MXU
  contraction runs on the raw int8 weights cast to the activation dtype.
- ``int4``  — GPTQ-style asymmetric 4-bit, two nibbles per byte packed along
  the K (input-feature) dimension with per-output-channel (optionally
  per-K-group) scale and zero, matching the layout of the reference's Triton
  kernel (``quantize/gptq.py:63-153``).
- ``nf4``   — QLoRA NormalFloat4 codebook lookup with per-block absmax
  (``quantize/bnb.py:62-75``); the ``-dq`` double-quant variant stores the
  per-block absmax as int8 with a second-level fp32 scale.

Each format has an XLA reference path here (dequantize-then-dot — always
correct, used on CPU and as the numerics oracle) and a fused Pallas
dequant-matmul kernel in :mod:`parrot_tpu.ops` used on TPU.

Weights are stored ``[in_features, out_features]`` like the dense format, so
quantizing a checkpoint only replaces pytree leaf-groups.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# QLoRA NF4 quantiles (Dettmers et al. 2023): 16 values, asymmetric around 0,
# normalized to [-1, 1].
NF4_CODE = np.array(
    [
        -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
        -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
        0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
        0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
        0.7229568362236023, 1.0,
    ],
    dtype=np.float32,
)

# FP4 (e2m1, sign-magnitude): magnitudes {0, .5, 1, 1.5, 2, 3, 4, 6}/6, bit 3
# is the sign — the bitsandbytes Linear4bit "fp4" data type
# (``quantize/bnb.py:62-75``).
_FP4_MAG = np.array([0.0, 1 / 12, 1 / 6, 0.25, 1 / 3, 0.5, 2 / 3, 1.0], np.float32)
FP4_CODE = np.concatenate([_FP4_MAG, -_FP4_MAG]).astype(np.float32)

_CODEBOOKS = {"nf4": NF4_CODE, "fp4": FP4_CODE}


@struct.dataclass
class QuantizedLinear:
    """A quantized linear's parameters.

    Array fields (pytree leaves; every one may carry extra leading stacked-layer
    axes):
      qw      packed quantized weights. int8: ``[in, out]`` int8.
              int4/nf4: ``[in//2, out]`` uint8 (low nibble = even k).
      scales  int8: ``[out]``. int4: ``[n_groups, out]``. nf4: per-block absmax
              ``[in*out/block]`` (int8 when double-quantized, else fp16/32).
      zeros   int4 only: ``[n_groups, out]`` asymmetric zero points (float).
      scales2 nf4-dq only: second-level fp32 scale for the int8 absmax blocks.
      b       optional bias ``[out]``.

    Static fields (part of the treedef, drive trace-time dispatch):
      fmt         "int8" | "int4" | "nf4"
      group_size  int4: K-group length (-1 = whole column). nf4: block size.
      in_features / out_features: unpacked logical shape.
    """

    qw: jnp.ndarray
    scales: jnp.ndarray
    zeros: Optional[jnp.ndarray] = None
    scales2: Optional[jnp.ndarray] = None
    b: Optional[jnp.ndarray] = None
    fmt: str = struct.field(pytree_node=False, default="int8")
    group_size: int = struct.field(pytree_node=False, default=-1)
    in_features: int = struct.field(pytree_node=False, default=0)
    out_features: int = struct.field(pytree_node=False, default=0)


# ---------------------------------------------------------------------------
# Packing / quantization (host-side, numpy-friendly but jittable)
# ---------------------------------------------------------------------------


def quantize_int8(w: jnp.ndarray, bias: Optional[jnp.ndarray] = None) -> QuantizedLinear:
    """Absmax per-output-channel symmetric int8. ``w``: [in, out]."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scales = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    qw = jnp.clip(jnp.round(w.astype(jnp.float32) / scales), -127, 127).astype(jnp.int8)
    return QuantizedLinear(
        qw=qw, scales=scales, b=bias, fmt="int8",
        in_features=w.shape[0], out_features=w.shape[1],
    )


def pack_nibbles(q: jnp.ndarray) -> jnp.ndarray:
    """Pack uint8 values in [0, 15] pairwise along axis 0: out[k] = q[2k] | q[2k+1]<<4."""
    assert q.shape[0] % 2 == 0, "K dimension must be even to pack int4"
    lo = q[0::2]
    hi = q[1::2]
    return (lo | (hi << 4)).astype(jnp.uint8)


def unpack_nibbles(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_nibbles`: [K//2, ...] uint8 -> [K, ...] uint8."""
    lo = packed & 0xF
    hi = (packed >> 4) & 0xF
    K2 = packed.shape[0]
    out = jnp.stack([lo, hi], axis=1)  # [K//2, 2, ...]
    return out.reshape((K2 * 2,) + packed.shape[1:])


def quantize_int4(
    w: jnp.ndarray, group_size: int = -1, bias: Optional[jnp.ndarray] = None
) -> QuantizedLinear:
    """Asymmetric min/max int4 per (K-group, output channel).

    Same scale/zero derivation as the reference's GPTQ weight quantizer
    (``quantize/gptq.py:317-347``): scale = (max-min)/15, zero = -min/scale.
    """
    K, N = w.shape
    gs = K if group_size == -1 else group_size
    assert K % gs == 0
    wf = w.astype(jnp.float32).reshape(K // gs, gs, N)
    wmax = jnp.maximum(jnp.max(wf, axis=1), 0.0)
    wmin = jnp.minimum(jnp.min(wf, axis=1), 0.0)
    scales = jnp.where(wmax == wmin, 1.0, (wmax - wmin) / 15.0)  # [n_groups, N]
    zeros = jnp.round(-wmin / scales)  # [n_groups, N], in [0, 15]
    q = jnp.clip(jnp.round(wf / scales[:, None]) + zeros[:, None], 0, 15)
    q = q.reshape(K, N).astype(jnp.uint8)
    return QuantizedLinear(
        qw=pack_nibbles(q), scales=scales, zeros=zeros, b=bias,
        fmt="int4", group_size=group_size, in_features=K, out_features=N,
    )


def quantize_nf4(
    w: jnp.ndarray,
    block_size: int = 64,
    double_quant: bool = False,
    bias: Optional[jnp.ndarray] = None,
) -> QuantizedLinear:
    return quantize_codebook(w, "nf4", block_size, double_quant, bias)


def quantize_fp4(
    w: jnp.ndarray,
    block_size: int = 64,
    double_quant: bool = False,
    bias: Optional[jnp.ndarray] = None,
) -> QuantizedLinear:
    return quantize_codebook(w, "fp4", block_size, double_quant, bias)


def quantize_codebook(
    w: jnp.ndarray,
    fmt: str,
    block_size: int = 64,
    double_quant: bool = False,
    bias: Optional[jnp.ndarray] = None,
) -> QuantizedLinear:
    """NF4/FP4 blockwise quantization. Blocks run over the column-major
    flattened tensor (one output channel's weights are contiguous), matching
    bitsandbytes' flat blocking while keeping dequant broadcastable in the
    matmul kernel."""
    K, N = w.shape
    assert (K * N) % block_size == 0, (K, N, block_size)
    wf = w.astype(jnp.float32).T.reshape(-1, block_size)  # [n_blocks, bs]
    absmax = jnp.max(jnp.abs(wf), axis=1)  # [n_blocks]
    absmax_safe = jnp.where(absmax == 0, 1.0, absmax)
    normalized = wf / absmax_safe[:, None]  # in [-1, 1]
    code = jnp.asarray(_CODEBOOKS[fmt])
    # nearest codebook entry
    dist = jnp.abs(normalized[..., None] - code[None, None, :])
    q = jnp.argmin(dist, axis=-1).astype(jnp.uint8)  # [n_blocks, block]
    q = q.reshape(N, K).T  # back to [K, N]
    scales2 = None
    if double_quant:
        # store absmax as int8 against a single fp32 second-level scale
        s2 = jnp.max(absmax) / 127.0
        s2 = jnp.where(s2 == 0, 1.0, s2)
        absmax_q = jnp.clip(jnp.round(absmax / s2), -127, 127).astype(jnp.int8)
        scales, scales2 = absmax_q, jnp.asarray(s2, jnp.float32)
    else:
        scales = absmax.astype(jnp.float32)
    return QuantizedLinear(
        qw=pack_nibbles(q), scales=scales, scales2=scales2, b=bias,
        fmt=fmt, group_size=block_size, in_features=K, out_features=N,
    )


# ---------------------------------------------------------------------------
# Dequantization (XLA reference paths / numerics oracle)
# ---------------------------------------------------------------------------


def dequantize(p: QuantizedLinear, dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """Materialize the full-precision weight ``[in, out]``."""
    if p.fmt == "int8":
        return (p.qw.astype(jnp.float32) * p.scales[None, :].astype(jnp.float32)).astype(dtype)
    if p.fmt == "int4":
        K, N = p.in_features, p.out_features
        gs = K if p.group_size == -1 else p.group_size
        q = unpack_nibbles(p.qw).astype(jnp.float32).reshape(K // gs, gs, N)
        w = (q - p.zeros[:, None].astype(jnp.float32)) * p.scales[:, None].astype(jnp.float32)
        return w.reshape(K, N).astype(dtype)
    if p.fmt in ("nf4", "fp4"):
        K, N = p.in_features, p.out_features
        bs = p.group_size
        q = unpack_nibbles(p.qw)  # [K, N] uint8
        vals = jnp.take(jnp.asarray(_CODEBOOKS[p.fmt]), q.astype(jnp.int32))
        absmax = p.scales.astype(jnp.float32)
        if p.scales2 is not None:
            absmax = absmax * p.scales2
        vals = vals.T.reshape(-1, bs) * absmax[:, None]
        return vals.reshape(N, K).T.astype(dtype)
    raise ValueError(f"Unknown quantized format {p.fmt!r}")


def apply_quantized_linear(p: QuantizedLinear, x: jnp.ndarray) -> jnp.ndarray:
    """Quantized matmul. Uses a fused Pallas kernel on TPU where profitable;
    falls back to the XLA dequantize-then-dot reference path."""
    from parrot_tpu.ops import quant_matmul

    y = quant_matmul.quantized_matmul(p, x)
    if p.b is not None:
        y = y + p.b.astype(y.dtype)
    return y
