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
      scales  int8: ``[out_pad]``. int4: ``[n_groups, out_pad]``. nf4/fp4:
              per-block absmax ``[in_pad/block, out_pad]`` (int8 when
              double-quantized, else fp32).
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

# Storage alignment baked in at quantization time: K to the packing block,
# N to the TPU lane width. Padding weights once here is what lets the Pallas
# kernels assume full tiles — the padded region quantizes so that it
# dequantizes to exactly 0 and contributes nothing to the matmul; logical
# shapes live in in_features/out_features and outputs are sliced at use.
K_ALIGN = 256  # == PACK_BLOCK (defined below)
N_ALIGN = 128


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _pad_kn(w: jnp.ndarray, k_align: int = K_ALIGN, n_align: int = N_ALIGN) -> jnp.ndarray:
    K, N = w.shape
    return jnp.pad(w, ((0, _round_up(K, k_align) - K), (0, _round_up(N, n_align) - N)))


def quantize_int8(
    w: jnp.ndarray, bias: Optional[jnp.ndarray] = None, llm_int8: bool = False
) -> QuantizedLinear:
    """Absmax per-output-channel symmetric int8. ``w``: [in, out].

    ``llm_int8=True`` marks the parameter for LLM.int8 runtime semantics
    (Dettmers et al. 2022; the reference's ``bnb.int8`` Linear8bitLt,
    ``quantize/bnb.py:38-44``): activations quantize to int8 per row EXCEPT
    input-feature columns whose magnitude exceeds threshold 6.0 — those run
    in full precision against the dequantized weight columns. Storage is
    identical; only the matmul dispatch differs. The plain ``int8`` format
    (weight-only, bf16 activations) is strictly MORE accurate and remains
    the TPU production path; ``int8-llm`` exists for reference parity."""
    K, N = w.shape
    w = _pad_kn(w)
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scales = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    qw = jnp.clip(jnp.round(w.astype(jnp.float32) / scales), -127, 127).astype(jnp.int8)
    return QuantizedLinear(
        qw=qw, scales=scales, b=bias, fmt="int8-llm" if llm_int8 else "int8",
        in_features=K, out_features=N,
    )


# LLM.int8 outlier threshold (reference quantize/bnb.py:41: threshold=6.0)
LLM_INT8_THRESHOLD = 6.0


def llm_int8_matmul(p: QuantizedLinear, x: jnp.ndarray,
                    threshold: float = LLM_INT8_THRESHOLD) -> jnp.ndarray:
    """LLM.int8 mixed-precision matmul (``y = x @ dequant(p)`` semantics).

    Input-feature columns where any ``|x| > threshold`` are outliers: they
    contribute in full precision (activation values pass through EXACTLY —
    no rounding). Every other column contributes through the int8 x int8
    product: activations quantized per row (absmax/127), weights already
    int8 per output channel — the vector-wise scheme of Linear8bitLt.
    """
    Kp = p.qw.shape[-2]
    if x.shape[-1] != Kp:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Kp - x.shape[-1])])
    xf = x.astype(jnp.float32)
    flat = xf.reshape(-1, Kp)
    outlier = jnp.any(jnp.abs(flat) > threshold, axis=0)  # [K] feature mask
    x_reg = jnp.where(outlier[None, :], 0.0, flat)
    x_out = flat - x_reg  # exactly the outlier columns, unrounded
    # regular path: per-row int8 activation quantization
    row_max = jnp.max(jnp.abs(x_reg), axis=-1, keepdims=True)
    sx = jnp.where(row_max == 0, 1.0, row_max / 127.0)
    xq = jnp.clip(jnp.round(x_reg / sx), -127, 127)
    y = jnp.dot(xq, p.qw.astype(jnp.float32)) * sx * p.scales[None, :].astype(jnp.float32)
    # outlier path: full precision against dequantized weight columns (the
    # zeroed regular columns contribute nothing)
    wd = p.qw.astype(jnp.float32) * p.scales[None, :].astype(jnp.float32)
    y = y + jnp.dot(x_out, wd)
    y = y.reshape(x.shape[:-1] + (y.shape[-1],)).astype(x.dtype)
    return y[..., : p.out_features]


# Unpacked rows per packing block. Within each block of 256 K-rows, the low
# nibbles hold rows [0, 128) and the high nibbles rows [128, 256): unpacking a
# block is a pure sublane concatenation (free layout on the TPU VPU), unlike
# the reference Triton kernel's per-row interleave ``(b12 >> ((k%2)*4)) & 0xF``
# (``quantize/gptq.py:139``) which would be a sublane shuffle. Contiguous
# packed tiles unpack to contiguous K-tiles, so the Pallas matmul kernel
# streams the packed weight linearly.
PACK_BLOCK = 256


def _pack_block_rows(K: int) -> int:
    if K % PACK_BLOCK == 0:
        return PACK_BLOCK
    assert K % 2 == 0, "K dimension must be even to pack int4"
    return K


def pack_nibbles(q: jnp.ndarray) -> jnp.ndarray:
    """Pack uint8 values in [0, 15] along axis 0 (blocked split-half layout).
    ``[K, ...] -> [K//2, ...]``."""
    K = q.shape[0]
    block = _pack_block_rows(K)
    blocked = q.reshape((K // block, block) + q.shape[1:])
    lo = blocked[:, : block // 2]
    hi = blocked[:, block // 2 :]
    packed = lo | (hi << 4)
    return packed.reshape((K // 2,) + q.shape[1:]).astype(jnp.uint8)


def unpack_nibbles(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_nibbles`: [K//2, ...] uint8 -> [K, ...] uint8."""
    K = packed.shape[0] * 2
    block = _pack_block_rows(K)
    blocked = packed.reshape((K // block, block // 2) + packed.shape[1:])
    lo = blocked & 0xF
    hi = (blocked >> 4) & 0xF
    out = jnp.concatenate([lo, hi], axis=1)
    return out.reshape((K,) + packed.shape[1:])


def _pack_block_rows2(K: int) -> int:
    if K % PACK_BLOCK == 0:
        return PACK_BLOCK
    assert K % 4 == 0, "K dimension must be a multiple of 4 to pack int2"
    return K


def pack_crumbs(q: jnp.ndarray) -> jnp.ndarray:
    """Pack uint8 values in [0, 3] along axis 0, 4 codes per byte.

    Blocked split-quarter layout (the 2-bit analogue of the int4 split-half
    packing): within each block of 256 K-rows, bit pair j of a byte holds
    rows [64j, 64(j+1)) — unpacking a block is 3 vector shifts and a sublane
    concat, and the telescoped-shift identity in the Pallas kernel needs no
    masks at all. ``[K, ...] -> [K//4, ...]``.
    """
    K = q.shape[0]
    block = _pack_block_rows2(K)
    blocked = q.reshape((K // block, block) + q.shape[1:])
    qtr = block // 4
    planes = [blocked[:, i * qtr : (i + 1) * qtr] for i in range(4)]
    packed = planes[0] | (planes[1] << 2) | (planes[2] << 4) | (planes[3] << 6)
    return packed.reshape((K // 4,) + q.shape[1:]).astype(jnp.uint8)


def unpack_crumbs(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_crumbs`: [K//4, ...] uint8 -> [K, ...] uint8."""
    K = packed.shape[0] * 4
    block = _pack_block_rows2(K)
    blocked = packed.reshape((K // block, block // 4) + packed.shape[1:])
    planes = [(blocked >> (2 * i)) & 0x3 for i in range(4)]
    out = jnp.concatenate(planes, axis=1)
    return out.reshape((K,) + packed.shape[1:])


def quantize_int4(
    w: jnp.ndarray, group_size: int = -1, bias: Optional[jnp.ndarray] = None
) -> QuantizedLinear:
    """Asymmetric min/max int4 per (K-group, output channel).

    Same scale/zero derivation as the reference's GPTQ weight quantizer
    (``quantize/gptq.py:317-347``): scale = (max-min)/15, zero = -min/scale.
    """
    return _quantize_asym(w, bits=4, group_size=group_size, bias=bias)


def quantize_int2(
    w: jnp.ndarray, group_size: int = -1, bias: Optional[jnp.ndarray] = None
) -> QuantizedLinear:
    """Asymmetric min/max 2-bit (4 codes/byte) — the sub-4-bit rung of the
    reference's ``ColBlockQuantizedLinear`` (``quantize/gptq.py:205-230``,
    ``bits in (2, 4, 8)``). scale = (max-min)/3, zero = -min/scale."""
    return _quantize_asym(w, bits=2, group_size=group_size, bias=bias)


def quantize_int8g(
    w: jnp.ndarray, group_size: int = -1, bias: Optional[jnp.ndarray] = None
) -> QuantizedLinear:
    """Asymmetric min/max grouped 8-bit (unpacked uint8 codes) — the bits=8
    rung of ``ColBlockQuantizedLinear``. Distinct from the symmetric
    weight-only ``int8`` format: codes are unsigned with a zero point."""
    return _quantize_asym(w, bits=8, group_size=group_size, bias=bias)


# packed K-rows per storage byte, by format
PACK_RATIO = {"int2": 4, "int4": 2, "nf4": 2, "fp4": 2, "int8g": 1}


def pack_codes(q: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Pack uint8 codes along axis 0 by bit width (blocked split layout)."""
    if bits == 2:
        return pack_crumbs(q)
    if bits == 4:
        return pack_nibbles(q)
    if bits == 8:
        return q.astype(jnp.uint8)
    raise ValueError(f"unsupported bit width {bits}")


def _quantize_asym(
    w: jnp.ndarray, bits: int, group_size: int, bias: Optional[jnp.ndarray]
) -> QuantizedLinear:
    maxq = 2**bits - 1
    fmt = {2: "int2", 4: "int4", 8: "int8g"}[bits]
    pack = PACK_RATIO[fmt]
    K, N = w.shape
    wp = _pad_kn(w) if (group_size == -1 or _round_up(K, K_ALIGN) % group_size == 0) \
        else _pad_kn(w, k_align=pack)
    Kp, Np = wp.shape
    gs = Kp if group_size == -1 else group_size
    assert Kp % gs == 0, (Kp, gs)
    wf = wp.astype(jnp.float32).reshape(Kp // gs, gs, Np)
    wmax = jnp.maximum(jnp.max(wf, axis=1), 0.0)
    wmin = jnp.minimum(jnp.min(wf, axis=1), 0.0)
    scales = jnp.where(wmax == wmin, 1.0, (wmax - wmin) / maxq)  # [n_groups, Np]
    zeros = jnp.round(-wmin / scales)  # [n_groups, Np], in [0, maxq]
    q = jnp.clip(jnp.round(wf / scales[:, None]) + zeros[:, None], 0, maxq)
    q = q.reshape(Kp, Np).astype(jnp.uint8)
    return QuantizedLinear(
        qw=pack_codes(q, bits), scales=scales, zeros=zeros, b=bias,
        fmt=fmt, group_size=group_size, in_features=K, out_features=N,
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
    wp = _pad_kn(w)
    Kp, Np = wp.shape
    assert Kp % block_size == 0, (Kp, block_size)
    # blocks run down each column; absmax stored [Kp/bs, Np] so the matmul
    # kernel's K-tile picks up its scale rows with a plain block index
    wf = wp.astype(jnp.float32).reshape(Kp // block_size, block_size, Np)
    absmax = jnp.max(jnp.abs(wf), axis=1)  # [Kp/bs, Np]
    absmax_safe = jnp.where(absmax == 0, 1.0, absmax)
    normalized = wf / absmax_safe[:, None, :]  # in [-1, 1]
    # nearest codebook entry via a running argmin (a [.., 16] distance tensor
    # costs 64 bytes/weight — OOM for multi-GB layers)
    best_idx = jnp.zeros(normalized.shape, jnp.uint8)
    best_dist = jnp.full(normalized.shape, jnp.inf, jnp.float32)
    for i, c in enumerate(_CODEBOOKS[fmt]):
        d = jnp.abs(normalized - float(c))
        better = d < best_dist
        best_dist = jnp.where(better, d, best_dist)
        best_idx = jnp.where(better, jnp.uint8(i), best_idx)
    q = best_idx.reshape(Kp, Np)
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
    """Materialize the full-precision weight at its *logical* shape
    ``[in_features, out_features]`` (storage padding sliced away)."""
    K, N = p.in_features, p.out_features
    if p.fmt in ("int8", "int8-llm"):
        w = p.qw.astype(jnp.float32) * p.scales[None, :].astype(jnp.float32)
        return w[:K, :N].astype(dtype)
    if p.fmt in ("int4", "int2", "int8g"):
        unpack = {"int4": unpack_nibbles, "int2": unpack_crumbs,
                  "int8g": lambda q: q}[p.fmt]
        Kp, Np = p.qw.shape[0] * PACK_RATIO[p.fmt], p.qw.shape[1]
        gs = Kp if p.group_size == -1 else p.group_size
        q = unpack(p.qw).astype(jnp.float32).reshape(Kp // gs, gs, Np)
        w = (q - p.zeros[:, None].astype(jnp.float32)) * p.scales[:, None].astype(jnp.float32)
        return w.reshape(Kp, Np)[:K, :N].astype(dtype)
    if p.fmt in ("nf4", "fp4"):
        Kp, Np = p.qw.shape[0] * 2, p.qw.shape[1]
        bs = p.group_size
        q = unpack_nibbles(p.qw)  # [Kp, Np] uint8
        vals = jnp.take(jnp.asarray(_CODEBOOKS[p.fmt]), q.astype(jnp.int32))
        absmax = p.scales.astype(jnp.float32)  # [Kp/bs, Np]
        if p.scales2 is not None:
            absmax = absmax * p.scales2
        vals = vals.reshape(Kp // bs, bs, Np) * absmax[:, None, :]
        return vals.reshape(Kp, Np)[:K, :N].astype(dtype)
    raise ValueError(f"Unknown quantized format {p.fmt!r}")


class StackedQuantizedLinear:
    """A stacked ``[L, ...]`` :class:`QuantizedLinear` paired with a traced
    layer index — created *inside* a decode trace so the Pallas kernels can
    DMA straight out of the stacked arrays (scalar-prefetch index maps)
    instead of XLA materializing a per-layer copy on every step. Plain
    object, deliberately NOT a pytree node: it never crosses a jit boundary."""

    __slots__ = ("p", "layer")

    def __init__(self, p: QuantizedLinear, layer):
        self.p = p
        self.layer = layer


def take_layer(p: QuantizedLinear, layer) -> QuantizedLinear:
    """Per-layer slice of a stacked QuantizedLinear (XLA fallback paths)."""
    import jax

    idx = lambda a: None if a is None else jax.lax.dynamic_index_in_dim(
        a, layer, 0, keepdims=False)
    return QuantizedLinear(
        qw=idx(p.qw), scales=idx(p.scales), zeros=idx(p.zeros),
        scales2=idx(p.scales2), b=idx(p.b), fmt=p.fmt,
        group_size=p.group_size, in_features=p.in_features,
        out_features=p.out_features,
    )


def apply_quantized_linear(p: QuantizedLinear, x: jnp.ndarray, layer=None) -> jnp.ndarray:
    """Quantized matmul. Uses a fused Pallas kernel on TPU where profitable;
    falls back to the XLA dequantize-then-dot reference path. ``layer``
    selects a slab of stacked ``[L, ...]`` parameters (see
    :class:`StackedQuantizedLinear`)."""
    from parrot_tpu.ops import quant_matmul

    y = quant_matmul.quantized_matmul(p, x, layer=layer)
    if p.b is not None:
        b = p.b if layer is None else jax.lax.dynamic_index_in_dim(
            p.b, layer, 0, keepdims=False)
        y = y + b.astype(y.dtype)
    return y
