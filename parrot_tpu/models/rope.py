"""Rotary position embeddings (rotate-half formulation, partial-rotary aware).

Semantics match the reference (``lit_gpt/model.py:304-336``): frequencies
``theta_i = base^(-2i/n_elem)``, position index divided by ``condense_ratio``
(positional interpolation for the 16k longchat checkpoints), and the cos/sin
tables tiled to ``n_elem`` columns so that the rotate-half product
``x*cos + rotate_half(x)*sin`` applies each frequency to the matching
(x1, x2) pair.

TPU-first differences: the cache is built once per (seq_len, n_elem) at trace
time as a pure function — there is no mutable module state — and tables are
kept in float32 and cast at the use site (the reference's "mimic complex32"
half-precision cast is reproduced by casting at application when the compute
dtype is half-precision).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def build_rope_cache(
    seq_len: int,
    n_elem: int,
    base: int = 10000,
    condense_ratio: int = 1,
    dtype: jnp.dtype = jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return ``(cos, sin)`` each of shape ``[seq_len, n_elem]``.

    Built with numpy at trace time: the table is a compile-time constant folded
    into the jitted program, never recomputed on device.
    """
    theta = 1.0 / (base ** (np.arange(0, n_elem, 2, dtype=np.float64) / n_elem))
    positions = np.arange(seq_len, dtype=np.float64) / condense_ratio
    angles = np.outer(positions, theta)  # [S, n_elem/2]
    angles = np.concatenate([angles, angles], axis=-1)  # [S, n_elem]
    cos = np.cos(angles)
    sin = np.sin(angles)
    if dtype in (jnp.float16, jnp.bfloat16):
        # match the reference's half-precision rope cache (model.py:324-326)
        cos, sin = cos.astype(np.float16), sin.astype(np.float16)
    return jnp.asarray(cos, dtype=dtype), jnp.asarray(sin, dtype=dtype)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate the last dim of ``x``.

    ``x``: [..., T, n_heads, rope_dim] (BTNH layout); ``cos``/``sin``:
    [T, rope_dim] shared across the batch, or [B, T, rope_dim] for per-batch
    positions (ragged batched decoding). Only call on the first
    ``rope_n_elem`` dims for partial-rotary models; the caller concatenates
    the pass-through tail.
    """
    rope_dim = x.shape[-1]
    x1 = x[..., : rope_dim // 2]
    x2 = x[..., rope_dim // 2 :]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    # insert the head axis: [T, d] -> [T, 1, d]; [B, T, d] -> [B, T, 1, d]
    c = cos[..., None, :].astype(x.dtype)
    s = sin[..., None, :].astype(x.dtype)
    return x * c + rotated * s
