"""Cross-entropy loss with ignore-index and sequence chunking.

Mirrors the reference's ``chunked_cross_entropy`` (``lit_gpt/utils.py:435-474``)
which splits logits into chunks "to avoid the peak memory of materializing the
full [B*T, V] float32 log-softmax". On TPU the chunked variant scans over
sequence chunks so the live fp32 buffer stays at ``chunk * V``.

Convention matches the reference training scripts: ``ignore_index=-1`` marks
padded label positions (``finetune/full.py:250``), and the caller passes
``logits[..., :-1, :]`` against ``targets[..., 1:]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def cross_entropy(
    logits: jnp.ndarray,  # [..., V]
    targets: jnp.ndarray,  # [...] int
    ignore_index: int = -1,
) -> jnp.ndarray:
    """Mean CE over non-ignored positions (scalar, float32)."""
    logits = logits.astype(jnp.float32)
    valid = targets != ignore_index
    safe_targets = jnp.where(valid, targets, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, safe_targets[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, logz - gold, 0.0)
    count = jnp.maximum(valid.sum(), 1)
    return nll.sum() / count


def chunked_cross_entropy(
    logits: jnp.ndarray,  # [B, T, V]
    targets: jnp.ndarray,  # [B, T]
    chunk_size: int = 128,
    ignore_index: int = -1,
) -> jnp.ndarray:
    """CE computed ``chunk_size`` sequence positions at a time via lax.scan.

    Equivalent to :func:`cross_entropy` but with peak fp32 memory bounded by
    ``B * chunk_size * V`` (reference: ``utils.py:435-474``).
    """
    B, T, V = logits.shape
    if T % chunk_size != 0:
        # pad T up with ignored positions so the scan has static chunks
        pad = chunk_size - T % chunk_size
        logits = jnp.pad(logits, ((0, 0), (0, pad), (0, 0)))
        targets = jnp.pad(targets, ((0, 0), (0, pad)), constant_values=ignore_index)
        T += pad
    n_chunks = T // chunk_size
    logits = logits.reshape(B, n_chunks, chunk_size, V).swapaxes(0, 1)
    targets = targets.reshape(B, n_chunks, chunk_size).swapaxes(0, 1)

    def step(carry, chunk):
        total, count = carry
        lg, tg = chunk
        lg = lg.astype(jnp.float32)
        valid = tg != ignore_index
        safe = jnp.where(valid, tg, 0)
        logz = jax.nn.logsumexp(lg, axis=-1)
        gold = jnp.take_along_axis(lg, safe[..., None], axis=-1)[..., 0]
        nll = jnp.where(valid, logz - gold, 0.0)
        return (total + nll.sum(), count + valid.sum()), None

    (total, count), _ = lax.scan(step, (jnp.float32(0.0), jnp.int32(0)), (logits, targets))
    return total / jnp.maximum(count, 1)
