"""Token sampling: temperature scaling, top-k masking, categorical draw.

Semantics match the reference decode loop (``generate/base.py:136-144``):
logits are divided by temperature, optionally truncated to the top-k values,
then sampled from the softmax. ``temperature=0`` short-circuits to greedy
argmax (an extension the reference lacks).

All pure functions of an explicit PRNG key — safe inside ``lax.while_loop``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def top_k_mask(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Set everything below the k-th largest logit to -inf. [..., V]."""
    k = min(k, logits.shape[-1])
    kth = lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def top_p_mask(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus sampling mask: keep the smallest set of tokens whose
    cumulative probability reaches ``p`` (always keeps the argmax)."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep entries whose *preceding* cumulative mass is < p
    keep_sorted = jnp.concatenate(
        [jnp.ones_like(cum[..., :1], bool), cum[..., :-1] < p], axis=-1
    )
    # threshold logit = smallest kept logit
    kth = jnp.take_along_axis(
        sorted_logits, jnp.sum(keep_sorted, axis=-1, keepdims=True) - 1, axis=-1
    )
    return jnp.where(logits < kth, -jnp.inf, logits)


def sample(
    rng: jax.Array,
    logits: jnp.ndarray,  # [..., V]
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
) -> jnp.ndarray:
    """Sample token ids ``[...]`` from logits ``[..., V]``."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits.astype(jnp.float32) / temperature
    if top_k is not None:
        logits = top_k_mask(logits, top_k)
    if top_p is not None and top_p < 1.0:
        logits = top_p_mask(logits, top_p)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)
