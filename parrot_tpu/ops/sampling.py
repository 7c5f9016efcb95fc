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


def top_k_mask_bisect(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact ``top_k_mask`` without a sort: bisect for the k-th largest value
    in float *bit space*.

    f32 values map monotonically to uint32 via the sign-flip trick, so ~32
    halvings of the bit interval pin the k-th largest logit exactly; each
    iteration is one compare+count pass over V — O(32·V) elementwise work and
    no O(V log V) sort, which at decode shapes (V≈50k, k≈200) can beat
    ``lax.top_k``'s sort-based lowering. Returns the same mask as
    ``top_k_mask`` (everything strictly below the k-th largest → -inf) for
    every input where the k-th largest is unique; with duplicated boundary
    values both functions keep all ties anyway.
    """
    k = min(k, logits.shape[-1])
    x = logits.astype(jnp.float32)
    bits = lax.bitcast_convert_type(x, jnp.int32)
    # order-preserving map to uint32: flip all bits of negatives, sign bit of
    # positives (NaNs excluded by construction of logits/temperature)
    ux = jnp.where(bits < 0, ~bits, bits ^ jnp.int32(-0x80000000)).astype(jnp.uint32)

    def body(i, state):
        lo, hi = state  # invariant: count(>= hi) < k <= count(>= lo)
        mid = lo + (hi - lo) // 2
        cnt = jnp.sum(ux >= mid[..., None], axis=-1)
        take_hi = cnt >= k  # mid still has >= k above it: raise lo
        lo = jnp.where(take_hi, mid, lo)
        hi = jnp.where(take_hi, hi, mid)
        return lo, hi

    shape = x.shape[:-1]
    lo = jnp.zeros(shape, jnp.uint32)
    hi = jnp.full(shape, jnp.uint32(0xFFFFFFFF))
    lo, hi = lax.fori_loop(0, 32, body, (lo, hi))
    # lo is the largest bit-value with count(>= lo) >= k == the k-th largest
    keep = ux >= lo[..., None]
    return jnp.where(keep, logits, -jnp.inf)


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


# ---------------------------------------------------------------------------
# Per-row traced sampling params (serving: per-request temperature/top_k/top_p)
# ---------------------------------------------------------------------------


def top_k_mask_traced(logits: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """``top_k_mask`` with a PER-ROW **traced** k (shape = batch shape).

    The bit-space bisection admits a traced k naturally — k only ever appears
    as a comparison operand (``count >= k``) — so one compiled program serves
    every per-request top_k mix (the whole point for continuous batching:
    no per-combination recompiles). Produces the same mask as
    ``top_k_mask`` wherever the k-th largest value is unique.
    """
    V = logits.shape[-1]
    x = logits.astype(jnp.float32)
    k = jnp.minimum(k, V)
    bits = lax.bitcast_convert_type(x, jnp.int32)
    ux = jnp.where(bits < 0, ~bits, bits ^ jnp.int32(-0x80000000)).astype(jnp.uint32)

    def body(i, state):
        lo, hi = state
        mid = lo + (hi - lo) // 2
        cnt = jnp.sum(ux >= mid[..., None], axis=-1)
        take_hi = cnt >= k
        lo = jnp.where(take_hi, mid, lo)
        hi = jnp.where(take_hi, hi, mid)
        return lo, hi

    shape = x.shape[:-1]
    lo = jnp.zeros(shape, jnp.uint32)
    hi = jnp.full(shape, jnp.uint32(0xFFFFFFFF))
    lo, hi = lax.fori_loop(0, 32, body, (lo, hi))
    keep = ux >= lo[..., None]
    return jnp.where(keep, logits, -jnp.inf)


def top_p_mask_traced(logits: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """``top_p_mask`` with a per-row traced p; ``p >= 1`` disables the mask
    for that row exactly (matching ``sample``'s static ``top_p < 1`` skip)."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_sorted = jnp.concatenate(
        [jnp.ones_like(cum[..., :1], bool), cum[..., :-1] < p[..., None]], axis=-1
    )
    kth = jnp.take_along_axis(
        sorted_logits, jnp.sum(keep_sorted, axis=-1, keepdims=True) - 1, axis=-1
    )
    kth = jnp.where(p[..., None] >= 1.0, -jnp.inf, kth)
    return jnp.where(logits < kth, -jnp.inf, logits)


def sample_per_slot(
    rng: jax.Array,
    logits: jnp.ndarray,  # [..., V]
    temps: jnp.ndarray,   # [...] f32; <= 0 means greedy for that row
    top_ks: jnp.ndarray,  # [...] i32; <= 0 means no top-k truncation
    top_ps: jnp.ndarray,  # [...] f32; >= 1 means no nucleus truncation
    *,
    use_top_k: bool = True,
    use_top_p: bool = True,
) -> jnp.ndarray:
    """``sample`` with PER-ROW traced sampling parameters.

    Row semantics match :func:`sample` given the same scalar values: same
    temperature scaling, same top-k mask (bisect ≡ sort form), same top-p
    mask, same categorical draw over the full-vocab masked logits. The
    static ``use_*`` flags skip whole mask stages when NO active request
    uses them (at most 4 program variants ever compile).
    """
    x = logits.astype(jnp.float32)
    greedy = jnp.argmax(x, axis=-1).astype(jnp.int32)
    t = jnp.where(temps <= 0.0, 1.0, temps)
    x = x / t[..., None]
    if use_top_k:
        V = x.shape[-1]
        k = jnp.where(top_ks <= 0, V, top_ks)
        x = top_k_mask_traced(x, k)
    if use_top_p:
        x = top_p_mask_traced(x, top_ps)
    sampled = jax.random.categorical(rng, x, axis=-1).astype(jnp.int32)
    return jnp.where(temps <= 0.0, greedy, sampled)
