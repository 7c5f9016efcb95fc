"""Multi-head / grouped-query / multi-query attention.

Replaces the reference's flash-attn-2 / SDPA dispatch
(``lit_gpt/model.py:256-275``) with a TPU-first design:

- activations flow in **BTNH** layout (batch, time, heads, head_dim) — the
  layout XLA tiles best on TPU;
- GQA/MQA never materialize repeated K/V heads (the reference
  ``repeat_interleave``s them, ``model.py:217-220``): queries are reshaped to
  ``[B, T, groups, q_per_kv, H]`` and contracted against the *unrepeated*
  ``[B, S, groups, H]`` keys, which also keeps the KV cache at
  ``n_query_groups`` heads;
- softmax statistics accumulate in float32 while matmuls stay in the
  activation dtype (bf16 on TPU feeds the MXU natively);
- the causal structure is expressed as a mask fused by XLA; a Pallas
  flash-attention kernel (``parrot_tpu.ops.flash_attention``) handles the
  long-sequence prefill path.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def attention(
    q: jnp.ndarray,  # [B, T, n_head, H]
    k: jnp.ndarray,  # [B, S, n_query_groups, H]
    v: jnp.ndarray,  # [B, S, n_query_groups, H]
    *,
    scale: float,
    mask: Optional[jnp.ndarray] = None,  # broadcastable to [B, T, S]; True = attend
    causal: bool = False,
    q_offset: int | jnp.ndarray = 0,
    window: Optional[int] = None,
    k_scale: Optional[jnp.ndarray] = None,  # [B, S, groups]: int8-KV dequant
    v_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention with implicit GQA broadcast.

    ``causal=True`` applies the standard causal mask where query ``i`` is at
    absolute position ``q_offset + i`` and keys occupy positions ``0..S-1``;
    ``window=W`` additionally restricts each query to its last ``W`` keys
    (sliding-window attention — the full-context equivalent of the rolling KV
    cache). Returns ``[B, T, n_head, H]``.
    """
    B, T, n_head, H = q.shape
    S, groups = k.shape[1], k.shape[2]
    q_per_kv = n_head // groups

    if (
        causal and mask is None and window is None and k_scale is None
        and isinstance(q_offset, int) and q_offset == 0 and T == S
    ):
        from parrot_tpu.ops import flash_attention as fa

        if fa.use_flash(T, H):
            return fa.flash_attention(q, k, v, scale=scale, causal=True)

    if k.dtype == jnp.int8:  # int8 KV cache: contract the codes, fold scales
        k = k.astype(q.dtype)
        v = v.astype(q.dtype)

    qg = q.reshape(B, T, groups, q_per_kv, H)
    # [B, G, Q, T, S]
    scores = jnp.einsum("btgqh,bsgh->bgqts", qg, k, preferred_element_type=jnp.float32)
    scores = scores * jnp.float32(scale)
    if k_scale is not None:
        scores = scores * k_scale.transpose(0, 2, 1)[:, :, None, None, :]

    neg = jnp.finfo(jnp.float32).min
    if causal:
        q_pos = q_offset + jnp.arange(T)[:, None]
        k_pos = jnp.arange(S)[None, :]
        causal_mask = k_pos <= q_pos  # [T, S]
        if window is not None:
            causal_mask &= k_pos > q_pos - window
        scores = jnp.where(causal_mask[None, None, None], scores, neg)
    if mask is not None:
        m = jnp.broadcast_to(mask, (B, T, S)) if mask.ndim != 3 else mask
        scores = jnp.where(m[:, None, None], scores, neg)

    probs = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    if v_scale is not None:
        probs = probs * v_scale.transpose(0, 2, 1)[:, :, None, None, :]
    probs = probs.astype(v.dtype)

    out = jnp.einsum("bgqts,bsgh->btgqh", probs, v)
    return out.reshape(B, T, n_head, H)
