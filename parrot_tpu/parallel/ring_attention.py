"""Ring attention: causal attention with the sequence dimension sharded
across a mesh axis.

The reference handles long context only through RoPE positional interpolation
(SURVEY.md §5); sequence parallelism is a genuinely new capability here: each
device holds a contiguous chunk of the sequence, K/V blocks rotate around the
ring (``lax.ppermute`` over ICI) while a flash-style online softmax
accumulates partial attention — peak memory per device is O(T/P) activations
and one in-flight K/V block, so context length scales linearly with the ring
size.

Causality by construction: the ring starts at each device's own block and
walks backwards (device p sees blocks p, p-1, ..., p-(P-1) mod P); blocks
from later chunks contribute nothing and are skipped with a `where` on the
running statistics; the diagonal block applies the intra-chunk causal mask.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = float(np.finfo(np.float32).min)


def _block_attention(q, k, v, scale, mask):
    """One q-chunk x one k-block online-softmax contribution.

    q: [B, Tq, N, H]; k/v: [B, Tk, G, H]; mask: [Tq, Tk] or None.
    Returns (m [B, N_, Tq], l [B, N_, Tq], o [B, Tq, N, H]) where N_ = heads.
    """
    B, Tq, N, H = q.shape
    G = k.shape[2]
    qg = q.reshape(B, Tq, G, N // G, H)
    s = jnp.einsum("btgqh,bsgh->bgqts", qg, k, preferred_element_type=jnp.float32)
    s = s * jnp.float32(scale)
    if mask is not None:
        s = jnp.where(mask[None, None, None], s, NEG_INF)
    m = jnp.max(s, axis=-1)  # [B, G, Qk, Tq]
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bgqts,bsgh->btgqh", p.astype(v.dtype), v).reshape(B, Tq, N, H)
    return m.reshape(B, N, Tq), l.reshape(B, N, Tq), o


def ring_attention_inner(
    q: jnp.ndarray,  # [B, T_local, N, H] — this device's query chunk
    k: jnp.ndarray,  # [B, T_local, G, H]
    v: jnp.ndarray,
    *,
    axis_name: str,
    scale: float,
    batch_axes: tuple = (),
) -> jnp.ndarray:
    """shard_map-inner causal ring attention. Chunks are contiguous in
    sequence order along ``axis_name``."""
    P_size = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    B, Tl, N, H = q.shape

    causal_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (Tl, Tl), 1)
        <= jax.lax.broadcasted_iota(jnp.int32, (Tl, Tl), 0)
    )

    m0 = jnp.full((B, N, Tl), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, N, Tl), jnp.float32)
    acc0 = jnp.zeros(q.shape, jnp.float32)
    # the loop outputs depend on axis_index and the (sharded) q/k/v inputs;
    # mark the device-invariant initial stats varying over every mesh axis
    # the body's outputs vary over, or the fori_loop carry types won't match
    varying = (axis_name, *batch_axes)
    if hasattr(lax, "pcast"):
        m0, l0, acc0 = (lax.pcast(x, varying, to="varying") for x in (m0, l0, acc0))
    elif hasattr(lax, "pvary"):
        m0, l0, acc0 = (lax.pvary(x, varying) for x in (m0, l0, acc0))

    def step(i, carry):
        k_blk, v_blk, m, l, acc = carry
        src = (idx - i) % P_size  # which sequence chunk this block holds
        bm, bl, bo = lax.cond(
            i == 0,  # diagonal block needs the intra-chunk causal mask
            lambda kb, vb: _block_attention(q, kb, vb, scale, causal_mask),
            lambda kb, vb: _block_attention(q, kb, vb, scale, None),
            k_blk, v_blk,
        )

        m_new = jnp.maximum(m, bm)
        alpha_old = jnp.exp(m - m_new)
        alpha_blk = jnp.exp(bm - m_new)
        l_new = l * alpha_old + bl * alpha_blk
        acc_new = (
            acc * alpha_old.transpose(0, 2, 1)[..., None]
            + bo.astype(jnp.float32) * alpha_blk.transpose(0, 2, 1)[..., None]
        )
        # skip blocks from later chunks entirely (src > idx: future tokens)
        skip = src > idx
        m = jnp.where(skip, m, m_new)
        l = jnp.where(skip, l, l_new)
        acc = jnp.where(skip, acc, acc_new)

        # rotate: receive the next-older chunk (from the ring neighbor)
        perm = [(j, (j + 1) % P_size) for j in range(P_size)]
        k_blk = lax.ppermute(k_blk, axis_name, perm)
        v_blk = lax.ppermute(v_blk, axis_name, perm)
        return k_blk, v_blk, m, l, acc

    _, _, m, l, acc = lax.fori_loop(0, P_size, step, (k, v, m0, l0, acc0))
    denom = jnp.where(l == 0, 1.0, l).transpose(0, 2, 1)[..., None]
    return (acc / denom).astype(q.dtype)


def ring_attention(
    mesh: Mesh,
    q: jnp.ndarray,  # [B, T, N, H] (global)
    k: jnp.ndarray,  # [B, T, G, H]
    v: jnp.ndarray,
    *,
    scale: float,
    axis_name: str = "fsdp",
    batch_axes=None,
) -> jnp.ndarray:
    """Causal attention with T sharded over ``axis_name``; runs the ring under
    ``shard_map``. The caller applies RoPE (positions are global) first.

    ``batch_axes``: mesh axes the batch dimension is already sharded over
    (e.g. ``("data", "fsdp")`` in the training drivers) — naming them here
    keeps GSPMD from all-gathering the batch at the shard_map boundary."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    spec = P(batch_axes, axis_name, None, None)
    inner = functools.partial(
        ring_attention_inner, axis_name=axis_name, scale=scale,
        batch_axes=tuple(batch_axes) if batch_axes else (),
    )
    return shard_map(
        inner, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )(q, k, v)
