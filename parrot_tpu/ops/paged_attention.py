"""Splash-style paged-attention decode kernel (VERDICT r4 #6).

The XLA paged decode path gathers each slot's pages into a contiguous
``[B, S, G, H]`` view per layer (``gpt.attn_forward`` paged branch) — a
materialized copy that cost ~6% aggregate tok/s in the round-4 on-chip A/B
(PERF.md). This kernel removes the copy: one grid step per (slot, page),
with the PAGE ID read from a scalar-prefetched page table — the DMA engine
pulls each page of K/V straight from the pool into VMEM (double-buffered
across grid steps by the Pallas pipeline), and an online softmax accumulates
across a slot's pages exactly like flash attention accumulates across key
tiles (``ops/flash_attention.py`` conventions: lane-broadcast [rows, 128]
f32 statistics).

Semantics match the gather path bit-for-tolerance:

- validity per key row ``s`` of page ``j``: ``(j*ps + s) <= pos_b`` or the
  window has rolled (``pos_b >= S``) — the same mask
  ``forward_decode_batched`` builds;
- unallocated table entries are clamped to the trash page (page 0) by the
  index map; their rows are masked by position anyway (identical to the
  gather path's clamp);
- int8 KV: scores multiply ``k_scale`` per key row, probs multiply
  ``v_scale`` before the value contraction — the same fold as
  ``ops/attention.attention``.

The reference has no paged attention at all (dense per-layer cache tensors,
``lit_gpt/model.py:130-144``); this is the TPU-native form of what its CUDA
descendants (vLLM PagedAttention) do with warp-level gather.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)
LANES = 128

_INTERPRET = False  # flipped by tests on CPU

# On/off switch for the fused kernel (module global read at trace time so a
# serving process can A/B it; the XLA gather path remains the oracle).
ENABLED = True


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _kernel(
    # scalar prefetch
    pt_ref,   # [B * n_pages] int32 page table (clamped in index maps)
    pos_ref,  # [B] int32 positions
    # inputs
    q_ref,    # [1, n_head_pad, H]
    k_ref,    # [1, ps, G, H]
    v_ref,    # [1, ps, G, H]
    ks_ref,   # [1, ps, G] or None (int8 KV)
    vs_ref,   # [1, ps, G] or None
    # output
    out_ref,  # [1, n_head_pad, H]
    # scratch
    m_ref,    # [n_head_pad, LANES] f32 running max (lane-broadcast)
    l_ref,    # [n_head_pad, LANES] f32 running denom
    acc_ref,  # [n_head_pad, H] f32 output accumulator
    *,
    ps: int,
    G: int,
    qpk: int,
    n_pages: int,
    S: int,
    scale: float,
    quantized: bool,
):
    b = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32)  # [n_head_pad, H]
    k = k_ref[0].astype(jnp.float32)  # [ps, G, H]
    HP = m_ref.shape[0]  # n_head_pad
    H = k.shape[-1]

    if G == 1:
        # MQA fast path (falcon): one dot, no group bookkeeping
        scores = jax.lax.dot_general(
            q, k[:, 0, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [HP, ps]
        if quantized:
            scores = scores * ks_ref[0][:, 0][None, :].astype(jnp.float32)
    else:
        # GQA/MHA: Mosaic rejects assembling per-group score rows with
        # concatenate ("offset mismatch on non-concat dimension"), so
        # compute ALL (head, s, group) products with ONE dot against the
        # flattened [ps*G, H] keys and mask-reduce over the group axis
        # (head h attends group h // qpk). G x extra MXU work on a tensor
        # that is tiny next to the weight stream.
        k2 = k.reshape(ps * G, H)
        all_sc = jax.lax.dot_general(
            q, k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(HP, ps, G)
        h_ids = jax.lax.broadcasted_iota(jnp.int32, (HP, 1, G), 0)
        g_ids = jax.lax.broadcasted_iota(jnp.int32, (HP, 1, G), 2)
        gmask = (h_ids // qpk == g_ids).astype(jnp.float32)  # [HP, 1, G]
        if quantized:
            all_sc = all_sc * ks_ref[0][None, :, :].astype(jnp.float32)
        scores = jnp.sum(all_sc * gmask, axis=2)  # [HP, ps]
    scores = scores * jnp.float32(scale)

    # validity: same expression as forward_decode_batched's mask
    pos = pos_ref[b]
    idx = j * ps + jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1)
    valid = (idx <= pos) | (pos >= S)  # [1, ps]
    scores = jnp.where(valid, scores, NEG_INF)

    # online softmax update (flash_attention.py conventions)
    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)  # [n_head_pad, ps]
    l_ref[:] = jnp.broadcast_to(
        alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True), l_ref.shape
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    v = v_ref[0].astype(jnp.float32)  # [ps, G, H]
    if G == 1:
        pg = p * vs_ref[0][:, 0][None, :].astype(jnp.float32) if quantized else p
        o = jax.lax.dot_general(
            pg, v[:, 0, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [HP, H]
    else:
        # spread probs to [HP, ps, G] with the same group mask (v_scale folds
        # here), flatten, and contract against the flattened values
        p_all = p[:, :, None] * gmask  # [HP, ps, G]
        if quantized:
            p_all = p_all * vs_ref[0][None, :, :].astype(jnp.float32)
        o = jax.lax.dot_general(
            p_all.reshape(HP, ps * G), v.reshape(ps * G, H),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc_ref[:] = acc_ref[:] * alpha + o

    @pl.when(j == n_pages - 1)
    def _():
        denom = jnp.maximum(l_ref[:, :1], 1e-30)
        out_ref[0] = (acc_ref[:] / denom).astype(out_ref.dtype)


def paged_attention_decode(
    q: jnp.ndarray,           # [B, n_head, H] (decode: T == 1, squeezed)
    pool_k: jnp.ndarray,      # [P, ps, G, H] (this layer's page pool)
    pool_v: jnp.ndarray,
    page_table: jnp.ndarray,  # [B, n_pages] int32 (-1 = unallocated)
    positions: jnp.ndarray,   # [B] int32
    *,
    scale: float,
    k_scale: Optional[jnp.ndarray] = None,  # [P, ps, G] (int8 KV)
    v_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fused paged decode attention: ``[B, n_head, H]`` out, no gather."""
    B, n_head, H = q.shape
    P, ps, G, _ = pool_k.shape
    n_pages = page_table.shape[1]
    S = n_pages * ps
    qpk = n_head // G
    n_head_pad = _round_up(n_head, 8)
    quantized = k_scale is not None

    qp = q if n_head_pad == n_head else jnp.pad(
        q, ((0, 0), (0, n_head_pad - n_head), (0, 0)))

    # clamp the table host^H^Hdevice-side once; index maps only read it
    pt_flat = jnp.maximum(page_table, 0).reshape(-1).astype(jnp.int32)
    pos = positions.astype(jnp.int32)

    grid = (B, n_pages)
    q_spec = pl.BlockSpec(
        (1, n_head_pad, H), lambda b, j, pt, ps_: (b, 0, 0),
        memory_space=pltpu.VMEM)
    page_spec = pl.BlockSpec(
        (1, ps, G, H),
        lambda b, j, pt, ps_, _np=n_pages: (pt[b * _np + j], 0, 0, 0),
        memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec(
        (1, ps, G),
        lambda b, j, pt, ps_, _np=n_pages: (pt[b * _np + j], 0, 0),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (1, n_head_pad, H), lambda b, j, pt, ps_: (b, 0, 0),
        memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel, ps=ps, G=G, qpk=qpk, n_pages=n_pages, S=S, scale=scale,
        quantized=quantized,
    )
    in_specs = [q_spec, page_spec, page_spec]
    args = [qp, pool_k, pool_v]
    if quantized:
        in_specs += [scale_spec, scale_spec]
        args += [k_scale, v_scale]
        body = kernel
    else:
        def body(pt_ref, pos_ref, q_ref, k_ref, v_ref, out_ref, *scratch):
            return kernel(pt_ref, pos_ref, q_ref, k_ref, v_ref, None, None,
                          out_ref, *scratch)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((n_head_pad, LANES), jnp.float32),  # running max
            pltpu.VMEM((n_head_pad, LANES), jnp.float32),  # running denom
            pltpu.VMEM((n_head_pad, H), jnp.float32),      # accumulator
        ],
    )
    out = pl.pallas_call(
        body, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_head_pad, H), q.dtype),
        interpret=_INTERPRET,
    )(pt_flat, pos, *args)
    return out[:, :n_head]


def use_kernel(on_tpu: bool, page_size: int, H: int) -> bool:
    """Gate: TPU (or interpret-forced tests), sublane/lane-friendly shapes
    (H=64 rides half-populated lanes; still profitable vs the gather copy)."""
    return ENABLED and (on_tpu or _INTERPRET) and page_size % 8 == 0 \
        and H % 64 == 0
