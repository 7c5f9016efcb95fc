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
import os
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
# PARROT_PAGED_KERNEL=0 disables it from the environment for script A/Bs.
ENABLED = os.environ.get("PARROT_PAGED_KERNEL", "1") != "0"

# Decode-kernel generation: 2 = grid-(slot,) live-page loop with manual
# double-buffered page DMA (default); 1 = grid-(slot, page) pipelined
# blocks. PARROT_PAGED_KERNEL_V selects for A/Bs.
DECODE_KERNEL = int(os.environ.get("PARROT_PAGED_KERNEL_V", "2"))


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _kernel(
    # scalar prefetch
    pt_ref,   # [B * n_pages] int32 page table (clamped device-side)
    pos_ref,  # [B] int32 positions
    ly_ref,   # [1] int32 layer index into the stacked pool (index maps only)
    # inputs
    q_ref,    # [1, G*qpk_pad, H]  (queries, per-group padded to 8 rows)
    k_ref,    # [1, 1, ps, G, H]   (one whole pool page of one layer)
    v_ref,    # [1, 1, ps, G, H]
    ks_ref,   # [1, 1, ps, G] or None (int8 KV)
    vs_ref,   # [1, 1, ps, G] or None
    # output
    out_ref,  # [1, G*qpk_pad, H]
    # scratch
    m_ref,    # [G*qpk_pad, LANES] f32 running max (lane-broadcast)
    l_ref,    # [G*qpk_pad, LANES] f32 running denom
    acc_ref,  # [G*qpk_pad, H] f32 output accumulator
    *,
    ps: int,
    G: int,
    qpk_pad: int,
    n_pages: int,
    S: int,
    scale: float,
    quantized: bool,
):
    """One grid step = one slot x one page (whole page DMA'd once — Pallas
    requires full or (8,128)-divisible trailing block dims, so a per-group
    page slice is not expressible as a block). Groups run as an unrolled
    in-kernel loop whose statistics live at 8-ALIGNED static row offsets of
    the shared scratch (qpk padded to 8 per group) — aligned ref slicing is
    Mosaic-legal where the concat/reshape assemblies of earlier drafts were
    not ("offset mismatch on non-concat dimension" / "unsupported shape
    cast")."""
    b = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pos = pos_ref[b]
    idx = j * ps + jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1)
    valid = (idx <= pos) | (pos >= S)  # same mask as forward_decode_batched

    k3 = k_ref[0, 0]  # [ps, G, H]
    v3 = v_ref[0, 0]
    for g in range(G):
        sl = slice(g * qpk_pad, (g + 1) * qpk_pad)
        q = q_ref[0, sl].astype(jnp.float32)      # [qpk_pad, H]
        kg = k3[:, g, :].astype(jnp.float32)      # [ps, H]
        scores = jax.lax.dot_general(
            q, kg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [qpk_pad, ps]
        if quantized:
            scores = scores * ks_ref[0, 0][:, g][None, :].astype(jnp.float32)
        scores = jnp.where(valid, scores * jnp.float32(scale), NEG_INF)

        m_prev = m_ref[sl, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_ref[sl, :] = jnp.broadcast_to(
            alpha * l_ref[sl, :1] + jnp.sum(p, axis=1, keepdims=True),
            (qpk_pad, l_ref.shape[1]),
        )
        m_ref[sl, :] = jnp.broadcast_to(m_new, (qpk_pad, m_ref.shape[1]))

        vg = v3[:, g, :].astype(jnp.float32)  # [ps, H]
        if quantized:
            p = p * vs_ref[0, 0][:, g][None, :].astype(jnp.float32)
        o = jax.lax.dot_general(
            p, vg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        acc_ref[sl, :] = acc_ref[sl, :] * alpha + o

    @pl.when(j == n_pages - 1)
    def _():
        denom = jnp.maximum(l_ref[:, :1], 1e-30)
        out_ref[0] = (acc_ref[:] / denom).astype(out_ref.dtype)


def paged_attention_decode(
    q: jnp.ndarray,           # [B, n_head, H] (decode: T == 1, squeezed)
    pool_k: jnp.ndarray,      # [P, ps, G, H] per-layer slab, or [L, P, ps, G, H]
    pool_v: jnp.ndarray,      #   stacked pool (pass ``layer`` for the latter)
    page_table: jnp.ndarray,  # [B, n_pages] int32 (-1 = unallocated)
    positions: jnp.ndarray,   # [B] int32
    *,
    scale: float,
    k_scale: Optional[jnp.ndarray] = None,  # [(L,) P, ps, G] (int8 KV)
    v_scale: Optional[jnp.ndarray] = None,
    layer: Optional[jnp.ndarray] = None,    # traced scalar layer index (5-D pools)
) -> jnp.ndarray:
    """Fused paged decode attention: ``[B, n_head, H]`` out, no gather.

    The stacked 5-D form is how the layer scan calls this WITHOUT threading
    per-layer pool slabs through the scan (which made XLA materialize a full
    slab copy in and out every decode step — the wide-paged-serving
    bottleneck named in PERF.md round 5): the pool stays a closed-over scan
    carry and the kernel indexes the layer via a scalar-prefetched index map,
    exactly like the stacked quantized-weight kernels (``gpt._split_qlin``).
    """
    if pool_k.ndim == 4:
        # per-layer slab view — same kernel, a 1-layer stacked pool
        pool_k, pool_v = pool_k[None], pool_v[None]
        if k_scale is not None:
            k_scale, v_scale = k_scale[None], v_scale[None]
        layer = jnp.zeros((), jnp.int32)
    # v2 needs lane-exact page slices: H a full lane multiple and the
    # flattened page rows a full int8/bf16 sublane tile (H=64 models —
    # falcon MQA, tiny test configs — ride v1, whose whole-dim blocks allow
    # half-populated lanes; their grouped KV is small so v1's per-page grid
    # cost is negligible there).
    if (DECODE_KERNEL == 2 and q.shape[-1] % 128 == 0
            and (pool_k.shape[2] * pool_k.shape[3]) % 32 == 0):
        return _decode_v2(q, pool_k, pool_v, page_table, positions,
                          scale=scale, k_scale=k_scale, v_scale=v_scale,
                          layer=layer)
    B, n_head, H = q.shape
    _, P, ps, G, _ = pool_k.shape
    n_pages = page_table.shape[1]
    S = n_pages * ps
    qpk = n_head // G
    qpk_pad = _round_up(qpk, 8)
    quantized = k_scale is not None

    # per-group 8-row padding: [B, n_head, H] -> [B, G*qpk_pad, H]
    q4 = q.reshape(B, G, qpk, H)
    if qpk_pad != qpk:
        q4 = jnp.pad(q4, ((0, 0), (0, 0), (0, qpk_pad - qpk), (0, 0)))
    qg = q4.reshape(B, G * qpk_pad, H)

    pt_flat = jnp.maximum(page_table, 0).reshape(-1).astype(jnp.int32)
    pos = positions.astype(jnp.int32)
    ly = jnp.asarray(layer, jnp.int32).reshape(1)

    grid = (B, n_pages)
    q_spec = pl.BlockSpec(
        (1, G * qpk_pad, H), lambda b, j, pt, ps_, ly_: (b, 0, 0),
        memory_space=pltpu.VMEM)
    # LIVE-PAGE clamp: pages past the slot's position map to its last live
    # page, so consecutive grid steps see a REPEATED block index and Pallas
    # skips the redundant DMA — paged attention bytes stay proportional to
    # LIVE tokens (the whole point of paging), not to pages_per_slot. The
    # in-kernel mask uses the raw grid j, so repeated pages contribute
    # nothing. Rolled windows (pos >= S) leave every page live.
    def _live_page(b, j, pt, pos_, _np=n_pages, _ps=ps):
        jl = jnp.minimum(j, jnp.maximum(pos_[b], 0) // _ps)
        return pt[b * _np + jl]

    page_spec = pl.BlockSpec(
        (1, 1, ps, G, H),
        lambda b, j, pt, ps_, ly_: (ly_[0], _live_page(b, j, pt, ps_), 0, 0, 0),
        memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec(
        (1, 1, ps, G),
        lambda b, j, pt, ps_, ly_: (ly_[0], _live_page(b, j, pt, ps_), 0, 0),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (1, G * qpk_pad, H), lambda b, j, pt, ps_, ly_: (b, 0, 0),
        memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel, ps=ps, G=G, qpk_pad=qpk_pad, n_pages=n_pages, S=S,
        scale=scale, quantized=quantized,
    )
    in_specs = [q_spec, page_spec, page_spec]
    args = [qg, pool_k, pool_v]
    if quantized:
        in_specs += [scale_spec, scale_spec]
        args += [k_scale, v_scale]
        body = kernel
    else:
        def body(pt_ref, pos_ref, ly_ref, q_ref, k_ref, v_ref, out_ref, *scratch):
            return kernel(pt_ref, pos_ref, ly_ref, q_ref, k_ref, v_ref, None,
                          None, out_ref, *scratch)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((G * qpk_pad, LANES), jnp.float32),  # running max
            pltpu.VMEM((G * qpk_pad, LANES), jnp.float32),  # running denom
            pltpu.VMEM((G * qpk_pad, H), jnp.float32),      # accumulator
        ],
    )
    out = pl.pallas_call(
        body, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, G * qpk_pad, H), q.dtype),
        interpret=_INTERPRET,
    )(pt_flat, pos, ly, *args)
    return out.reshape(B, G, qpk_pad, H)[:, :, :qpk].reshape(B, n_head, H)


def _decode_kernel_v2(
    # scalar prefetch (SMEM)
    pt_ref,   # [B * n_pages] int32 page table (clamped device-side)
    pos_ref,  # [B] int32 positions
    ly_ref,   # [1] int32 layer index
    # inputs
    q_ref,    # [1, hp, H] VMEM (heads padded to a multiple of 8)
    k_hbm,    # [L, P, psG, H] (ANY: stays in HBM, paged in manually)
    v_hbm,
    ks_hbm,   # [L, P, 1, psG] f32 or None
    vs_hbm,
    # output
    out_ref,  # [1, hp, H] VMEM
    # scratch
    k_buf,    # [2, psG, H] pool dtype (double buffer)
    v_buf,
    ks_buf,   # [2, 1, psG] f32 or None
    vs_buf,
    m_ref,    # [hp, LANES] f32
    l_ref,
    acc_ref,  # [hp, H] f32
    sems,     # DMA semaphores [4, 2]
    *,
    ps: int,
    G: int,
    qpk: int,
    n_pages: int,
    S: int,
    scale: float,
    quantized: bool,
):
    """Grid (slot,): per-slot online softmax over ONLY the live pages, with
    manually double-buffered page DMA.

    Two measured facts drove this rewrite of the grid-(slot, page) v1
    (probe_paged_step, 3B int4+int8KV): (1) v1's cost was ~7.4 us per
    (slot, page) PER LAYER regardless of live tokens — the pipeline runs
    every page's grid step even when the live-page index map suppresses the
    re-DMA, so decode paid for pages_per_slot, not live pages; (2) most of
    that time was the G-unrolled group loop of tiny [qpk_pad, H] x [H, ps]
    dots. Here the page loop is a fori_loop bounded by the slot's LIVE page
    count, and each page is ONE [hp, H] x [H, ps*G] MXU dot against the
    flattened page with an iota group/validity mask (verify-skill lesson:
    flatten + mask beats per-group assembly) — so attention time scales
    with live tokens and the MXU sees one wide op per page instead of G
    narrow ones.
    """
    b = pl.program_id(0)
    pos = pos_ref[b]
    ly = ly_ref[0]
    n_live = jnp.where(pos >= S, n_pages,
                       jnp.minimum(pos // ps + 1, n_pages))

    def dmas(j_slot, pid):
        ops = [
            pltpu.make_async_copy(k_hbm.at[ly, pid], k_buf.at[j_slot],
                                  sems.at[0, j_slot]),
            pltpu.make_async_copy(v_hbm.at[ly, pid], v_buf.at[j_slot],
                                  sems.at[1, j_slot]),
        ]
        if quantized:
            ops += [
                pltpu.make_async_copy(ks_hbm.at[ly, pid], ks_buf.at[j_slot],
                                      sems.at[2, j_slot]),
                pltpu.make_async_copy(vs_hbm.at[ly, pid], vs_buf.at[j_slot],
                                      sems.at[3, j_slot]),
            ]
        return ops

    def start(j, j_slot):
        pid = pt_ref[b * n_pages + j]
        for op in dmas(j_slot, pid):
            op.start()

    def wait(j, j_slot):
        pid = pt_ref[b * n_pages + j]
        for op in dmas(j_slot, pid):
            op.wait()

    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    start(0, 0)

    hp = q_ref.shape[1]
    psG = ps * G
    hh = jax.lax.broadcasted_iota(jnp.int32, (hp, psG), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (hp, psG), 1)
    # flattened page column c holds (row=c//G, group=c%G); head h reads
    # group h//qpk — padded head rows match no group and fall out masked
    grp_ok = (cc % G) == (hh // qpk)
    q = q_ref[0].astype(jnp.float32)  # [hp, H]

    def loop(j, carry):
        j_slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_live)
        def _():
            start(j + 1, jax.lax.rem(j + 1, 2))

        wait(j, j_slot)
        kg = k_buf[j_slot].astype(jnp.float32)  # [psG, H]
        scores = jax.lax.dot_general(
            q, kg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [hp, psG]
        if quantized:
            scores = scores * ks_buf[j_slot].astype(jnp.float32)
        row_pos = j * ps + cc // G
        valid = grp_ok & ((row_pos <= pos) | (pos >= S))
        scores = jnp.where(valid, scores * jnp.float32(scale), NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        # padded-head rows are all-NEG_INF: clamp so exp(x - m) underflows
        # to 0 instead of NaN (-inf minus -inf)
        m_new = jnp.maximum(m_new, jnp.float32(-1e30))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_ref[:] = jnp.broadcast_to(
            alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True),
            l_ref.shape)
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

        vg = v_buf[j_slot].astype(jnp.float32)  # [psG, H]
        if quantized:
            p = p * vs_buf[j_slot].astype(jnp.float32)
        o = jax.lax.dot_general(
            p, vg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + o
        return carry

    jax.lax.fori_loop(0, n_live, loop, 0)
    denom = jnp.maximum(l_ref[:, :1], 1e-30)
    out_ref[0] = (acc_ref[:] / denom).astype(out_ref.dtype)


def _decode_v2(q, pool_k, pool_v, page_table, positions, *, scale,
               k_scale=None, v_scale=None, layer=None):
    """Wrapper for :func:`_decode_kernel_v2` (5-D stacked pools)."""
    B, n_head, H = q.shape
    L, P, ps, G, _ = pool_k.shape
    n_pages = page_table.shape[1]
    S = n_pages * ps
    psG = ps * G
    qpk = n_head // G
    hp = _round_up(n_head, 8)
    quantized = k_scale is not None

    if hp != n_head:
        q = jnp.pad(q, ((0, 0), (0, hp - n_head), (0, 0)))

    # free reshapes: page rows flatten row-major to (row*G + g)
    k2 = pool_k.reshape(L, P, psG, H)
    v2 = pool_v.reshape(L, P, psG, H)
    pt_flat = jnp.maximum(page_table, 0).reshape(-1).astype(jnp.int32)
    pos = positions.astype(jnp.int32)
    ly = jnp.asarray(layer if layer is not None else 0, jnp.int32).reshape(1)

    kernel = functools.partial(
        _decode_kernel_v2, ps=ps, G=G, qpk=qpk, n_pages=n_pages, S=S,
        scale=scale, quantized=quantized,
    )
    dt = pool_k.dtype
    q_spec = pl.BlockSpec((1, hp, H), lambda b, pt, ps_, ly_: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    out_spec = pl.BlockSpec((1, hp, H), lambda b, pt, ps_, ly_: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((2, psG, H), dt),
        pltpu.VMEM((2, psG, H), dt),
        pltpu.VMEM((2, 1, psG), jnp.float32) if quantized else None,
        pltpu.VMEM((2, 1, psG), jnp.float32) if quantized else None,
        pltpu.VMEM((hp, LANES), jnp.float32),
        pltpu.VMEM((hp, LANES), jnp.float32),
        pltpu.VMEM((hp, H), jnp.float32),
        pltpu.SemaphoreType.DMA((4, 2)),
    ]
    if quantized:
        ks2 = k_scale.reshape(L, P, 1, psG)
        vs2 = v_scale.reshape(L, P, 1, psG)
        in_specs = [q_spec, any_spec, any_spec, any_spec, any_spec]
        args = [q, k2, v2, ks2, vs2]
        body = kernel
    else:
        scratch = [s for i, s in enumerate(scratch) if i not in (2, 3)]

        def body(pt_ref, pos_ref, ly_ref, q_ref, k_hbm, v_hbm, out_ref,
                 k_buf, v_buf, m_ref, l_ref, acc_ref, sems):
            return kernel(pt_ref, pos_ref, ly_ref, q_ref, k_hbm, v_hbm,
                          None, None, out_ref, k_buf, v_buf, None, None,
                          m_ref, l_ref, acc_ref, sems)

        in_specs = [q_spec, any_spec, any_spec]
        args = [q, k2, v2]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        body, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, hp, H), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_INTERPRET,
    )(pt_flat, pos, ly, *args)
    return out[:, :n_head]


def paged_kv_write(
    pool_k: jnp.ndarray,   # [L, P, ps, G, H] stacked pool (aliased in place)
    pool_v: jnp.ndarray,
    k: jnp.ndarray,        # [B, G, H] this token's K rows (pool dtype)
    v: jnp.ndarray,
    page_of: jnp.ndarray,  # [B] int32 pool page per slot (trash-clamped)
    row: jnp.ndarray,      # [B] int32 row within the page
    layer: jnp.ndarray,    # traced scalar layer index
    pool_ks: Optional[jnp.ndarray] = None,  # [L, P, ps, G] (int8 KV)
    pool_vs: Optional[jnp.ndarray] = None,
    k_sc: Optional[jnp.ndarray] = None,     # [B, G] f32
    v_sc: Optional[jnp.ndarray] = None,
):
    """Write one decode token's K/V rows into the stacked page pool IN PLACE
    (``input_output_aliases``) and return the updated pool arrays.

    Why a kernel and not ``pool.at[layer, page, row].set(...)``: XLA does not
    alias that scatter — measured on-chip, the paged decode step's time was
    proportional to POOL size, not live tokens (probe_paged_step: 80 ms at
    513 pages vs 61 ms at 321, fill-invariant; rolled or unrolled scan
    alike), i.e. every layer paid a full pool copy. With the aliased Pallas
    write the pool is updated by ``B`` row-sized DMAs and the copies vanish.
    One grid step per slot; repeated (page, row) targets (dead slots clamped
    to the trash page) are benign last-writer-wins.
    """
    B, G, H = k.shape
    ps = pool_k.shape[2]
    quantized = pool_ks is not None
    pf = page_of.astype(jnp.int32)
    rw = row.astype(jnp.int32)
    ly = jnp.asarray(layer, jnp.int32).reshape(1)

    # K/V blocks are a single pool row: trailing (G, H) are whole array dims,
    # always Mosaic-legal. SCALE blocks can't be a single row ((1, G) has a
    # non-whole, non-8-divisible second-minor), so they cover the whole
    # page's scale rows (ps*G*4 B ≈ 1 KB) and the kernel row-masks the
    # update — read-modify-write on the aliased block.
    tok_spec = pl.BlockSpec((1, G, H), lambda b, pf_, rw_, ly_: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    tok_sc_spec = pl.BlockSpec((1, 1, G), lambda b, pf_, rw_, ly_: (b, 0, 0),
                               memory_space=pltpu.VMEM)
    pool_spec = pl.BlockSpec(
        (1, 1, 1, G, H),
        lambda b, pf_, rw_, ly_: (ly_[0], pf_[b], rw_[b], 0, 0),
        memory_space=pltpu.VMEM)
    pool_sc_spec = pl.BlockSpec(
        (1, 1, ps, G),
        lambda b, pf_, rw_, ly_: (ly_[0], pf_[b], 0, 0),
        memory_space=pltpu.VMEM)

    if quantized:
        def body(pf_ref, rw_ref, ly_ref, k_ref, v_ref, ks_ref, vs_ref,
                 pk_in, pv_in, pks_in, pvs_in,
                 pk_out, pv_out, pks_out, pvs_out):
            b = pl.program_id(0)
            pk_out[0, 0, 0] = k_ref[0]
            pv_out[0, 0, 0] = v_ref[0]
            sel = jax.lax.broadcasted_iota(jnp.int32, (ps, G), 0) == rw_ref[b]
            pks_out[0, 0] = jnp.where(sel, ks_ref[0], pks_in[0, 0])
            pvs_out[0, 0] = jnp.where(sel, vs_ref[0], pvs_in[0, 0])

        in_specs = [tok_spec, tok_spec, tok_sc_spec, tok_sc_spec,
                    pool_spec, pool_spec, pool_sc_spec, pool_sc_spec]
        args = [k, v, k_sc[:, None], v_sc[:, None], pool_k, pool_v,
                pool_ks, pool_vs]
        out_specs = [pool_spec, pool_spec, pool_sc_spec, pool_sc_spec]
        out_shape = [jax.ShapeDtypeStruct(a.shape, a.dtype)
                     for a in (pool_k, pool_v, pool_ks, pool_vs)]
        # alias indices count scalar-prefetch operands first (3 scalars)
        aliases = {7: 0, 8: 1, 9: 2, 10: 3}
    else:
        def body(pf_ref, rw_ref, ly_ref, k_ref, v_ref, pk_in, pv_in,
                 pk_out, pv_out):
            pk_out[0, 0, 0] = k_ref[0]
            pv_out[0, 0, 0] = v_ref[0]

        in_specs = [tok_spec, tok_spec, pool_spec, pool_spec]
        args = [k, v, pool_k, pool_v]
        out_specs = [pool_spec, pool_spec]
        out_shape = [jax.ShapeDtypeStruct(a.shape, a.dtype)
                     for a in (pool_k, pool_v)]
        aliases = {5: 0, 6: 1}

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(B,), in_specs=in_specs,
        out_specs=out_specs)
    out = pl.pallas_call(
        body, grid_spec=grid_spec, out_shape=out_shape,
        input_output_aliases=aliases, interpret=_INTERPRET,
    )(pf, rw, ly, *args)
    return tuple(out)


def use_kernel(on_tpu: bool, page_size: int, H: int) -> bool:
    """Gate: TPU (or interpret-forced tests), sublane/lane-friendly shapes
    (H=64 rides half-populated lanes; still profitable vs the gather copy)."""
    return ENABLED and (on_tpu or _INTERPRET) and page_size % 8 == 0 \
        and H % 64 == 0
