"""Block-paged KV cache (BASELINE north star: "INT8 KV-cache paged across
hosts"; VERDICT r3 #3).

The contiguous slot cache (:class:`parrot_tpu.models.gpt.KVCache`) reserves
``max_seq_length`` rows per slot regardless of request length. This module
replaces that reservation with a shared **page pool** plus a per-slot page
table:

- ``k``/``v``: ``[L, P, page_size, G, H]`` — one pool of ``P`` pages shared by
  all slots. A page belongs to at most one slot at a time, so decode scatters
  never collide. INT8 variant carries ``k_scale``/``v_scale``
  ``[L, P, page_size, G]`` exactly like the contiguous cache.
- ``page_table``: ``[slots, pages_per_slot]`` int32, host-managed
  (:class:`PageAllocator`): entry ``j`` of slot ``b`` names the pool page
  holding positions ``[j*page_size, (j+1)*page_size)`` of that slot's rolling
  window. ``-1`` = not allocated. **Page 0 is reserved as the trash page**:
  in-jit reads/writes of unallocated entries clamp to it, so the programs stay
  static-shaped while the allocator stays host-side.
- Decode gathers each slot's pages into a contiguous ``[B, S, G, H]`` view per
  layer (page-granular DMA; the same HBM bytes the contiguous cache reads) —
  attention masking is unchanged. Admission prefills into a batch-1 scratch
  cache and scatters it page-wise into the pool.

Why paging: pages are allocated as positions advance and freed at retirement,
so HBM holds only the *live* tokens — an engine can oversubscribe slots
(``total_pages < slots * pages_per_slot``) and admit short requests into
memory a full-length reservation would have wasted. The multi-host form
shards the pool's kv-head axis over ``tensor`` like the contiguous cache
(pages ride the same mesh; a cross-host cold-page tier would sit behind the
allocator without touching the jitted programs).

The reference has no paging (its cache is per-layer dense tensors,
``lit_gpt/model.py:130-144``).
"""

from __future__ import annotations

from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from parrot_tpu.config import Config
from parrot_tpu.models import gpt


@struct.dataclass
class PagedKVCache:
    """Page pool: ``k``/``v`` ``[L, P, page_size, G, H]``; int8 variant adds
    per-(page,row,head) fp32 scales."""

    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: Optional[jnp.ndarray] = None
    v_scale: Optional[jnp.ndarray] = None

    @property
    def page_size(self) -> int:
        return self.k.shape[2]

    @property
    def n_pages(self) -> int:
        return self.k.shape[1]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @classmethod
    def init(
        cls,
        config: Config,
        n_pages: int,
        page_size: int = 64,
        dtype: jnp.dtype = jnp.bfloat16,
    ) -> "PagedKVCache":
        shape = (config.n_layer, n_pages, page_size, config.n_query_groups,
                 config.head_size)
        if dtype == jnp.int8:
            return cls(
                k=jnp.zeros(shape, jnp.int8),
                v=jnp.zeros(shape, jnp.int8),
                k_scale=jnp.ones(shape[:-1], jnp.float32),
                v_scale=jnp.ones(shape[:-1], jnp.float32),
            )
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


class PageAllocator:
    """Host-side free list over the pool. Page 0 (trash) is never handed out."""

    def __init__(self, n_pages: int, slots: int, pages_per_slot: int):
        self.free: deque[int] = deque(range(1, n_pages))
        self.capacity = n_pages - 1  # allocatable pages (page 0 is trash)
        self.table = np.full((slots, pages_per_slot), -1, np.int32)

    @property
    def n_free(self) -> int:
        return len(self.free)

    def pages_needed(self, slot: int, upto_pos: int, page_size: int) -> int:
        """How many new pages slot ``b`` needs to cover positions < upto_pos
        (window-wrapped positions reuse already-allocated pages)."""
        upto = min(upto_pos, self.table.shape[1] * page_size)
        need = -(-upto // page_size)  # ceil
        have = int((self.table[slot] >= 0).sum())
        return max(0, need - have)

    def ensure(self, slot: int, upto_pos: int, page_size: int) -> bool:
        """Allocate pages so slot ``b`` covers positions < upto_pos. Returns
        False (allocating nothing) if the pool can't satisfy the request."""
        n = self.pages_needed(slot, upto_pos, page_size)
        if n > len(self.free):
            return False
        row = self.table[slot]
        for j in range(row.shape[0]):
            if n == 0:
                break
            if row[j] < 0:
                row[j] = self.free.popleft()
                n -= 1
        return True

    def release(self, slot: int) -> None:
        row = self.table[slot]
        for j in range(row.shape[0]):
            if row[j] > 0:
                self.free.append(int(row[j]))
            row[j] = -1


# ---------------------------------------------------------------------------
# Forward passes over the page pool
# ---------------------------------------------------------------------------


def forward_decode_paged(
    params: gpt.Params,
    config: Config,
    idx: jnp.ndarray,  # [B, 1] int32
    cache: PagedKVCache,
    page_table: jnp.ndarray,  # [B, pages_per_slot] int32 (-1 = unallocated)
    positions: jnp.ndarray,  # [B] int32
) -> tuple[jnp.ndarray, PagedKVCache]:
    """Paged analogue of :func:`gpt.forward_decode_batched`: single-token
    ragged-batch decode where each sequence's K/V lives in its page-table
    pages instead of a contiguous slot row. Thin delegation — the contiguous
    and paged decode paths share one implementation."""
    return gpt.forward_decode_batched(
        params, config, idx, cache, positions, page_table=page_table
    )


def scatter_prefill(
    cache: PagedKVCache,
    scratch: gpt.KVCache,  # [L, 1, S, G, H] — a freshly prefilled batch-1 cache
    pages_row: jnp.ndarray,  # [pages_per_slot] int32 (-1 entries -> trash page)
) -> PagedKVCache:
    """Write a prefilled contiguous scratch cache into one slot's pages.

    Rows past the prompt land in whatever page the (clamped) table names —
    the trash page for unallocated tails — and stay invisible to attention
    via position masking, exactly like padded prefill rows in the contiguous
    engine."""
    ps = cache.page_size
    pr = jnp.maximum(pages_row, 0)

    def put(pool, rows):  # pool [L,P,ps,...], rows [L,1,S,...]
        L = pool.shape[0]
        tail = rows.shape[3:]
        paged_rows = rows.reshape((L, pr.shape[0], ps) + tail)
        return pool.at[:, pr].set(paged_rows)

    if cache.quantized:
        return PagedKVCache(
            k=put(cache.k, scratch.k), v=put(cache.v, scratch.v),
            k_scale=put(cache.k_scale, scratch.k_scale),
            v_scale=put(cache.v_scale, scratch.v_scale),
        )
    return PagedKVCache(k=put(cache.k, scratch.k), v=put(cache.v, scratch.v))
