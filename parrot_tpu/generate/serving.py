"""Continuous-batching serving engine.

The reference serves one request at a time (``generate/base.py:92-159``);
this engine keeps a fixed pool of decode slots live and admits/retires
requests between single-token steps — the BASELINE.json north-star
"continuous batching across hosts" serving core, single-host form:

- **slots**: one batched KV cache ``[L, B, S, ...]``; slot ``b`` belongs to at
  most one in-flight request. Admission prefills the prompt directly into the
  slot's cache rows (a row slice round-trips through the shared bucketed
  prefill program, so admission compiles O(log block_size) programs total).
  Admission is **async**: prefill dispatches pipeline behind the running
  decode and first tokens are read at the next step/burst barrier, so a
  burst of k arrivals costs zero extra device->host round-trips.
- **lock-step decode**: every step runs ONE ``forward_decode_batched``
  dispatch for all slots at their own positions (idle slots compute at
  position 0 and are ignored — the standard slot-batching tradeoff).
- **retirement**: EOS or budget frees the slot immediately; the next queued
  request reuses it on the following step. No cache zeroing is needed — the
  per-slot position masking makes stale rows invisible until overwritten
  (same argument as bucketed prefill padding, ``engine.py``).

All jitted entry points are module-level and shape-bucketed, so a serving
process compiles a handful of programs regardless of traffic mix.
"""

from __future__ import annotations

import functools
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from parrot_tpu.config import Config
from parrot_tpu.generate.engine import _pad_to, prompt_bucket
from parrot_tpu.models import gpt
from parrot_tpu.models.gpt import KVCache
from parrot_tpu.ops.sampling import sample_per_slot


@dataclass
class Request:
    """One in-flight generation request."""

    id: int
    prompt: np.ndarray  # [T] int32
    max_new_tokens: int
    produced: list[int] = field(default_factory=list)
    done: bool = False
    t_submit: float = 0.0
    t_first_token: Optional[float] = None
    t_done: Optional[float] = None
    # per-request sampling overrides (None -> engine defaults)
    temperature: Optional[float] = None
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    # multi-token stop sequences (tuples of token ids); a match retires the
    # request and the matched suffix is NOT part of ``produced`` — the same
    # contract as ``engine.generate_stream`` (≙ reference chat/base.py:49-95)
    stop_tokens: tuple = ()
    # preempted-to-host state (paged engine): saved KV pages + resume point
    saved: Optional[dict] = None
    preemptions: int = 0

    @property
    def ttft(self) -> Optional[float]:
        return None if self.t_first_token is None else self.t_first_token - self.t_submit


# Sampling parameters ride as TRACED per-slot arrays (``samp``: dict of
# t [slots] f32, k [slots] i32, p [slots] f32), so any per-request mix runs
# the same compiled program — no grouping, no per-combination recompiles
# (``sample_per_slot``'s bisect top-k takes k as data). The static
# ``use_top_k/use_top_p`` flags only gate whole stages: at most 4 variants
# of each program ever compile.


@functools.partial(
    jax.jit,
    static_argnames=("config", "use_top_k", "use_top_p"),
    donate_argnums=(1, 2),
)
def _admit_step(
    params, cache: KVCache, cur: jnp.ndarray, row: jnp.ndarray,
    prompt: jnp.ndarray, t_true: jnp.ndarray, samp, rng,
    *, config: Config, use_top_k: bool, use_top_p: bool,
):
    """Prefill ``prompt`` into cache row ``row`` and sample its first token.

    The slot's cache rows are sliced out, run through the standard prefill
    (batch-1), and written back — so admission shares the bucketed prefill
    program across slots and requests.
    """
    sub = jax.tree.map(lambda a: lax.dynamic_slice_in_dim(a, row, 1, axis=1), cache)
    logits, sub = gpt.forward_cached(
        params, config, prompt[None, :], sub, jnp.asarray(0, jnp.int32), prefill=True
    )
    cache = jax.tree.map(
        lambda big, small: lax.dynamic_update_slice_in_dim(big, small, row, axis=1),
        cache, sub,
    )
    last = lax.dynamic_index_in_dim(logits[0], t_true - 1, axis=0, keepdims=False)
    first = sample_per_slot(rng, last, samp["t"], samp["k"], samp["p"],
                            use_top_k=use_top_k, use_top_p=use_top_p)
    return cache, cur.at[row].set(first)


@functools.partial(
    jax.jit,
    static_argnames=("config", "use_top_k", "use_top_p"),
    donate_argnums=(1,),
)
def _decode_all_slots(
    params, cache: KVCache, cur: jnp.ndarray, positions: jnp.ndarray, samp, rng,
    *, config: Config, use_top_k: bool, use_top_p: bool,
):
    logits, cache = gpt.forward_decode_batched(
        params, config, cur[:, None], cache, positions
    )
    nxt = sample_per_slot(rng, logits[:, 0], samp["t"], samp["k"], samp["p"],
                          use_top_k=use_top_k, use_top_p=use_top_p)
    return nxt, cache


@functools.partial(
    jax.jit,
    static_argnames=("config", "n_steps", "use_top_k", "use_top_p"),
    donate_argnums=(1,),
)
def _decode_burst(
    params, cache: KVCache, cur: jnp.ndarray, positions: jnp.ndarray, samp, rng,
    *, config: Config, n_steps: int, use_top_k: bool, use_top_p: bool,
):
    """``n_steps`` lock-step decodes for all slots in ONE dispatched scan.

    Returns ``(toks [n_steps, slots], cache, cur)``. Numerically each
    iteration equals one ``_decode_all_slots`` call; the host only syncs at
    burst end, trading admission/retirement granularity for dispatch count
    (the throughput knob of ``ServingEngine.step_burst``).
    """

    def body(carry, _):
        cache, cur, positions, rng = carry
        logits, cache = gpt.forward_decode_batched(
            params, config, cur[:, None], cache, positions
        )
        rng, step_rng = jax.random.split(rng)
        nxt = sample_per_slot(step_rng, logits[:, 0], samp["t"], samp["k"],
                              samp["p"], use_top_k=use_top_k, use_top_p=use_top_p)
        return (cache, nxt, positions + 1, rng), nxt

    (cache, cur, positions, rng), toks = lax.scan(
        body, (cache, cur, positions, rng), None, length=n_steps
    )
    return toks, cache, cur


@functools.partial(
    jax.jit,
    static_argnames=("config", "use_top_k", "use_top_p"),
    donate_argnums=(1, 2),
)
def _admit_paged(
    params, cache, cur: jnp.ndarray, row: jnp.ndarray,
    pages_row: jnp.ndarray, prompt: jnp.ndarray, t_true: jnp.ndarray, samp, rng,
    *, config: Config, use_top_k: bool, use_top_p: bool,
):
    """Paged admission: prefill into a batch-1 scratch cache, scatter the
    scratch rows page-wise into the pool, sample the first token."""
    from parrot_tpu.models import paged_kv

    S = pages_row.shape[0] * cache.page_size
    scratch = KVCache.init(
        config, 1, S, dtype=jnp.int8 if cache.quantized else cache.k.dtype
    )
    logits, scratch = gpt.forward_cached(
        params, config, prompt[None, :], scratch, jnp.asarray(0, jnp.int32),
        prefill=True,
    )
    cache = paged_kv.scatter_prefill(cache, scratch, pages_row)
    last = lax.dynamic_index_in_dim(logits[0], t_true - 1, axis=0, keepdims=False)
    first = sample_per_slot(rng, last, samp["t"], samp["k"], samp["p"],
                            use_top_k=use_top_k, use_top_p=use_top_p)
    return cache, cur.at[row].set(first)


@functools.partial(
    jax.jit,
    static_argnames=("config", "use_top_k", "use_top_p"),
    donate_argnums=(1,),
)
def _decode_all_slots_paged(
    params, cache, cur: jnp.ndarray, page_table: jnp.ndarray,
    positions: jnp.ndarray, samp, rng,
    *, config: Config, use_top_k: bool, use_top_p: bool,
):
    """Paged single step with the SAME rng consumption as
    :func:`_decode_all_slots`, so seed-controlled paged-vs-contiguous A/Bs
    sample identical streams at temperature > 0 in step() mode."""
    from parrot_tpu.models import paged_kv

    logits, cache = paged_kv.forward_decode_paged(
        params, config, cur[:, None], cache, page_table, positions
    )
    nxt = sample_per_slot(rng, logits[:, 0], samp["t"], samp["k"], samp["p"],
                          use_top_k=use_top_k, use_top_p=use_top_p)
    return nxt, cache


@functools.partial(
    jax.jit,
    static_argnames=("config", "n_steps", "use_top_k", "use_top_p"),
    donate_argnums=(1,),
)
def _decode_burst_paged(
    params, cache, cur: jnp.ndarray, page_table: jnp.ndarray,
    positions: jnp.ndarray, samp, rng,
    *, config: Config, n_steps: int, use_top_k: bool, use_top_p: bool,
):
    """Paged analogue of :func:`_decode_burst` (step() uses
    :func:`_decode_all_slots_paged` for rng parity with the contiguous path).
    The page table is fixed across the burst — the engine preallocates pages
    covering ``positions + n_steps`` before dispatch."""
    from parrot_tpu.models import paged_kv

    def body(carry, _):
        cache, cur, positions, rng = carry
        logits, cache = paged_kv.forward_decode_paged(
            params, config, cur[:, None], cache, page_table, positions
        )
        rng, step_rng = jax.random.split(rng)
        nxt = sample_per_slot(step_rng, logits[:, 0], samp["t"], samp["k"],
                              samp["p"], use_top_k=use_top_k, use_top_p=use_top_p)
        return (cache, nxt, positions + 1, rng), nxt

    (cache, cur, positions, rng), toks = lax.scan(
        body, (cache, cur, positions, rng), None, length=n_steps
    )
    return toks, cache, cur


@jax.jit
def _gather_pages(cache, pages):
    """Pull one slot's pages out of the pool (d2h swap-out path)."""
    return jax.tree.map(lambda a: a[:, pages], cache)


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_pages(cache, pages, saved):
    """Write swapped-in pages back into (fresh) pool slots."""
    return jax.tree.map(lambda big, small: big.at[:, pages].set(small), cache, saved)


class ServingEngine:
    """Slot-based continuous batching around the ragged decode step.

    Usage::

        eng = ServingEngine(params, config, slots=8, temperature=0.0)
        req = eng.submit(prompt_ids, max_new_tokens=64)
        while not req.done:
            eng.step()           # one decode step for ALL in-flight requests
        print(req.produced)
    """

    def __init__(
        self,
        params,
        config: Config,
        *,
        slots: int = 8,
        max_seq_length: Optional[int] = None,
        cache_dtype: jnp.dtype = jnp.bfloat16,
        temperature: float = 1.0,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        eos_id: Optional[int] = None,
        rng: Optional[jax.Array] = None,
        sync_admission: bool = False,
        mesh=None,
        paged_kv: bool = False,
        page_size: int = 64,
        total_pages: Optional[int] = None,
    ):
        """``mesh``: a ``jax.sharding.Mesh`` — params are tensor/fsdp-sharded
        by the :mod:`parrot_tpu.parallel.sharding` rules and the slot KV cache
        is placed slots-over-(data,fsdp) x kv-heads-over-tensor, so the same
        admission/decode/retirement programs run SPMD over the mesh (the
        BASELINE "continuous batching across hosts" composition; GSPMD inserts
        the proj psums and cache collectives). Token streams are identical to
        the single-device engine (``tests/test_serving.py`` parity).

        ``paged_kv``: replace the contiguous slot cache with the block-paged
        pool (:mod:`parrot_tpu.models.paged_kv`): pages of ``page_size``
        tokens are allocated as requests grow and freed at retirement, so
        ``total_pages`` (default: the contiguous equivalent,
        ``slots * S/page_size``) can undersubscribe the full-length
        reservation. Admission backpressures when the pool is empty; a
        running request that cannot get a page **preempts** the
        fattest other request — its pages swap out to HOST RAM and it
        requeues with priority, resuming later from the saved pages with no
        re-prefill (the host tier of "INT8 KV-cache paged across hosts").
        Only when no victim exists does the engine raise."""
        self.params = params
        self.config = config
        self.slots = slots
        self.S = min(max_seq_length or config.block_size, config.block_size)
        self.paged = paged_kv
        if paged_kv:
            from parrot_tpu.models import paged_kv as paged_lib

            if self.S % page_size:
                raise ValueError(
                    f"max_seq_length {self.S} must be a multiple of "
                    f"page_size {page_size}"
                )
            self.page_size = page_size
            self.pages_per_slot = self.S // page_size
            n_pages = 1 + (  # +1: reserved trash page
                total_pages if total_pages is not None
                else slots * self.pages_per_slot
            )
            self.alloc = paged_lib.PageAllocator(n_pages, slots, self.pages_per_slot)
            self.cache = paged_lib.PagedKVCache.init(
                config, n_pages, page_size, dtype=cache_dtype
            )
        else:
            self.cache = KVCache.init(config, slots, self.S, dtype=cache_dtype)
        self.cur = jnp.zeros((slots,), jnp.int32)
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from parrot_tpu.parallel import sharding as sharding_lib

            self.params = sharding_lib.shard_params(mesh, params)
            if paged_kv:
                self.cache = sharding_lib.shard_paged_kv_cache(mesh, self.cache)
            else:
                self.cache = sharding_lib.shard_kv_cache(mesh, self.cache)
            rep = NamedSharding(mesh, P())
            self.cur = jax.device_put(self.cur, rep)
        self.pos = np.zeros((slots,), np.int64)  # tokens so far (prompt+produced)
        self.occupant: list[Optional[Request]] = [None] * slots
        self.queue: deque[Request] = deque()
        # engine-level DEFAULTS; each Request may override any of the three
        # (folded into the jitted programs as per-slot arrays, VERDICT r4 #5)
        self.defaults = dict(temperature=temperature, top_k=top_k, top_p=top_p)
        self.eos_id = eos_id
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self._next_id = 0
        # A/B knob: True restores the round-2 behavior of one host sync per
        # admission (TTFT read immediately); False (default) defers first
        # tokens to the step/burst barrier so admissions pipeline.
        self.sync_admission = sync_admission
        self._sync_finished: list = []  # admission-time retirees (sync mode)

    # -- public API ---------------------------------------------------------

    def submit(
        self,
        prompt,
        max_new_tokens: int,
        *,
        temperature: Optional[float] = None,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        stop_tokens: tuple = (),
    ) -> Request:
        """Queue a request. ``temperature``/``top_k``/``top_p`` override the
        engine defaults for this request only; ``stop_tokens`` is a tuple of
        token-id sequences — producing any of them retires the request with
        the matched suffix excluded from ``produced`` (chat-template stops,
        same contract as ``generate_stream``)."""
        prompt = np.asarray(prompt, np.int32)
        if len(prompt) > self.S:
            raise ValueError(f"prompt length {len(prompt)} exceeds cache size {self.S}")
        if len(prompt) + max_new_tokens > self.S:
            # the KV window will roll: positions >= S wrap and the sequence
            # attends only its last S tokens — legal, but quality degrades
            import warnings

            warnings.warn(
                f"prompt ({len(prompt)}) + max_new_tokens ({max_new_tokens}) "
                f"exceeds the cache size ({self.S}); the KV window will roll "
                "and the request only attends its most recent "
                f"{self.S} tokens",
                stacklevel=2,
            )
        req = Request(
            self._next_id, prompt, max_new_tokens,
            temperature=temperature, top_k=top_k, top_p=top_p,
            stop_tokens=tuple(tuple(int(t) for t in s) for s in stop_tokens),
            t_submit=time.perf_counter(),
        )
        self._next_id += 1
        self.queue.append(req)
        return req

    @property
    def n_active(self) -> int:
        return sum(r is not None for r in self.occupant)

    # -- sampling-parameter plumbing -----------------------------------------

    def _eff(self, req: Request) -> tuple[float, Optional[int], Optional[float]]:
        """Effective (temperature, top_k, top_p) for one request."""
        d = self.defaults
        t = d["temperature"] if req.temperature is None else req.temperature
        k = d["top_k"] if req.top_k is None else req.top_k
        p = d["top_p"] if req.top_p is None else req.top_p
        return t, k, p

    def _samp_slots(self):
        """Per-slot sampling arrays + the static stage flags for this
        dispatch. Encoding: t<=0 greedy, k<=0 no top-k, p>=1 no top-p."""
        t = np.zeros(self.slots, np.float32)
        k = np.zeros(self.slots, np.int32)
        p = np.ones(self.slots, np.float32)
        use_k = use_p = False
        for b, r in enumerate(self.occupant):
            if r is None:
                continue
            te, tk, tp = self._eff(r)
            t[b] = te
            k[b] = 0 if tk is None else tk
            p[b] = 1.0 if tp is None else tp
            use_k |= tk is not None
            use_p |= tp is not None and tp < 1.0
        samp = dict(t=jnp.asarray(t), k=jnp.asarray(k), p=jnp.asarray(p))
        return samp, use_k, use_p

    def _samp_one(self, req: Request):
        """Scalar sampling tree for one request's admission first-token."""
        te, tk, tp = self._eff(req)
        samp = dict(
            t=jnp.asarray(te, jnp.float32),
            k=jnp.asarray(0 if tk is None else tk, jnp.int32),
            p=jnp.asarray(1.0 if tp is None else tp, jnp.float32),
        )
        return samp, tk is not None, tp is not None and tp < 1.0

    @staticmethod
    def _stop_hit(req: Request) -> int:
        """Length of the stop sequence ``produced`` now ends with (0 = none)."""
        for s in req.stop_tokens:
            if len(req.produced) >= len(s) and tuple(req.produced[-len(s):]) == s:
                return len(s)
        return 0

    def has_work(self) -> bool:
        return bool(self.queue) or self.n_active > 0

    def step(self) -> list[Request]:
        """Admit queued requests into free slots, then run one lock-step
        decode for all active slots. Returns requests that finished this
        step."""
        pending = self._admit()
        finished = list(self._sync_finished)
        self._sync_finished.clear()
        active = [b for b, r in enumerate(self.occupant) if r is not None]
        if not active:
            return finished

        first_snapshot = self.cur if pending else None  # first tokens, pre-decode
        positions = jnp.asarray(
            np.where([r is not None for r in self.occupant], self.pos - 1, 0),
            jnp.int32,
        )
        samp, use_k, use_p = self._samp_slots()
        self.rng, step_rng = jax.random.split(self.rng)
        if self.paged:
            self._ensure_pages(active, 1)
            nxt, self.cache = _decode_all_slots_paged(
                self.params, self.cache, self.cur,
                jnp.asarray(self.alloc.table), positions, samp, step_rng,
                config=self.config, use_top_k=use_k, use_top_p=use_p,
            )
            self.cur = nxt
        else:
            nxt, self.cache = _decode_all_slots(
                self.params, self.cache, self.cur, positions, samp, step_rng,
                config=self.config, use_top_k=use_k, use_top_p=use_p,
            )
            self.cur = nxt
        toks = np.asarray(nxt)  # host sync: admission decisions need the values
        now = time.perf_counter()

        self._account_pending(pending, first_snapshot, now, finished)
        for b in active:
            req = self.occupant[b]
            if req is None:  # retired on its admission first-token
                continue
            tok = int(toks[b])
            req.produced.append(tok)
            self.pos[b] += 1
            hit_eos = self.eos_id is not None and tok == self.eos_id
            n_stop = self._stop_hit(req)
            if n_stop:
                del req.produced[-n_stop:]  # stop sequence is not output
            if hit_eos or n_stop or len(req.produced) >= req.max_new_tokens:
                req.done, req.t_done = True, now
                self._retire(b)  # slot free for the next admission
                finished.append(req)
        return finished

    def step_burst(self, n: int = 8) -> list[Request]:
        """Admit, then decode ``n`` lock-step tokens in one dispatch.

        Retirement only happens at burst boundaries: a request that hits EOS
        or its budget mid-burst keeps its slot (computing ignored tokens)
        until the burst ends, and its post-EOS tokens are dropped host-side —
        the classic batching granularity/throughput tradeoff. In the default
        async-admission mode the first token is *read* at the burst-end
        barrier, so reported TTFT includes up to a full burst of decode; pass
        ``sync_admission=True`` for latency-honest TTFT A/Bs against the old
        sync numbers. Stale KV rows
        written past a retired request's end are invisible to the slot's next
        occupant (position masking; same argument as bucketed prefill).
        """
        pending = self._admit()
        finished = list(self._sync_finished)
        self._sync_finished.clear()
        active = [b for b, r in enumerate(self.occupant) if r is not None]
        if not active:
            return finished

        first_snapshot = self.cur if pending else None  # first tokens, pre-decode
        positions = jnp.asarray(
            np.where([r is not None for r in self.occupant], self.pos - 1, 0),
            jnp.int32,
        )
        samp, use_k, use_p = self._samp_slots()
        self.rng, step_rng = jax.random.split(self.rng)
        if self.paged:
            self._ensure_pages(active, n)
            toks, self.cache, self.cur = _decode_burst_paged(
                self.params, self.cache, self.cur,
                jnp.asarray(self.alloc.table), positions, samp, step_rng,
                config=self.config, n_steps=n, use_top_k=use_k, use_top_p=use_p,
            )
        else:
            toks, self.cache, self.cur = _decode_burst(
                self.params, self.cache, self.cur, positions, samp, step_rng,
                config=self.config, n_steps=n, use_top_k=use_k, use_top_p=use_p,
            )
        toks = np.asarray(toks)  # [n, slots] host sync, once per burst
        now = time.perf_counter()

        self._account_pending(pending, first_snapshot, now, finished)
        for b in active:
            req = self.occupant[b]
            if req is None:  # retired on its admission first-token
                continue
            for i in range(n):
                tok = int(toks[i, b])
                req.produced.append(tok)
                self.pos[b] += 1
                hit_eos = self.eos_id is not None and tok == self.eos_id
                n_stop = self._stop_hit(req)
                if n_stop:
                    del req.produced[-n_stop:]  # stop sequence is not output
                if hit_eos or n_stop or len(req.produced) >= req.max_new_tokens:
                    req.done, req.t_done = True, now
                    self._retire(b)
                    finished.append(req)
                    break
        return finished

    def run_until_drained(
        self, max_steps: int = 1_000_000, burst: int = 1
    ) -> None:
        for _ in range(max_steps):
            if not self.has_work():
                return
            self.step() if burst <= 1 else self.step_burst(burst)

    # -- internals ----------------------------------------------------------

    def _retire(self, b: int) -> None:
        self.occupant[b] = None
        if self.paged:
            self.alloc.release(b)

    def _preempt(self, b: int) -> None:
        """Swap a running request's KV pages out to HOST RAM and requeue it —
        the host tier of "INT8 KV-cache paged across hosts". Its pages free
        immediately; on re-admission the pages scatter back into fresh pool
        slots and decoding resumes exactly where it stopped (no re-prefill;
        greedy continuations are bit-identical — tests)."""
        req = self.occupant[b]
        row = self.alloc.table[b]
        n = int((row >= 0).sum())  # allocated pages are an ascending-j prefix
        # pad the page list to the full per-slot width with the trash page so
        # gather/scatter compile ONCE (per-shape compiles cost seconds
        # through remote runtimes); padded entries carry trash-page garbage
        # that the restore writes straight back to the trash page
        padded = np.maximum(row, 0).astype(np.int32)
        saved_pages = jax.device_get(_gather_pages(self.cache, jnp.asarray(padded)))
        # keep only the n live pages in host RAM (ascontiguousarray drops the
        # full-width gather buffer — the padded tail is trash-page garbage);
        # the swap-in pads zeros back so the scatter keeps its fixed shape
        saved_pages = jax.tree.map(
            lambda a: np.ascontiguousarray(a[:, :n]), saved_pages
        )
        req.saved = {
            "pages": saved_pages, "n": n,
            "pos": int(self.pos[b]), "cur": int(np.asarray(self.cur)[b]),
        }
        req.preemptions += 1
        self._retire(b)
        self.queue.appendleft(req)  # resume with priority

    def _pick_victim(self, exclude: int) -> Optional[int]:
        """Preemption victim: the occupied slot holding the most pages (frees
        the most), skipping requests whose first token is still pending at
        the barrier (their accounting is in flight)."""
        best, best_pages = None, 0
        for b in range(self.slots):
            req = self.occupant[b]
            if b == exclude or req is None or not req.produced:
                continue
            n_pages = int((self.alloc.table[b] >= 0).sum())
            if n_pages > best_pages:
                best, best_pages = b, n_pages
        return best

    def _ensure_pages(self, active: list[int], n_steps: int) -> None:
        """Preallocate pages so every active slot can write its next
        ``n_steps`` tokens (rows ``pos-1 .. pos+n-2``). When the pool is
        empty, preempt (swap out to host) the fattest other request rather
        than failing — raise only when no victim exists."""
        for b in active:
            if self.occupant[b] is None:
                continue
            upto = min(int(self.pos[b]) + n_steps - 1, self.S)
            while not self.alloc.ensure(b, upto, self.page_size):
                victim = self._pick_victim(exclude=b)
                if victim is None:
                    raise RuntimeError(
                        f"KV page pool exhausted: slot {b} needs coverage to "
                        f"position {upto}, only {self.alloc.n_free} pages are "
                        f"free, and no other request can be preempted — size "
                        f"total_pages for at least one full-length request "
                        f"plus a page per extra slot"
                    )
                self._preempt(victim)

    def _admit(self) -> list[tuple["Request", int]]:
        """Dispatch admission prefills into free slots WITHOUT host syncs.

        Each admitted request's first token is pending in ``self.cur[slot]``;
        the caller reads it at the step/burst-end barrier (``_account_pending``).
        A queue of k arrivals therefore costs k pipelined dispatches instead
        of k ~25 ms device->host round-trips (VERDICT r2 #9) — admission
        prefill overlaps the decode burst on the device.
        """
        pending = []
        for b in range(self.slots):
            if not self.queue or self.occupant[b] is not None:
                continue
            head = self.queue[0]
            if head.saved is not None:
                # swap-in: restore a preempted request's pages from host RAM.
                # Anti-thrash guard: resuming must leave a page of headroom
                # per active slot, or the resume would immediately force
                # another preemption next step.
                n = head.saved["n"]
                if self.alloc.n_free < n + self.n_active or not self.alloc.ensure(
                    b, min(n * self.page_size, self.S), self.page_size
                ):
                    break  # not enough pages yet — keep its priority spot
                req = self.queue.popleft()
                # full-width page list (unallocated tail -> trash page): the
                # scatter program compiles once, padded rows land in trash.
                # Saved pages were host-sliced to the live prefix at preempt
                # time; zero-pad back to the fixed scatter width here.
                pages_row = jnp.asarray(
                    np.maximum(self.alloc.table[b], 0).astype(np.int32)
                )
                W = self.alloc.table.shape[1]

                def _padw(a, W=W):
                    if a.shape[1] == W:
                        return jnp.asarray(a)
                    pad = np.zeros(
                        (a.shape[0], W - a.shape[1]) + a.shape[2:], a.dtype
                    )
                    return jnp.asarray(np.concatenate([a, pad], axis=1))

                self.cache = _scatter_pages(
                    self.cache, pages_row,
                    jax.tree.map(_padw, req.saved["pages"]),
                )
                self.cur = self.cur.at[b].set(req.saved["cur"])
                self.pos[b] = req.saved["pos"]
                self.occupant[b] = req
                req.saved = None
                continue  # no pending entry: its first token was read long ago
            T = len(head.prompt)
            if self.paged:
                upto = min(T + 1, self.S)
                needed = self.alloc.pages_needed(b, upto, self.page_size)
                if needed > self.alloc.capacity:
                    # it can NEVER fit, even into an empty pool: waiting can
                    # never help — fail loudly instead of spinning
                    # has_work() forever
                    raise ValueError(
                        f"request {head.id} needs {needed} pages for its "
                        f"prompt but the pool only has {self.alloc.capacity} "
                        f"— raise total_pages or lower max_seq_length/"
                        f"page_size"
                    )
                # Headroom guard (mirrors the swap-in guard above): a fresh
                # admission is unpreemptible until its first-token barrier
                # (no produced token yet), so admitting into the last free
                # pages could leave _ensure_pages victimless within this
                # same step. Only admit if every already-active slot keeps a
                # page of headroom for its next decode step.
                if self.alloc.n_free < needed + self.n_active or not self.alloc.ensure(
                    b, upto, self.page_size
                ):
                    break  # backpressure — request stays queued
            req = self.queue.popleft()
            Tb = prompt_bucket(T, self.S)
            padded = _pad_to(req.prompt.astype(np.int32), Tb)
            samp, use_k, use_p = self._samp_one(req)
            self.rng, admit_rng = jax.random.split(self.rng)
            if self.paged:
                self.cache, self.cur = _admit_paged(
                    self.params, self.cache, self.cur, jnp.asarray(b, jnp.int32),
                    jnp.asarray(self.alloc.table[b]), padded,
                    jnp.asarray(T, jnp.int32), samp, admit_rng,
                    config=self.config, use_top_k=use_k, use_top_p=use_p,
                )
            else:
                self.cache, self.cur = _admit_step(
                    self.params, self.cache, self.cur, jnp.asarray(b, jnp.int32),
                    padded, jnp.asarray(T, jnp.int32), samp, admit_rng,
                    config=self.config, use_top_k=use_k, use_top_p=use_p,
                )
            self.occupant[b] = req
            self.pos[b] = T + 1
            if self.sync_admission:
                # retirees land in _sync_finished so step()/step_burst()
                # report them exactly like the async path does
                self._account_pending([(req, b)], self.cur, time.perf_counter(),
                                      self._sync_finished)
            else:
                pending.append((req, b))
        return pending

    def _account_pending(
        self, pending, first_snapshot, now: float, finished: list
    ) -> None:
        """Record admission first-tokens at the single post-dispatch barrier."""
        if not pending:
            return
        first = np.asarray(first_snapshot)  # pipeline already drained: cheap
        for req, b in pending:
            tok = int(first[b])
            req.produced.append(tok)
            req.t_first_token = now
            hit_eos = self.eos_id is not None and tok == self.eos_id
            n_stop = self._stop_hit(req)
            if n_stop:
                del req.produced[-n_stop:]
            if hit_eos or n_stop or len(req.produced) >= req.max_new_tokens:
                req.done, req.t_done = True, now
                self._retire(b)
                finished.append(req)
