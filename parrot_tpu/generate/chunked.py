"""Layer-chunked decode executor: the model step as K small programs.

Why this exists: the single-program decode step passes the entire parameter
tree to one XLA executable. On some runtimes that is a liability — the axon
TPU relay in this environment (in its degraded state; see PERF.md "Relay
HBM budget") rejects large executions with a bare ``RESOURCE_EXHAUSTED``
even though the compiled program's own footprint (args + temps + code, per
``compiled.memory_analysis()``) fits in a fraction of HBM and raw
allocations of 4x the size succeed. Isolation experiments put the working
regime at roughly 4 GB of *cumulative bytes touched by executions* per
process — one 2.3 GB-arg program runs (even with 1.5 GB more resident), a
3.1 GB-arg program does not, and a second 1.8 GB-arg program after a
2.3 GB-arg one does not. Splitting the layer stack into chunks keeps each
program small while keeping all tensors resident on device; only the
[B, T, n_embd] hidden state flows between programs, so the extra cost is
one dispatch per chunk per step (~0.5 ms on the relay) — noise against a
7B model's ~13 ms/token decode. (In the degraded relay state even the
chunked 7B trips the cumulative cap; in the healthy state — round 1 — the
fused 7B runs unchunked. The executor is kept for its multi-mesh placement
value, not as a relay workaround.)

This is also the natural executor shape for models whose weights exceed one
chip's HBM (chunks can be placed on different meshes or swapped), which is
why it lives in the library rather than in bench.py.

The reference has no analogue (its per-layer Python loop re-dispatches every
block from the host anyway, ``lit_gpt/model.py:94-110``); this is the
TPU-native middle ground between that and the fully fused single program.

Numerics are identical to ``gpt.forward_cached`` — same scan, same rope
tables, same mask — verified by ``tests/test_chunked.py`` parity tests.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from parrot_tpu.config import Config
from parrot_tpu.models import gpt
from parrot_tpu.models.gpt import KVCache
from parrot_tpu.ops.sampling import sample


def split_params(params: dict, n_chunks: int) -> list[dict]:
    """Split a stacked-layer param tree into ``n_chunks`` chunk trees.

    Chunk ``i`` carries ``blocks`` rows ``[l_i, l_{i+1})`` (sliced on the
    stacked axis — each slice is its own device buffer, which is the whole
    point); chunk 0 additionally carries ``wte``, the last chunk carries
    ``ln_f`` + ``lm_head``.  Non-block keys are shared by reference, not
    copied.
    """
    L = jax.tree.leaves(params["blocks"])[0].shape[0]
    bounds = [round(i * L / n_chunks) for i in range(n_chunks + 1)]
    chunks = []
    for i in range(n_chunks):
        lo, hi = bounds[i], bounds[i + 1]
        chunk = {"blocks": jax.tree.map(lambda a: a[lo:hi], params["blocks"])}
        if i == 0:
            chunk["wte"] = params["wte"]
        if i == n_chunks - 1:
            chunk["ln_f"] = params["ln_f"]
            chunk["lm_head"] = params["lm_head"]
        chunks.append(chunk)
    return chunks


def split_cache(cache: KVCache, n_chunks: int) -> list[KVCache]:
    L = cache.k.shape[0]
    bounds = [round(i * L / n_chunks) for i in range(n_chunks + 1)]
    return [
        jax.tree.map(lambda a: a[bounds[i]:bounds[i + 1]], cache)
        for i in range(n_chunks)
    ]


@functools.partial(
    jax.jit,
    static_argnames=("config", "layer_offset", "first", "last", "prefill"),
    donate_argnums=(2,),
)
def _chunk_step(
    chunk: dict,
    x_or_idx: jnp.ndarray,  # idx [B, T] int32 if first else hidden [B, T, D]
    cache: KVCache,
    input_pos: jnp.ndarray,  # scalar int32
    *,
    config: Config,
    layer_offset: int,
    first: bool,
    last: bool,
    prefill: bool = False,
) -> tuple[jnp.ndarray, KVCache]:
    """One chunk of ``gpt.forward_cached``: layers [offset, offset+len)."""
    if first:
        idx = x_or_idx
        B, T = idx.shape
        x = jnp.take(chunk["wte"]["weight"], idx, axis=0)
    else:
        x = x_or_idx
        B, T = x.shape[:2]
    S = cache.max_seq_length

    cos_t, sin_t = gpt._rope_tables(config, x.dtype)
    positions = input_pos + jnp.arange(T)
    cos = jnp.take(cos_t, positions, axis=0)
    sin = jnp.take(sin_t, positions, axis=0)
    slots = jnp.arange(S)[None, :]
    visible = (slots <= positions[:, None]) | (positions[:, None] >= S)
    mask = jnp.broadcast_to(visible[None], (B, T, S))
    slot = jnp.where(input_pos >= S, input_pos % S, input_pos)

    n_here = jax.tree.leaves(chunk["blocks"])[0].shape[0]
    layer_ids = layer_offset + jnp.arange(n_here)
    if cache.quantized:
        def step(x, layer):
            p_layer, layer_id, k_l, v_l, ks_l, vs_l = layer
            return gpt.block_forward(
                p_layer, config, x, cos, sin, kv=(k_l, v_l, ks_l, vs_l),
                slot=slot, mask=mask, layer_id=layer_id, prefill=prefill,
            )

        x, (nk, nv, nks, nvs) = lax.scan(
            step, x,
            (chunk["blocks"], layer_ids, cache.k, cache.v, cache.k_scale, cache.v_scale),
        )
        new_cache = KVCache(k=nk, v=nv, k_scale=nks, v_scale=nvs)
    else:
        def step(x, layer):
            p_layer, layer_id, k_l, v_l = layer
            return gpt.block_forward(
                p_layer, config, x, cos, sin, kv=(k_l, v_l), slot=slot,
                mask=mask, layer_id=layer_id, prefill=prefill,
            )

        x, (nk, nv) = lax.scan(step, x, (chunk["blocks"], layer_ids, cache.k, cache.v))
        new_cache = KVCache(k=nk, v=nv)

    if last:
        x = gpt.apply_norm(chunk["ln_f"], x, config.norm_class, config.norm_eps)
        x = gpt.apply_linear(chunk["lm_head"], x, lora_scaling=gpt._lora_scaling(config))
    return x, new_cache


def forward_cached_chunked(
    chunks: list[dict],
    config: Config,
    idx: jnp.ndarray,  # [B, T] int32
    caches: list[KVCache],
    input_pos: jnp.ndarray,
    *,
    prefill: bool = False,
) -> tuple[jnp.ndarray, list[KVCache]]:
    """Drop-in ``gpt.forward_cached`` over split params: K chained programs.

    Caches are donated chunk-by-chunk, so steady-state decode holds exactly
    one copy of each cache chunk plus the small inter-chunk hidden state.
    """
    offsets = []
    off = 0
    for c in chunks:
        offsets.append(off)
        off += jax.tree.leaves(c["blocks"])[0].shape[0]
    x = idx
    new_caches = []
    for i, (chunk, cache) in enumerate(zip(chunks, caches)):
        x, nc = _chunk_step(
            chunk, x, cache, jnp.asarray(input_pos, jnp.int32),
            config=config, layer_offset=offsets[i],
            first=(i == 0), last=(i == len(chunks) - 1), prefill=prefill,
        )
        new_caches.append(nc)
    return x, new_caches


@functools.partial(jax.jit, static_argnames=("temperature", "top_k", "top_p"))
def _sample_jit(rng, logits, temperature, top_k, top_p):
    return sample(rng, logits, temperature, top_k, top_p)


def generate_chunked(
    params: dict,
    config: Config,
    prompt: jnp.ndarray,  # [T] int32
    rng: jax.Array,
    *,
    max_returned_tokens: int,
    n_chunks: int = 2,
    max_seq_length: Optional[int] = None,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    eos_id: Optional[int] = None,
    cache_dtype: jnp.dtype = jnp.bfloat16,
) -> tuple[jnp.ndarray, int]:
    """``engine.generate`` semantics on the chunked executor (host loop).

    One host-side loop step per token; each step runs ``n_chunks`` programs.
    Use when the fused single-program engine cannot execute (oversized
    argument trees on relay runtimes) or when chunks live on separate
    meshes.
    """
    from parrot_tpu.generate.engine import _pad_to, prompt_bucket

    T = int(prompt.shape[0])
    R = max_returned_tokens
    S = min(max_seq_length or prompt_bucket(R, config.block_size), config.block_size)
    if T > S:
        raise ValueError(f"prompt length {T} exceeds the KV cache size {S}")
    Tb = prompt_bucket(T, S)

    chunks = split_params(params, n_chunks)
    caches = split_cache(KVCache.init(config, 1, S, dtype=cache_dtype), n_chunks)

    padded = _pad_to(prompt.astype(jnp.int32), Tb)[None, :]
    logits, caches = forward_cached_chunked(
        chunks, config, padded, caches, jnp.asarray(0, jnp.int32), prefill=True
    )
    rng, step_rng = jax.random.split(rng)
    tok = _sample_jit(step_rng, logits[0, T - 1], temperature, top_k, top_p)

    out = [int(t) for t in prompt]
    pos = T
    while pos < R:
        t = int(tok)
        out.append(t)
        if eos_id is not None and t == eos_id:
            break
        if len(out) >= R:
            break
        rng, step_rng = jax.random.split(rng)
        logits, caches = forward_cached_chunked(
            chunks, config, tok[None, None], caches, jnp.asarray(pos, jnp.int32)
        )
        tok = _sample_jit(step_rng, logits[0, -1], temperature, top_k, top_p)
        pos += 1
    tokens = jnp.asarray(out, jnp.int32)
    return tokens, len(out)
