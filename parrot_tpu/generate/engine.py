"""Autoregressive generation engine.

The reference generates with a per-token Python loop that re-enters the model
(and, on XLA, forces a graph break every step — ``generate/base.py:131-157``).
Here the whole decode runs inside one jitted program: prefill consumes the
prompt, then a ``lax.while_loop`` takes single-token steps against the
functional KV cache, sampling on-device and early-exiting on EOS.

**Bucketed compilation**: prompts are right-padded to power-of-two length
buckets and the true length travels as a dynamic scalar, so the number of
compiled programs is O(log block_size), not O(#distinct prompt lengths) — the
discipline the reference applies to finetuning on XLA ("pad to fixed shapes
to avoid recompilation", ``finetune/full.py:247-248``) extended to serving.
Padding is sound because prefill attention is causal (logits at the true last
token never see the pad tail) and decode masks cache slots above the current
position, so pad-slot garbage K/V is overwritten before it ever becomes
visible.

``generate_stream`` covers the chat use case (``chat/base.py:49-95``): it
yields tokens as they are produced by stepping a jitted single-token function
from Python, with multi-token stop-sequence detection handled host-side. All
jitted entry points live at module level so repeated calls (chat turns) reuse
the compiled programs.
"""

from __future__ import annotations

import functools
from typing import Iterator, Optional

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax

from parrot_tpu.config import Config
from parrot_tpu.models import gpt
from parrot_tpu.models.gpt import KVCache
from parrot_tpu.ops.sampling import sample

_BUCKET_MIN = 16


def prompt_bucket(t: int, cap: int) -> int:
    """Smallest power-of-two bucket >= t (floor _BUCKET_MIN), capped at cap."""
    b = _BUCKET_MIN
    while b < t:
        b *= 2
    return min(b, cap)


def _pad_to(x: jnp.ndarray, n: int, axis: int = 0) -> jnp.ndarray:
    """Right-pad to ``n`` along ``axis``.

    Concrete (non-tracer) inputs pad on the HOST: an eager ``jnp.pad``
    compiles one tiny program per distinct input length — ~0.5 s each on the
    relay backend (measured; serving admissions were paying it per request,
    dwarfing the 8 ms prefill itself). The jitted entry points then see only
    bucketed shapes. Tracers (in-jit use) keep ``jnp.pad``."""
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    if isinstance(x, jax.core.Tracer):
        return jnp.pad(x, widths)
    return np.pad(np.asarray(x), widths)


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "buf_size", "cache_size", "temperature", "top_k", "top_p",
        "eos_id", "cache_dtype",
    ),
)
def _generate_padded(
    params,
    config: Config,
    prompt: jnp.ndarray,  # [Tb] int32, right-padded to a bucket
    t_true: jnp.ndarray,  # scalar int32: true prompt length
    limit: jnp.ndarray,  # scalar int32: stop once `length` reaches this
    rng: jax.Array,
    *,
    buf_size: int,
    cache_size: int,
    temperature: float,
    top_k: Optional[int],
    top_p: Optional[float],
    eos_id: Optional[int],
    cache_dtype: jnp.dtype,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    Tb = prompt.shape[0]
    R = buf_size

    cache = KVCache.init(config, 1, cache_size, dtype=cache_dtype)
    tokens = jnp.zeros((R,), jnp.int32).at[:Tb].set(prompt)

    # prefill (flash-eligible causal attention path); pad-position K/V stays
    # masked during decode until overwritten
    logits, cache = gpt.forward_cached(
        params, config, prompt[None, :], cache, jnp.asarray(0, jnp.int32), prefill=True
    )
    rng, step_rng = jax.random.split(rng)
    last = lax.dynamic_index_in_dim(logits[0], t_true - 1, axis=0, keepdims=False)
    next_tok = sample(step_rng, last, temperature, top_k, top_p)

    def cond(state):
        tokens, cache, pos, cur, rng, done = state
        return jnp.logical_and(pos < limit, jnp.logical_not(done))

    def body(state):
        tokens, cache, pos, cur, rng, done = state
        tokens = lax.dynamic_update_slice(tokens, cur[None], (pos,))
        is_eos = (cur == eos_id) if eos_id is not None else jnp.asarray(False)
        logits, cache = gpt.forward_cached(
            params, config, cur[None, None], cache, pos
        )
        rng, step_rng = jax.random.split(rng)
        nxt = sample(step_rng, logits[0, -1], temperature, top_k, top_p)
        return (tokens, cache, pos + 1, nxt, rng, is_eos)

    state = (tokens, cache, t_true.astype(jnp.int32), next_tok, rng, jnp.asarray(False))
    tokens, _, pos, _, _, done = lax.while_loop(cond, body, state)
    # `pos` counts tokens written; EOS (when hit) is included in the buffer
    return tokens, pos


def generate(
    params,
    config: Config,
    prompt: jnp.ndarray,  # [T] int32
    rng: jax.Array,
    *,
    max_returned_tokens: int,
    max_seq_length: Optional[int] = None,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    eos_id: Optional[int] = None,
    cache_dtype: jnp.dtype = jnp.bfloat16,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Generate up to ``max_returned_tokens - T`` tokens after the prompt.

    Returns ``(tokens, length)``: a fixed-size ``[max_returned_tokens]``
    buffer (positions past ``length`` hold the pad value 0) and the number of
    valid tokens including the prompt and any EOS. Mirrors
    ``generate/base.py:92-159`` semantics, entirely on device; compiles once
    per (prompt bucket, budget bucket), not per prompt length.
    """
    T = int(prompt.shape[0])
    R = max_returned_tokens
    if max_seq_length is None:
        # bucket the cache size too: otherwise S tracks R = T + max_new and
        # every prompt length still recompiles through the cache shape
        S = min(prompt_bucket(R, config.block_size), config.block_size)
    else:
        S = min(max_seq_length, config.block_size)
    if T > S:
        raise ValueError(
            f"prompt length {T} exceeds the KV cache size {S} "
            f"(max_seq_length={max_seq_length}, block_size={config.block_size})"
        )
    Tb = prompt_bucket(T, S)
    buf = max(prompt_bucket(R, max(R, Tb)), Tb)

    tokens, length = _generate_padded(
        params, config, _pad_to(prompt.astype(jnp.int32), Tb),
        jnp.asarray(T, jnp.int32), jnp.asarray(R, jnp.int32), rng,
        buf_size=buf, cache_size=S, temperature=temperature, top_k=top_k,
        top_p=top_p, eos_id=eos_id, cache_dtype=cache_dtype,
    )
    return tokens[:R], length


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "buf_size", "cache_size", "temperature", "top_k", "top_p",
        "eos_id", "cache_dtype",
    ),
)
def _generate_batch_padded(
    params,
    config: Config,
    prompts: jnp.ndarray,  # [B, Tb] int32, right-padded
    prompt_lengths: jnp.ndarray,  # [B] int32
    limit: jnp.ndarray,  # scalar int32: per-sequence total-token budget
    rng: jax.Array,
    *,
    buf_size: int,
    cache_size: int,
    temperature: float,
    top_k: Optional[int],
    top_p: Optional[float],
    eos_id: Optional[int],
    cache_dtype: jnp.dtype,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    B, Tb = prompts.shape
    R = buf_size

    cache = KVCache.init(config, B, cache_size, dtype=cache_dtype)
    tokens = jnp.zeros((B, R), jnp.int32)
    tokens = lax.dynamic_update_slice(tokens, prompts, (0, 0))

    # prefill all prompts together; pad positions write garbage K/V that
    # stays masked (slot >= length) until overwritten by decode
    logits, cache = gpt.forward_cached(
        params, config, prompts, cache, jnp.asarray(0, jnp.int32), prefill=True
    )
    # each sequence's first step conditions on its own last prompt token
    last = jnp.take_along_axis(
        logits, (prompt_lengths - 1)[:, None, None], axis=1
    )[:, 0]  # [B, V]
    rng, step_rng = jax.random.split(rng)
    cur = sample(step_rng, last, temperature, top_k, top_p)  # [B]

    def cond(state):
        tokens, cache, lengths, cur, rng, done = state
        return jnp.logical_and(jnp.any(~done), jnp.min(lengths) < limit)

    def body(state):
        tokens, cache, lengths, cur, rng, done = state
        can_write = (~done) & (lengths < limit)
        write_pos = jnp.clip(lengths, 0, R - 1)
        new_vals = jnp.where(can_write, cur, tokens[jnp.arange(B), write_pos])
        tokens = tokens.at[jnp.arange(B), write_pos].set(new_vals)
        is_eos = (cur == eos_id) if eos_id is not None else jnp.zeros((B,), bool)
        done = done | (can_write & is_eos)
        lengths = jnp.where(can_write, lengths + 1, lengths)
        done = done | (lengths >= limit)

        logits, cache = gpt.forward_decode_batched(
            params, config, cur[:, None], cache, jnp.minimum(lengths - 1, R - 1)
        )
        rng, step_rng = jax.random.split(rng)
        nxt = sample(step_rng, logits[:, 0], temperature, top_k, top_p)
        return tokens, cache, lengths, nxt, rng, done

    state = (tokens, cache, prompt_lengths.astype(jnp.int32), cur, rng,
             jnp.zeros((B,), bool))
    tokens, _, lengths, _, _, _ = lax.while_loop(cond, body, state)
    return tokens, lengths


def generate_batch(
    params,
    config: Config,
    prompts: jnp.ndarray,  # [B, T_max] int32, right-padded
    prompt_lengths: jnp.ndarray,  # [B] int32
    rng: jax.Array,
    *,
    max_returned_tokens: int,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    eos_id: Optional[int] = None,
    cache_dtype: jnp.dtype = jnp.bfloat16,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched ragged generation: B prompts of different lengths decode in
    lock-step, each at its own position, with per-sequence EOS retirement —
    the static-batch core of continuous batching. (The reference generates
    batch-size 1 only, ``generate/base.py:92-159``.)

    Returns ``(tokens [B, max_returned_tokens], lengths [B])``; each row holds
    its prompt then its generation (incl. EOS when hit). Compiles once per
    (batch, prompt bucket, budget bucket).
    """
    B, T_max = prompts.shape
    R = max_returned_tokens
    S = min(prompt_bucket(R, config.block_size), config.block_size)
    Tb = prompt_bucket(T_max, S)
    buf = max(prompt_bucket(R, max(R, Tb)), Tb)

    tokens, lengths = _generate_batch_padded(
        params, config, _pad_to(prompts.astype(jnp.int32), Tb, axis=1),
        prompt_lengths.astype(jnp.int32), jnp.asarray(R, jnp.int32), rng,
        buf_size=buf, cache_size=S, temperature=temperature, top_k=top_k,
        top_p=top_p, eos_id=eos_id, cache_dtype=cache_dtype,
    )
    return tokens[:, :R], lengths


# module-level jits: chat turns and repeated stream calls reuse the compiled
# prefill/decode programs instead of re-jitting per call
_prefill_jit = jax.jit(
    functools.partial(gpt.forward_cached, prefill=True), static_argnames=("config",)
)


@functools.partial(
    jax.jit,
    static_argnames=("config", "temperature", "top_k", "top_p"),
    donate_argnums=(2,),  # reuse the cache buffers in place
)
def _decode_step(params, tok, cache, pos, rng, *, config, temperature, top_k, top_p=None):
    logits, cache = gpt.forward_cached(params, config, tok[None, None], cache, pos)
    nxt = sample(rng, logits[0, -1], temperature, top_k, top_p)
    return nxt, cache


@functools.partial(
    jax.jit,
    static_argnames=("config", "n_steps", "temperature", "top_k", "top_p"),
    donate_argnums=(2,),
)
def decode_steps(
    params, tok, cache, pos, rng, *, config, n_steps, temperature, top_k, top_p=None
):
    """Take ``n_steps`` sampled decode steps in ONE dispatched program.

    A ``lax.scan`` over single-token steps: same numerics as calling
    ``_decode_step`` ``n_steps`` times, but one host dispatch per chunk and
    the RNG chain advances on device (no per-token host splits).

    When to use it: when the host is dispatch-bound (slow host, many models
    per host) or the caller needs tokens in chunks anyway. When NOT to: a
    caller that syncs after every chunk on a remote-runtime backend — async
    per-token dispatches pipeline (the host runs ahead of the device), while
    each sync drains the pipeline at a full round-trip (~25 ms on the axon
    relay); the round-2 A/B measured chunked-with-sync 24% slower than
    pipelined per-token (PERF.md). ``ServingEngine.step_burst`` is the win
    case: it replaces a *mandatory* per-token sync with one per burst.

    Returns ``(toks [n_steps], cache, rng)``; ``toks[-1]`` is the next input
    token. The reference has no analogue (its Python loop is per-token,
    ``generate/base.py:131-157``).
    """

    def body(carry, _):
        tok, cache, pos, rng = carry
        logits, cache = gpt.forward_cached(params, config, tok[None, None], cache, pos)
        rng, step_rng = jax.random.split(rng)
        nxt = sample(step_rng, logits[0, -1], temperature, top_k, top_p)
        return (nxt, cache, pos + 1, rng), nxt

    (tok, cache, pos, rng), toks = lax.scan(
        body, (tok, cache, pos.astype(jnp.int32), rng), None, length=n_steps
    )
    return toks, cache, rng


def generate_stream(
    params,
    config: Config,
    prompt: jnp.ndarray,  # [T] int32
    rng: jax.Array,
    *,
    max_returned_tokens: int,
    max_seq_length: Optional[int] = None,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    stop_tokens: tuple[tuple[int, ...], ...] = (),
    cache_dtype: jnp.dtype = jnp.bfloat16,
    burst: int = 1,
) -> Iterator[int]:
    """Yield generated token ids one at a time (streaming chat).

    Stops at ``max_returned_tokens`` or when any of the ``stop_tokens``
    sequences is produced; the stop sequence itself is not yielded (buffered
    until disambiguated, as in ``chat/base.py:62-85``). The prefill is
    prompt-bucketed and the decode step is shared across calls, so a second
    chat turn of any length pays zero compilation.

    ``burst > 1`` generates that many tokens per device round-trip
    (``decode_steps``) and yields them as they arrive host-side — on
    remote-runtime backends the per-token host sync costs a full round-trip
    (~25 ms on the relay; PERF.md round-2 A/B), so bursting multiplies
    streaming throughput at the cost of ``burst``-token output granularity.
    Greedy output is identical to ``burst=1``; sampled output differs only
    in RNG schedule (device-chained vs host splits). Tokens generated past
    a stop sequence inside a burst are dropped before yielding.
    """
    T = int(prompt.shape[0])
    R = max_returned_tokens
    if max_seq_length is None:
        S = min(prompt_bucket(R, config.block_size), config.block_size)
    else:
        S = min(max_seq_length, config.block_size)
    if T > S:
        raise ValueError(f"prompt length {T} exceeds the KV cache size {S}")
    Tb = prompt_bucket(T, S)

    cache = KVCache.init(config, 1, S, dtype=cache_dtype)
    logits, cache = _prefill_jit(
        params, config, _pad_to(prompt.astype(jnp.int32), Tb)[None, :], cache,
        jnp.asarray(0, jnp.int32),
    )
    rng, step_rng = jax.random.split(rng)
    # T is a host int: indexing the concrete logits costs a slice, no compile
    tok = sample(step_rng, logits[0, T - 1], temperature, top_k, top_p)

    def _tail_is_stop(buf: list[int]) -> bool:
        return any(len(buf) >= len(s) and tuple(buf[-len(s):]) == s for s in stop_tokens)

    def _is_stop_prefix(buf: list[int]) -> bool:
        return any(tuple(buf) == s[: len(buf)] for s in stop_tokens)

    # `buffer` always holds the withheld tail that might still complete a stop
    # sequence; everything else has been yielded (chat/base.py:62-85 pattern)
    buffer: list[int] = []
    if burst > 1:
        import numpy as np

        needed = R - T  # tokens to produce, incl. any withheld stop tail
        host_q = [int(tok)]  # first token from prefill (this sync IS TTFT)
        dev_pos = T  # device decode position; runs ahead of emission
        produced = 0
        while produced < needed:
            if not host_q:
                toks_b, cache, rng = decode_steps(
                    params, tok, cache, jnp.asarray(dev_pos, jnp.int32), rng,
                    config=config, n_steps=burst, temperature=temperature,
                    top_k=top_k, top_p=top_p,
                )
                tok = toks_b[-1]
                dev_pos += burst
                host_q = [int(t) for t in np.asarray(toks_b)]  # one sync/burst
            buffer.append(host_q.pop(0))
            produced += 1
            if _tail_is_stop(buffer):
                return  # tokens already decoded past the stop are dropped
            while buffer and not _is_stop_prefix(buffer):
                yield buffer.pop(0)
        yield from buffer
        return
    pos = T
    while pos < R:
        buffer.append(int(tok))
        if _tail_is_stop(buffer):
            return
        while buffer and not _is_stop_prefix(buffer):
            yield buffer.pop(0)
        rng, step_rng = jax.random.split(rng)
        tok, cache = _decode_step(
            params, tok, cache, jnp.asarray(pos, jnp.int32), step_rng,
            config=config, temperature=temperature, top_k=top_k, top_p=top_p,
        )
        pos += 1
    # ran out of budget: nothing withheld can complete a stop sequence anymore
    yield from buffer
