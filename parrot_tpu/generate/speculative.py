"""Speculative decoding: draft-model proposals verified by the target model.

Not in the reference (its decode is strictly one-token-at-a-time,
``generate/base.py:131-157``); on TPU this is close to free throughput:
single-stream decode is HBM-bound on the weight stream, so a (k+1)-token
verification pass through the target costs nearly the same wall clock as a
1-token step, and every accepted draft token is a decode step the target
never has to take. Measured on a v5e (PERF.md round 3): a k=4 round costs
1.26x one plain decode step all-in (tiny draft + verify + overhead), so
speedup = (1 + 4*acceptance)/1.26 — breakeven at ~6.5%% acceptance, 2x at
~40%%, 3x at ~65%%; the accept/commit machinery is validated on-chip at
acceptance 0.95 (draft==target control).

The whole loop is one jitted program, like ``engine.generate``:

1. draft ``k`` tokens autoregressively (tiny model, its own KV cache),
2. verify all ``k`` in ONE cached target forward over ``[cur, d_1..d_k]``,
3. accept the longest prefix by the standard speculative-sampling rule and
   take one extra token from the target distribution (the correction on
   rejection, the bonus on full acceptance),

so each round commits between 1 and ``k+1`` tokens with exactly one target
pass. Greedy (``temperature=0``) output is **bit-identical** to
``engine.generate`` greedy output of the target alone (tested); stochastic
sampling preserves the target distribution via leftover sampling
(`p' = normalize(max(p - q, 0))`, Leviathan et al., arXiv:2211.17192).

No cache rollback is needed on rejection: ``forward_cached`` masks cache
slots above the query position (``models/gpt.py:forward_cached``), and every
slot a rejected token dirtied is re-written by the next round's consumption
before any query can see it — the same invariant that makes bucketed prefill
sound (``engine.py`` module docstring).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from parrot_tpu.config import Config
from parrot_tpu.generate.engine import _pad_to, _prefill_jit, prompt_bucket
from parrot_tpu.models import gpt
from parrot_tpu.models.gpt import KVCache
from parrot_tpu.ops.sampling import sample, top_k_mask, top_p_mask


def _filtered_probs(
    logits: jnp.ndarray, temperature: float, top_k: Optional[int], top_p: Optional[float]
) -> jnp.ndarray:
    """The distribution ``sample()`` actually draws from, as probabilities."""
    lg = logits.astype(jnp.float32) / temperature
    if top_k is not None:
        lg = top_k_mask(lg, top_k)
    if top_p is not None and top_p < 1.0:
        lg = top_p_mask(lg, top_p)
    return jax.nn.softmax(lg, axis=-1)


def _round_core(
    params,
    config: Config,
    draft_params,
    draft_config: Config,
    cache_t,
    cache_d,
    pos: jnp.ndarray,  # scalar int32: buffer index of `cur` (not yet in caches)
    cur: jnp.ndarray,  # scalar int32: last committed-but-unprocessed token
    rng: jax.Array,
    limit: jnp.ndarray,  # scalar int32: max committed buffer length
    *,
    k: int,
    temperature: float,
    top_k: Optional[int],
    top_p: Optional[float],
    eos_id: Optional[int],
):
    """One speculative round: draft ``k``, verify in one target pass.

    Returns ``(commit, m, cur_next, cache_t, cache_d, rng, done)`` where
    ``commit[: m + 1]`` (``[cur] + drafts[:m]``) are the tokens committed at
    buffer positions ``pos .. pos + m`` and ``cur_next`` is the correction /
    bonus token to commit next round at ``pos + m + 1``.
    """
    iota_k = jnp.arange(k)

    # 1. draft k proposals autoregressively
    def draft_step(carry, _):
        cache_d, tok, p, rng = carry
        logits, cache_d = gpt.forward_cached(
            draft_params, draft_config, tok[None, None], cache_d, p
        )
        lg = logits[0, -1]
        rng, r = jax.random.split(rng)
        nxt = sample(r, lg, temperature, top_k, top_p)
        return (cache_d, nxt, p + 1, rng), (nxt, lg)

    (cache_d, _, _, rng), (drafts, q_logits) = lax.scan(
        draft_step, (cache_d, cur, pos, rng), None, length=k
    )

    # 2. one target pass verifies all k (+ produces the bonus logits)
    seq = jnp.concatenate([cur[None], drafts])  # [k+1]
    t_logits, cache_t = gpt.forward_cached(
        params, config, seq[None, :], cache_t, pos
    )
    t_logits = t_logits[0]  # [k+1, V]; row j predicts buffer index pos+j+1

    # 3. longest accepted prefix + one token from the target distribution
    rng, a_rng, r_rng = jax.random.split(rng, 3)
    if temperature == 0.0:
        t_choice = jnp.argmax(t_logits, axis=-1).astype(jnp.int32)  # [k+1]
        accept = drafts == t_choice[:k]
        m = jnp.sum(jnp.cumprod(accept.astype(jnp.int32)))
        cur_next = t_choice[m]  # correction at the mismatch, bonus at m==k
    else:
        p = _filtered_probs(t_logits, temperature, top_k, top_p)  # [k+1, V]
        q = _filtered_probs(q_logits, temperature, top_k, top_p)  # [k, V]
        u = jax.random.uniform(a_rng, (k,))
        p_d = p[iota_k, drafts]
        q_d = q[iota_k, drafts]
        accept = u * q_d < p_d
        m = jnp.sum(jnp.cumprod(accept.astype(jnp.int32)))
        # leftover distribution: max(p_m - q_m, 0); q row k is zero, so at
        # full acceptance this reduces to the plain target distribution
        q_pad = jnp.concatenate([q, jnp.zeros_like(q[:1])], axis=0)
        res = jnp.clip(jnp.take(p, m, axis=0) - jnp.take(q_pad, m, axis=0), 0.0)
        res = res / jnp.maximum(res.sum(), 1e-20)
        cur_next = jax.random.categorical(r_rng, jnp.log(res + 1e-20)).astype(jnp.int32)

    # EOS: a committed EOS ends the stream; nothing after it commits
    cur_is_eos = (cur == eos_id) if eos_id is not None else jnp.asarray(False)
    m = jnp.where(cur_is_eos, 0, m)
    if eos_id is not None:
        acc_eos = (drafts == eos_id) & (iota_k < m)
        hit = jnp.any(acc_eos)
        m = jnp.where(hit, jnp.argmax(acc_eos) + 1, m)
    else:
        hit = jnp.asarray(False)

    # never commit past the budget
    m = jnp.clip(m, 0, limit - pos - 1)

    done = cur_is_eos | hit
    commit = jnp.concatenate([cur[None], drafts])  # [k+1]
    return commit, m, cur_next, cache_t, cache_d, rng, done


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "draft_config", "k", "buf_size", "cache_size", "temperature",
        "top_k", "top_p", "eos_id", "cache_dtype",
    ),
)
def _speculative_padded(
    params,
    config: Config,
    draft_params,
    draft_config: Config,
    prompt: jnp.ndarray,  # [Tb] int32, right-padded to a bucket
    t_true: jnp.ndarray,  # scalar int32
    limit: jnp.ndarray,  # scalar int32
    rng: jax.Array,
    *,
    k: int,
    buf_size: int,
    cache_size: int,
    temperature: float,
    top_k: Optional[int],
    top_p: Optional[float],
    eos_id: Optional[int],
    cache_dtype: jnp.dtype,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    Tb = prompt.shape[0]

    cache_t = KVCache.init(config, 1, cache_size, dtype=cache_dtype)
    cache_d = KVCache.init(draft_config, 1, cache_size, dtype=cache_dtype)
    tokens = jnp.zeros((buf_size,), jnp.int32).at[:Tb].set(prompt)

    # prefill both models on the same (padded) prompt
    t_logits, cache_t = gpt.forward_cached(
        params, config, prompt[None, :], cache_t, jnp.asarray(0, jnp.int32), prefill=True
    )
    _, cache_d = gpt.forward_cached(
        draft_params, draft_config, prompt[None, :], cache_d,
        jnp.asarray(0, jnp.int32), prefill=True,
    )
    rng, step_rng = jax.random.split(rng)
    last = lax.dynamic_index_in_dim(t_logits[0], t_true - 1, axis=0, keepdims=False)
    cur = sample(step_rng, last, temperature, top_k, top_p)

    def cond(state):
        tokens, cache_t, cache_d, pos, cur, rng, done, stats = state
        return jnp.logical_and(pos < limit, jnp.logical_not(done))

    def body(state):
        tokens, cache_t, cache_d, pos, cur, rng, done, stats = state

        commit, m, cur_next, cache_t, cache_d, rng, round_done = _round_core(
            params, config, draft_params, draft_config, cache_t, cache_d,
            pos, cur, rng, limit,
            k=k, temperature=temperature, top_k=top_k, top_p=top_p, eos_id=eos_id,
        )

        # write cur + the m accepted drafts; reject-tail slots keep their
        # old buffer contents (so past-`length` positions stay zero)
        old = lax.dynamic_slice(tokens, (pos,), (k + 1,))
        window = jnp.where(jnp.arange(k + 1) <= m, commit, old)
        tokens = lax.dynamic_update_slice(tokens, window, (pos,))

        done = done | round_done
        stats = stats + jnp.asarray([m + 1, 1], jnp.int32)  # tokens, rounds
        return tokens, cache_t, cache_d, pos + 1 + m, cur_next, rng, done, stats

    state = (
        tokens, cache_t, cache_d, t_true.astype(jnp.int32), cur, rng,
        jnp.asarray(False), jnp.zeros((2,), jnp.int32),
    )
    tokens, _, _, pos, _, _, done, stats = lax.while_loop(cond, body, state)
    return tokens, pos, stats[0], stats[1]


def generate_speculative(
    params,
    config: Config,
    draft_params,
    draft_config: Config,
    prompt: jnp.ndarray,  # [T] int32
    rng: jax.Array,
    *,
    max_returned_tokens: int,
    k: int = 4,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    eos_id: Optional[int] = None,
    cache_dtype: jnp.dtype = jnp.bfloat16,
) -> tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Speculative counterpart of ``engine.generate``.

    Returns ``(tokens, length, stats)`` where tokens/length have exactly the
    ``engine.generate`` semantics and ``stats`` reports ``rounds`` (target
    passes) and ``tokens_committed`` — acceptance rate =
    ``(tokens_committed - rounds) / (rounds * k)``.

    Requires both models to share the tokenizer/vocab (asserted on the padded
    vocab size). Greedy output is bit-identical to the target decoding alone.
    """
    if config.padded_vocab_size != draft_config.padded_vocab_size:
        raise ValueError(
            f"draft vocab {draft_config.padded_vocab_size} != "
            f"target vocab {config.padded_vocab_size}; speculative decoding "
            "requires a shared tokenizer"
        )
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    T = int(prompt.shape[0])
    R = max_returned_tokens
    # cache/buffer carry up to k trailing in-flight slots past the budget
    S = min(prompt_bucket(R + k, config.block_size), config.block_size)
    if T > S or R + k > S:
        raise ValueError(f"prompt {T} + budget {R} + k {k} exceed cache size {S}")
    Tb = prompt_bucket(T, S)
    buf = max(prompt_bucket(R + k + 1, S + k + 1), Tb + k + 1)

    tokens, length, committed, rounds = _speculative_padded(
        params, config, draft_params, draft_config,
        _pad_to(prompt.astype(jnp.int32), Tb),
        jnp.asarray(T, jnp.int32), jnp.asarray(R, jnp.int32), rng,
        k=k, buf_size=buf, cache_size=S, temperature=temperature,
        top_k=top_k, top_p=top_p, eos_id=eos_id, cache_dtype=cache_dtype,
    )
    stats = {"rounds": int(rounds), "tokens_committed": int(committed)}
    return tokens[:R], length, stats


@functools.partial(
    jax.jit,
    static_argnames=("config", "draft_config", "k", "temperature", "top_k",
                     "top_p", "eos_id"),
    donate_argnums=(4, 5),  # caches: reuse HBM across rounds
)
def _spec_round_jit(
    params, config, draft_params, draft_config, cache_t, cache_d,
    pos, cur, rng, limit,
    *, k, temperature, top_k, top_p, eos_id,
):
    return _round_core(
        params, config, draft_params, draft_config, cache_t, cache_d,
        pos, cur, rng, limit,
        k=k, temperature=temperature, top_k=top_k, top_p=top_p, eos_id=eos_id,
    )


def generate_stream_speculative(
    params,
    config: Config,
    draft_params,
    draft_config: Config,
    prompt: jnp.ndarray,  # [T] int32
    rng: jax.Array,
    *,
    max_returned_tokens: int,
    k: int = 4,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    stop_tokens: tuple[tuple[int, ...], ...] = (),
    eos_id: Optional[int] = None,
    cache_dtype: jnp.dtype = jnp.bfloat16,
):
    """Speculative counterpart of ``engine.generate_stream`` (chat REPL).

    One jitted round (draft ``k`` + single verify pass) per host iteration,
    yielding the 1..k+1 tokens each round commits; stop sequences are
    withheld-until-disambiguated exactly like ``engine.generate_stream``
    (reference ``chat/base.py:62-85``). Greedy token stream is identical to
    the target streaming alone.
    """
    if config.padded_vocab_size != draft_config.padded_vocab_size:
        raise ValueError("speculative decoding requires a shared tokenizer")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    T = int(prompt.shape[0])
    R = max_returned_tokens
    S = min(prompt_bucket(R + k, config.block_size), config.block_size)
    if T > S or R + k > S:
        raise ValueError(f"prompt {T} + budget {R} + k {k} exceed cache size {S}")
    Tb = prompt_bucket(T, S)
    limit = jnp.asarray(R, jnp.int32)

    cache_t = KVCache.init(config, 1, S, dtype=cache_dtype)
    cache_d = KVCache.init(draft_config, 1, S, dtype=cache_dtype)
    padded = _pad_to(prompt.astype(jnp.int32), Tb)[None, :]
    t_logits, cache_t = _prefill_jit(
        params, config=config, idx=padded, cache=cache_t,
        input_pos=jnp.asarray(0, jnp.int32),
    )
    _, cache_d = _prefill_jit(
        draft_params, config=draft_config, idx=padded, cache=cache_d,
        input_pos=jnp.asarray(0, jnp.int32),
    )
    rng, step_rng = jax.random.split(rng)
    cur = sample(step_rng, t_logits[0, T - 1], temperature, top_k, top_p)

    def _tail_is_stop(buf: list[int]) -> bool:
        return any(len(buf) >= len(s) and tuple(buf[-len(s):]) == s for s in stop_tokens)

    def _is_stop_prefix(buf: list[int]) -> bool:
        return any(tuple(buf) == s[: len(buf)] for s in stop_tokens)

    buffer: list[int] = []
    pos = T
    while pos < R:
        commit, m, cur, cache_t, cache_d, rng, done = _spec_round_jit(
            params, config, draft_params, draft_config, cache_t, cache_d,
            jnp.asarray(pos, jnp.int32), cur, rng, limit,
            k=k, temperature=temperature, top_k=top_k, top_p=top_p, eos_id=eos_id,
        )
        n_commit = int(m) + 1
        for tok in [int(t) for t in commit[:n_commit]]:
            buffer.append(tok)
            if _tail_is_stop(buffer):
                return
            while buffer and not _is_stop_prefix(buffer):
                yield buffer.pop(0)
        pos += n_commit
        if bool(done):
            return
    yield from buffer
