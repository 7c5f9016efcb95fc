"""Layer-chunked decode executor: exact parity with the fused single-program
path (same scan, same rope, same mask — split only on the stacked axis)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parrot_tpu.config import Config
from parrot_tpu.generate import engine
from parrot_tpu.generate.chunked import (
    forward_cached_chunked, generate_chunked, split_cache, split_params,
)
from parrot_tpu.models import gpt
from parrot_tpu.models.gpt import KVCache

CFG = Config(
    name="chunk-tiny",
    block_size=64,
    vocab_size=96,
    padded_vocab_size=96,
    n_layer=5,
    n_head=4,
    n_query_groups=2,
    n_embd=32,
    intermediate_size=64,
    rotary_percentage=0.5,
    parallel_residual=True,
    bias=True,
    _norm_class="LayerNorm",
    _mlp_class="GptNeoxMLP",
)


@pytest.fixture(scope="module")
def params():
    return gpt.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)


PROMPT = jnp.asarray([[5, 11, 2, 7, 30, 1]], jnp.int32)


@pytest.mark.parametrize("n_chunks", [1, 2, 3, 5])
def test_prefill_and_decode_parity(params, n_chunks):
    cache = KVCache.init(CFG, 1, 32, dtype=jnp.float32)
    ref_logits, ref_cache = gpt.forward_cached(
        params, CFG, PROMPT, cache, jnp.asarray(0, jnp.int32), prefill=True
    )

    chunks = split_params(params, n_chunks)
    caches = split_cache(KVCache.init(CFG, 1, 32, dtype=jnp.float32), n_chunks)
    logits, caches = forward_cached_chunked(
        chunks, CFG, PROMPT, caches, jnp.asarray(0, jnp.int32), prefill=True
    )
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), rtol=2e-5)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(c.k) for c in caches]),
        np.asarray(ref_cache.k), rtol=2e-5, atol=1e-6,
    )

    # a few decode steps on top
    tok = jnp.argmax(ref_logits[:, -1:], -1).astype(jnp.int32)
    ref_tok = tok
    for i in range(4):
        ref_logits, ref_cache = gpt.forward_cached(
            params, CFG, ref_tok, ref_cache, jnp.asarray(6 + i, jnp.int32)
        )
        logits, caches = forward_cached_chunked(
            chunks, CFG, tok, caches, jnp.asarray(6 + i, jnp.int32)
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(ref_logits), rtol=2e-5, atol=1e-6
        )
        ref_tok = jnp.argmax(ref_logits[:, -1:], -1).astype(jnp.int32)
        tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
        assert int(tok[0, 0]) == int(ref_tok[0, 0])


def test_int8_kv_cache_parity(params):
    cache = KVCache.init(CFG, 1, 32, dtype=jnp.int8)
    ref_logits, _ = gpt.forward_cached(
        params, CFG, PROMPT, cache, jnp.asarray(0, jnp.int32), prefill=True
    )
    chunks = split_params(params, 2)
    caches = split_cache(KVCache.init(CFG, 1, 32, dtype=jnp.int8), 2)
    logits, _ = forward_cached_chunked(
        chunks, CFG, PROMPT, caches, jnp.asarray(0, jnp.int32), prefill=True
    )
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), rtol=2e-5)


def test_generate_chunked_matches_engine_greedy(params):
    prompt = PROMPT[0]
    ref_tokens, ref_len = engine.generate(
        params, CFG, prompt, jax.random.PRNGKey(1),
        max_returned_tokens=20, temperature=0.0, cache_dtype=jnp.float32,
    )
    tokens, length = generate_chunked(
        params, CFG, prompt, jax.random.PRNGKey(1),
        max_returned_tokens=20, n_chunks=2, temperature=0.0,
        cache_dtype=jnp.float32,
    )
    assert length == int(ref_len)
    np.testing.assert_array_equal(
        np.asarray(tokens)[:length], np.asarray(ref_tokens)[: int(ref_len)]
    )


def test_quantized_chunked_runs(params):
    from parrot_tpu.quantize.api import quantize_params

    qparams = quantize_params(params, CFG, "bnb.int8")
    tokens, length = generate_chunked(
        qparams, CFG, PROMPT[0], jax.random.PRNGKey(2),
        max_returned_tokens=14, n_chunks=2, temperature=0.0,
        cache_dtype=jnp.float32,
    )
    assert length >= 7
    toks = np.asarray(tokens)[:length]
    assert (toks >= 0).all() and (toks < 96).all()
