"""Splash-style paged-attention kernel vs the XLA gather oracle (interpret
mode on CPU; on-chip A/B lives in scripts/benchmark_serving.py + PERF.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parrot_tpu.config import Config
from parrot_tpu.models import gpt, paged_kv
from parrot_tpu.ops import attention as attn_ops
from parrot_tpu.ops import paged_attention as pa


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pa, "_INTERPRET", True)


def _oracle(q, pool_k, pool_v, table, positions, scale, ks=None, vs=None):
    """The gather path exactly as gpt.attn_forward's paged branch runs it."""
    B = q.shape[0]
    ps = pool_k.shape[1]
    S = table.shape[1] * ps
    G, H = pool_k.shape[2], pool_k.shape[3]
    pt = jnp.maximum(table, 0)
    slots = jnp.arange(S)[None, :]
    visible = (slots <= positions[:, None]) | (positions[:, None] >= S)
    kw = {}
    if ks is not None:
        kw = dict(k_scale=ks[pt].reshape(B, S, G), v_scale=vs[pt].reshape(B, S, G))
        k = pool_k[pt].reshape(B, S, G, H)
        v = pool_v[pt].reshape(B, S, G, H)
    else:
        k = pool_k[pt].reshape(B, S, G, H).astype(q.dtype)
        v = pool_v[pt].reshape(B, S, G, H).astype(q.dtype)
    return attn_ops.attention(
        q[:, None], k, v, scale=scale, mask=visible[:, None, :], **kw
    )[:, 0]


def _rand_pool(key, P, ps, G, H, int8=False):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    if int8:
        pool_k = jax.random.randint(k1, (P, ps, G, H), -127, 128, jnp.int8)
        pool_v = jax.random.randint(k2, (P, ps, G, H), -127, 128, jnp.int8)
        ks = jax.random.uniform(k3, (P, ps, G), jnp.float32, 0.01, 0.03)
        vs = jax.random.uniform(k4, (P, ps, G), jnp.float32, 0.01, 0.03)
        return pool_k, pool_v, ks, vs
    pool_k = jax.random.normal(k1, (P, ps, G, H)) * 0.5
    pool_v = jax.random.normal(k2, (P, ps, G, H)) * 0.5
    return pool_k, pool_v, None, None


@pytest.mark.parametrize("int8", [False, True])
@pytest.mark.parametrize("G,n_head", [(1, 8), (2, 8), (4, 16)])
def test_kernel_matches_gather_oracle(int8, G, n_head):
    B, ps, n_pages, H, P = 3, 8, 4, 64, 16
    key = jax.random.PRNGKey(0)
    pool_k, pool_v, ks, vs = _rand_pool(key, P, ps, G, H, int8)
    q = jax.random.normal(jax.random.PRNGKey(1), (B, n_head, H)) * 0.5
    # ragged positions incl. a rolled window (pos >= S) and a fresh slot
    positions = jnp.asarray([5, ps * n_pages + 3, 0], jnp.int32)
    table = jnp.asarray([
        [3, 4, -1, -1],       # partially allocated
        [5, 6, 7, 8],         # fully allocated (rolled)
        [9, -1, -1, -1],      # fresh
    ], jnp.int32)
    scale = 1.0 / np.sqrt(H)
    want = _oracle(q, pool_k, pool_v, table, positions, scale, ks, vs)
    got = pa.paged_attention_decode(
        q, pool_k, pool_v, table, positions, scale=scale, k_scale=ks, v_scale=vs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_forward_decode_paged_kernel_matches_gather(monkeypatch):
    """End to end: forward_decode_paged with the fused kernel produces the
    same greedy tokens as the gather path."""
    from parrot_tpu.ops import quant_matmul

    config = Config(
        name="pat-tiny", block_size=64, vocab_size=64, padded_vocab_size=64,
        n_layer=2, n_head=2, n_embd=128,  # head_size 64
    )
    params = gpt.init_params(config, jax.random.PRNGKey(0))
    n_pages, ps = 5, 8

    def run(enabled):
        monkeypatch.setattr(pa, "ENABLED", enabled)
        cache = paged_kv.PagedKVCache.init(config, n_pages, ps, dtype=jnp.int8)
        table = jnp.asarray([[1, 2, -1, -1], [3, 4, -1, -1]], jnp.int32)
        toks = jnp.asarray([[5], [9]], jnp.int32)
        positions = jnp.asarray([0, 3], jnp.int32)
        out = []
        for _ in range(6):
            logits, cache = paged_kv.forward_decode_paged(
                params, config, toks, cache, table, positions)
            toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            positions = positions + 1
            out.append(np.asarray(toks)[:, 0].tolist())
        return out

    gather = run(False)
    fused = run(True)
    assert gather == fused, (gather, fused)


def test_use_kernel_gate():
    assert pa.use_kernel(True, 8, 64)
    assert pa.use_kernel(True, 64, 128)
    assert not pa.use_kernel(True, 6, 64)   # ragged page size
    assert not pa.use_kernel(True, 64, 80)  # odd head dim
