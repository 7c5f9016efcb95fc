"""Flash attention kernel vs the XLA attention oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parrot_tpu.ops import flash_attention as fa
from parrot_tpu.ops.attention import attention


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(fa, "_INTERPRET", True)


@pytest.mark.parametrize("groups", [8, 2, 1])
@pytest.mark.parametrize("causal", [True, False])
def test_flash_matches_xla(groups, causal):
    B, T, N, H = 2, 512, 8, 64
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (B, T, N, H))
    k = jax.random.normal(kk, (B, T, groups, H))
    v = jax.random.normal(kv, (B, T, groups, H))
    scale = 1.0 / np.sqrt(H)

    expected = attention(q, k, v, scale=scale, causal=causal)
    actual = fa.flash_attention(q, k, v, scale=scale, causal=causal)
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(expected), rtol=2e-2, atol=2e-2
    )


def test_flash_multi_qtile_causality():
    """Tokens in a later q tile must not see later k tiles."""
    B, T, N, H = 1, 1024, 2, 64
    rng = jax.random.PRNGKey(1)
    q = jax.random.normal(rng, (B, T, N, H))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (B, T, N, H))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (B, T, N, H))
    scale = 1.0 / np.sqrt(H)
    full = fa.flash_attention(q, k, v, scale=scale, causal=True)
    # truncating the future must not change earlier outputs
    half = fa.flash_attention(
        q[:, :512], k[:, :512], v[:, :512], scale=scale, causal=True
    )
    np.testing.assert_allclose(
        np.asarray(full[:, :512]), np.asarray(half), rtol=2e-2, atol=2e-2
    )
