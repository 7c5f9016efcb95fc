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


@pytest.mark.parametrize("groups", [8, 2, 1])
@pytest.mark.parametrize("causal", [True, False])
def test_flash_grad_matches_xla(groups, causal):
    """custom_vjp backward kernels vs autodiff through the XLA oracle."""
    B, T, N, H = 1, 512, 8, 64
    rng = jax.random.PRNGKey(2)
    kq, kk, kv, kg = jax.random.split(rng, 4)
    q = jax.random.normal(kq, (B, T, N, H))
    k = jax.random.normal(kk, (B, T, groups, H))
    v = jax.random.normal(kv, (B, T, groups, H))
    w = jax.random.normal(kg, (B, T, N, H))  # cotangent-shaping weights
    scale = 1.0 / np.sqrt(H)

    def loss(f):
        def inner(q, k, v):
            return jnp.sum(f(q, k, v, scale=scale, causal=causal) * w)
        return inner

    ref = jax.grad(loss(lambda *a, **kw: attention(*a, **kw)), argnums=(0, 1, 2))(
        q, k, v
    )
    got = jax.grad(loss(fa.flash_attention), argnums=(0, 1, 2))(q, k, v)
    for r, g, name in zip(ref, got, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=5e-2, atol=5e-2,
            err_msg=f"d{name} mismatch (groups={groups}, causal={causal})",
        )


def test_training_step_through_flash_path(monkeypatch):
    """VERDICT r2 #1: jax.grad through the full training forward with the
    flash dispatch forced on (interpret mode stands in for the TPU backend).
    This used to raise at trace time — flash had no backward rule."""
    from parrot_tpu.config import Config
    from parrot_tpu.models import gpt
    from parrot_tpu.training.train import loss_fn

    monkeypatch.setattr(fa, "use_flash", lambda t, h: t % fa.Q_TILE == 0 and h in (64, 128, 256))

    config = Config(
        name="flash-train-tiny", block_size=256, vocab_size=128,
        padded_vocab_size=128, n_layer=2, n_head=4, n_embd=256,
        n_query_groups=2, bias=False,
    )
    params = gpt.init_params(config, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 256), 0, 128)

    def loss(p):
        return loss_fn(p, config, tokens, tokens, remat=False)

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # and the grads must agree with the XLA attention path
    monkeypatch.setattr(fa, "use_flash", lambda t, h: False)
    ref = jax.grad(loss)(params)
    for a, b in zip(flat, jax.tree_util.tree_leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-2)


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
