"""Training-math tests: chunked CE equivalences, chunked lm_head loss."""

import jax
import jax.numpy as jnp
import numpy as np

from parrot_tpu.config import Config
from parrot_tpu.models import gpt
from parrot_tpu.ops.cross_entropy import chunked_cross_entropy, cross_entropy
from parrot_tpu.training import train

CFG = Config(
    name="train-tiny", block_size=64, vocab_size=64, padded_vocab_size=64,
    n_layer=2, n_head=2, n_embd=32,
)


def test_chunked_ce_matches_plain():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 50, 64), jnp.float32)
    targets = jnp.asarray(rng.randint(0, 64, (2, 50)), jnp.int32)
    targets = targets.at[0, :10].set(-1)  # some ignored positions
    plain = cross_entropy(logits, targets)
    for chunk in (7, 16, 50, 128):
        chunked = chunked_cross_entropy(logits, targets, chunk_size=chunk)
        np.testing.assert_allclose(float(chunked), float(plain), rtol=1e-6)


def test_lm_head_chunked_loss_matches_full():
    params = gpt.init_params(CFG, jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    batch = jnp.asarray(rng.randint(0, 64, (2, 33)), jnp.int32)
    labels = jnp.asarray(rng.randint(0, 64, (2, 33)), jnp.int32)
    full = train.loss_fn(params, CFG, batch, labels, remat=False)
    for chunk in (8, 16, 64):
        chunked = train.loss_fn(
            params, CFG, batch, labels, remat=False, lm_head_chunk_size=chunk
        )
        np.testing.assert_allclose(float(chunked), float(full), rtol=1e-5)

    # gradients must agree too
    g_full = jax.grad(lambda p: train.loss_fn(p, CFG, batch, labels, remat=False))(params)
    g_chunk = jax.grad(
        lambda p: train.loss_fn(p, CFG, batch, labels, remat=False, lm_head_chunk_size=16)
    )(params)
    np.testing.assert_allclose(
        np.asarray(g_full["lm_head"]["w"]), np.asarray(g_chunk["lm_head"]["w"]),
        rtol=1e-4, atol=1e-6,
    )


def test_prefill_flag_matches_masked_path():
    params = gpt.init_params(CFG, jax.random.PRNGKey(1))
    tokens = jnp.asarray(np.random.RandomState(2).randint(0, 64, (2, 10)), jnp.int32)
    cache_a = gpt.KVCache.init(CFG, 2, 16, dtype=jnp.float32)
    cache_b = gpt.KVCache.init(CFG, 2, 16, dtype=jnp.float32)
    la, ca = gpt.forward_cached(params, CFG, tokens, cache_a, jnp.asarray(0))
    lb, cb = gpt.forward_cached(params, CFG, tokens, cache_b, jnp.asarray(0), prefill=True)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ca.k), np.asarray(cb.k), rtol=1e-5, atol=1e-6)


def test_frozen_params_not_touched_by_optimizer():
    """PEFT: weight decay must not leak into frozen base weights — with a
    trainable_mask, non-trainable leaves must come out of a train step
    bit-identical (the reference passes only trainable params to AdamW)."""
    from parrot_tpu.models import lora as lora_lib
    from parrot_tpu.training import optim

    cfg = lora_lib.LoRAConfig(
        **CFG.to_dict(), r=4, alpha=8, dropout=0.0,
        to_query=True, to_value=True,
    )
    params = gpt.init_params(CFG, jax.random.PRNGKey(0))
    params = lora_lib.add_lora_params(cfg, params, jax.random.PRNGKey(1))
    mask = lora_lib.lora_trainable_mask(params)

    opt = optim.adamw(optim.warmup_constant(1e-2, 0), weight_decay=0.1)
    step = train.make_train_step(cfg, opt, trainable_mask=mask)
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, 64, (2, 32)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 64, (2, 32)), jnp.int32),
    }
    # several steps so the warmup schedule is past lr=0 and weight decay bites
    new_params, opt_state = params, step.optimizer.init(params)
    loss = None
    for _ in range(3):
        new_params, opt_state, loss = step(new_params, opt_state, batch)
    assert np.isfinite(float(loss))

    changed_lora = unchanged_frozen = True
    for (path, old), (_, new), (_, m) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(new_params),
        jax.tree_util.tree_leaves_with_path(mask),
    ):
        if m:
            changed_lora &= bool((np.asarray(old) != np.asarray(new)).any()) or old.size == 0
        else:
            unchanged_frozen &= bool((np.asarray(old) == np.asarray(new)).all())
    assert unchanged_frozen, "frozen leaves were modified by the optimizer"
