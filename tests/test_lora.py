"""LoRA tests (reference analogue: tests/test_lora.py — layer replacement,
merge semantics, filtered checkpoints)."""

import jax
import jax.numpy as jnp
import numpy as np

from parrot_tpu.models import gpt, lora
from parrot_tpu.models.lora import LoRAConfig
from parrot_tpu.training import optim, train
from parrot_tpu.utils import checkpoint

CFG = LoRAConfig(
    name="lora-tiny",
    block_size=32,
    vocab_size=64,
    padded_vocab_size=64,
    n_layer=2,
    n_head=4,
    n_query_groups=2,
    n_embd=32,
    intermediate_size=64,
    rotary_percentage=1.0,
    parallel_residual=False,
    bias=False,
    _norm_class="RMSNorm",
    _mlp_class="LLaMAMLP",
    r=4,
    alpha=8,
    to_query=True,
    to_key=False,
    to_value=True,
    to_projection=True,
    to_mlp=True,
    to_head=True,
)

TOKENS = jnp.asarray(np.random.RandomState(0).randint(0, 64, (2, 12)), jnp.int32)


def setup():
    base = gpt.init_params(CFG, jax.random.PRNGKey(0))
    with_lora = lora.add_lora_params(CFG, base, jax.random.PRNGKey(1))
    return base, with_lora


def test_zero_init_B_means_identity():
    base, with_lora = setup()
    expected = gpt.forward(base, CFG, TOKENS)
    actual = gpt.forward(with_lora, CFG, TOKENS)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), atol=1e-6)


def perturb(params):
    return jax.tree.map(
        lambda x: x + 0.01 if x.ndim and x.shape[-1] else x, params
    )


def test_nonzero_B_changes_output_and_merge_matches():
    _, with_lora = setup()
    # give every lora B a nonzero value
    def bump_lora(tree, path=""):
        if isinstance(tree, dict):
            return {
                k: (jax.tree.map(lambda x: x + 0.02, v) if k == "lora" else bump_lora(v))
                for k, v in tree.items()
            }
        return tree

    bumped = bump_lora(with_lora)
    base_out = gpt.forward(setup()[0], CFG, TOKENS)
    lora_out = gpt.forward(bumped, CFG, TOKENS)
    assert np.abs(np.asarray(lora_out) - np.asarray(base_out)).max() > 1e-3

    merged = lora.merge_lora_weights(CFG, bumped)
    flat, _ = checkpoint.flatten_params(merged)
    assert not any(".lora." in k for k in flat)
    merged_out = gpt.forward(merged, CFG, TOKENS)
    np.testing.assert_allclose(
        np.asarray(merged_out), np.asarray(lora_out), rtol=2e-4, atol=2e-5
    )


def test_cached_decode_applies_lora():
    _, with_lora = setup()

    def bump(tree):
        if isinstance(tree, dict):
            return {
                k: (jax.tree.map(lambda x: x + 0.02, v) if k == "lora" else bump(v))
                for k, v in tree.items()
            }
        return tree

    bumped = bump(with_lora)
    full = gpt.forward(bumped, CFG, TOKENS)
    cache = gpt.KVCache.init(CFG, 2, 16, dtype=jnp.float32)
    logits, _ = gpt.forward_cached(bumped, CFG, TOKENS, cache, jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full), rtol=1e-5, atol=1e-5)


def test_trainable_mask_and_filtered_checkpoint(tmp_path):
    base, with_lora = setup()
    mask = lora.lora_trainable_mask(with_lora)
    flat_mask, _ = checkpoint.flatten_params(mask)
    trainable = {k for k, v in flat_mask.items() if v}
    assert trainable and all(".lora." in k for k in trainable)

    # one masked train step leaves base weights untouched
    optimizer = optim.adamw(1e-2, weight_decay=0.0)  # constant lr: step 0 must move
    step = train.make_train_step(CFG, optimizer, trainable_mask=mask, remat=False)
    opt_state = step.optimizer.init(with_lora)
    batch = {"input_ids": TOKENS, "labels": TOKENS}
    new_params, _, loss = jax.jit(step)(with_lora, opt_state, batch)
    assert np.isfinite(float(loss))
    np.testing.assert_array_equal(
        np.asarray(new_params["blocks"]["attn"]["qkv"]["w"]),
        np.asarray(with_lora["blocks"]["attn"]["qkv"]["w"]),
    )
    # lora B must have moved
    assert (
        np.abs(np.asarray(new_params["blocks"]["attn"]["qkv"]["lora"]["q"]["b"])).max() > 0
    )

    # filtered save -> merge back over base
    delta = checkpoint.filter_params(new_params, lora.lora_filter)
    checkpoint.save_checkpoint(tmp_path / "lora.safetensors", delta)
    loaded = checkpoint.load_checkpoint(tmp_path / "lora.safetensors")
    rebuilt = checkpoint.merge_trees(lora.add_lora_params(CFG, base, jax.random.PRNGKey(1)), loaded)
    out_a = gpt.forward(new_params, CFG, TOKENS)
    out_b = gpt.forward(rebuilt, CFG, TOKENS)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a), atol=1e-6)


def test_dropout_path_runs():
    _, with_lora = setup()
    cfg = LoRAConfig(**{**CFG.to_dict(), "dropout": 0.5})
    out1 = gpt.forward(with_lora, cfg, TOKENS, dropout_rng=jax.random.PRNGKey(0))
    out2 = gpt.forward(with_lora, cfg, TOKENS, dropout_rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(np.asarray(out1)).all()
