"""Adapter v1/v2 tests (reference analogue: tests/test_adapter.py,
test_adapter_v2.py — config equivalence with base model, filtered
checkpoint contents)."""

import jax
import jax.numpy as jnp
import numpy as np

from parrot_tpu.models import adapter, adapter_v2, gpt
from parrot_tpu.models.adapter import AdapterConfig
from parrot_tpu.utils import checkpoint

CFG = AdapterConfig(
    name="adapter-tiny",
    block_size=32,
    vocab_size=64,
    padded_vocab_size=64,
    n_layer=4,
    n_head=4,
    n_embd=32,
    rotary_percentage=0.25,
    adapter_prompt_length=5,
    adapter_start_layer=2,
)

TOKENS = jnp.asarray(np.random.RandomState(0).randint(0, 64, (2, 10)), jnp.int32)


def test_zero_gate_means_identity():
    base = gpt.init_params(CFG, jax.random.PRNGKey(0))
    with_adapter = adapter.add_adapter_params(CFG, base, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        np.asarray(gpt.forward(with_adapter, CFG, TOKENS)),
        np.asarray(gpt.forward(base, CFG, TOKENS)),
        atol=1e-6,
    )


def _open_gate(params):
    params = jax.tree.map(lambda x: x, params)
    ad = params["blocks"]["attn"]["adapter"]
    params["blocks"]["attn"]["adapter"] = {**ad, "gate": jnp.ones_like(ad["gate"])}
    return params


def test_open_gate_changes_output_only_for_active_layers():
    base = gpt.init_params(CFG, jax.random.PRNGKey(0))
    with_adapter = _open_gate(adapter.add_adapter_params(CFG, base, jax.random.PRNGKey(1)))
    out_base = gpt.forward(base, CFG, TOKENS)
    out_ad = gpt.forward(with_adapter, CFG, TOKENS)
    assert np.abs(np.asarray(out_ad) - np.asarray(out_base)).max() > 1e-4

    # start_layer beyond depth disables everything even with an open gate
    cfg_off = AdapterConfig(**{**CFG.to_dict(), "adapter_start_layer": CFG.n_layer})
    out_off = gpt.forward(with_adapter, cfg_off, TOKENS)
    np.testing.assert_allclose(np.asarray(out_off), np.asarray(out_base), atol=1e-6)


def test_adapter_cached_decode_matches_full():
    base = gpt.init_params(CFG, jax.random.PRNGKey(0))
    with_adapter = _open_gate(adapter.add_adapter_params(CFG, base, jax.random.PRNGKey(1)))
    full = gpt.forward(with_adapter, CFG, TOKENS)
    cache = gpt.KVCache.init(CFG, 2, 16, dtype=jnp.float32)
    logits, cache = gpt.forward_cached(with_adapter, CFG, TOKENS[:, :6], cache, jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :6]), rtol=1e-5, atol=1e-5)
    for t in range(6, 10):
        logits, cache = gpt.forward_cached(
            with_adapter, CFG, TOKENS[:, t : t + 1], cache, jnp.asarray(t)
        )
        np.testing.assert_allclose(
            np.asarray(logits[:, 0]), np.asarray(full[:, t]), rtol=1e-5, atol=1e-5
        )


def test_adapter_filter_and_mask():
    base = gpt.init_params(CFG, jax.random.PRNGKey(0))
    with_adapter = adapter.add_adapter_params(CFG, base, jax.random.PRNGKey(1))
    delta = checkpoint.filter_params(with_adapter, adapter.adapter_filter)
    flat, _ = checkpoint.flatten_params(delta)
    assert set(flat) == {"blocks.attn.adapter.wte", "blocks.attn.adapter.gate"}
    mask = adapter.adapter_trainable_mask(with_adapter)
    flat_mask, _ = checkpoint.flatten_params(mask)
    assert sum(bool(v) for v in flat_mask.values()) == 2


def test_adapter_v2_identity_and_filter():
    base = gpt.init_params(CFG, jax.random.PRNGKey(0))
    v2 = adapter_v2.add_adapter_v2_params(CFG, base, jax.random.PRNGKey(1))
    # scale=1, bias=0, gate=0: output unchanged
    np.testing.assert_allclose(
        np.asarray(gpt.forward(v2, CFG, TOKENS)),
        np.asarray(gpt.forward(base, CFG, TOKENS)),
        atol=1e-6,
    )
    # perturbing a scale changes the output
    v2b = jax.tree.map(lambda x: x, v2)
    g = v2b["blocks"]["mlp"]["proj"]
    v2b["blocks"]["mlp"]["proj"] = {**g, "adapter_scale": g["adapter_scale"] * 1.1}
    assert (
        np.abs(np.asarray(gpt.forward(v2b, CFG, TOKENS)) - np.asarray(gpt.forward(v2, CFG, TOKENS))).max()
        > 1e-4
    )
    # filter keeps adapter params AND norms (adapter_v2.py:12-25)
    delta = checkpoint.filter_params(v2, adapter_v2.adapter_v2_filter)
    flat, _ = checkpoint.flatten_params(delta)
    assert "blocks.norm_1.scale" in flat and "ln_f.scale" in flat
    assert "blocks.attn.qkv.adapter_scale" in flat
    assert "blocks.attn.qkv.w" not in flat
