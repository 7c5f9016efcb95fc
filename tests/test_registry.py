"""Every registry entry must build a geometrically-consistent model.

``jax.eval_shape`` traces init + forward + cached decode without allocating,
so even the 70B configs validate in milliseconds — a sweep the reference
never does (its tests cover 4 families)."""

import jax
import jax.numpy as jnp
import pytest

from parrot_tpu.config import Config, name_to_config
from parrot_tpu.models import gpt


@pytest.mark.parametrize("name", sorted(name_to_config))
def test_registry_entry_traces(name):
    config = Config.from_name(name)
    assert config.n_embd % config.n_head == 0
    assert config.n_head % config.n_query_groups == 0
    assert config.rope_n_elem % 2 == 0, "rope dims must be even for rotate-half"

    params_shape = jax.eval_shape(
        lambda: gpt.init_params(config, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    )
    qkv = params_shape["blocks"]["attn"]["qkv"]["w"]
    assert qkv.shape == (config.n_layer, config.n_embd, config.qkv_out_size)

    idx = jax.ShapeDtypeStruct((1, 8), jnp.int32)
    logits = jax.eval_shape(lambda p, i: gpt.forward(p, config, i), params_shape, idx)
    assert logits.shape == (1, 8, config.padded_vocab_size)

    cache_shape = jax.eval_shape(
        lambda: gpt.KVCache.init(config, 1, 16, dtype=jnp.bfloat16)
    )
    tok = jax.ShapeDtypeStruct((1, 1), jnp.int32)
    pos = jax.ShapeDtypeStruct((), jnp.int32)
    out, new_cache = jax.eval_shape(
        lambda p, t, c, pp: gpt.forward_cached(p, config, t, c, pp),
        params_shape, tok, cache_shape, pos,
    )
    assert out.shape == (1, 1, config.padded_vocab_size)
    assert new_cache.k.shape == (
        config.n_layer, 1, 16, config.n_query_groups, config.head_size
    )


def test_registry_covers_reference_families():
    names = set(name_to_config)
    for required in (
        "stablelm-base-alpha-3b", "pythia-70m", "pythia-12b-deduped",
        "RedPajama-INCITE-Base-3B-v1", "falcon-7b", "falcon-40b-instruct",
        "open_llama_13b", "vicuna-33b-v1.3", "longchat-13b-16k",
        "Nous-Hermes-13b", "Llama-2-70b-chat-hf", "FreeWilly2",
    ):
        assert required in names, required
    assert len(names) >= 40
