"""Numerical parity vs HuggingFace implementations (reference test strategy:
``tests/test_model.py:16-209`` checks lit-gpt against HF GPT-NeoX, Falcon,
OpenLLaMA and Llama-2). Here the HF models are built locally with tiny configs
and random weights — no network — and fed through the real checkpoint
converter, so these tests cover both the model math and the weight maps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from parrot_tpu.config import Config
from parrot_tpu.models import gpt
from parrot_tpu.utils.hf_convert import convert_hf_state_dict


def hf_state_numpy(model) -> dict:
    return {k: v.detach().to(torch.float32).numpy() for k, v in model.state_dict().items()}


def run_parrot(config, params, tokens):
    logits = gpt.forward(params, config, jnp.asarray(tokens, jnp.int32))
    return np.asarray(logits, np.float32)


@pytest.mark.parametrize("rotary_pct", [0.25, 1.0])
@pytest.mark.parametrize("parallel_residual", [True, False])
def test_gpt_neox_parity(rotary_pct, parallel_residual):
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    torch.manual_seed(0)
    hf_config = GPTNeoXConfig(
        vocab_size=128,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=256,
        max_position_embeddings=64,
        rotary_pct=rotary_pct,
        use_parallel_residual=parallel_residual,
        layer_norm_eps=1e-5,
        use_cache=False,
    )
    hf_model = GPTNeoXForCausalLM(hf_config).eval()

    config = Config(
        name="neox-tiny",
        block_size=64,
        vocab_size=128,
        padded_vocab_size=128,
        n_layer=3,
        n_head=4,
        n_embd=64,
        rotary_percentage=rotary_pct,
        parallel_residual=parallel_residual,
        norm_eps=1e-5,
    )
    params = convert_hf_state_dict(config, iter([hf_state_numpy(hf_model)]))

    tokens = np.random.RandomState(1).randint(0, 128, size=(2, 17))
    with torch.no_grad():
        expected = hf_model(torch.tensor(tokens)).logits.numpy()
    actual = run_parrot(config, params, tokens)
    np.testing.assert_allclose(actual, expected, rtol=1e-4, atol=2e-4)


@pytest.mark.parametrize("n_query_groups", [4, 2, 1])
def test_llama_parity(n_query_groups):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf_config = LlamaConfig(
        vocab_size=96,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=n_query_groups,
        intermediate_size=112,
        max_position_embeddings=64,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        use_cache=False,
    )
    hf_model = LlamaForCausalLM(hf_config).eval()

    config = Config(
        name="llama-tiny",
        block_size=64,
        vocab_size=96,
        padded_vocab_size=96,
        n_layer=2,
        n_head=4,
        n_embd=64,
        n_query_groups=n_query_groups,
        rotary_percentage=1.0,
        parallel_residual=False,
        bias=False,
        _norm_class="RMSNorm",
        norm_eps=1e-6,
        _mlp_class="LLaMAMLP",
        intermediate_size=112,
    )
    params = convert_hf_state_dict(config, iter([hf_state_numpy(hf_model)]))

    tokens = np.random.RandomState(2).randint(0, 96, size=(2, 11))
    with torch.no_grad():
        expected = hf_model(torch.tensor(tokens)).logits.numpy()
    actual = run_parrot(config, params, tokens)
    np.testing.assert_allclose(actual, expected, rtol=1e-4, atol=2e-4)


def test_falcon_parity():
    from transformers import FalconConfig, FalconForCausalLM

    torch.manual_seed(0)
    hf_config = FalconConfig(
        vocab_size=128,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        bias=False,
        new_decoder_architecture=False,
        multi_query=True,
        parallel_attn=True,
        alibi=False,
        layer_norm_epsilon=1e-5,
        use_cache=False,
    )
    hf_model = FalconForCausalLM(hf_config).eval()

    # falcon-7b-style: MQA + shared attention norm; the "falcon" substring in
    # the name selects the falcon weight map (as in the reference converter)
    config = Config(
        name="falcon-tiny",
        block_size=64,
        vocab_size=128,
        padded_vocab_size=128,
        n_layer=2,
        n_head=4,
        n_embd=64,
        rotary_percentage=1.0,
        parallel_residual=True,
        n_query_groups=1,
        bias=False,
        shared_attention_norm=True,
        norm_eps=1e-5,
    )
    params = convert_hf_state_dict(config, iter([hf_state_numpy(hf_model)]))

    tokens = np.random.RandomState(3).randint(0, 128, size=(2, 9))
    with torch.no_grad():
        expected = hf_model(torch.tensor(tokens)).logits.numpy()
    actual = run_parrot(config, params, tokens)
    np.testing.assert_allclose(actual, expected, rtol=1e-4, atol=2e-4)


def test_falcon_40b_style_parity():
    """falcon-40b architecture: GQA + parallel residual with separate attn/mlp
    norms (new_decoder_architecture)."""
    from transformers import FalconConfig, FalconForCausalLM

    torch.manual_seed(0)
    hf_config = FalconConfig(
        vocab_size=128,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_kv_heads=2,
        bias=False,
        new_decoder_architecture=True,
        alibi=False,
        layer_norm_epsilon=1e-5,
        use_cache=False,
    )
    hf_model = FalconForCausalLM(hf_config).eval()

    config = Config(
        name="falcon-tiny-40b",
        block_size=64,
        vocab_size=128,
        padded_vocab_size=128,
        n_layer=2,
        n_head=8,
        n_embd=64,
        rotary_percentage=1.0,
        parallel_residual=True,
        n_query_groups=2,
        bias=False,
        norm_eps=1e-5,
    )
    params = convert_hf_state_dict(config, iter([hf_state_numpy(hf_model)]))

    tokens = np.random.RandomState(7).randint(0, 128, size=(2, 9))
    with torch.no_grad():
        expected = hf_model(torch.tensor(tokens)).logits.numpy()
    actual = run_parrot(config, params, tokens)
    np.testing.assert_allclose(actual, expected, rtol=1e-4, atol=2e-4)


def test_kv_cache_decode_matches_full_forward():
    """Reference invariant (``tests/test_model.py:228-259``): decoding with the
    kv cache must reproduce the full-context logits."""
    config = Config(
        name="tiny",
        block_size=32,
        vocab_size=64,
        padded_vocab_size=64,
        n_layer=2,
        n_head=4,
        n_embd=32,
        rotary_percentage=0.5,
        parallel_residual=True,
    )
    params = gpt.init_params(config, jax.random.PRNGKey(0))
    tokens = np.random.RandomState(4).randint(0, 64, size=(1, 20))

    full_logits = gpt.forward(params, config, jnp.asarray(tokens, jnp.int32))

    T_prompt = 8
    cache = gpt.KVCache.init(config, batch_size=1, max_seq_length=32, dtype=jnp.float32)
    logits, cache = gpt.forward_cached(
        params, config, jnp.asarray(tokens[:, :T_prompt], jnp.int32), cache,
        jnp.asarray(0, jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full_logits[:, :T_prompt]), rtol=1e-5, atol=1e-5
    )
    for t in range(T_prompt, tokens.shape[1]):
        logits, cache = gpt.forward_cached(
            params, config, jnp.asarray(tokens[:, t : t + 1], jnp.int32), cache,
            jnp.asarray(t, jnp.int32),
        )
        np.testing.assert_allclose(
            np.asarray(logits[:, 0]), np.asarray(full_logits[:, t]), rtol=1e-5, atol=1e-5
        )


def test_int8_kv_cache_close_to_fp():
    """INT8 KV cache decode must track the fp cache closely (north-star
    feature; no reference counterpart)."""
    config = Config(
        name="tiny",
        block_size=32,
        vocab_size=64,
        padded_vocab_size=64,
        n_layer=2,
        n_head=4,
        n_query_groups=2,
        n_embd=32,
        rotary_percentage=1.0,
    )
    params = gpt.init_params(config, jax.random.PRNGKey(2))
    tokens = np.random.RandomState(6).randint(0, 64, size=(2, 12))

    fp_cache = gpt.KVCache.init(config, 2, 16, dtype=jnp.float32)
    q_cache = gpt.KVCache.init(config, 2, 16, dtype=jnp.int8)
    assert q_cache.quantized and q_cache.k.dtype == jnp.int8

    fp_logits, fp_cache = gpt.forward_cached(
        params, config, jnp.asarray(tokens[:, :8], jnp.int32), fp_cache, jnp.asarray(0)
    )
    q_logits, q_cache = gpt.forward_cached(
        params, config, jnp.asarray(tokens[:, :8], jnp.int32), q_cache, jnp.asarray(0)
    )
    scale = np.abs(np.asarray(fp_logits)).max()
    np.testing.assert_allclose(
        np.asarray(q_logits) / scale, np.asarray(fp_logits) / scale, atol=0.02
    )
    for t in range(8, 12):
        fp_logits, fp_cache = gpt.forward_cached(
            params, config, jnp.asarray(tokens[:, t:t+1], jnp.int32), fp_cache, jnp.asarray(t)
        )
        q_logits, q_cache = gpt.forward_cached(
            params, config, jnp.asarray(tokens[:, t:t+1], jnp.int32), q_cache, jnp.asarray(t)
        )
    np.testing.assert_allclose(
        np.asarray(q_logits) / scale, np.asarray(fp_logits) / scale, atol=0.03
    )


def test_rolling_window_matches_truncated_recompute():
    """Once positions exceed the cache size, logits must equal a full forward
    over the *last S tokens at their absolute positions* (the reference's
    rolling-window semantics via torch.roll, ``model.py:238-242``)."""
    config = Config(
        name="tiny",
        block_size=64,
        vocab_size=64,
        padded_vocab_size=64,
        n_layer=2,
        n_head=2,
        n_embd=32,
        rotary_percentage=1.0,
    )
    params = gpt.init_params(config, jax.random.PRNGKey(1))
    S = 8
    tokens = np.random.RandomState(5).randint(0, 64, size=(1, 14))

    # sliding-window full forward is the mathematical reference for rolling
    # decode: each token attends to exactly its last S predecessors
    ref_logits = gpt.forward(params, config, jnp.asarray(tokens, jnp.int32), window=S)

    cache = gpt.KVCache.init(config, 1, S, dtype=jnp.float32)
    for t in range(tokens.shape[1]):
        logits, cache = gpt.forward_cached(
            params, config, jnp.asarray(tokens[:, t : t + 1], jnp.int32), cache,
            jnp.asarray(t, jnp.int32),
        )
        np.testing.assert_allclose(
            np.asarray(logits[:, 0]), np.asarray(ref_logits[:, t]), rtol=1e-5, atol=1e-5,
            err_msg=f"step {t}",
        )
