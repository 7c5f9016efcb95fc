"""Sharding tests on the virtual 8-device CPU mesh — coverage the reference
lacks entirely (it has no distributed tests, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from parrot_tpu.config import Config
from parrot_tpu.models import gpt
from parrot_tpu.parallel import mesh as mesh_lib
from parrot_tpu.parallel import sharding
from parrot_tpu.training import optim, train

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)

CFG = Config(
    name="shard-tiny",
    block_size=32,
    vocab_size=128,
    padded_vocab_size=128,
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
)


def test_make_mesh_shapes():
    m = mesh_lib.make_mesh(2, 2, 2)
    assert m.axis_names == ("data", "fsdp", "pipe", "context", "tensor")
    assert m.shape["pipe"] == 1 and m.shape["context"] == 1
    m = mesh_lib.make_mesh(1, 2, 1, pipe=4)
    assert m.shape["pipe"] == 4
    m = mesh_lib.make_mesh(1, 2, 1, context=4)
    assert m.shape["context"] == 4
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(3, 1, 1)


def test_sharded_forward_matches_single_device():
    params = gpt.init_params(CFG, jax.random.PRNGKey(0))
    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 128, (4, 16)), jnp.int32)
    expected = np.asarray(gpt.forward(params, CFG, tokens))

    mesh = mesh_lib.make_mesh(2, 2, 2)
    sp = sharding.shard_params(mesh, params)
    st = jax.device_put(tokens, sharding.batch_sharding(mesh))
    actual = np.asarray(jax.jit(lambda p, t: gpt.forward(p, CFG, t))(sp, st))
    np.testing.assert_allclose(actual, expected, rtol=1e-4, atol=1e-4)


def test_sharded_train_step_matches_single_device():
    params = gpt.init_params(CFG, jax.random.PRNGKey(0))
    optimizer = optim.adamw(optim.warmup_cosine(1e-3, 2, 10), grad_clip=1.0)
    step = train.make_train_step(CFG, optimizer, accumulate_steps=1, remat=True)

    batch = {
        "input_ids": jnp.asarray(np.random.RandomState(1).randint(0, 128, (4, 16)), jnp.int32),
        "labels": jnp.asarray(np.random.RandomState(2).randint(0, 128, (4, 16)), jnp.int32),
    }

    p1, o1 = params, optimizer.init(params)
    p1, o1, loss1 = jax.jit(step)(p1, o1, batch)

    mesh = mesh_lib.make_mesh(2, 2, 2)
    sp = sharding.shard_params(mesh, params)
    so = optimizer.init(sp)
    sb = jax.device_put(
        batch, {k: sharding.batch_sharding(mesh) for k in batch}
    )
    param_sh = sharding.param_shardings(mesh, sp)
    jit_step = jax.jit(step, in_shardings=(param_sh, None, None), out_shardings=(param_sh, None, None))
    p2, o2, loss2 = jit_step(sp, so, sb)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    # updated params must match too (same optimizer math under sharding)
    w1 = np.asarray(p1["blocks"]["attn"]["qkv"]["w"])
    w2 = np.asarray(p2["blocks"]["attn"]["qkv"]["w"])
    np.testing.assert_allclose(w1, w2, rtol=1e-4, atol=1e-5)


def test_sharded_generation_matches_single_device():
    """Tensor+fsdp-sharded params must generate the same tokens (greedy)."""
    from parrot_tpu.generate import engine

    params = gpt.init_params(CFG, jax.random.PRNGKey(3))
    prompt = jnp.array([3, 1, 4], jnp.int32)
    expected, n = engine.generate(
        params, CFG, prompt, jax.random.PRNGKey(0),
        max_returned_tokens=10, temperature=0.0, cache_dtype=jnp.float32,
    )
    mesh = mesh_lib.make_mesh(1, 2, 4)
    sp = sharding.shard_params(mesh, params)
    actual, n2 = engine.generate(
        sp, CFG, prompt, jax.random.PRNGKey(0),
        max_returned_tokens=10, temperature=0.0, cache_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(actual), np.asarray(expected))
    assert int(n) == int(n2)


def test_quantized_params_shard_with_same_rules():
    from parrot_tpu.quantize.formats import quantize_int4

    params = gpt.init_params(CFG, jax.random.PRNGKey(0))
    # quantize one mlp fc leaf-group (stacked layer axis retained)
    w = params["blocks"]["mlp"]["fc_1"]["w"]  # [L, D, I]
    q = jax.vmap(lambda wl: quantize_int4(wl, group_size=16))(w)
    params["blocks"]["mlp"]["fc_1"] = q

    mesh = mesh_lib.make_mesh(1, 2, 4)
    sp = sharding.shard_params(mesh, params)
    qs = sp["blocks"]["mlp"]["fc_1"]
    # out-features axis of the packed weight sharded over tensor
    spec = qs.qw.sharding.spec
    assert spec[-1] == "tensor"
    tokens = jnp.ones((2, 8), jnp.int32)
    logits = jax.jit(lambda p, t: gpt.forward(p, CFG, t))(sp, tokens)
    assert np.isfinite(np.asarray(logits)).all()


def test_sharded_int4_int8kv_generate_parity():
    """The full jitted generate() while-loop with int4 weights + INT8 KV cache
    under tensor+fsdp sharding produces the same greedy tokens as one device
    (SURVEY §7 'multi-host decode' hard part)."""
    from parrot_tpu.generate import engine
    from parrot_tpu.quantize import api as quant_api

    params = gpt.init_params(CFG, jax.random.PRNGKey(5), dtype=jnp.float32)
    qparams = quant_api.quantize_params(
        jax.tree.map(lambda x: x, params), CFG, "gptq.int4"
    )
    prompt = jnp.array([5, 2, 7, 1], jnp.int32)
    kw = dict(max_returned_tokens=12, temperature=0.0, cache_dtype=jnp.int8)
    expected, n = engine.generate(qparams, CFG, prompt, jax.random.PRNGKey(0), **kw)

    mesh = mesh_lib.make_mesh(1, 2, 4)
    sq = sharding.shard_params(mesh, qparams)
    actual, n2 = engine.generate(sq, CFG, prompt, jax.random.PRNGKey(0), **kw)
    np.testing.assert_array_equal(np.asarray(actual), np.asarray(expected))
    assert int(n) == int(n2)


def test_sharded_ragged_batch_generate_parity():
    """Ragged generate_batch (per-sequence positions + EOS retirement) under
    the mesh matches the single-device run token-for-token."""
    from parrot_tpu.generate import engine

    params = gpt.init_params(CFG, jax.random.PRNGKey(6), dtype=jnp.float32)
    prompts = jnp.asarray(
        [[3, 1, 4, 0], [2, 7, 0, 0], [9, 8, 6, 5]], jnp.int32
    )
    lengths = jnp.asarray([3, 2, 4], jnp.int32)
    kw = dict(max_returned_tokens=10, temperature=0.0, cache_dtype=jnp.int8)
    expected, el = engine.generate_batch(
        params, CFG, prompts, lengths, jax.random.PRNGKey(0), **kw)

    mesh = mesh_lib.make_mesh(1, 2, 4)
    sp = sharding.shard_params(mesh, params)
    actual, al = engine.generate_batch(
        sp, CFG, prompts, lengths, jax.random.PRNGKey(0), **kw)
    np.testing.assert_array_equal(np.asarray(actual), np.asarray(expected))
    np.testing.assert_array_equal(np.asarray(al), np.asarray(el))


def test_sharded_int2_int8kv_generate_parity():
    """The 2-bit format (the falcon-7b direct-decode headline) under
    tensor+fsdp sharding: same greedy tokens as one device — the Megatron
    split composes with the blocked split-quarter packing (each shard's K
    range is whole pack blocks)."""
    from parrot_tpu.generate import engine
    from parrot_tpu.quantize import api as quant_api

    params = gpt.init_params(CFG, jax.random.PRNGKey(6), dtype=jnp.float32)
    qparams = quant_api.quantize_params(
        jax.tree.map(lambda x: x, params), CFG, "gptq.int2"
    )
    prompt = jnp.array([3, 9, 4, 2], jnp.int32)
    kw = dict(max_returned_tokens=12, temperature=0.0, cache_dtype=jnp.int8)
    expected, n = engine.generate(qparams, CFG, prompt, jax.random.PRNGKey(0), **kw)

    mesh = mesh_lib.make_mesh(1, 2, 4)
    sq = sharding.shard_params(mesh, qparams)
    actual, n2 = engine.generate(sq, CFG, prompt, jax.random.PRNGKey(0), **kw)
    np.testing.assert_array_equal(np.asarray(actual), np.asarray(expected))
    assert int(n) == int(n2)
