"""GPipe pipeline-parallel tests on the virtual 8-device CPU mesh.

The reference has no pipeline parallelism at all (SURVEY.md §2.6); these
tests hold ``parallel/pipeline.py`` to token-level parity with the plain
``gpt.forward`` path and check that gradients flow through the rotated
schedule (``ppermute`` transpose) identically to the single-device backward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parrot_tpu.config import Config
from parrot_tpu.models import gpt
from parrot_tpu.parallel import mesh as mesh_lib
from parrot_tpu.parallel import pipeline, sharding
from parrot_tpu.training import optim, train

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)

CFG = Config(
    name="pipe-tiny",
    block_size=32,
    vocab_size=128,
    padded_vocab_size=128,
    n_layer=4,
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


def _data(seed=0, B=4, T=16):
    rs = np.random.RandomState(seed)
    return jnp.asarray(rs.randint(0, 128, (B, T)), jnp.int32)


def test_pipeline_forward_matches_plain_forward():
    params = gpt.init_params(CFG, jax.random.PRNGKey(0))
    tokens = _data()
    expected = np.asarray(gpt.forward(params, CFG, tokens))

    mesh = mesh_lib.make_mesh(1, 2, 1, pipe=4)
    sp = sharding.shard_params(mesh, params)  # blocks sharded over pipe axis 0
    actual = np.asarray(
        jax.jit(
            lambda p, t: pipeline.pipeline_forward(
                p, CFG, t, mesh=mesh, n_micro=2
            )
        )(sp, tokens)
    )
    np.testing.assert_allclose(actual, expected, rtol=2e-4, atol=2e-4)


def test_pipeline_forward_single_microbatch_and_bubble():
    # n_micro=1 (pure bubble) and n_micro=B both reduce to the same numerics
    params = gpt.init_params(CFG, jax.random.PRNGKey(1))
    tokens = _data(3)
    expected = np.asarray(gpt.forward(params, CFG, tokens))
    mesh = mesh_lib.make_mesh(1, 1, 1, pipe=2, devices=jax.devices()[:2])
    sp = sharding.shard_params(mesh, params)
    for n_micro in (1, 4):
        actual = np.asarray(
            pipeline.pipeline_forward(sp, CFG, tokens, mesh=mesh, n_micro=n_micro)
        )
        np.testing.assert_allclose(actual, expected, rtol=2e-4, atol=2e-4)


def test_pipeline_grad_matches_plain_grad():
    params = gpt.init_params(CFG, jax.random.PRNGKey(2))
    tokens, labels = _data(5), _data(6)

    def plain_loss(p):
        return train.loss_fn(p, CFG, tokens, labels, remat=False)

    mesh = mesh_lib.make_mesh(1, 2, 1, pipe=4)

    def pipe_loss(p):
        from parrot_tpu.ops.cross_entropy import chunked_cross_entropy

        logits = pipeline.pipeline_forward(p, CFG, tokens, mesh=mesh, n_micro=2)
        return chunked_cross_entropy(logits[:, :-1], labels[:, 1:])

    g_plain = jax.grad(plain_loss)(params)
    sp = sharding.shard_params(mesh, params)
    g_pipe = jax.jit(jax.grad(pipe_loss))(sp)
    flat_a, _ = jax.tree.flatten(jax.tree.map(np.asarray, g_plain))
    flat_b, _ = jax.tree.flatten(jax.tree.map(np.asarray, g_pipe))
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-4)


def test_pipeline_train_step_runs_and_descends():
    mesh = mesh_lib.make_mesh(1, 2, 1, pipe=4)
    params = gpt.init_params(CFG, jax.random.PRNGKey(3))
    params = sharding.shard_params(mesh, params)
    optimizer = optim.adamw(optim.warmup_cosine(1e-3, 2, 10), grad_clip=1.0)
    step = pipeline.make_pipeline_train_step(CFG, optimizer, mesh, n_micro=2)
    opt_state = optimizer.init(params)
    batch = {"input_ids": _data(7), "labels": _data(7)}
    losses = []
    for _ in range(4):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_pipeline_integrates_with_train_step_variants():
    # the pipeline threads through train.make_train_step: gradient
    # accumulation + chunked lm_head CE produce the same first-step loss as
    # the plain path
    mesh = mesh_lib.make_mesh(1, 2, 1, pipe=4)
    params = gpt.init_params(CFG, jax.random.PRNGKey(4))
    optimizer = optim.adamw(optim.warmup_cosine(1e-3, 2, 10), grad_clip=1.0)
    batch = {
        "input_ids": _data(8, B=2)[None].repeat(2, 0),  # [A=2, B=2, T]
        "labels": _data(9, B=2)[None].repeat(2, 0),
    }

    plain = train.make_train_step(
        CFG, optimizer, accumulate_steps=2, remat=True, lm_head_chunk_size=8
    )
    p1, o1, loss_plain = jax.jit(plain)(params, optimizer.init(params), batch)

    piped = pipeline.make_pipeline_train_step(
        CFG, optimizer, mesh, n_micro=2, accumulate_steps=2, lm_head_chunk_size=8
    )
    sp = sharding.shard_params(mesh, params)
    p2, o2, loss_pipe = piped(sp, optimizer.init(sp), batch)
    np.testing.assert_allclose(float(loss_pipe), float(loss_plain), rtol=1e-4)


def test_pipeline_rejects_indivisible_shapes():
    params = gpt.init_params(CFG, jax.random.PRNGKey(0))
    mesh = mesh_lib.make_mesh(1, 1, 1, pipe=8)
    with pytest.raises(ValueError):
        pipeline.pipeline_forward(params, CFG, _data(), mesh=mesh, n_micro=2)
    mesh = mesh_lib.make_mesh(1, 2, 1, pipe=4)
    with pytest.raises(ValueError):
        pipeline.pipeline_forward(params, CFG, _data(), mesh=mesh, n_micro=3)
