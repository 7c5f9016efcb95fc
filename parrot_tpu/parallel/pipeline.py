"""GPipe pipeline parallelism over the stacked-layer axis.

The reference has no pipeline parallelism (SURVEY.md §2.6 marks it optional);
this is a TPU-native extra enabled by the model's layout: per-layer params are
already stacked on a leading ``n_layer`` axis and iterated with ``lax.scan``
(``models/gpt.py``), so sharding that axis over a ``pipe`` mesh axis gives
each device a contiguous slab of ``L/P`` layers with zero re-packing.

Schedule: classic GPipe inside one ``shard_map`` whose only *manual* axis is
``pipe`` — ``data``/``fsdp``/``tensor`` stay automatic, so GSPMD still inserts
the Megatron/ZeRO collectives inside each stage.  The batch is split into
``n_micro`` microbatches; activations rotate stage-to-stage with a
nearest-neighbor ``lax.ppermute`` each tick for ``n_micro + P - 1`` ticks
(the usual GPipe bubble).  Everything is differentiable — ``ppermute``
transposes to the reverse rotation, so ``jax.grad`` of a pipelined loss gives
the 1F1B-equivalent backward automatically.

Embedding, final norm and lm_head run *outside* the shard_map under plain
GSPMD (they are not part of the layer stack).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from parrot_tpu.config import Config
from parrot_tpu.models.gpt import (
    Params,
    _rope_tables,
    apply_linear,
    apply_norm,
    block_forward,
)

try:
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def _pipe_blocks(
    blocks: Params,
    x_mb: jnp.ndarray,  # [M, b, T, D] microbatched activations
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    config: Config,
    mesh: Mesh,
    *,
    remat: bool = False,
    window: Optional[int] = None,
) -> jnp.ndarray:
    """Run the stacked Blocks as a P-stage GPipe pipeline. Returns [M, b, T, D]."""
    n_stage = mesh.shape["pipe"]
    n_layer = config.n_layer
    if n_layer % n_stage:
        raise ValueError(f"n_layer={n_layer} not divisible by pipe={n_stage}")
    per_stage = n_layer // n_stage
    n_micro = x_mb.shape[0]
    perm = [(i, (i + 1) % n_stage) for i in range(n_stage)]

    def kernel(blocks_local, x_all, cos, sin):
        stage = lax.axis_index("pipe")

        def stage_fn(h):
            lids = stage * per_stage + jnp.arange(per_stage)

            def step(h, layer):
                p_layer, lid = layer
                h, _ = block_forward(
                    p_layer, config, h, cos, sin, window=window, layer_id=lid
                )
                return h, None

            if remat:
                step = jax.checkpoint(step)
            h, _ = lax.scan(step, h, (blocks_local, lids))
            return h

        def tick(carry, t):
            state, outputs = carry
            # stage s receives what stage s-1 computed last tick
            prev = lax.ppermute(state, "pipe", perm)
            inject = lax.dynamic_index_in_dim(
                x_all, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False
            )
            h = jnp.where(stage == 0, inject, prev)
            y = stage_fn(h)
            # last stage finished microbatch t-(P-1) this tick
            out_idx = t - (n_stage - 1)
            upd = lax.dynamic_update_index_in_dim(
                outputs, y, jnp.clip(out_idx, 0, n_micro - 1), 0
            )
            write = jnp.logical_and(stage == n_stage - 1, out_idx >= 0)
            outputs = jnp.where(write, upd, outputs)
            return (y, outputs), None

        state0 = jnp.zeros(x_all.shape[1:], x_all.dtype)
        out0 = jnp.zeros_like(x_all)
        (_, outputs), _ = lax.scan(
            tick, (state0, out0), jnp.arange(n_micro + n_stage - 1)
        )
        # results live on the last stage; mask+psum replicates them
        outputs = jnp.where(stage == n_stage - 1, outputs, jnp.zeros_like(outputs))
        return lax.psum(outputs, "pipe")

    block_specs = jax.tree.map(lambda _: P("pipe"), blocks)
    fn = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(block_specs, P(), P(), P()),
        out_specs=P(),
        axis_names=frozenset({"pipe"}),
        check_vma=False,
    )
    # partial-manual shard_map (auto data/fsdp/tensor axes) only traces under
    # jit; the extra jit is a no-op when we're already inside one
    return jax.jit(fn)(blocks, x_mb, cos, sin)


def pipeline_forward(
    params: Params,
    config: Config,
    idx: jnp.ndarray,  # [B, T] int32
    *,
    mesh: Mesh,
    n_micro: int,
    remat: bool = False,
    window: Optional[int] = None,
    return_hidden: bool = False,
) -> jnp.ndarray:
    """Pipelined equivalent of ``gpt.forward`` (training/eval, no KV cache).

    ``B`` must be divisible by ``n_micro`` and ``n_layer`` by ``mesh.shape['pipe']``.
    Numerics match ``gpt.forward`` exactly (same per-layer compute, same order).
    """
    B, T = idx.shape
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible by n_micro={n_micro}")
    x = jnp.take(params["wte"]["weight"], idx, axis=0)
    cos, sin = _rope_tables(config, x.dtype)
    cos, sin = cos[:T], sin[:T]

    x_mb = x.reshape(n_micro, B // n_micro, T, x.shape[-1])
    y_mb = _pipe_blocks(
        params["blocks"], x_mb, cos, sin, config, mesh, remat=remat, window=window
    )
    x = y_mb.reshape(B, T, -1)

    x = apply_norm(params["ln_f"], x, config.norm_class, config.norm_eps)
    if return_hidden:
        return x
    return apply_linear(params["lm_head"], x)


def make_pipeline_train_step(
    config: Config,
    optimizer,
    mesh: Mesh,
    *,
    n_micro: int,
    remat: bool = True,
    **train_kw,
):
    """A jitted (params, opt_state, batch) -> (params, opt_state, loss) step
    whose forward/backward run through the GPipe schedule.  Gradients flow
    through the reverse rotation automatically (``ppermute`` transpose), and
    ``data``/``fsdp``/``tensor`` collectives are still GSPMD-inserted.

    Delegates to :func:`parrot_tpu.training.train.make_train_step`, so every
    loss variant (shift, chunked lm_head, PEFT trainable masks, gradient
    accumulation) composes with the pipeline.
    """
    from parrot_tpu.training import train

    step = train.make_train_step(
        config, optimizer, remat=remat, pipeline=(mesh, n_micro), **train_kw
    )
    jitted = jax.jit(step, donate_argnums=(0, 1))

    def pipeline_step(params, opt_state, batch):
        return jitted(params, opt_state, batch)

    # callers must init opt_state from THIS optimizer (optax.masked-wrapped
    # when a trainable_mask was passed) — same contract as make_train_step
    pipeline_step.optimizer = step.optimizer
    return pipeline_step
