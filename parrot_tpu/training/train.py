"""Training step construction: sharded loss/grad/update under one jit.

The reference's training skeleton (``finetune/full.py:115-200``) — forward,
chunked CE on shifted targets, backward with gradient accumulation under
``no_backward_sync``, optimizer step on the accumulation boundary — becomes
two pure functions:

- ``train_step``: one optimizer update from one (macro)batch. Gradient
  accumulation is a ``lax.scan`` over microbatches *inside* the jit, so the
  collectives GSPMD inserts for fsdp/tensor sharding are amortized exactly
  like Fabric's no_backward_sync achieves on GPU.
- ``eval_step``: loss only.

Shardings come from :mod:`parrot_tpu.parallel.sharding`; donate the params
and optimizer state for in-place updates on device.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from jax import lax

from parrot_tpu.config import Config
from parrot_tpu.models import gpt
from parrot_tpu.ops.cross_entropy import chunked_cross_entropy


def loss_fn(
    params: Any,
    config: Config,
    input_ids: jnp.ndarray,  # [B, T]
    labels: jnp.ndarray,  # [B, T], -1 = ignored
    *,
    remat: bool = True,
    chunk_size: int = 128,
    shift: bool = True,
    lm_head_chunk_size: int = 0,
    pipeline: Optional[tuple] = None,
    context_parallel: Optional[tuple] = None,
) -> jnp.ndarray:
    if pipeline is not None:
        # GPipe forward over the 'pipe' mesh axis (parallel/pipeline.py);
        # same numerics as gpt.forward, so every loss variant below applies
        from parrot_tpu.parallel.pipeline import pipeline_forward

        if context_parallel is not None:
            raise NotImplementedError(
                "pipeline and context parallelism cannot be combined yet"
            )
        mesh, n_micro = pipeline
        forward = functools.partial(
            pipeline_forward, mesh=mesh, n_micro=n_micro
        )
    else:
        forward = functools.partial(gpt.forward, context_parallel=context_parallel)

    if lm_head_chunk_size > 0:
        # chunk the lm_head matmul itself: the [B, T, V] logits never
        # materialize (reference: lm_head_chunk_size, lit_gpt/lora.py:561-564
        # + chunked CE over the pieces, finetune/lora.py:191-194)
        from parrot_tpu.ops.linear import apply_linear

        hidden = forward(params, config, input_ids, remat=remat, return_hidden=True)
        if shift:
            hidden, labels = hidden[:, :-1], labels[:, 1:]
        B, T, D = hidden.shape
        pad = (-T) % lm_head_chunk_size
        if pad:
            hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
            labels = jnp.pad(labels, ((0, 0), (0, pad)), constant_values=-1)
        n_chunks = hidden.shape[1] // lm_head_chunk_size
        hidden = hidden.reshape(B, n_chunks, lm_head_chunk_size, D).swapaxes(0, 1)
        labels_c = labels.reshape(B, n_chunks, lm_head_chunk_size).swapaxes(0, 1)

        def chunk_step(carry, xs):
            total, count = carry
            h, y = xs
            logits = apply_linear(
                params["lm_head"], h, lora_scaling=gpt._lora_scaling(config)
            ).astype(jnp.float32)
            valid = y != -1
            safe = jnp.where(valid, y, 0)
            logz = jax.nn.logsumexp(logits, axis=-1)
            gold = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
            nll = jnp.where(valid, logz - gold, 0.0)
            return (total + nll.sum(), count + valid.sum()), None

        (total, count), _ = lax.scan(
            chunk_step, (jnp.float32(0.0), jnp.int32(0)), (hidden, labels_c)
        )
        return total / jnp.maximum(count, 1)

    logits = forward(params, config, input_ids, remat=remat)
    if shift:
        # labels aligned with inputs: logits t predicts label t+1
        # (finetune/full.py:163-165)
        logits, labels = logits[:, :-1], labels[:, 1:]
    # else: labels pre-shifted by the data pipeline (pretrain/redpajama.py:179-180)
    return chunked_cross_entropy(logits, labels, chunk_size=chunk_size)


def make_train_step(
    config: Config,
    optimizer: optax.GradientTransformation,
    *,
    accumulate_steps: int = 1,
    remat: bool = True,
    trainable_mask: Optional[Any] = None,
    shift: bool = True,
    lm_head_chunk_size: int = 0,
    pipeline: Optional[tuple] = None,
    context_parallel: Optional[tuple] = None,
):
    """Build a jittable ``(params, opt_state, batch) -> (params, opt_state,
    loss)`` step.

    ``batch`` is ``{"input_ids": [A, B, T], "labels": [A, B, T]}`` when
    ``accumulate_steps=A > 1``, else ``[B, T]``.

    ``trainable_mask``: pytree of bools matching params; False leaves get zero
    gradients (PEFT: the functional form of ``mark_only_lora_as_trainable``,
    ``lit_gpt/lora.py:412-442``). The optimizer is wrapped in ``optax.masked``
    so frozen leaves are untouched — without this, AdamW's decoupled weight
    decay would shrink the frozen base weights every step even with zero
    gradients — and no moment buffers are allocated for them (the reference
    achieves both by passing only trainable params to AdamW,
    ``finetune/lora.py:104-107``).
    """
    if trainable_mask is not None:
        optimizer = optax.masked(optimizer, trainable_mask)

    grad_fn = jax.value_and_grad(
        functools.partial(
            loss_fn, config=config, remat=remat, shift=shift,
            lm_head_chunk_size=lm_head_chunk_size, pipeline=pipeline,
            context_parallel=context_parallel,
        )
    )

    def microbatch_grads(params, input_ids, labels):
        loss, grads = grad_fn(params, input_ids=input_ids, labels=labels)
        if trainable_mask is not None:
            grads = jax.tree.map(
                lambda g, m: g if m else jnp.zeros_like(g), grads, trainable_mask
            )
        return loss, grads

    def train_step(params, opt_state, batch):
        input_ids, labels = batch["input_ids"], batch["labels"]
        if accumulate_steps == 1:
            loss, grads = microbatch_grads(params, input_ids, labels)
        else:
            def scan_body(carry, micro):
                acc, total = carry
                loss, grads = microbatch_grads(params, micro["input_ids"], micro["labels"])
                acc = jax.tree.map(jnp.add, acc, grads)
                return (acc, total + loss), None

            zero = jax.tree.map(jnp.zeros_like, params)
            (grads, total), _ = lax.scan(
                scan_body, (zero, jnp.float32(0.0)), {"input_ids": input_ids, "labels": labels}
            )
            grads = jax.tree.map(lambda g: g / accumulate_steps, grads)
            loss = total / accumulate_steps

        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # callers must init opt_state from THIS optimizer (it differs from the
    # one passed in when trainable_mask wrapped it in optax.masked)
    train_step.optimizer = optimizer
    return train_step


def make_eval_step(
    config: Config,
    *,
    remat: bool = False,
    shift: bool = True,
    pipeline: Optional[tuple] = None,
    context_parallel: Optional[tuple] = None,
):
    def eval_step(params, batch):
        return loss_fn(
            params, config, batch["input_ids"], batch["labels"],
            remat=remat, shift=shift, pipeline=pipeline,
            context_parallel=context_parallel,
        )

    return eval_step
