"""LLaMA-Adapter v1: learnable prompt-prefix attention with zero-init gating.

Functional counterpart of ``lit_gpt/adapter.py``: per layer (from
``adapter_start_layer`` on) a learnable prefix embedding ``[prompt_len, D]``
goes through the block's own fused QKV projection; the roped queries attend
over the (un-roped) prefix keys with full visibility and the result adds into
the attention output scaled by a zero-init per-head ``gating_factor``
(``adapter.py:234-254``). The prefix attention itself lives in
``gpt._adapter_attention``.

Stacked-scan note: parameters exist for *all* layers (one stacked leaf);
layers below ``adapter_start_layer`` are disabled by a trace-level ``where``
on the layer id, so their slices keep zero gradient through the gate and stay
at init — numerically identical to the reference's omit-the-module approach.

The reference's separate ``adapter_kv_caches`` (``adapter.py:52,105``) are
unnecessary here: the prefix is 10 tokens, recomputing its K/V inside the
jitted step costs one tiny matmul and avoids a second cache to functionalize.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from parrot_tpu.config import Config


@dataclasses.dataclass(frozen=True)
class AdapterConfig(Config):
    adapter_prompt_length: int = 10
    adapter_start_layer: int = 2


def add_adapter_params(config: AdapterConfig, params: dict, rng: jax.Array) -> dict:
    """Add ``blocks.attn.adapter = {wte: [L, aT, D], gate: [L, n_head]}``."""
    L, D = config.n_layer, config.n_embd
    aT = config.adapter_prompt_length
    dtype = params["lm_head"]["w"].dtype
    params = jax.tree.map(lambda x: x, params)
    params["blocks"]["attn"]["adapter"] = {
        # nn.Embedding default init: normal(0, 1)
        "wte": jax.random.normal(rng, (L, aT, D)).astype(dtype),
        "gate": jnp.zeros((L, config.n_head), dtype),
    }
    return params


def adapter_filter(path: str) -> bool:
    """Checkpoint filter (``adapter.py:270-271``): wte + gate leaves."""
    return ".adapter.wte" in path or ".adapter.gate" in path


def adapter_trainable_mask(params: Any) -> Any:
    from parrot_tpu.utils.checkpoint import mask_by_path

    return mask_by_path(params, adapter_filter)
