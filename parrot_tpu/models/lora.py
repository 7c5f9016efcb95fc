"""LoRA: low-rank adaptation as parameter-tree extension.

Functional counterpart of ``lit_gpt/lora.py``: instead of module subclasses
(``LoRALinear``/``LoRAQKVLinear``, ``lora.py:94-409``), LoRA adds small
``{"a", "b"}`` groups inside existing linear leaf-groups; the forward pass in
:mod:`parrot_tpu.models.gpt` and :mod:`parrot_tpu.ops.linear` picks them up
structurally.

Fused-QKV handling: the reference scatters per-projection deltas through a
``lora_ind`` buffer with a grouped-conv1d trick (``lora.py:296-409``); here
the fused output is viewed as ``[B, T, groups, q_per_kv+2, head_size]`` and
deltas add into their natural slots (``gpt._qkv_with_lora``) — no
gather/scatter, and GQA/MQA fall out of the same code path.

API parity surface:
- ``LoRAConfig`` — ``r/alpha/dropout/to_query..to_head`` (``lora.py:449-476``)
- ``add_lora_params`` — A kaiming-uniform (bound ``1/sqrt(fan_in)``), B zeros
  (``lora.py:144-150``)
- ``lora_trainable_mask`` ≙ ``mark_only_lora_as_trainable`` (``:412-442``)
- ``lora_filter`` — checkpoint filter (``:445-446``)
- ``merge_lora_weights`` — fold deltas into the dense weights (``:676-681``)
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from parrot_tpu.config import Config


@dataclasses.dataclass(frozen=True)
class LoRAConfig(Config):
    r: int = 0
    alpha: int = 1
    dropout: float = 0.0
    to_query: bool = False
    to_key: bool = False
    to_value: bool = False
    to_projection: bool = False
    to_mlp: bool = False
    to_head: bool = False

    @property
    def scaling(self) -> float:
        return self.alpha / self.r


def _init_ab(rng: jax.Array, fan_in: int, r: int, fan_out: int, dtype, stack: int | None):
    """A ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (kaiming-uniform a=sqrt(5) on a
    [r, fan_in] torch weight), B = 0."""
    bound = 1.0 / (fan_in ** 0.5)
    a_shape = (fan_in, r) if stack is None else (stack, fan_in, r)
    b_shape = (r, fan_out) if stack is None else (stack, r, fan_out)
    return {
        "a": jax.random.uniform(rng, a_shape, dtype, minval=-bound, maxval=bound),
        "b": jnp.zeros(b_shape, dtype),
    }


def add_lora_params(config: LoRAConfig, params: dict, rng: jax.Array) -> dict:
    """Return a new tree with LoRA groups added per the config's flags."""
    assert config.r > 0, "LoRAConfig.r must be positive"
    L, D, H = config.n_layer, config.n_embd, config.head_size
    dtype = params["lm_head"]["w"].dtype
    keys = iter(jax.random.split(rng, 16))
    params = jax.tree.map(lambda x: x, params)  # shallow-ish copy via rebuild

    attn = params["blocks"]["attn"]
    qkv_lora: dict = {}
    if config.to_query:
        qkv_lora["q"] = _init_ab(next(keys), D, config.r, config.n_head * H, dtype, L)
    if config.to_key:
        qkv_lora["k"] = _init_ab(next(keys), D, config.r, config.n_query_groups * H, dtype, L)
    if config.to_value:
        qkv_lora["v"] = _init_ab(next(keys), D, config.r, config.n_query_groups * H, dtype, L)
    if qkv_lora:
        attn["qkv"] = {**attn["qkv"], "lora": qkv_lora}
    if config.to_projection:
        attn["proj"] = {**attn["proj"], "lora": _init_ab(next(keys), D, config.r, D, dtype, L)}
    if config.to_mlp:
        mlp = params["blocks"]["mlp"]
        I = config.intermediate_size
        for name in mlp:
            fan_in, fan_out = (D, I) if name.startswith("fc") else (I, D)
            mlp[name] = {**mlp[name], "lora": _init_ab(next(keys), fan_in, config.r, fan_out, dtype, L)}
    if config.to_head:
        params["lm_head"] = {
            **params["lm_head"],
            "lora": _init_ab(next(keys), D, config.r, config.padded_vocab_size, dtype, None),
        }
    return params


def lora_trainable_mask(params: Any) -> Any:
    """Bool pytree: True only on LoRA leaves (``mark_only_lora_as_trainable``)."""
    from parrot_tpu.utils.checkpoint import mask_by_path

    return mask_by_path(params, lambda path: ".lora." in path)


def lora_filter(path: str) -> bool:
    """Checkpoint filter: keep only LoRA leaves (``lora.py:445-446``)."""
    return ".lora." in path


def merge_lora_weights(config: LoRAConfig, params: dict) -> dict:
    """Fold every LoRA delta into its dense weight and drop the groups
    (inference-time merge, ``lora.py:154-164,676-681``).
    """
    scaling = config.scaling
    G, Q, H = config.n_query_groups, config.q_per_kv, config.head_size

    def merge_flat(group: dict) -> dict:
        out = {k: v for k, v in group.items() if k != "lora"}
        lora = group.get("lora")
        if lora is not None and "a" in lora:
            delta = jnp.einsum("...ir,...ro->...io", lora["a"], lora["b"]) * scaling
            out["w"] = (group["w"].astype(jnp.float32) + delta.astype(jnp.float32)).astype(
                group["w"].dtype
            )
        return out

    params = jax.tree.map(lambda x: x, params)
    attn = params["blocks"]["attn"]
    qkv = dict(attn["qkv"])
    lora = qkv.pop("lora", None)
    if lora:
        w = qkv["w"].astype(jnp.float32)  # [L, D, (Q+2)*G*H]
        L, D = w.shape[:2]
        w5 = w.reshape(L, D, G, Q + 2, H)
        for name, width, start in (("q", Q, 0), ("k", 1, Q), ("v", 1, Q + 1)):
            if name not in lora:
                continue
            delta = jnp.einsum("lir,lro->lio", lora[name]["a"].astype(jnp.float32),
                               lora[name]["b"].astype(jnp.float32)) * scaling
            w5 = w5.at[:, :, :, start : start + width].add(
                delta.reshape(L, D, G, width, H)
            )
        qkv["w"] = w5.reshape(L, D, G * (Q + 2) * H).astype(attn["qkv"]["w"].dtype)
    attn["qkv"] = qkv
    attn["proj"] = merge_flat(attn["proj"])
    params["blocks"]["mlp"] = {k: merge_flat(v) for k, v in params["blocks"]["mlp"].items()}
    params["lm_head"] = merge_flat(params["lm_head"])
    return params
