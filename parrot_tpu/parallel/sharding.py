"""Sharding rules: parameter/activation/cache PartitionSpecs by pytree path.

This module is the declarative replacement for the reference's
``FSDPStrategy(auto_wrap_policy={Block}, ...)`` (``finetune/full.py:61-67``)
plus the tensor parallelism the reference lacks:

- **tensor** axis shards the head dimension of QKV, the ffn columns of the
  MLP up-projections, and the contraction dim of the down-projections — the
  Megatron split: one all-reduce (psum) per block on each proj output,
  inserted automatically by GSPMD from these specs.
- **fsdp** axis shards the remaining large dim of every weight; XLA
  all-gathers just-in-time per layer (ZeRO-3 semantics) and reduce-scatters
  gradients.

Rules are matched on the dotted path of each leaf, so they apply uniformly to
dense leaves and to the array fields inside ``QuantizedLinear`` groups (packed
int4 weights shard exactly like their fp counterparts — K-packing keeps the
out-features axis intact).
"""

from __future__ import annotations

import re
from typing import Any, Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# path-regex -> spec for the *trailing* named dims; a leading stacked-layer
# axis (rank mismatch) is padded with None automatically.
_PARAM_RULES: list[tuple[str, P]] = [
    (r"wte\.weight$", P(None, "fsdp")),                      # [V, D]
    (r"lm_head\.(w|qw)$", P("fsdp", "tensor")),              # [D, V]
    (r"attn\.qkv\.(w|qw)$", P("fsdp", "tensor")),            # [D, (nh+2g)hs]
    (r"attn\.qkv\.(b|scales|zeros)$", P("tensor")),          # [(nh+2g)hs]-ish
    (r"attn\.proj\.(w|qw)$", P("tensor", "fsdp")),           # [D, D] (in=heads)
    (r"mlp\.(fc|fc_1|fc_2)\.(w|qw)$", P("fsdp", "tensor")),  # [D, I]
    (r"mlp\.(fc|fc_1|fc_2)\.(b|scales|zeros)$", P("tensor")),
    (r"mlp\.proj\.(w|qw)$", P("tensor", "fsdp")),            # [I, D]
    (r"lm_head\.(scales|zeros)$", P("tensor")),
    # everything else (norms, small biases, nf4 block scales): replicated
]


def _spec_for_path(path: str, ndim: int, pipe: bool = False) -> P:
    spec = None
    for pattern, rule in _PARAM_RULES:
        if re.search(pattern, path):
            pad = ndim - len(rule)
            if pad < 0:  # e.g. grouped int4 scales [n_groups, out] vs P(out)
                spec = P(*([None] * (ndim - 1) + [rule[-1]]))
            else:
                spec = P(*([None] * pad + list(rule)))
            break
    if spec is None:
        spec = P(*([None] * ndim))
    if pipe and path.startswith("blocks.") and ndim >= 1 and spec[0] is None:
        # every leaf under blocks/ carries the stacked n_layer axis first; a
        # pipeline mesh shards it so each stage holds L/P layers
        spec = P(*(["pipe"] + list(spec)[1:]))
    return spec


def _iter_leaf_paths(tree: Any, prefix: str = ""):
    """Yield (dotted_path, leaf) including inside QuantizedLinear groups."""
    from parrot_tpu.quantize.formats import QuantizedLinear

    if isinstance(tree, QuantizedLinear):
        for field in ("qw", "scales", "zeros", "scales2", "b"):
            val = getattr(tree, field)
            if val is not None:
                yield f"{prefix}.{field}" if prefix else field, val
        return
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _iter_leaf_paths(v, f"{prefix}.{k}" if prefix else k)
        return
    yield prefix, tree


def param_specs(params: Any, *, pipe: bool = False) -> Any:
    """PartitionSpec pytree matching ``params``' structure."""
    return _map_with_path(
        params, lambda path, leaf: _spec_for_path(path, leaf.ndim, pipe=pipe)
    )


def param_shardings(mesh: Mesh, params: Any, *, pipe: bool = False) -> Any:
    pipe = pipe or ("pipe" in mesh.axis_names and mesh.shape.get("pipe", 1) > 1)
    return _map_with_path(
        params,
        lambda path, leaf: NamedSharding(mesh, _spec_for_path(path, leaf.ndim, pipe=pipe)),
    )


def _map_with_path(tree: Any, fn: Callable[[str, Any], Any], prefix: str = ""):
    from parrot_tpu.quantize.formats import QuantizedLinear

    if isinstance(tree, QuantizedLinear):
        fields = {}
        for field in ("qw", "scales", "zeros", "scales2", "b"):
            val = getattr(tree, field)
            path = f"{prefix}.{field}" if prefix else field
            fields[field] = None if val is None else fn(path, val)
        return tree.replace(**fields)
    if isinstance(tree, dict):
        return {
            k: _map_with_path(v, fn, f"{prefix}.{k}" if prefix else k)
            for k, v in tree.items()
        }
    return fn(prefix, tree)


# -- activations / data / cache --------------------------------------------

BATCH_SPEC = P(("data", "fsdp"))  # batch dim sharded over both dp-like axes


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """[B, T, ...] arrays: shard batch over data+fsdp."""
    return NamedSharding(mesh, P(*([("data", "fsdp")] + [None] * (ndim - 1))))


def kv_cache_spec() -> P:
    """[L, B, S, G, H]: batch over data+fsdp, kv heads over tensor."""
    return P(None, ("data", "fsdp"), None, "tensor", None)


def kv_scale_spec() -> P:
    """INT8-cache scales ``[L, B, S, G]``: batch over data+fsdp, heads over
    tensor (same placement as the codes they scale)."""
    return P(None, ("data", "fsdp"), None, "tensor")


def kv_cache_sharding(mesh: Mesh, *, quantized: bool = False):
    from parrot_tpu.models.gpt import KVCache

    spec = NamedSharding(mesh, kv_cache_spec())
    if quantized:
        sspec = NamedSharding(mesh, kv_scale_spec())
        return KVCache(k=spec, v=spec, k_scale=sspec, v_scale=sspec)  # type: ignore[arg-type]
    return KVCache(k=spec, v=spec)  # type: ignore[arg-type]


def shard_kv_cache(mesh: Mesh, cache):
    """Device-put a live KVCache onto the mesh (slots over data+fsdp, kv heads
    over tensor) — the serving-engine placement for 'continuous batching
    across hosts' (BASELINE north star).

    Axes that don't divide are dropped from the spec (replicated) rather than
    erroring: MQA models (falcon-7b, ``n_query_groups=1``) can't split kv
    heads over tensor, and a slot count below the dp width can't split the
    batch — the params stay fully sharded either way."""
    L, B, S, G, _ = cache.k.shape
    dp = mesh.shape.get("data", 1) * mesh.shape.get("fsdp", 1)
    tp = mesh.shape.get("tensor", 1)
    b_ax = ("data", "fsdp") if B % dp == 0 else None
    g_ax = "tensor" if G % tp == 0 else None
    code_spec = NamedSharding(mesh, P(None, b_ax, None, g_ax, None))
    scale_spec = NamedSharding(mesh, P(None, b_ax, None, g_ax))
    from parrot_tpu.models.gpt import KVCache

    shardings = KVCache(
        k=code_spec, v=code_spec,
        k_scale=scale_spec if cache.quantized else None,
        v_scale=scale_spec if cache.quantized else None,
    )
    return jax.tree.map(jax.device_put, cache, shardings)


def shard_paged_kv_cache(mesh: Mesh, cache):
    """Place a paged pool on the mesh: kv heads over tensor (when divisible);
    the page axis stays unsharded — pages are the allocator's unit and any
    page must be writable by the slot that owns it."""
    from parrot_tpu.models.paged_kv import PagedKVCache

    G = cache.k.shape[3]
    tp = mesh.shape.get("tensor", 1)
    g_ax = "tensor" if G % tp == 0 else None
    code = NamedSharding(mesh, P(None, None, None, g_ax, None))
    scale = NamedSharding(mesh, P(None, None, None, g_ax))
    shardings = PagedKVCache(
        k=code, v=code,
        k_scale=scale if cache.quantized else None,
        v_scale=scale if cache.quantized else None,
    )
    return jax.tree.map(jax.device_put, cache, shardings)


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Device-put a param tree according to the rules (lazy per-leaf)."""
    shardings = param_shardings(mesh, params)
    return jax.tree.map(lambda p, s: jax.device_put(p, s), params, shardings)
