"""HuggingFace checkpoint -> parrot-tpu parameter pytree conversion.

Reimplements the per-family weight maps of the reference converter
(``scripts/convert_hf_checkpoint.py:19-167``) for the functional parameter
layout of :mod:`parrot_tpu.models.gpt`:

- linear weights transpose to ``[in, out]``;
- per-layer tensors stack along a leading ``n_layer`` axis (scan layout);
- GPT-NeoX and Falcon fused QKV tensors copy through unchanged (their HF
  layout is already the group-interleaved one);
- Llama-family separate q/k/v projections interleave per query group
  (reference ``:153-167``): per group, ``q_per_kv`` query heads then one key
  head then one value head.

The core operates on numpy arrays so it is torch-free; thin loaders read
``.bin``/``.safetensors`` shards one at a time (the streaming discipline of the
reference's ``incremental_save`` — peak host memory stays at one shard plus the
output tree).
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Callable, Iterator, Optional

import numpy as np

from parrot_tpu.config import Config

# ---------------------------------------------------------------------------
# Family weight maps: HF name pattern -> (pytree path, transpose?)
# `L` marks the layer index; paths are into the parrot param tree with the
# layer axis removed (stacking happens at the end).
# ---------------------------------------------------------------------------

_NEOX_MAP = {
    "gpt_neox.embed_in.weight": ("wte.weight", False),
    "gpt_neox.layers.{L}.input_layernorm.weight": ("blocks.norm_1.scale", False),
    "gpt_neox.layers.{L}.input_layernorm.bias": ("blocks.norm_1.bias", False),
    "gpt_neox.layers.{L}.attention.query_key_value.weight": ("blocks.attn.qkv.w", True),
    "gpt_neox.layers.{L}.attention.query_key_value.bias": ("blocks.attn.qkv.b", False),
    "gpt_neox.layers.{L}.attention.dense.weight": ("blocks.attn.proj.w", True),
    "gpt_neox.layers.{L}.attention.dense.bias": ("blocks.attn.proj.b", False),
    "gpt_neox.layers.{L}.post_attention_layernorm.weight": ("blocks.norm_2.scale", False),
    "gpt_neox.layers.{L}.post_attention_layernorm.bias": ("blocks.norm_2.bias", False),
    "gpt_neox.layers.{L}.mlp.dense_h_to_4h.weight": ("blocks.mlp.fc.w", True),
    "gpt_neox.layers.{L}.mlp.dense_h_to_4h.bias": ("blocks.mlp.fc.b", False),
    "gpt_neox.layers.{L}.mlp.dense_4h_to_h.weight": ("blocks.mlp.proj.w", True),
    "gpt_neox.layers.{L}.mlp.dense_4h_to_h.bias": ("blocks.mlp.proj.b", False),
    "gpt_neox.final_layer_norm.weight": ("ln_f.scale", False),
    "gpt_neox.final_layer_norm.bias": ("ln_f.bias", False),
    "embed_out.weight": ("lm_head.w", True),
}

# one map serves both falcon variants: 7b names its single norm
# "input_layernorm", 40b uses "ln_attn"/"ln_mlp" — the source names never
# collide, so presence in the shard decides (the reference picks by
# n_embd == 8192 instead, convert_hf_checkpoint.py:197)
_FALCON_MAP = {
    "transformer.word_embeddings.weight": ("wte.weight", False),
    "transformer.h.{L}.input_layernorm.weight": ("blocks.norm_1.scale", False),
    "transformer.h.{L}.input_layernorm.bias": ("blocks.norm_1.bias", False),
    "transformer.h.{L}.ln_attn.weight": ("blocks.norm_1.scale", False),
    "transformer.h.{L}.ln_attn.bias": ("blocks.norm_1.bias", False),
    "transformer.h.{L}.ln_mlp.weight": ("blocks.norm_2.scale", False),
    "transformer.h.{L}.ln_mlp.bias": ("blocks.norm_2.bias", False),
    "transformer.h.{L}.self_attention.query_key_value.weight": ("blocks.attn.qkv.w", True),
    "transformer.h.{L}.self_attention.dense.weight": ("blocks.attn.proj.w", True),
    "transformer.h.{L}.mlp.dense_h_to_4h.weight": ("blocks.mlp.fc.w", True),
    "transformer.h.{L}.mlp.dense_4h_to_h.weight": ("blocks.mlp.proj.w", True),
    "transformer.ln_f.weight": ("ln_f.scale", False),
    "transformer.ln_f.bias": ("ln_f.bias", False),
    "lm_head.weight": ("lm_head.w", True),
}

_LLAMA_MAP = {
    "model.embed_tokens.weight": ("wte.weight", False),
    "model.layers.{L}.input_layernorm.weight": ("blocks.norm_1.scale", False),
    "model.layers.{L}.self_attn.q_proj.weight": ("__qkv_q", False),
    "model.layers.{L}.self_attn.k_proj.weight": ("__qkv_k", False),
    "model.layers.{L}.self_attn.v_proj.weight": ("__qkv_v", False),
    "model.layers.{L}.self_attn.o_proj.weight": ("blocks.attn.proj.w", True),
    "model.layers.{L}.post_attention_layernorm.weight": ("blocks.norm_2.scale", False),
    "model.layers.{L}.mlp.gate_proj.weight": ("blocks.mlp.fc_1.w", True),
    "model.layers.{L}.mlp.up_proj.weight": ("blocks.mlp.fc_2.w", True),
    "model.layers.{L}.mlp.down_proj.weight": ("blocks.mlp.proj.w", True),
    "model.norm.weight": ("ln_f.scale", False),
    "lm_head.weight": ("lm_head.w", True),
}

_IGNORED = re.compile(
    r"(rotary_emb\.inv_freq|attention\.bias$|attention\.masked_bias$|\.num_batches_tracked$)"
)


def weight_map_for(config: Config) -> dict:
    if "falcon" in config.name:
        return _FALCON_MAP
    if config.mlp_class == "LLaMAMLP":
        return _LLAMA_MAP
    return _NEOX_MAP


def interleave_qkv(config: Config, q: np.ndarray, k: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Fuse separate HF q/k/v projections ``[out, in]`` into the
    group-interleaved layout, returning ``[in, qkv_out]`` (already transposed).
    """
    hs, G, Q = config.head_size, config.n_query_groups, config.q_per_kv
    D = q.shape[1]
    q = q.reshape(G, Q * hs, D)
    k = k.reshape(G, hs, D)
    v = v.reshape(G, hs, D)
    fused = np.concatenate([q, k, v], axis=1)  # [G, (Q+2)*hs, D]
    return np.ascontiguousarray(fused.reshape(G * (Q + 2) * hs, D).T)


def _set_path(tree: dict, path: str, value: np.ndarray) -> None:
    parts = path.split(".")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _iter_converted(
    config: Config, shards: Iterator[dict[str, np.ndarray]]
) -> Iterator[tuple[str, Optional[int], np.ndarray]]:
    """Yield ``(path, layer_or_None, array)`` conversion events one tensor at
    a time (transposed to [in, out], llama q/k/v fused per layer). The memory
    high-water mark is one source shard plus at most one pending q/k/v pair
    per layer — this is what lets the streaming converter handle 40B-class
    checkpoints in bounded RAM."""
    wmap = weight_map_for(config)
    qkv_parts: dict[int, dict[str, np.ndarray]] = {}
    layer_re = re.compile(r"^(.*?\.)(\d+)(\..*)$")

    for shard in shards:
        for name, param in shard.items():
            if _IGNORED.search(name):
                continue
            m = layer_re.match(name)
            if m and (m.group(1).endswith("layers.") or m.group(1).endswith("h.")):
                layer = int(m.group(2))
                pattern = f"{m.group(1)}{{L}}{m.group(3)}"
                if pattern not in wmap:
                    continue
                to_path, transpose = wmap[pattern]
                arr = np.asarray(param)
                if to_path.startswith("__qkv_"):
                    qkv_parts.setdefault(layer, {})[to_path[-1]] = arr
                    if len(qkv_parts[layer]) == 3:
                        parts = qkv_parts.pop(layer)
                        yield "blocks.attn.qkv.w", layer, interleave_qkv(
                            config, parts["q"], parts["k"], parts["v"]
                        )
                    continue
                if transpose:
                    arr = np.ascontiguousarray(arr.T)
                yield to_path, layer, arr
            else:
                if name not in wmap:
                    continue
                to_path, transpose = wmap[name]
                arr = np.asarray(param)
                if transpose:
                    arr = np.ascontiguousarray(arr.T)
                yield to_path, None, arr

    if qkv_parts:
        raise ValueError(f"Incomplete q/k/v projections for layers {sorted(qkv_parts)}")


def convert_hf_state_dict(
    config: Config,
    shards: Iterator[dict[str, np.ndarray]],
    dtype: Optional[np.dtype] = None,
) -> dict:
    """Convert an iterator of HF state-dict shards into an in-RAM parrot
    param tree with stacked per-layer leaves (small/medium models; for
    bounded-memory conversion of large checkpoints use
    :func:`convert_hf_checkpoint_streaming`)."""
    flat: dict[str, np.ndarray] = {}
    per_layer: dict[str, dict[int, np.ndarray]] = {}

    for path, layer, arr in _iter_converted(config, shards):
        if layer is None:
            flat[path] = arr
        else:
            per_layer.setdefault(path, {})[layer] = arr

    tree: dict = {}
    for path, arr in flat.items():
        _set_path(tree, path, _maybe_cast(_pad_vocab(config, path, arr), dtype))
    for path, by_layer in per_layer.items():
        if len(by_layer) != config.n_layer:
            missing = sorted(set(range(config.n_layer)) - set(by_layer))
            raise ValueError(f"{path}: missing layers {missing}")
        stacked = np.stack([by_layer[i] for i in range(config.n_layer)])
        _set_path(tree, path, _maybe_cast(stacked, dtype))
    return tree


def convert_hf_checkpoint_streaming(
    config: Config,
    checkpoint_dir: Path,
    out_dir: Optional[Path] = None,
    dtype: Optional[np.dtype] = None,
    max_shard_bytes: int = 2 << 30,
) -> Path:
    """Convert an HF checkpoint to the parrot format with bounded host RAM
    (≙ the reference's ``incremental_save`` discipline,
    ``lit_gpt/utils.py:262-399``): each converted tensor is handed straight to
    a :class:`~parrot_tpu.utils.checkpoint.ShardedSafetensorsWriter`, with
    per-layer tensors written under ``<path>.__layer__.<i>`` keys (re-stacked
    at load). Peak RSS stays at ~one source shard + one tensor regardless of
    model size. Returns the written model/index path.
    """
    from parrot_tpu.utils.checkpoint import ShardedSafetensorsWriter

    checkpoint_dir = Path(checkpoint_dir)
    out = Path(out_dir) if out_dir is not None else checkpoint_dir
    writer = ShardedSafetensorsWriter(out, max_shard_bytes=max_shard_bytes)

    seen_layers: dict[str, set[int]] = {}
    for path, layer, arr in _iter_converted(config, iter_hf_shards(checkpoint_dir)):
        arr = _maybe_cast(_pad_vocab(config, path, arr) if layer is None else arr, dtype)
        if layer is None:
            writer.add(path, arr)
        else:
            seen_layers.setdefault(path, set()).add(layer)
            writer.add(f"{path}.__layer__.{layer:05d}", arr)

    for path, layers in seen_layers.items():
        missing = sorted(set(range(config.n_layer)) - layers)
        if missing:
            raise ValueError(f"{path}: missing layers {missing}")
    return writer.finish(config=config)


def _pad_vocab(config: Config, path: str, arr: np.ndarray) -> np.ndarray:
    """Zero-pad embedding/lm_head rows up to ``padded_vocab_size``."""
    V = config.padded_vocab_size
    if path == "wte.weight" and arr.shape[0] < V:
        pad = np.zeros((V - arr.shape[0], arr.shape[1]), arr.dtype)
        arr = np.concatenate([arr, pad], axis=0)
    elif path == "lm_head.w" and arr.shape[1] < V:
        pad = np.zeros((arr.shape[0], V - arr.shape[1]), arr.dtype)
        arr = np.concatenate([arr, pad], axis=1)
    return arr


def _maybe_cast(arr: np.ndarray, dtype: Optional[np.dtype]) -> np.ndarray:
    if dtype is None:
        return arr
    return arr.astype(dtype)


# ---------------------------------------------------------------------------
# Shard loaders (host-side IO)
# ---------------------------------------------------------------------------


def iter_hf_shards(checkpoint_dir: Path) -> Iterator[dict[str, np.ndarray]]:
    """Yield HF checkpoint shards as numpy dicts, one file at a time.

    Handles both ``*.safetensors`` and torch ``*.bin`` shards, resolving the
    shard list from the index json when present (reference ``:209-215``).
    """
    checkpoint_dir = Path(checkpoint_dir)
    files: set[Path] = set()
    for index_name in ("model.safetensors.index.json", "pytorch_model.bin.index.json"):
        idx = checkpoint_dir / index_name
        if idx.is_file():
            with open(idx) as f:
                files = {checkpoint_dir / v for v in json.load(f)["weight_map"].values()}
            break
    if not files:
        files = set(checkpoint_dir.glob("*.safetensors")) or set(checkpoint_dir.glob("*.bin"))
    if not files:
        raise ValueError(f"No .safetensors or .bin shards in {checkpoint_dir}")

    for path in sorted(files):
        if path.suffix == ".safetensors":
            from safetensors.numpy import load_file

            yield load_file(path)
        else:
            yield load_torch_bin(path)


def split_fused_qkv(config: Config, fused_t: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of :func:`interleave_qkv`: ``[in, qkv_out]`` -> HF-layout
    ``q/k/v`` each ``[out, in]``."""
    hs, G, Q = config.head_size, config.n_query_groups, config.q_per_kv
    D = fused_t.shape[0]
    fused = np.ascontiguousarray(fused_t.T).reshape(G, (Q + 2) * hs, D)
    q = fused[:, : Q * hs].reshape(G * Q * hs, D)
    k = fused[:, Q * hs : (Q + 1) * hs].reshape(G * hs, D)
    v = fused[:, (Q + 1) * hs :].reshape(G * hs, D)
    return q, k, v


def convert_to_hf_state_dict(config: Config, params: dict) -> dict[str, np.ndarray]:
    """parrot param tree -> HF state dict (counterpart of
    ``scripts/convert_lit_checkpoint.py``; unlike the reference, the
    llama direction is implemented — the fused QKV de-interleaves back into
    separate projections — where the reference raises NotImplementedError,
    ``convert_lit_checkpoint.py:117``)."""
    wmap = weight_map_for(config)
    out: dict[str, np.ndarray] = {}
    V = config.vocab_size if config.padded_vocab_size is None else config.padded_vocab_size

    # invert the map: parrot path -> (hf pattern, transpose)
    inverse = {}
    for hf_pattern, (path, transpose) in wmap.items():
        if path.startswith("__qkv_"):
            continue
        inverse[path] = (hf_pattern, transpose)
    if "falcon" in config.name and config.shared_attention_norm:
        # 7b variant: the single norm is named input_layernorm, not ln_attn
        inverse["blocks.norm_1.scale"] = ("transformer.h.{L}.input_layernorm.weight", False)
        inverse["blocks.norm_1.bias"] = ("transformer.h.{L}.input_layernorm.bias", False)

    def emit(path: str, arr: np.ndarray, layer: int | None) -> None:
        if path not in inverse:
            return
        hf_pattern, transpose = inverse[path]
        name = hf_pattern.replace("{L}", str(layer)) if layer is not None else hf_pattern
        if transpose:
            arr = np.ascontiguousarray(arr.T)
        out[name] = arr

    flat_blocks: dict[str, np.ndarray] = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for key, val in node.items():
                walk(val, f"{prefix}.{key}" if prefix else key)
        else:
            flat_blocks[prefix] = np.asarray(val_to_np(node))

    def val_to_np(x):
        import jax.numpy as jnp

        arr = np.asarray(x if x.dtype != jnp.bfloat16 else x.astype(jnp.float32))
        return arr

    walk(params, "")

    llama = config.mlp_class == "LLaMAMLP" and "falcon" not in config.name
    for path, arr in flat_blocks.items():
        if path.startswith("blocks."):
            for layer in range(config.n_layer):
                sliced = arr[layer]
                if llama and path == "blocks.attn.qkv.w":
                    q, k, v = split_fused_qkv(config, sliced)
                    base = f"model.layers.{layer}.self_attn"
                    out[f"{base}.q_proj.weight"] = q
                    out[f"{base}.k_proj.weight"] = k
                    out[f"{base}.v_proj.weight"] = v
                else:
                    emit(path, sliced, layer)
        else:
            emit(path, arr, None)
    return out


def load_torch_bin(path: Path) -> dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = sd.get("model", sd) if isinstance(sd, dict) else sd
    out = {}
    for k, v in sd.items():
        if not hasattr(v, "numpy"):
            continue
        if v.dtype == torch.bfloat16:
            # keep bf16 bytes: uint16 view -> ml_dtypes.bfloat16 view (the old
            # float32 round-trip doubled host bytes for 40B-class converts)
            import ml_dtypes

            out[k] = v.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
        else:
            out[k] = v.numpy()
    return out
