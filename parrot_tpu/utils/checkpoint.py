"""Checkpoint IO: safetensors-backed, lazy, quantization-aware.

Replaces the reference's torch-zip ``lazy_load``/``incremental_save`` pair
(``lit_gpt/utils.py:89-399``) with the safetensors format:

- **zero-copy lazy loads** — safetensors mmaps the file, so materializing a
  40B-parameter tree never doubles host RAM (the property ``lazy_load`` was
  hand-built for);
- **streaming-friendly writes** — the param tree is flattened to dotted-path
  keys and written in one pass;
- **one schema for fp and quantized checkpoints** — a ``QuantizedLinear``
  leaf-group serializes its arrays under ``<path>.__quant__.<field>`` with its
  static metadata (fmt/group_size/shape) in the safetensors metadata header,
  so fp16 and int4/int8/nf4 models load through a single code path (the
  reference needs ``strict=quantize is None`` hacks, ``generate/base.py:222``).

Checkpoint directory contract (mirrors ``check_valid_checkpoint_dir``,
``lit_gpt/utils.py:228-259``): ``lit_model.safetensors`` + ``lit_config.json``
+ tokenizer files.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from parrot_tpu.config import Config
from parrot_tpu.quantize.formats import QuantizedLinear

MODEL_FILE = "lit_model.safetensors"

_QUANT_FIELDS = ("qw", "scales", "zeros", "scales2", "b")
_QUANT_META = ("fmt", "group_size", "in_features", "out_features")


def flatten_params(tree: Any, prefix: str = "") -> tuple[dict[str, np.ndarray], dict[str, str]]:
    """Flatten a param tree to {dotted_path: array} + metadata for quantized
    leaf-groups."""
    flat: dict[str, np.ndarray] = {}
    meta: dict[str, str] = {}

    def visit(node: Any, path: str) -> None:
        if isinstance(node, QuantizedLinear):
            meta[path] = json.dumps({k: getattr(node, k) for k in _QUANT_META})
            for field in _QUANT_FIELDS:
                val = getattr(node, field)
                if val is not None:
                    flat[f"{path}.__quant__.{field}"] = np.asarray(val)
            return
        if isinstance(node, dict):
            for k, v in node.items():
                visit(v, f"{path}.{k}" if path else k)
            return
        flat[path] = np.asarray(node)

    visit(tree, prefix)
    return flat, meta


def unflatten_params(
    flat: dict[str, np.ndarray], meta: dict[str, str], as_jax: bool = True
) -> dict:
    """Inverse of :func:`flatten_params`."""
    conv = jnp.asarray if as_jax else (lambda x: x)
    quant_groups: dict[str, dict[str, Any]] = {}
    tree: dict = {}

    def set_path(path: str, value: Any) -> None:
        parts = path.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    for key, arr in flat.items():
        if ".__quant__." in key:
            path, field = key.split(".__quant__.")
            quant_groups.setdefault(path, {})[field] = conv(arr)
        else:
            set_path(key, conv(arr))

    for path, fields in quant_groups.items():
        static = json.loads(meta[path])
        set_path(path, QuantizedLinear(
            qw=fields["qw"],
            scales=fields["scales"],
            zeros=fields.get("zeros"),
            scales2=fields.get("scales2"),
            b=fields.get("b"),
            **static,
        ))
    return tree


def save_checkpoint(path: Path, params: Any, config: Optional[Config] = None) -> None:
    """Save a param tree (and optionally the config) to ``path``.

    If ``path`` is a directory, writes ``lit_model.safetensors`` (+
    ``lit_config.json``) inside it.
    """
    from safetensors.numpy import save_file

    path = Path(path)
    if path.suffix != ".safetensors":
        path.mkdir(parents=True, exist_ok=True)
        if config is not None:
            config.save_json(path / "lit_config.json")
        path = path / MODEL_FILE
    flat, meta = flatten_params(params)
    # bfloat16 has no numpy dtype; view as uint16 and tag it in metadata
    casts = {}
    for k, v in list(flat.items()):
        if v.dtype == jnp.bfloat16:
            flat[k] = np.asarray(v).view(np.uint16)
            casts[k] = "bfloat16"
    if casts:
        meta["__bf16__"] = json.dumps(sorted(casts))
    save_file(flat, str(path), metadata=meta)


def load_checkpoint(path: Path, as_jax: bool = True) -> dict:
    """Load a param tree saved by :func:`save_checkpoint` (lazy mmap)."""
    from safetensors import safe_open

    path = Path(path)
    if path.is_dir():
        path = path / MODEL_FILE
    flat: dict[str, np.ndarray] = {}
    with safe_open(str(path), framework="numpy") as f:
        meta = dict(f.metadata() or {})
        bf16_keys = set(json.loads(meta.pop("__bf16__", "[]")))
        for key in f.keys():
            arr = f.get_tensor(key)
            if key in bf16_keys:
                arr = jnp.asarray(arr.view(np.uint16)).view(jnp.bfloat16)
            flat[key] = arr
    return unflatten_params(flat, meta, as_jax=as_jax)


def filter_params(params: Any, predicate) -> dict:
    """Keep only leaves whose dotted path satisfies ``predicate`` — the
    counterpart of the reference's filtered ``fabric.save`` for PEFT deltas
    (``finetune/lora.py:307-309``). Returns a (possibly partial) tree."""
    flat, meta = flatten_params(params)
    kept = {k: v for k, v in flat.items() if predicate(k.split(".__quant__.")[0])}
    kept_meta = {k: v for k, v in meta.items() if any(f.startswith(k) for f in kept)}
    return unflatten_params(kept, kept_meta)


def merge_trees(base: dict, delta: dict) -> dict:
    """Recursively overlay ``delta`` onto ``base`` (PEFT checkpoint loading:
    base weights + filtered delta dict, ``generate/lora.py:108-110``)."""
    out = dict(base)
    for k, v in delta.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_trees(out[k], v)
        else:
            out[k] = v
    return out


def mask_by_path(params: Any, predicate) -> Any:
    """Bool pytree matching ``params``: predicate applied to each dotted
    leaf path (drives PEFT trainable masks)."""
    from parrot_tpu.parallel.sharding import _map_with_path

    return _map_with_path(params, lambda path, leaf: predicate(path))


def check_valid_checkpoint_dir(checkpoint_dir: Path) -> None:
    """Validate the checkpoint directory contract with a helpful error
    (mirrors ``lit_gpt/utils.py:228-259``)."""
    checkpoint_dir = Path(checkpoint_dir)
    files = {
        MODEL_FILE: (checkpoint_dir / MODEL_FILE).is_file(),
        "lit_config.json": (checkpoint_dir / "lit_config.json").is_file(),
        "tokenizer.json OR tokenizer.model": (checkpoint_dir / "tokenizer.json").is_file()
        or (checkpoint_dir / "tokenizer.model").is_file(),
    }
    if all(files.values()):
        return
    if checkpoint_dir.is_dir():
        problem = f" is missing the files: {[f for f, ok in files.items() if not ok]!r}"
    else:
        problem = " is not a checkpoint directory"
    # list locally available checkpoints to point the user somewhere useful
    available = "\n".join(
        f" {p.parent}" for p in Path("checkpoints").glob(f"*/*/{MODEL_FILE}")
    )
    extra = f"\nYou have downloaded locally:\n{available}\n" if available else ""
    raise OSError(
        f"checkpoint_dir {str(checkpoint_dir)!r}{problem}."
        f"\nFind download instructions in the repo tutorials.{extra}"
    )
