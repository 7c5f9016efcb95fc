"""Checkpoint IO: safetensors-backed, lazy, quantization-aware.

Replaces the reference's torch-zip ``lazy_load``/``incremental_save`` pair
(``lit_gpt/utils.py:89-399``) with the safetensors format:

- **zero-copy lazy loads** — safetensors mmaps the file, so materializing a
  40B-parameter tree never doubles host RAM (the property ``lazy_load`` was
  hand-built for);
- **bounded-memory writes** — :class:`ShardedSafetensorsWriter` flushes
  tensors to numbered shard files as they accumulate (≙ ``incremental_save``,
  ``lit_gpt/utils.py:262-399``), with an HF-style index json; stacked
  per-layer leaves may be written one layer at a time under
  ``<path>.__layer__.<i>`` keys and are re-stacked on load, so a 40B-class
  conversion never holds more than one source shard plus one tensor in RAM;
- **one schema for fp and quantized checkpoints** — a ``QuantizedLinear``
  leaf-group serializes its arrays under ``<path>.__quant__.<field>`` with its
  static metadata (fmt/group_size/shape) in the safetensors metadata header,
  so fp16 and int4/int8/nf4 models load through a single code path (the
  reference needs ``strict=quantize is None`` hacks, ``generate/base.py:222``).

Checkpoint directory contract (mirrors ``check_valid_checkpoint_dir``,
``lit_gpt/utils.py:228-259``): ``lit_model.safetensors`` (single-file) or
``lit_model-XXXXX-of-XXXXX.safetensors`` + ``lit_model.safetensors.index.json``
(sharded), plus ``lit_config.json`` + tokenizer files.

jax is imported lazily so host-side conversion subprocesses stay light.
"""

from __future__ import annotations

import dataclasses
import json
import re
from pathlib import Path
from typing import Any, Iterable, Optional

import numpy as np

from parrot_tpu.config import Config
from parrot_tpu.quantize.formats import QuantizedLinear

MODEL_FILE = "lit_model.safetensors"
INDEX_FILE = "lit_model.safetensors.index.json"

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
    if as_jax:
        import jax.numpy as jnp

        conv = jnp.asarray
    else:
        conv = lambda x: x  # noqa: E731
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


class ShardedSafetensorsWriter:
    """Bounded-memory checkpoint writer (≙ the reference's
    ``incremental_save``, ``lit_gpt/utils.py:262-399``): tensors flush to
    numbered shard files whenever the pending buffer would exceed
    ``max_shard_bytes``. If everything fits in one shard the output is a plain
    ``lit_model.safetensors``; otherwise ``lit_model-XXXXX-of-XXXXX`` files
    plus an HF-style ``lit_model.safetensors.index.json``.
    """

    def __init__(self, out_dir: Path, max_shard_bytes: int = 2 << 30):
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.max_shard_bytes = max_shard_bytes
        self._buf: dict[str, np.ndarray] = {}
        self._buf_bytes = 0
        self._pending_meta: dict[str, str] = {}
        self._tmp_files: list[Path] = []
        self._weight_map: dict[str, int] = {}  # key -> shard ordinal
        self._total_bytes = 0
        self._finished = False

    def add(self, key: str, arr: np.ndarray) -> None:
        arr = np.ascontiguousarray(arr)
        if self._buf and self._buf_bytes + arr.nbytes > self.max_shard_bytes:
            self._flush()
        self._buf[key] = arr
        self._buf_bytes += arr.nbytes
        self._total_bytes += arr.nbytes

    def add_metadata(self, meta: dict[str, str]) -> None:
        """Attach string metadata (e.g. quantized-group schemas); it is
        written into the next flushed shard and merged across shards on load."""
        self._pending_meta.update(meta)

    def _flush(self) -> None:
        from safetensors.numpy import save_file

        ordinal = len(self._tmp_files)
        # bfloat16 has no stable numpy dtype code; view as uint16 and tag
        bf16 = sorted(k for k, v in self._buf.items() if v.dtype.name == "bfloat16")
        for k in bf16:
            self._buf[k] = self._buf[k].view(np.uint16)
        meta = dict(self._pending_meta)
        if bf16:
            meta["__bf16__"] = json.dumps(bf16)
        self._pending_meta = {}
        tmp = self.out_dir / f"lit_model-{ordinal:05d}.safetensors.tmp"
        save_file(self._buf, str(tmp), metadata=meta or None)
        self._tmp_files.append(tmp)
        for k in self._buf:
            self._weight_map[k] = ordinal
        self._buf, self._buf_bytes = {}, 0

    def finish(self, config: Optional[Config] = None) -> Path:
        assert not self._finished
        self._finished = True
        if self._buf or not self._tmp_files:
            self._flush()
        if config is not None:
            config.save_json(self.out_dir / "lit_config.json")
        n = len(self._tmp_files)
        if n == 1:
            path = self.out_dir / MODEL_FILE
            (self.out_dir / INDEX_FILE).unlink(missing_ok=True)
            self._tmp_files[0].rename(path)
            return path
        names = [f"lit_model-{i:05d}-of-{n:05d}.safetensors" for i in range(n)]
        for tmp, name in zip(self._tmp_files, names):
            tmp.rename(self.out_dir / name)
        (self.out_dir / MODEL_FILE).unlink(missing_ok=True)
        index = {
            "metadata": {"total_size": self._total_bytes},
            "weight_map": {k: names[i] for k, i in self._weight_map.items()},
        }
        with open(self.out_dir / INDEX_FILE, "w") as f:
            json.dump(index, f, indent=2, sort_keys=True)
        return self.out_dir / INDEX_FILE


def save_checkpoint(
    path: Path, params: Any, config: Optional[Config] = None,
    max_shard_bytes: Optional[int] = None,
) -> None:
    """Save a param tree (and optionally the config) to ``path``.

    If ``path`` is a directory, writes ``lit_model.safetensors`` (+
    ``lit_config.json``) inside it; ``max_shard_bytes`` splits the model
    across shard files with an index json.
    """
    from safetensors.numpy import save_file

    path = Path(path)
    flat, meta = flatten_params(params)
    if path.suffix != ".safetensors":
        writer = ShardedSafetensorsWriter(
            path, max_shard_bytes=max_shard_bytes or (1 << 62)
        )
        writer.add_metadata(meta)
        for k, v in flat.items():
            writer.add(k, v)
        writer.finish(config=config)
        return
    # explicit single-file target
    casts = sorted(k for k, v in flat.items() if np.asarray(v).dtype.name == "bfloat16")
    flat = {k: np.asarray(v) for k, v in flat.items()}
    for k in casts:
        flat[k] = flat[k].view(np.uint16)
    if casts:
        meta["__bf16__"] = json.dumps(casts)
    save_file(flat, str(path), metadata=meta)


_LAYER_KEY = re.compile(r"^(?P<base>.+)\.__layer__\.(?P<i>\d+)$")


def checkpoint_files(path: Path) -> list[Path]:
    """Resolve the model file list for a checkpoint path: a ``.safetensors``
    file, or a directory holding a single-file or sharded+indexed model."""
    path = Path(path)
    if path.is_file():
        return [path]
    if (path / MODEL_FILE).is_file():
        return [path / MODEL_FILE]
    idx = path / INDEX_FILE
    if idx.is_file():
        with open(idx) as f:
            names = sorted(set(json.load(f)["weight_map"].values()))
        return [path / n for n in names]
    raise FileNotFoundError(f"No {MODEL_FILE} or {INDEX_FILE} under {path}")


def load_checkpoint(path: Path, as_jax: bool = True) -> dict:
    """Load a param tree saved by :func:`save_checkpoint` /
    :class:`ShardedSafetensorsWriter` (lazy mmap; merges shards, re-stacks
    ``__layer__``-split leaves)."""
    from safetensors import safe_open

    flat: dict[str, np.ndarray] = {}
    meta: dict[str, str] = {}
    for file in checkpoint_files(path):
        with safe_open(str(file), framework="numpy") as f:
            fmeta = dict(f.metadata() or {})
            bf16_keys = set(json.loads(fmeta.pop("__bf16__", "[]")))
            meta.update(fmeta)
            for key in f.keys():
                arr = f.get_tensor(key)
                if key in bf16_keys:
                    import ml_dtypes

                    arr = arr.view(np.uint16).view(ml_dtypes.bfloat16)
                flat[key] = arr

    # re-stack per-layer split leaves: <base>.__layer__.<i> -> stacked [L, ...]
    groups: dict[str, dict[int, np.ndarray]] = {}
    for key in [k for k in flat if ".__layer__." in k]:
        m = _LAYER_KEY.match(key)
        groups.setdefault(m.group("base"), {})[int(m.group("i"))] = flat.pop(key)
    for base, by_layer in groups.items():
        L = max(by_layer) + 1
        missing = sorted(set(range(L)) - set(by_layer))
        if missing:
            raise ValueError(f"{base}: missing layers {missing}")
        flat[base] = np.stack([by_layer[i] for i in range(L)])
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
        MODEL_FILE: (checkpoint_dir / MODEL_FILE).is_file()
        or (checkpoint_dir / INDEX_FILE).is_file(),
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
