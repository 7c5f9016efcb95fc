"""Device mesh construction.

The reference's entire distributed stack (Fabric strategies, FSDP wrapping,
NCCL, torch_xla ``mark_step`` — SURVEY.md §2.6) collapses on TPU into one
object: a ``jax.sharding.Mesh`` with named axes, over which shardings are
declared and GSPMD inserts the collectives (psum/all-gather over ICI,
cross-slice over DCN).

Axis convention:

- ``data``    pure data parallelism (batch split; gradients all-reduced)
- ``fsdp``    ZeRO-3-style parameter sharding (the reference's FSDPStrategy,
              ``finetune/full.py:61-67``); also splits the batch
- ``tensor``  Megatron-style tensor parallelism over heads / ffn columns
              (absent in the reference; first-class here per BASELINE.json)
- ``pipe``    GPipe pipeline stages over the stacked-layer axis
              (``parallel/pipeline.py``; neighbor ``ppermute`` traffic only)
- ``context`` sequence/context parallelism: the token axis of long-context
              training batches is sharded here and attention runs as a ring
              (``parallel/ring_attention.py``; neighbor ``ppermute`` only,
              so it also wants ICI adjacency)

Multi-host: the same mesh spans hosts via ``jax.distributed.initialize``; put
``tensor`` innermost so its collectives ride ICI, ``pipe`` next (stage
hand-offs are nearest-neighbor), and ``data`` outermost so only gradient/step
reductions cross DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("data", "fsdp", "pipe", "context", "tensor")


def make_mesh(
    data: int = 1,
    fsdp: int = 1,
    tensor: int = 1,
    *,
    pipe: int = 1,
    context: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = data * fsdp * pipe * context * tensor
    if n != len(devices):
        raise ValueError(
            f"mesh {data}x{fsdp}x{pipe}x{context}x{tensor}={n} does not match "
            f"{len(devices)} devices"
        )
    grid = np.asarray(devices).reshape(data, fsdp, pipe, context, tensor)
    return Mesh(grid, AXES)


def parse_mesh(spec: str) -> tuple[int, ...]:
    """Parse a CLI mesh spec ``"data,fsdp,tensor[,pipe[,context]]"`` into a
    shape tuple."""
    parts = tuple(int(v) for v in spec.split(","))
    if len(parts) not in (3, 4, 5):
        raise ValueError(
            f"mesh spec {spec!r} must be 'data,fsdp,tensor[,pipe[,context]]'"
        )
    return parts


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1, 1, devices=jax.devices()[:1])


def init_distributed() -> None:
    """Multi-host initialization (one process per host). Mirrors the role of
    ``fabric.launch`` (``finetune/full.py:74``) without the spawn: the TPU
    runtime provides coordinator discovery."""
    jax.distributed.initialize()
