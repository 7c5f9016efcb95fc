"""Pallas flash attention for TPU (prefill path).

The TPU-native replacement for the reference's flash-attn-2 CUDA dependency
(``lit_gpt/model.py:20,260-272``). Online-softmax tiling (Dao et al.):
K/V stream through VMEM in tiles while running max/denominator statistics
rescale a float32 accumulator; nothing of size [T, S] ever materializes.

Design notes:
- operates per (batch, query-head): GQA/MQA queries attend their group's
  unrepeated K/V head via index-map arithmetic — no repeat_interleave;
- causal tiles strictly above the diagonal are skipped with ``pl.when``
  (half the FLOPs at long T);
- statistics are kept lane-broadcast in [Tq, 128] f32 VMEM scratch (TPU has
  no cheap [Tq, 1] layout);
- used for prefill; single-token decode keeps the XLA path (a [1, S] score
  row is already a single fused reduction there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q_TILE = 256
K_TILE = 256

_INTERPRET = False

NEG_INF = float(np.finfo(np.float32).min)


def _flash_kernel(
    q_ref, k_ref, v_ref, out_ref, m_ref, l_ref, acc_ref,
    *, scale: float, n_k: int, causal: bool,
):
    kt = pl.program_id(2)
    qt = pl.program_id(1)

    @pl.when(kt == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # visible unless the whole k tile is strictly above the causal diagonal
    visible = (not causal) or (kt * K_TILE <= qt * Q_TILE + Q_TILE - 1)

    @pl.when(visible)
    def _():
        q = q_ref[0].astype(jnp.bfloat16)  # [Tq, H]
        k = k_ref[0].astype(jnp.bfloat16)  # [Tk, H]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [Tq, Tk]
        if causal:
            q_pos = qt * Q_TILE + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            k_pos = kt * K_TILE + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)

        m_prev = m_ref[:, :1]  # [Tq, 1] (all lanes equal)
        m_cur = jnp.max(s, axis=1, keepdims=True)  # [Tq, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)  # rescale of old stats
        p = jnp.exp(s - m_new)  # [Tq, Tk]
        l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)

        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_ref[0].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kt == n_k - 1)
    def _():
        denom = jnp.where(l_ref[:, :1] == 0, 1.0, l_ref[:, :1])
        out_ref[0] = (acc_ref[:] / denom).astype(out_ref.dtype)


def flash_attention(
    q: jnp.ndarray,  # [B, T, n_head, H]
    k: jnp.ndarray,  # [B, S, groups, H]
    v: jnp.ndarray,  # [B, S, groups, H]
    *,
    scale: float,
    causal: bool = True,
) -> jnp.ndarray:
    """Tiled attention; returns [B, T, n_head, H]. Requires T % Q_TILE == 0
    and S % K_TILE == 0 (callers pad or fall back)."""
    B, T, N, H = q.shape
    S, G = k.shape[1], k.shape[2]
    q_per_kv = N // G

    qh = q.transpose(0, 2, 1, 3).reshape(B * N, T, H)
    kh = k.transpose(0, 2, 1, 3).reshape(B * G, S, H)
    vh = v.transpose(0, 2, 1, 3).reshape(B * G, S, H)

    n_k = S // K_TILE
    kernel = functools.partial(_flash_kernel, scale=scale, n_k=n_k, causal=causal)

    def kv_head(bh):  # query head index -> kv head index
        b = bh // N
        h = bh % N
        return b * G + h // q_per_kv

    out = pl.pallas_call(
        kernel,
        grid=(B * N, T // Q_TILE, n_k),
        in_specs=[
            pl.BlockSpec((1, Q_TILE, H), lambda bh, qt, kt: (bh, qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K_TILE, H), lambda bh, qt, kt: (kv_head(bh), kt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K_TILE, H), lambda bh, qt, kt: (kv_head(bh), kt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Q_TILE, H), lambda bh, qt, kt: (bh, qt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * N, T, H), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((Q_TILE, 128), jnp.float32),  # running max
            pltpu.VMEM((Q_TILE, 128), jnp.float32),  # running denom
            pltpu.VMEM((Q_TILE, H), jnp.float32),    # output accumulator
        ],
        interpret=_INTERPRET,
    )(qh, kh, vh)
    return out.reshape(B, N, T, H).transpose(0, 2, 1, 3)


def use_flash(q_len: int, head_size: int) -> bool:
    """Prefill heuristic: long enough to tile, head fits a block."""
    return (
        jax.default_backend() == "tpu"
        and q_len % Q_TILE == 0
        and head_size in (64, 128, 256)
    )
