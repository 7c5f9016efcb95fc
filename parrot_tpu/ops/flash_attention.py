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

Training path (the reference trains THROUGH flash-attn-2,
``lit_gpt/model.py:256-275``): ``flash_attention`` carries a
``jax.custom_vjp`` whose backward is two more Pallas kernels
(FlashAttention-2 style):
- the forward-under-vjp variant additionally emits the row logsumexp
  ``lse = m + log(l)`` (lane-broadcast ``[BN, T, 128]``, the layout the
  VPU reduces to for free) as the only softmax residual;
- dQ kernel: grid ``(B·N, q_tile, k_tile)`` — recomputes the score tile,
  forms ``p = exp(s - lse)``, ``ds = p·(dp - Δ)``, accumulates
  ``dq += ds·k`` in f32 scratch;
- dKV kernel: grid ``(B·G, k_tile, q_tile · q_per_kv)`` — the innermost
  axis walks every (group-member, q-tile) pair so GQA/MQA gradients
  accumulate into the *unrepeated* K/V heads in VMEM scratch, never
  materializing per-query-head dK/dV in HBM;
- ``Δ = Σ_h dO·O`` is a cheap fused XLA rowsum, computed outside.
Tiles strictly above the causal diagonal are skipped in both kernels.
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
LANES = 128  # lane-broadcast width for per-row statistics

_INTERPRET = False

NEG_INF = float(np.finfo(np.float32).min)


def _flash_kernel(
    q_ref, k_ref, v_ref, out_ref, *rest,
    scale: float, n_k: int, causal: bool, emit_lse: bool,
):
    if emit_lse:
        lse_ref, m_ref, l_ref, acc_ref = rest
    else:
        m_ref, l_ref, acc_ref = rest
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
        l_final = l_ref[:, :1]
        denom = jnp.where(l_final == 0, 1.0, l_final)
        out_ref[0] = (acc_ref[:] / denom).astype(out_ref.dtype)
        if emit_lse:
            lse = m_ref[:, :1] + jnp.log(denom)  # rows with l==0 never occur causally
            lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _flash_call(qh, kh, vh, *, scale, causal, N, G, emit_lse):
    """Shared pallas_call for the forward kernel over head-major inputs.

    qh: [B*N, T, H]; kh/vh: [B*G, S, H]. Returns out [B*N, T, H] and, when
    ``emit_lse``, the lane-broadcast logsumexp [B*N, T, LANES] (f32).
    """
    BN, T, H = qh.shape
    S = kh.shape[1]
    q_per_kv = N // G
    n_k = S // K_TILE
    kernel = functools.partial(
        _flash_kernel, scale=scale, n_k=n_k, causal=causal, emit_lse=emit_lse
    )

    def kv_head(bh):  # query head index -> kv head index
        b = bh // N
        h = bh % N
        return b * G + h // q_per_kv

    out_shape = [jax.ShapeDtypeStruct((BN, T, H), qh.dtype)]
    out_specs = [
        pl.BlockSpec((1, Q_TILE, H), lambda bh, qt, kt: (bh, qt, 0),
                     memory_space=pltpu.VMEM)
    ]
    if emit_lse:
        out_shape.append(jax.ShapeDtypeStruct((BN, T, LANES), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, Q_TILE, LANES), lambda bh, qt, kt: (bh, qt, 0),
                         memory_space=pltpu.VMEM)
        )

    results = pl.pallas_call(
        kernel,
        grid=(BN, T // Q_TILE, n_k),
        in_specs=[
            pl.BlockSpec((1, Q_TILE, H), lambda bh, qt, kt: (bh, qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K_TILE, H), lambda bh, qt, kt: (kv_head(bh), kt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K_TILE, H), lambda bh, qt, kt: (kv_head(bh), kt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((Q_TILE, LANES), jnp.float32),  # running max
            pltpu.VMEM((Q_TILE, LANES), jnp.float32),  # running denom
            pltpu.VMEM((Q_TILE, H), jnp.float32),      # output accumulator
        ],
        interpret=_INTERPRET,
    )(qh, kh, vh)
    if emit_lse:
        return results[0], results[1]
    return results[0], None


def _heads_major(q, k, v):
    B, T, N, H = q.shape
    S, G = k.shape[1], k.shape[2]
    qh = q.transpose(0, 2, 1, 3).reshape(B * N, T, H)
    kh = k.transpose(0, 2, 1, 3).reshape(B * G, S, H)
    vh = v.transpose(0, 2, 1, 3).reshape(B * G, S, H)
    return qh, kh, vh


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_attention(q, k, v, scale, causal):
    B, T, N, H = q.shape
    G = k.shape[2]
    qh, kh, vh = _heads_major(q, k, v)
    out, _ = _flash_call(qh, kh, vh, scale=scale, causal=causal, N=N, G=G,
                         emit_lse=False)
    return out.reshape(B, N, T, H).transpose(0, 2, 1, 3)


def _flash_fwd(q, k, v, scale, causal):
    B, T, N, H = q.shape
    G = k.shape[2]
    qh, kh, vh = _heads_major(q, k, v)
    out, lse = _flash_call(qh, kh, vh, scale=scale, causal=causal, N=N, G=G,
                           emit_lse=True)
    primal = out.reshape(B, N, T, H).transpose(0, 2, 1, 3)
    return primal, (qh, kh, vh, out, lse, (B, T, N, H, G))


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref, acc_ref,
    *, scale: float, n_k: int, causal: bool,
):
    kt = pl.program_id(2)
    qt = pl.program_id(1)

    @pl.when(kt == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    visible = (not causal) or (kt * K_TILE <= qt * Q_TILE + Q_TILE - 1)

    @pl.when(visible)
    def _():
        q = q_ref[0].astype(jnp.bfloat16)   # [Tq, H]
        k = k_ref[0].astype(jnp.bfloat16)   # [Tk, H]
        v = v_ref[0].astype(jnp.bfloat16)   # [Tk, H]
        do = do_ref[0].astype(jnp.bfloat16)  # [Tq, H]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [Tq, Tk]
        if causal:
            q_pos = qt * Q_TILE + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            k_pos = kt * K_TILE + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        p = jnp.exp(s - lse_ref[0][:, :1])  # [Tq, Tk]; masked entries -> 0
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [Tq, Tk]
        ds = p * (dp - di_ref[0][:, :1]) * scale
        acc_ref[:] += jax.lax.dot_general(
            ds.astype(jnp.bfloat16), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kt == n_k - 1)
    def _():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, scale: float, n_q: int, n_inner: int, causal: bool,
):
    kt = pl.program_id(1)
    it = pl.program_id(2)  # walks (group member, q tile) pairs
    qt = it % n_q

    @pl.when(it == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    visible = (not causal) or (kt * K_TILE <= qt * Q_TILE + Q_TILE - 1)

    @pl.when(visible)
    def _():
        q = q_ref[0].astype(jnp.bfloat16)   # [Tq, H]
        k = k_ref[0].astype(jnp.bfloat16)   # [Tk, H]
        v = v_ref[0].astype(jnp.bfloat16)   # [Tk, H]
        do = do_ref[0].astype(jnp.bfloat16)  # [Tq, H]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [Tq, Tk]
        if causal:
            q_pos = qt * Q_TILE + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            k_pos = kt * K_TILE + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        p = jnp.exp(s - lse_ref[0][:, :1]).astype(jnp.bfloat16)  # [Tq, Tk]
        # dV += P^T dO
        dv_acc[:] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [Tq, Tk]
        ds = (p.astype(jnp.float32) * (dp - di_ref[0][:, :1]) * scale).astype(
            jnp.bfloat16
        )
        # dK += dS^T Q
        dk_acc[:] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(it == n_inner - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd(scale, causal, residuals, g):
    qh, kh, vh, out, lse, (B, T, N, H, G) = residuals
    S = kh.shape[1]
    q_per_kv = N // G
    n_q, n_k = T // Q_TILE, S // K_TILE

    doh = g.transpose(0, 2, 1, 3).reshape(B * N, T, H)
    # Δ_i = Σ_h dO·O — one fused XLA rowsum, lane-broadcast like lse
    di = jnp.sum(doh.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    di = jnp.broadcast_to(di[..., None], (B * N, T, LANES))

    stat_spec = pl.BlockSpec((1, Q_TILE, LANES), lambda bh, qt, kt: (bh, qt, 0),
                             memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, Q_TILE, H), lambda bh, qt, kt: (bh, qt, 0),
                          memory_space=pltpu.VMEM)

    def kv_head(bh):
        b = bh // N
        h = bh % N
        return b * G + h // q_per_kv

    k_spec = pl.BlockSpec((1, K_TILE, H), lambda bh, qt, kt: (kv_head(bh), kt, 0),
                          memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, n_k=n_k, causal=causal),
        grid=(B * N, n_q, n_k),
        in_specs=[q_spec, k_spec, k_spec, q_spec, stat_spec, stat_spec],
        out_specs=pl.BlockSpec((1, Q_TILE, H), lambda bh, qt, kt: (bh, qt, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * N, T, H), qh.dtype),
        scratch_shapes=[pltpu.VMEM((Q_TILE, H), jnp.float32)],
        interpret=_INTERPRET,
    )(qh, kh, vh, doh, lse, di)

    # dK/dV: one program per (batch·kv-head, k tile); the inner axis walks all
    # q tiles of every query head in the group, accumulating in VMEM.
    n_inner = n_q * q_per_kv

    def q_head(bg, it):  # (batch·group, inner index) -> query-head row in qh
        b = bg // G
        gidx = bg % G
        member = it // n_q
        return b * N + gidx * q_per_kv + member

    bq_spec = pl.BlockSpec(
        (1, Q_TILE, H), lambda bg, kt, it: (q_head(bg, it), it % n_q, 0),
        memory_space=pltpu.VMEM)
    bstat_spec = pl.BlockSpec(
        (1, Q_TILE, LANES), lambda bg, kt, it: (q_head(bg, it), it % n_q, 0),
        memory_space=pltpu.VMEM)
    bk_spec = pl.BlockSpec((1, K_TILE, H), lambda bg, kt, it: (bg, kt, 0),
                           memory_space=pltpu.VMEM)
    bkv_out = pl.BlockSpec((1, K_TILE, H), lambda bg, kt, it: (bg, kt, 0),
                           memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, n_q=n_q, n_inner=n_inner,
                          causal=causal),
        grid=(B * G, n_k, n_inner),
        in_specs=[bq_spec, bk_spec, bk_spec, bq_spec, bstat_spec, bstat_spec],
        out_specs=[bkv_out, bkv_out],
        out_shape=[
            jax.ShapeDtypeStruct((B * G, S, H), kh.dtype),
            jax.ShapeDtypeStruct((B * G, S, H), vh.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((K_TILE, H), jnp.float32),
            pltpu.VMEM((K_TILE, H), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(qh, kh, vh, doh, lse, di)

    dq = dq.reshape(B, N, T, H).transpose(0, 2, 1, 3)
    dk = dk.reshape(B, G, S, H).transpose(0, 2, 1, 3)
    dv = dv.reshape(B, G, S, H).transpose(0, 2, 1, 3)
    return dq, dk, dv


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,  # [B, T, n_head, H]
    k: jnp.ndarray,  # [B, S, groups, H]
    v: jnp.ndarray,  # [B, S, groups, H]
    *,
    scale: float,
    causal: bool = True,
) -> jnp.ndarray:
    """Tiled attention; returns [B, T, n_head, H]. Requires T % Q_TILE == 0
    and S % K_TILE == 0 (callers pad or fall back). Differentiable: the
    custom VJP runs Pallas backward kernels (see module docstring)."""
    return _flash_attention(q, k, v, float(scale), bool(causal))


def use_flash(q_len: int, head_size: int) -> bool:
    """Prefill heuristic: long enough to tile, head fits a block."""
    return (
        jax.default_backend() == "tpu"
        and q_len % Q_TILE == 0
        and head_size in (64, 128, 256)
    )
