"""GPTQ (Frantar et al., arXiv:2210.17323) in JAX.

Faithful reimplementation of the reference's ``GPTQQuantizer``
(``quantize/gptq.py:267-445``) for the functional parameter layout:

- Hessian accumulation from calibration activations with the same running
  renormalization (``collect_input_stats``, ``gptq.py:349-363``);
- damped Cholesky inverse chain ``H -> chol -> inv -> upper-chol``
  (``gptq.py:385-391``);
- per-block greedy column quantization with error feedback
  (``gptq.py:393-425``) — the intrinsically serial inner loop runs as a
  ``lax.fori_loop`` over the block's columns with masked tail updates, while
  the outer block loop is a static Python loop so per-group scale/zero
  recomputation happens at trace-time-known boundaries;
- optional ``actorder`` permutation (``gptq.py:377-380``), incompatible with
  grouped quantization exactly as in the reference (``:308-310``).

All math in float32 with HIGHEST matmul precision (the Cholesky inverse is
precision-sensitive; TPU fp32 matmuls default to bf16 passes otherwise).

Conventions: weights here are ``[in_features, out_features]``; the GPTQ math
runs on the transposed ``[out, in]`` view so "columns" are input features, as
in the paper and the reference.
"""

from __future__ import annotations

import functools
import math
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from parrot_tpu.quantize import formats as formats_mod
from parrot_tpu.quantize.formats import QuantizedLinear, pack_nibbles  # noqa: F401

HIGH = lax.Precision.HIGHEST


def init_hessian(in_features: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    return jnp.zeros((in_features, in_features), jnp.float32), jnp.zeros((), jnp.float32)


@jax.jit
def accumulate_hessian(
    H: jnp.ndarray, nsamples: jnp.ndarray, x: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Running ``H = 2/n * sum_i x_i x_i^T`` over calibration activations.

    ``x``: [B, T, in] (or [tokens, in]); the sample count increments by the
    batch size, matching ``collect_input_stats`` (``gptq.py:349-363``).
    """
    batch = x.shape[0] if x.ndim == 3 else 1
    xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    new_n = nsamples + batch
    H = H * (nsamples / new_n)
    xf = xf * jnp.sqrt(2.0 / new_n)
    return H + jnp.dot(xf.T, xf, precision=HIGH), new_n


def find_params_weight(x: jnp.ndarray, maxq: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row asymmetric min/max scale+zero (``find_params_weight``,
    ``gptq.py:317-347``, perchannel asym path). ``x``: [rows, cols]."""
    xmin = jnp.minimum(x.min(axis=1), 0.0)
    xmax = jnp.maximum(x.max(axis=1), 0.0)
    degenerate = (xmin == 0) & (xmax == 0)
    xmin = jnp.where(degenerate, -1.0, xmin)
    xmax = jnp.where(degenerate, 1.0, xmax)
    scale = (xmax - xmin) / maxq
    zero = jnp.round(-xmin / scale)
    return scale, zero


def _quant_col(w, scale, zero, maxq):
    q = jnp.clip(jnp.round(w / scale) + zero, 0, maxq)
    return scale * (q - zero)


@functools.partial(jax.jit, static_argnames=("percdamp", "actorder"))
def _dead_damp(H, W, *, percdamp: float, actorder: bool):
    K = H.shape[0]
    dead = jnp.diag(H) == 0
    H = jnp.where(jnp.eye(K, dtype=bool) & dead[None, :], 1.0, H)
    W = jnp.where(dead[None, :], 0.0, W)
    perm = None
    if actorder:
        perm = jnp.argsort(-jnp.diag(H))
        W = W[:, perm]
        H = H[perm][:, perm]
    damp = percdamp * jnp.mean(jnp.diag(H))
    H = H + jnp.eye(K) * damp
    return H, W, perm


@functools.partial(jax.jit, static_argnames=("c0", "cs"))
def _tri_solve_block(L, *, c0: int, cs: int):
    """Columns [c0, c0+cs) of L^-1 via a triangular solve against an identity
    slice — chunked so no single program holds the full K x K solve temps."""
    K = L.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (K, cs), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (K, cs), 1) + c0
    rhs = (rows == cols).astype(jnp.float32)
    return jax.lax.linalg.triangular_solve(
        L, rhs, left_side=True, lower=True
    )


@jax.jit
def _chol_reversed(H):
    """Lower Cholesky factor of the index-reversed matrix J H J."""
    return jnp.linalg.cholesky(H[::-1, ::-1])


# Above this K the triangular-inverse chunks stream through host RAM so the
# device never holds L, the chunk outputs AND the assembled U at once —
# 70B-class layers (mlp.proj K=28672, falcon-40b K=32768) calibrate on one
# 16 GB chip (the reference streams blocks for the same reason,
# quantize/gptq.py:456-548).
OFFLOAD_FEATURES = 16384


def _prepare_hinv(H, W, *, percdamp: float, actorder: bool,
                  offload: bool | None = None):
    """Dead-column handling, damping, and the upper factor ``U`` with
    ``H^-1 = U^T U`` (what the block loop consumes; ≙ the reference's
    cholesky -> cholesky_inverse -> cholesky(upper) chain, gptq.py:385-391).

    Uses the reversal identity ``U = J · chol(J H J)^-1 · J`` (Cholesky
    uniqueness: J L^-1 J is upper-triangular with positive diagonal and
    satisfies H^-1 = (JL^-1J)^T (JL^-1J)) — ONE Cholesky plus a chunked
    triangular inverse instead of chol -> full inverse -> gram -> second
    chol. Device peak is ~2 K^2 fp32 (the Cholesky in/out) instead of ~4 K^2,
    and with ``offload`` the inverse chunks round-trip through host RAM so
    K=28672+ layers fit a 16 GB chip.
    """
    K = H.shape[0]
    if offload is None:
        offload = K > OFFLOAD_FEATURES
    H, W, perm = _dead_damp(H, W, percdamp=percdamp, actorder=actorder)
    Lr = _chol_reversed(H)
    jax.block_until_ready(Lr)
    del H
    if offload:
        # TRUE offload: only the Cholesky runs on device (~2 K^2 fp32 peak).
        # XLA's triangular_solve program materializes ~3 copies of L in temps
        # — 15.3 GB at K=28672, over HBM even chunked (measured round 3) — so
        # the inverse runs on the host in column chunks instead; the greedy
        # block loop then streams U back up once. scipy ships transitively
        # with jax; if a slim env lacks it, fall through to the chunked
        # device solve (smaller-K path) rather than crash.
        try:
            import scipy.linalg
        except ImportError:
            offload = False
    if offload:
        L_host = np.asarray(Lr)
        Lr.delete()  # free K^2 on device before uploading U
        cs = 4096
        cols = []
        for c0 in range(0, K, cs):
            rhs = np.zeros((K, min(cs, K - c0)), np.float32)
            rhs[np.arange(c0, c0 + rhs.shape[1]), np.arange(rhs.shape[1])] = 1.0
            cols.append(scipy.linalg.solve_triangular(
                L_host, rhs, lower=True, check_finite=False))
        del L_host
        Linv_r = np.concatenate(cols, axis=1)
        del cols
        U = jnp.asarray(Linv_r[::-1, ::-1])
        return W, U, perm
    cs = min(K, 1024)  # solve temps scale with the RHS width; 4096 peaked >17 GB at K=16k
    blocks = []
    for c0 in range(0, K, cs):
        blk = _tri_solve_block(Lr, c0=c0, cs=min(cs, K - c0))
        jax.block_until_ready(blk)
        blocks.append(blk)
    U = jnp.concatenate(blocks, axis=1)[::-1, ::-1]
    return W, U, perm


def gptq_quantize_matrix(
    w: jnp.ndarray,  # [in, out]
    H: jnp.ndarray,  # [in, in]
    *,
    bits: int = 4,
    blocksize: int = 128,
    percdamp: float = 0.01,
    groupsize: int = -1,
    actorder: bool = False,
    offload: bool | None = None,
):
    """Run GPTQ on one weight matrix.

    Returns ``(q_codes [in, out] uint8, scales [n_groups, out],
    zeros [n_groups, out], error)`` in the layout
    :class:`~parrot_tpu.quantize.formats.QuantizedLinear` packs.

    The outer block loop is a ``lax.fori_loop`` (one traced body regardless of
    K) with masked full-width error propagation; this keeps compile time and
    HLO-temp memory flat in K where a python-unrolled loop OOMs the compiler
    on 16k-feature layers.
    """
    if actorder and groupsize != -1:
        raise ValueError("actorder is incompatible with grouped quantization")
    K, N = w.shape
    W0 = w.astype(jnp.float32).T  # [out, in]: GPTQ operates over input columns
    # separate dispatch: the Cholesky chain's K^2 temporaries must not share a
    # program with the block loop (jit-of-jit inlines, so this cannot be an
    # inner jitted call)
    W, Hinv, perm = _prepare_hinv(
        H, W0, percdamp=percdamp, actorder=actorder, offload=offload
    )
    jax.block_until_ready(Hinv)
    return _gptq_blocks(
        W, Hinv, perm, bits=bits, blocksize=blocksize, groupsize=groupsize,
        actorder=actorder,
    )


@functools.partial(
    jax.jit, static_argnames=("bits", "blocksize", "groupsize", "actorder")
)
def _gptq_blocks(W, Hinv, perm, *, bits, blocksize, groupsize, actorder):
    maxq = 2**bits - 1
    N, K = W.shape

    gs = K if groupsize == -1 else groupsize
    # block size must divide both K and (for grouped mode) the group size so
    # every block sits inside one scale group
    bs = math.gcd(blocksize, K) if groupsize == -1 else math.gcd(math.gcd(blocksize, gs), K)
    n_blocks = K // bs
    n_groups = K // gs if groupsize != -1 else 1

    scales = jnp.zeros((n_groups, N), jnp.float32)
    zeros = jnp.zeros((n_groups, N), jnp.float32)
    if groupsize == -1:
        s0, z0 = find_params_weight(W, maxq)  # [out]
        scales = s0[None, :]
        zeros = z0[None, :]

    Q0 = jnp.zeros_like(W)
    col_idx = jnp.arange(K)

    def block_step(bi, carry):
        W, Q, scales, zeros, total_loss = carry
        i1 = bi * bs

        if groupsize != -1:
            g = i1 // gs

            def recompute(sz):
                sc, zc = sz
                s_g, z_g = find_params_weight(
                    lax.dynamic_slice(W, (0, i1 - (i1 % gs)), (N, gs)), maxq
                )
                sc = lax.dynamic_update_slice(sc, s_g[None], (g, 0))
                zc = lax.dynamic_update_slice(zc, z_g[None], (g, 0))
                return sc, zc

            scales, zeros = lax.cond(
                i1 % gs == 0, recompute, lambda sz: sz, (scales, zeros)
            )
            scale_col = lax.dynamic_slice(scales, (g, 0), (1, N))[0]
            zero_col = lax.dynamic_slice(zeros, (g, 0), (1, N))[0]
        else:
            scale_col, zero_col = scales[0], zeros[0]

        W1 = lax.dynamic_slice(W, (0, i1), (N, bs))
        Hinv1 = lax.dynamic_slice(Hinv, (i1, i1), (bs, bs))

        def col_step(i, inner):
            W1, Q1, Err1, loss = inner
            wcol = lax.dynamic_index_in_dim(W1, i, axis=1, keepdims=False)  # [out]
            d = Hinv1[i, i]
            q = _quant_col(wcol, scale_col, zero_col, maxq)
            Q1 = lax.dynamic_update_index_in_dim(Q1, q, i, axis=1)
            err = (wcol - q) / d
            loss = loss + jnp.sum((wcol - q) ** 2 / d**2) / 2
            # W1[:, i+1:] -= err (x) Hinv1[i, i+1:]  (masked full-width update)
            tail = jnp.arange(bs) > i
            upd = jnp.outer(err, jnp.where(tail, Hinv1[i], 0.0))
            W1 = W1 - upd
            Err1 = lax.dynamic_update_index_in_dim(Err1, err, i, axis=1)
            return W1, Q1, Err1, loss

        W1, Q1, Err1, total_loss = lax.fori_loop(
            0, bs, col_step, (W1, jnp.zeros_like(W1), jnp.zeros_like(W1), total_loss)
        )
        Q = lax.dynamic_update_slice(Q, Q1, (0, i1))
        # propagate block error to all remaining columns (gptq.py:425) —
        # masked full-width matmul keeps shapes static inside the fori_loop
        Hrows = lax.dynamic_slice(Hinv, (i1, 0), (bs, K))
        Hrows = jnp.where(col_idx[None, :] >= i1 + bs, Hrows, 0.0)
        W = W - jnp.dot(Err1, Hrows, precision=HIGH)
        return W, Q, scales, zeros, total_loss

    _, Q, scales, zeros, total_loss = lax.fori_loop(
        0, n_blocks, block_step,
        (W, Q0, scales, zeros, jnp.float32(0.0)),
    )

    if actorder:
        invperm = jnp.argsort(perm)
        Q = Q[:, invperm]

    # Q holds dequantized values; recover integer codes for packing
    if groupsize == -1:
        codes = jnp.clip(jnp.round(Q / scales[0][:, None] + zeros[0][:, None]), 0, maxq)
    else:
        Qg = Q.reshape(N, K // gs, gs)
        codes = jnp.clip(
            jnp.round(Qg / scales.T[:, :, None] + zeros.T[:, :, None]), 0, maxq
        ).reshape(N, K)
    codes = codes.T.astype(jnp.uint8)  # [in, out]
    return codes, scales, zeros, total_loss


def gptq_quantize_linear(
    group: dict,
    H: jnp.ndarray,
    *,
    bits: int = 4,
    blocksize: int = 128,
    percdamp: float = 0.01,
    groupsize: int = -1,
    actorder: bool = False,
) -> tuple[QuantizedLinear, float]:
    """Quantize one dense linear param group ``{"w": [in, out], "b"?}``."""
    w = group["w"]
    codes, scales, zeros, err = gptq_quantize_matrix(
        w, H, bits=bits, blocksize=blocksize, percdamp=percdamp,
        groupsize=groupsize, actorder=actorder,
    )
    if bits not in (2, 4, 8):
        # same bit-width menu as the reference's ColBlockQuantizedLinear
        # (quantize/gptq.py:205-213)
        raise NotImplementedError("GPTQ packing supports bits in (2, 4, 8)")
    fmt = {2: "int2", 4: "int4", 8: "int8g"}[bits]
    codes, scales, zeros = pad_quant_fields(
        codes, scales, zeros, groupsize, pack=formats_mod.PACK_RATIO[fmt]
    )
    return (
        QuantizedLinear(
            qw=formats_mod.pack_codes(codes, bits),
            scales=scales,
            zeros=zeros,
            b=group.get("b"),
            fmt=fmt,
            group_size=groupsize,
            in_features=w.shape[0],
            out_features=w.shape[1],
        ),
        float(err),
    )


def pad_quant_fields(codes, scales, zeros, groupsize, pack: int = 2):
    """Pad codes/scales/zeros to storage alignment so the packed tensor
    matches the tile-aligned layout of :func:`formats._quantize_asym`. Padded
    rows/cols dequantize to exactly 0. ``pack``: K-rows per storage byte."""
    from parrot_tpu.quantize.formats import K_ALIGN, N_ALIGN, _round_up

    K, N = codes.shape
    Kp, Np = _round_up(K, K_ALIGN), _round_up(N, N_ALIGN)
    if groupsize != -1 and Kp % groupsize != 0:
        # unalignable group size: minimal (pack) padding
        Kp = _round_up(K, max(pack, 1))
    if (Kp, Np) == (K, N):
        return codes, scales, zeros
    # N padding: codes 0 / zeros 0 -> (0-0)*s == 0 for any scale
    scales = jnp.pad(scales, ((0, 0), (0, Np - N)), constant_values=1.0)
    zeros = jnp.pad(zeros, ((0, 0), (0, Np - N)))
    codes = jnp.pad(codes, ((0, 0), (0, Np - N)))
    if Kp != K:
        if groupsize == -1:
            # padded rows extend the single group: code == zero-point -> 0
            pad_rows = jnp.broadcast_to(
                jnp.round(zeros[0]).astype(codes.dtype)[None, :], (Kp - K, Np)
            )
            codes = jnp.concatenate([codes, pad_rows], axis=0)
        else:
            # padded rows form whole new groups with zero-point 0
            codes = jnp.pad(codes, ((0, Kp - K), (0, 0)))
            extra = (Kp - K) // groupsize
            scales = jnp.pad(scales, ((0, extra), (0, 0)), constant_values=1.0)
            zeros = jnp.pad(zeros, ((0, extra), (0, 0)))
    return codes, scales, zeros
