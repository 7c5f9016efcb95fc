"""Fused Pallas dequant-matmul kernels (int8 / int4 / NF4 / FP4) for TPU.

The TPU-native answer to the reference's Triton int4 kernel
(``quantize/gptq.py:28-153``) and the bitsandbytes CUDA kernels
(``quantize/bnb.py``). Design points, all different from the Triton kernel
because the regime is different:

- **Decode is HBM-bound**: the only bytes that matter are the packed weights.
  The kernel streams packed tiles HBM->VMEM and never materializes the
  dequantized matrix in HBM. (The Triton kernel pads M to 256 for the MXU-era
  GPU tiling, ``gptq.py:161-168`` — exactly wrong for M=1 decode.)
- **The MXU multiplies the raw codes**: for int4/int8, scales and zero points
  commute past the contraction —
  ``y = sum_g s_g * (x_g @ q_g - z_g * sum(x_g))`` — so the dot runs on codes
  cast to bf16 (exact for ints < 256) and dequant math happens per tile on
  [1, N]-shaped statistics in the VPU.
- **Unpacking is a sublane concat**, thanks to the blocked split-half packing
  (``formats.PACK_BLOCK``): ``lo = b & 0xF; hi = b >> 4; concat`` — no
  cross-sublane interleave.
- **NF4/FP4 decode is a 4-level select tree** on the nibble bits (15 VPU
  selects against broadcast constants) rather than a 16-entry gather, which
  the VPU has no fast path for.

Grid: ``(m, n, k)`` with k innermost; a float32 VMEM scratch accumulates
partials and flushes to the output on the last k step.

All shapes arrive pre-padded by the quantized formats (``K % 256 == 0``,
``N % 128 == 0``); the wrapper pads M and activations' K and slices the
output back to logical width. Edge tiles may be partial on BOTH N and K:
N stores are masked by Pallas, and a ragged K (falcon 18176, llama 11008)
rides a partial K edge tile whose out-of-bounds weight reads are finite
integer garbage multiplied by zero-padded activations, with in-kernel
scale-row clamps (see ``_pick_k_tile``). N tiles are chosen per matrix to
avoid partial N tiles where the width allows (``_pick_n_tile``) — on
falcon-7b this one change was worth +51% decode throughput (PERF.md r5).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parrot_tpu.quantize import formats

# Tiles sized for HBM streaming: per grid step the kernel moves a
# [K_TILE/2, N_TILE] packed block (1 MB at 512x4096) so per-step pipeline
# overhead (DMA setup, semaphores, index math) amortizes. Swept in-model on
# v5e (3B int4 decode): N_TILE 128 -> 512 -> 1024 -> 2048 -> 4096 gives
# 54 -> 134 -> 147 -> 155 -> 162 tok/s; K_TILE=1024 and a hand-blocked
# contiguous weight layout both measured worse (XLA's native tiled array
# layout already serves the DMA well). K_TILE spans two PACK_BLOCKs (unpack
# = two sublane concats); N edge blocks may be partial (Pallas masks them).
K_TILE = 2 * formats.PACK_BLOCK  # 512 unpacked rows = 256 packed rows
N_TILE = 4096
M_TILE = 128

# N-tile policy. "fitted" removes partial N tiles where the padded width
# allows: whole-matrix tiles up to 9216 lanes, else the largest 128-multiple
# divisor in [2048, 9216], else the classic 4096 (partial edge tile). The
# round-5 falcon-7b profile showed the classic policy streaming at ~245 GB/s
# effective (vs ~490 GB/s on the 4096-friendly 3B shapes): falcon's widths
# (4736 / 4608 / 18176) make every second-or-so grid step a mostly-empty
# edge tile. "classic" kept for A/B.
N_TILE_MODE = "fitted"


def _pick_n_tile(Np: int, rows: int = 128, m_tile: int = 8,
                 extra_rows_f32: int = 0) -> int:
    """Pick the N tile under a scoped-VMEM byte budget.

    Per-lane VMEM cost of one grid step: the f32 accumulator + output
    (``m_tile`` rows x ~6 B), the double-buffered packed weight tile
    (``rows`` x 2 B, rows = k_tile//pack), and any full-height f32
    scale/zero rows the kernel keeps resident (``extra_rows_f32`` x 4 B).
    The scoped-vmem limit is 16 MB; budget 10 MB and leave the rest to the
    pipeline. This is what the prefill path (m_tile=128) OOM'd on when the
    first fitted policy only counted weight bytes ("Scoped allocation with
    size 20.47M and limit 16.00M", PERF.md r5). Widths the classic 4096
    already divides keep it (the 3B A/B measured larger even tiles ~3%
    slower); only widths that would pay a partial edge tile get fitted."""
    if N_TILE_MODE == "classic" or Np % N_TILE == 0:
        return N_TILE
    if m_tile > 8:
        # prefill (M >= 128) is MXU-bound and its wide accumulator/output
        # buffers blow the scoped-vmem limit at fitted widths (measured:
        # 20.5M/24.7M vs the 16M limit); tile fitting is a decode-bandwidth
        # optimization — keep the proven classic tiling here
        return N_TILE
    per_lane = m_tile * 6 + rows * 2 + extra_rows_f32 * 4
    cap = max(2048, min(16384, (10_000_000 // max(per_lane, 1)) // 128 * 128))
    # DMA-efficiency bound on the weight tile itself (~2.5 MB): the on-chip
    # A/B'd decode picks (falcon 16256-lane lm_head, 3B 8448) live here
    cap = min(cap, max(2048, (2_621_440 // max(rows, 1)) // 128 * 128))
    if Np <= cap:
        return Np
    nd = Np // 128
    for cand in range(cap // 128, 15, -1):
        if nd % cand == 0:
            return cand * 128
    return min(N_TILE, cap)


_INTERPRET = False  # flipped by tests on CPU


def _decode_code(q_bits: jnp.ndarray, code: np.ndarray) -> jnp.ndarray:
    """Map 4-bit codes to codebook values with a binary select tree."""
    vals = code.astype(np.float32)
    level = [jnp.float32(v) for v in vals]
    # 16 -> 8 -> 4 -> 2 -> 1 selects on bits 0..3
    for bit in range(4):
        b = ((q_bits >> bit) & 1) == 1
        level = [jnp.where(b, level[2 * i + 1], level[2 * i]) for i in range(len(level) // 2)]
    return level[0]


def _unpack_tile(packed: jnp.ndarray) -> jnp.ndarray:
    """[K//2, N] uint8 -> [K, N] int32 (blocked split-half, possibly several
    PACK_BLOCKs per tile).

    Bit ops run in int32: Mosaic has no vector i8 shift (arith.shrui fails to
    legalize), and the widening is free relative to the dot that follows.
    """
    half = formats.PACK_BLOCK // 2  # packed rows per block
    rows, N = packed.shape
    p32 = packed.astype(jnp.int32)  # zero-extends: high bits are already 0
    lo = p32 & 0xF
    hi = p32 >> 4
    if rows == half:
        return jnp.concatenate([lo, hi], axis=0)
    n_blocks = rows // half
    lo = lo.reshape(n_blocks, half, N)
    hi = hi.reshape(n_blocks, half, N)
    return jnp.concatenate([lo, hi], axis=1).reshape(2 * rows, N)


def _to_bf16(q: jnp.ndarray) -> jnp.ndarray:
    """Integer codes -> bf16 (exact for |q| < 256). Mosaic has no direct
    (u)int8 -> bfloat16 cast; route through int32/float32."""
    if q.dtype != jnp.int32:
        q = q.astype(jnp.int32)
    return q.astype(jnp.float32).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# int8
# ---------------------------------------------------------------------------


def _int8_kernel(x_ref, qw_ref, scales_ref, out_ref, acc_ref, *, n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _to_bf16(qw_ref[:])
    acc_ref[:] += jnp.dot(
        x_ref[:].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = (acc_ref[:] * scales_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# int4 (GPTQ asymmetric, grouped)
# ---------------------------------------------------------------------------


def _int4_kernel(
    x_ref, qw_ref, scales_ref, zeros_ref, out_ref, acc_ref, *, n_k: int, gs: int,
    k_tile: int, n_groups: int = 1,
):
    """scales_ref/zeros_ref hold ALL group rows for this n-tile (tiny: a few
    KB) — per-group rows are picked with a dynamic index computed from the
    k grid position, which sidesteps the sublane-divisibility rule on tiled
    scale blocks."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = _to_bf16(_unpack_tile(qw_ref[:]))  # [k_tile, N_TILE]
    x = x_ref[:].astype(jnp.bfloat16)
    groups_per_tile = max(1, k_tile // gs)
    sub = min(gs, k_tile)
    for g in range(groups_per_tile):
        xg = x[:, g * sub : (g + 1) * sub]
        qg = q[g * sub : (g + 1) * sub]
        partial = jnp.dot(xg, qg, preferred_element_type=jnp.float32)  # [M, N]
        xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)  # [M, 1]
        row = jnp.minimum((k * k_tile + g * sub) // gs, n_groups - 1)
        s = scales_ref[pl.ds(row, 1), :].astype(jnp.float32)  # [1, N]
        z = zeros_ref[pl.ds(row, 1), :].astype(jnp.float32)
        acc_ref[:] += (partial - xsum * z) * s

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# int4, two-dot form (decode fast path)
# ---------------------------------------------------------------------------
#
# Identity: within one PACK_BLOCK, packed byte j holds lo = q[j] and
# hi = q[j + 128], so with activation halves x_a (rows of lo) and x_b (rows
# of hi):
#
#     x_a @ lo + x_b @ hi  ==  (x_a - x_b/16) @ lo  +  (x_b/16) @ p
#
# where p = lo + 16*hi is the RAW PACKED BYTE. The [M, k]-sized activation
# rewrite is free; on the weight-sized data the kernel does ONE mask
# (lo = p & 0xF) and two int->float casts — no shift, no sublane concat, and
# half the former cast traffic. Decode at M=1 is VPU-bound on exactly that
# per-byte elementwise work (the [1MB] DMA per grid step takes ~1.4 us at
# roofline while the old unpack chain cost ~5x that), so cutting passes is
# cutting tok/s directly. Requires every pack block inside one scale group
# (group_size % 256 == 0, including the GPTQ default -1).

# Which int4 kernel `int4_matmul` uses when shapes allow: "2dot" (above) or
# "grouped" (the general kernel). Module-level so the in-model sweep can flip
# it; both are numerically exact in weight treatment.
INT4_VARIANT = "2dot"
# Feed f32 straight into the MXU dots (skips the f32->bf16 pass over weight
# codes; the MXU runs f32 as multiple bf16 passes, irrelevant at decode M).
# Default True per the round-2 TPU sweep (scripts/sweep_int4_kernel.py):
# in-model 3B decode 184.9 tok/s (2dot-f32) vs 174.5 (grouped) vs 159.5
# (2dot-bf16); W8A8 measured 198.9 but stays opt-in (activation-int8
# numerics).
DOT_F32 = True


def _int4_2dot_kernel(
    x_ref, qw_ref, scales_ref, zeros_ref, out_ref, acc_ref, *, n_k: int, gs: int,
    k_tile: int, dot_f32: bool, n_groups: int = 1,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p32 = qw_ref[:].astype(jnp.int32)  # [k_tile//2, N] zero-extended bytes
    lo_d = (p32 & 0xF).astype(jnp.float32)
    p_d = p32.astype(jnp.float32)
    dt = jnp.float32 if dot_f32 else jnp.bfloat16
    if not dot_f32:
        lo_d = lo_d.astype(dt)
        p_d = p_d.astype(dt)

    x = x_ref[:].astype(jnp.float32)  # [M, k_tile]
    half = formats.PACK_BLOCK // 2  # packed rows per block
    for b in range(k_tile // formats.PACK_BLOCK):
        xa = x[:, b * 2 * half : b * 2 * half + half]
        xb = x[:, b * 2 * half + half : (b + 1) * 2 * half]
        v = xb * (1.0 / 16.0)
        u = xa - v
        d = jnp.dot(u.astype(dt), lo_d[b * half : (b + 1) * half],
                    preferred_element_type=jnp.float32)
        d += jnp.dot(v.astype(dt), p_d[b * half : (b + 1) * half],
                     preferred_element_type=jnp.float32)
        row = jnp.minimum((k * k_tile + b * formats.PACK_BLOCK) // gs, n_groups - 1)
        s = scales_ref[pl.ds(row, 1), :].astype(jnp.float32)  # [1, N]
        z = zeros_ref[pl.ds(row, 1), :].astype(jnp.float32)
        xsum = jnp.sum(xa + xb, axis=1, keepdims=True)  # [M, 1]
        acc_ref[:] += (d - xsum * z) * s

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# int2 (GPTQ asymmetric, 4 codes/byte) — the sub-4-bit decode format
# ---------------------------------------------------------------------------
#
# Telescoped-shift identity (the 4-plane generalization of the int4 2-dot
# form). Within one PACK_BLOCK the packed byte is p = q0 + 4·q1 + 16·q2 +
# 64·q3 with plane j holding rows [64j, 64(j+1)). Let t_j = p >> 2j, so
# t_0 = p (raw byte), t_3 = q3, and q_j = t_j − 4·t_{j+1}. Then
#
#   Σ_j x_j·q_j = x_0·t_0 + Σ_{j=1..3} (x_j − 4·x_{j−1})·t_j
#
# The weight-sized elementwise work is 3 shifts + 4 int→float casts per
# packed byte — no masks, no sublane concat — and the packed byte itself
# feeds the first dot untouched. HBM traffic is HALF of int4's, which is the
# whole point: decode is weight-streaming-bound, so 2-bit is the format that
# fits a 7B model under the relay's ~1.7 GB resident-blocks cap
# (falcon-7b blocks ≈ 1.68 GB at 2-bit; int4's 3.4 GB never fits).


def _int2_kernel(
    x_ref, qw_ref, scales_ref, zeros_ref, out_ref, acc_ref, *, n_k: int, gs: int,
    k_tile: int, dot_f32: bool, n_groups: int = 1,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p32 = qw_ref[:].astype(jnp.int32)  # [k_tile//4, N] zero-extended bytes
    dt = jnp.float32 if dot_f32 else jnp.bfloat16
    # all plane values ≤ 255: exact in bf16 as well as f32
    t = [p32.astype(jnp.float32)]
    for j in (1, 2, 3):
        t.append((p32 >> (2 * j)).astype(jnp.float32))
    if not dot_f32:
        t = [tj.astype(dt) for tj in t]

    x = x_ref[:].astype(jnp.float32)  # [M, k_tile]
    qtr = formats.PACK_BLOCK // 4  # 64 packed rows per block, 64 rows per plane
    for b in range(k_tile // formats.PACK_BLOCK):
        xs = [
            x[:, b * 4 * qtr + j * qtr : b * 4 * qtr + (j + 1) * qtr]
            for j in range(4)
        ]
        coefs = [xs[0]] + [xs[j] - 4.0 * xs[j - 1] for j in (1, 2, 3)]
        d = jnp.dot(coefs[0].astype(dt), t[0][b * qtr : (b + 1) * qtr],
                    preferred_element_type=jnp.float32)
        for j in (1, 2, 3):
            d += jnp.dot(coefs[j].astype(dt), t[j][b * qtr : (b + 1) * qtr],
                         preferred_element_type=jnp.float32)
        row = jnp.minimum((k * k_tile + b * formats.PACK_BLOCK) // gs, n_groups - 1)
        s = scales_ref[pl.ds(row, 1), :].astype(jnp.float32)  # [1, N]
        z = zeros_ref[pl.ds(row, 1), :].astype(jnp.float32)
        xsum = jnp.sum(xs[0] + xs[1] + xs[2] + xs[3], axis=1, keepdims=True)
        acc_ref[:] += (d - xsum * z) * s

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


# int2 on the int8 MXU (the fast falcon-7b decode path)
#
# The exact-activation kernel above is VPU-bound: widen + 3 shifts + 4
# int->float casts ≈ 8 int32-width passes per packed byte (profiled at 3-4x
# the DMA time on falcon-7b, PERF.md round 5). This variant does the whole
# weight-sized unpack with THREE i8 masks and one i8 XOR — quarter-cost VPU
# passes, no shifts (Mosaic has no i8 vector shift), no widening — and runs
# the dots on the int8 MXU. Mask-telescoped identity: with
# m0 = p & 0x03, m1 = p & 0x0F, m2 = p & 0x3F (all int8-safe),
#
#   q1 = (m1-m0)/4, q2 = (m2-m1)/16, q3 = (p-m2)/64   =>
#   sum_j x_j q_j = (x0 - x1/4)·m0 + (x1/4 - x2/16)·m1
#                 + (x2/16 - x3/64)·m2 + (x3/64)·p
#
# p itself needs the sign trick (p in [0,255]): p_s8 = bitcast(p ^ 0x80)
# = p - 128, corrected by +128·Σc3q. Activations are int8 per (row,
# quarter-block) — W8A8 numerics, opt-in behind the same quality gate as
# the int4 W8A8 variant (measured on the 70m harness: the 2-bit weight
# error dwarfs the activation-int8 noise).


def _int2_w8a8_kernel(
    x_ref, qw_ref, scales_ref, zeros_ref, out_ref, acc_ref, *, n_k: int, gs: int,
    k_tile: int, n_groups: int = 1,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = qw_ref[:]  # [k_tile//4, N] uint8
    m0 = (packed & 0x03).astype(jnp.int8)
    m1 = (packed & 0x0F).astype(jnp.int8)
    m2 = (packed & 0x3F).astype(jnp.int8)
    p_s8 = pltpu.bitcast(packed ^ 0x80, jnp.int8)  # p - 128

    x = x_ref[:].astype(jnp.float32)  # [M, k_tile]
    qtr = formats.PACK_BLOCK // 4  # 64 rows per plane

    def quant_rows(a):
        """[M, qtr] f32 -> int8 codes + per-row f32 scale."""
        absmax = jnp.max(jnp.abs(a), axis=1, keepdims=True)
        s = jnp.where(absmax == 0, 1.0, absmax / 127.0)
        return jnp.clip(jnp.round(a / s), -127, 127).astype(jnp.int8), s

    y_codes = jnp.zeros(acc_ref.shape, jnp.float32)
    xsum_all = jnp.zeros((x.shape[0], 1), jnp.float32)
    for b in range(k_tile // formats.PACK_BLOCK):
        xs = [
            x[:, b * 4 * qtr + jq * qtr : b * 4 * qtr + (jq + 1) * qtr]
            for jq in range(4)
        ]
        coefs = [
            xs[0] - xs[1] * 0.25,
            xs[1] * 0.25 - xs[2] * 0.0625,
            xs[2] * 0.0625 - xs[3] * (1.0 / 64.0),
            xs[3] * (1.0 / 64.0),
        ]
        planes = [m0, m1, m2, p_s8]
        sl = slice(b * qtr, (b + 1) * qtr)
        for i in range(4):
            cq, si = quant_rows(coefs[i])
            d = jnp.dot(cq, planes[i][sl], preferred_element_type=jnp.int32)
            if i == 3:  # p_s8 = p - 128: add back 128 per contracted code
                d = d + 128 * jnp.sum(cq.astype(jnp.int32), axis=1, keepdims=True)
            y_codes = y_codes + si * d.astype(jnp.float32)
        xsum_all = xsum_all + jnp.sum(xs[0] + xs[1] + xs[2] + xs[3], axis=1,
                                      keepdims=True)
        row = jnp.minimum((k * k_tile + b * formats.PACK_BLOCK) // gs, n_groups - 1)
        s = scales_ref[pl.ds(row, 1), :].astype(jnp.float32)
        z = zeros_ref[pl.ds(row, 1), :].astype(jnp.float32)
        acc_ref[:] += s * (y_codes - z * xsum_all)
        y_codes = jnp.zeros(acc_ref.shape, jnp.float32)
        xsum_all = jnp.zeros((x.shape[0], 1), jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# int8g (GPTQ asymmetric grouped 8-bit, unpacked codes)
# ---------------------------------------------------------------------------


def _uint8g_kernel(
    x_ref, qw_ref, scales_ref, zeros_ref, out_ref, acc_ref, *, n_k: int, gs: int,
    k_tile: int, n_groups: int = 1,
):
    """bits=8 rung of ``ColBlockQuantizedLinear``: same grouped asymmetric
    dequant epilogue as int4, no unpack (codes are whole bytes)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = qw_ref[:].astype(jnp.int32).astype(jnp.float32)  # codes 0..255, exact
    x = x_ref[:].astype(jnp.float32)
    groups_per_tile = max(1, k_tile // gs)
    sub = min(gs, k_tile)
    for g in range(groups_per_tile):
        xg = x[:, g * sub : (g + 1) * sub]
        qg = q[g * sub : (g + 1) * sub]
        partial = jnp.dot(xg, qg, preferred_element_type=jnp.float32)
        xsum = jnp.sum(xg, axis=1, keepdims=True)
        row = jnp.minimum((k * k_tile + g * sub) // gs, n_groups - 1)
        s = scales_ref[pl.ds(row, 1), :].astype(jnp.float32)
        z = zeros_ref[pl.ds(row, 1), :].astype(jnp.float32)
        acc_ref[:] += (partial - xsum * z) * s

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# int4 weights x int8 activations on the int8 MXU (the fast decode path)
# ---------------------------------------------------------------------------


def _int4_w8a8_kernel(
    x_ref, qw_ref, scales_ref, zeros_ref, out_ref, acc_ref, *, n_k: int, gs: int,
    k_tile: int,
):
    """Contract raw int4 codes on the int8 MXU without ever dequantizing.

    Two-dot form of the packed-byte identity (see ``_int4_2dot_kernel``):
    with u = x_a - x_b/16 and v = x_b/16, both int8-quantized with their own
    per-row scales,

        x_a·lo + x_b·hi  =  su·(uq·lo) + sv·(vq·p)
        p_s8 = bitcast(p ^ 0x80) = p - 128,   vq·p = vq·p_s8 + 128·Σvq

    so the only weight-sized elementwise work is one i8 AND and one i8 XOR
    (quarter-cost VPU passes); the two [M,128]x[128,N] dots per pack block
    run at the MXU's doubled int8 rate. Numerics: weights exact; activations
    int8 per (row, half-block) (W8A8).
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = qw_ref[:]  # [k_tile//2, N] uint8
    lo = (packed & 0xF).astype(jnp.int8)
    p_s8 = pltpu.bitcast(packed ^ 0x80, jnp.int8)

    x = x_ref[:].astype(jnp.float32)  # [M, k_tile]
    half = formats.PACK_BLOCK // 2  # 128 unpacked rows per nibble half
    n_blocks = k_tile // formats.PACK_BLOCK

    def quant_rows(a):
        """[M, half] f32 -> int8 codes + per-row f32 scale."""
        absmax = jnp.max(jnp.abs(a), axis=1, keepdims=True)
        s = jnp.where(absmax == 0, 1.0, absmax / 127.0)
        return jnp.clip(jnp.round(a / s), -127, 127).astype(jnp.int8), s

    y_codes = jnp.zeros(acc_ref.shape, jnp.float32)
    xsum_all = jnp.zeros((x.shape[0], 1), jnp.float32)
    for blk in range(n_blocks):
        xa = x[:, blk * 2 * half : blk * 2 * half + half]
        xb = x[:, blk * 2 * half + half : (blk + 1) * 2 * half]
        v = xb * (1.0 / 16.0)
        u = xa - v
        uq, su = quant_rows(u)
        vq, sv = quant_rows(v)
        lo_b = lo[blk * half : (blk + 1) * half]
        p_b = p_s8[blk * half : (blk + 1) * half]
        d_lo = jnp.dot(uq, lo_b, preferred_element_type=jnp.int32)
        d_p = jnp.dot(vq, p_b, preferred_element_type=jnp.int32)
        sum_vq = jnp.sum(vq.astype(jnp.int32), axis=1, keepdims=True)
        y_codes = y_codes + su * d_lo.astype(jnp.float32) \
            + sv * (d_p + 128 * sum_vq).astype(jnp.float32)
        xsum_all = xsum_all + jnp.sum(xa + xb, axis=1, keepdims=True)

    # dequant epilogue: y_fp = s_g * (y_codes - z_g * Σx)
    groups_per_tile = max(1, k_tile // gs)
    if groups_per_tile == 1:
        row = (k * k_tile) // gs
        s = scales_ref[pl.ds(row, 1), :].astype(jnp.float32)
        z = zeros_ref[pl.ds(row, 1), :].astype(jnp.float32)
        acc_ref[:] += s * (y_codes - z * xsum_all)
    else:
        # multiple scale groups inside one tile: fall back is handled by the
        # wrapper (it requires gs >= k_tile for this kernel)
        raise NotImplementedError

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


# opt-in switch for the W8A8 decode path (activation int8 changes numerics)
W8A8 = False

INT4_VARIANTS = ("2dot-f32", "2dot", "grouped", "w8a8")


def set_int4_variant(name: str) -> None:
    """Select the int4 decode kernel for subsequent traces.

    Round-2 TPU sweep (3B in-model decode): '2dot-f32' 184.9 tok/s
    (default, exact weight numerics), 'grouped' 174.5, '2dot' 159.5,
    'w8a8' 198.9 (activations quantized to int8 — ~0.6% rel err, opt-in).
    Must be called before the first forward pass traces (the globals are
    read at trace time); exposed as ``--int4_kernel`` on the generate /
    chat / serving-bench CLIs.
    """
    global INT4_VARIANT, DOT_F32, W8A8
    if name not in INT4_VARIANTS:
        raise ValueError(f"int4 kernel {name!r} not in {INT4_VARIANTS}")
    INT4_VARIANT = "grouped" if name == "grouped" else "2dot"
    DOT_F32 = name == "2dot-f32"
    W8A8 = name == "w8a8"


def int4_matmul_w8a8(p: "formats.QuantizedLinear", x: jnp.ndarray, layer=None) -> jnp.ndarray:
    Kp, Np = p.qw.shape[-2] * 2, p.qw.shape[-1]
    gs = Kp if p.group_size == -1 else p.group_size
    k_tile = _pick_k_tile(Kp)
    if Kp % formats.PACK_BLOCK or (p.group_size != -1 and gs % k_tile != 0):
        return int4_matmul(p, x, layer)  # grouped finer than a tile: standard kernel
    x2, batch_shape, M, m_tile = _prep_x(x, Kp, k_tile)
    n_groups = Kp // gs
    nt = _pick_n_tile(Np, k_tile // 2, m_tile, 2 * n_groups)
    n_k = -(-Kp // k_tile)
    kernel = functools.partial(_int4_w8a8_kernel, n_k=n_k, gs=gs, k_tile=k_tile)
    y = _common_call(
        kernel, x2, x2.shape[0], Kp, Np, m_tile, k_tile,
        [
            pl.BlockSpec(
                (k_tile // 2, nt), lambda m, n, k: (k, n), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((n_groups, nt), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, nt), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
        ],
        [p.qw, p.scales.astype(jnp.float32), p.zeros.astype(jnp.float32)],
        x.dtype,
        layer=layer, nt=nt,
    )
    return y[:M, : p.out_features].reshape(batch_shape + (p.out_features,))


# ---------------------------------------------------------------------------
# NF4 / FP4 (codebook, per-block absmax)
# ---------------------------------------------------------------------------


def _codebook_kernel(
    x_ref, scale2_ref, qw_ref, scales_ref, out_ref, acc_ref, *, n_k: int, bs: int,
    code: np.ndarray, k_tile: int, total_blocks: int = 1 << 30,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = _unpack_tile(qw_ref[:])  # [k_tile, N_TILE] int32
    vals = _decode_code(q, code)  # [k_tile, N_TILE] f32
    blocks = k_tile // bs
    # per-block absmax rows, clamped for partial K edge tiles: real blocks
    # always resolve their true row; garbage blocks (zero activations) read
    # the last real row — finite, contributes nothing
    vb = vals.reshape(blocks, bs, vals.shape[-1])
    parts = []
    for i in range(blocks):
        row = jnp.minimum(k * blocks + i, total_blocks - 1)
        raw = scales_ref[pl.ds(row, 1), :]  # [1, N]
        if raw.dtype == jnp.int8:  # double-quant absmax
            raw = raw.astype(jnp.int32)
        # second-level scale (1.0 when not double-quantized) from SMEM
        parts.append(vb[i] * (raw.astype(jnp.float32) * scale2_ref[0, 0]))
    w = jnp.concatenate(parts, axis=0)
    acc_ref[:] += jnp.dot(
        x_ref[:].astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# Wrappers
# ---------------------------------------------------------------------------


def _prep_x(x: jnp.ndarray, Kp: int, k_tile: int = 0):
    """Flatten leading dims, pad K (to the k-tile multiple: the partial-K
    edge tile contract needs zero activations beyond Kp) and M."""
    batch_shape = x.shape[:-1]
    M = int(np.prod(batch_shape)) if batch_shape else 1
    x2 = x.reshape(M, x.shape[-1])
    Kt = -(-Kp // k_tile) * k_tile if k_tile else Kp
    if x2.shape[1] != Kt:
        x2 = jnp.pad(x2, ((0, 0), (0, Kt - x2.shape[1])))
    m_tile = M_TILE if M > 8 else 8
    Mp = -(-M // m_tile) * m_tile
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    return x2, batch_shape, M, min(m_tile, Mp)


def _pick_k_tile(Kp: int) -> int:
    """Always the full K_TILE: a ragged Kp (falcon 18176 = 256 x 71, llama
    11008) gets a PARTIAL EDGE TILE instead of degrading every step to
    256-row DMAs (round 5: that degradation alone cost falcon-7b ~30%).
    Safety: activations are zero-padded to the K_TILE multiple, so the
    finite integer garbage in an out-of-bounds weight block multiplies
    zeros; in-kernel scale-row indices clamp to the last real group."""
    return K_TILE if Kp >= K_TILE else formats.PACK_BLOCK


def _common_call(kernel, x2, Mp, Kp, Np, m_tile, k_tile, extra_specs, extra_args,
                 out_dtype, *, layer=None, stacked=None, nt=None):
    # N and K edge blocks may both be partial: N stores are masked by
    # Pallas; the K contract is zero-padded activations (see _pick_k_tile)
    nt = nt or _pick_n_tile(Np)
    grid = (Mp // m_tile, pl.cdiv(Np, nt), pl.cdiv(Kp, k_tile))
    x_spec = pl.BlockSpec((m_tile, k_tile), lambda m, n, k: (m, k),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((m_tile, nt), lambda m, n, k: (m, n),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((Mp, Np), out_dtype)
    scratch = [pltpu.VMEM((m_tile, nt), jnp.float32)]
    if layer is None:
        return pl.pallas_call(
            kernel, grid=grid, in_specs=[x_spec, *extra_specs],
            out_specs=out_spec, out_shape=out_shape, scratch_shapes=scratch,
            interpret=_INTERPRET,
        )(x2, *extra_args)

    # Stacked-layer mode: weight operands carry a leading [L] axis and the
    # runtime layer index arrives via scalar prefetch; the index maps select
    # the layer's slab so the DMA reads straight out of the stacked array.
    # This is what lets the decode scan close over stacked weights without
    # XLA materializing a per-layer copy every step (a copy the profiler
    # showed costing ~44% of the 3B int4 decode step — PERF.md round 3).
    def with_l(spec, is_stacked):
        im = spec.index_map
        if is_stacked:
            return pl.BlockSpec(
                (None, *spec.block_shape),
                (lambda m, n, k, l, _im=im: (l[0], *_im(m, n, k))),
                memory_space=pltpu.VMEM,
            )
        return pl.BlockSpec(
            spec.block_shape,
            (lambda m, n, k, l, _im=im: _im(m, n, k)),
            memory_space=getattr(spec, "memory_space", None) or pltpu.VMEM,
        )

    if stacked is None:
        stacked = (True,) * len(extra_specs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[with_l(x_spec, False)]
        + [with_l(s, st) for s, st in zip(extra_specs, stacked)],
        out_specs=with_l(out_spec, False),
        scratch_shapes=scratch,
    )

    def kernel_drop_scalar(l_ref, *refs):  # kernels don't consume the index
        return kernel(*refs)

    return pl.pallas_call(
        kernel_drop_scalar, grid_spec=grid_spec, out_shape=out_shape,
        interpret=_INTERPRET,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x2, *extra_args)


def int8_matmul(p: "formats.QuantizedLinear", x: jnp.ndarray, layer=None) -> jnp.ndarray:
    Kp, Np = p.qw.shape[-2:]
    if Kp % formats.PACK_BLOCK:
        return _xla_int8(p if layer is None else formats.take_layer(p, layer), x)
    k_tile = _pick_k_tile(Kp)
    x2, batch_shape, M, m_tile = _prep_x(x, Kp, k_tile)
    nt = _pick_n_tile(Np, k_tile, m_tile, 1)
    kernel = functools.partial(_int8_kernel, n_k=-(-Kp // k_tile))
    scales2d = p.scales.reshape((-1, 1, Np) if layer is not None else (1, Np))
    y = _common_call(
        kernel, x2, x2.shape[0], Kp, Np, m_tile, k_tile,
        [
            pl.BlockSpec((k_tile, nt), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
        ],
        [p.qw, scales2d],
        x.dtype,
        layer=layer, nt=nt,
    )
    return y[:M, : p.out_features].reshape(batch_shape + (p.out_features,))


def int4_matmul(p: "formats.QuantizedLinear", x: jnp.ndarray, layer=None) -> jnp.ndarray:
    if p.fmt in ("nf4", "fp4"):
        return _codebook_matmul(p if layer is None else formats.take_layer(p, layer), x)
    Kp, Np = p.qw.shape[-2] * 2, p.qw.shape[-1]
    gs = Kp if p.group_size == -1 else p.group_size
    k_tile = _pick_k_tile(Kp)
    aligned = Kp % formats.PACK_BLOCK == 0 and (
        p.group_size == -1 or gs % k_tile == 0 or k_tile % gs == 0)
    if not aligned:
        return _xla_dequant(p if layer is None else formats.take_layer(p, layer), x)
    x2, batch_shape, M, m_tile = _prep_x(x, Kp, k_tile)
    n_groups = Kp // gs
    nt = _pick_n_tile(Np, k_tile // 2, m_tile, 2 * n_groups)
    n_k = -(-Kp // k_tile)
    if INT4_VARIANT == "2dot" and gs % formats.PACK_BLOCK == 0:
        kernel = functools.partial(
            _int4_2dot_kernel, n_k=n_k, gs=gs, k_tile=k_tile, dot_f32=DOT_F32,
            n_groups=n_groups,
        )
    else:
        kernel = functools.partial(_int4_kernel, n_k=n_k, gs=gs, k_tile=k_tile,
                                   n_groups=n_groups)

    y = _common_call(
        kernel, x2, x2.shape[0], Kp, Np, m_tile, k_tile,
        [
            pl.BlockSpec(
                (k_tile // 2, nt), lambda m, n, k: (k, n), memory_space=pltpu.VMEM
            ),
            # all group rows for this n-tile; rows picked dynamically in-kernel
            pl.BlockSpec((n_groups, nt), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, nt), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
        ],
        [p.qw, p.scales.astype(jnp.float32), p.zeros.astype(jnp.float32)],
        x.dtype,
        layer=layer, nt=nt,
    )
    return y[:M, : p.out_features].reshape(batch_shape + (p.out_features,))


def int2_matmul(p: "formats.QuantizedLinear", x: jnp.ndarray, layer=None) -> jnp.ndarray:
    Kp, Np = p.qw.shape[-2] * 4, p.qw.shape[-1]
    gs = Kp if p.group_size == -1 else p.group_size
    k_tile = _pick_k_tile(Kp)
    aligned = Kp % formats.PACK_BLOCK == 0 and gs % formats.PACK_BLOCK == 0
    if not aligned:
        return _xla_dequant(p if layer is None else formats.take_layer(p, layer), x)
    x2, batch_shape, M, m_tile = _prep_x(x, Kp, k_tile)
    n_groups = Kp // gs
    nt = _pick_n_tile(Np, k_tile // 4, m_tile, 2 * n_groups)
    n_k = -(-Kp // k_tile)
    if W8A8:
        kernel = functools.partial(
            _int2_w8a8_kernel, n_k=n_k, gs=gs, k_tile=k_tile, n_groups=n_groups
        )
    else:
        kernel = functools.partial(
            _int2_kernel, n_k=n_k, gs=gs, k_tile=k_tile, dot_f32=DOT_F32,
            n_groups=n_groups,
        )
    y = _common_call(
        kernel, x2, x2.shape[0], Kp, Np, m_tile, k_tile,
        [
            pl.BlockSpec(
                (k_tile // 4, nt), lambda m, n, k: (k, n), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((n_groups, nt), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, nt), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
        ],
        [p.qw, p.scales.astype(jnp.float32), p.zeros.astype(jnp.float32)],
        x.dtype,
        layer=layer, nt=nt,
    )
    return y[:M, : p.out_features].reshape(batch_shape + (p.out_features,))


def uint8g_matmul(p: "formats.QuantizedLinear", x: jnp.ndarray, layer=None) -> jnp.ndarray:
    Kp, Np = p.qw.shape[-2:]
    gs = Kp if p.group_size == -1 else p.group_size
    k_tile = _pick_k_tile(Kp)
    aligned = Kp % formats.PACK_BLOCK == 0 and (
        p.group_size == -1 or gs % k_tile == 0 or k_tile % gs == 0)
    if not aligned:
        return _xla_dequant(p if layer is None else formats.take_layer(p, layer), x)
    x2, batch_shape, M, m_tile = _prep_x(x, Kp, k_tile)
    n_groups = Kp // gs
    nt = _pick_n_tile(Np, k_tile, m_tile, 2 * n_groups)
    kernel = functools.partial(
        _uint8g_kernel, n_k=-(-Kp // k_tile), gs=gs, k_tile=k_tile, n_groups=n_groups
    )
    y = _common_call(
        kernel, x2, x2.shape[0], Kp, Np, m_tile, k_tile,
        [
            pl.BlockSpec((k_tile, nt), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, nt), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups, nt), lambda m, n, k: (0, n), memory_space=pltpu.VMEM),
        ],
        [p.qw, p.scales.astype(jnp.float32), p.zeros.astype(jnp.float32)],
        x.dtype,
        layer=layer, nt=nt,
    )
    return y[:M, : p.out_features].reshape(batch_shape + (p.out_features,))


def _codebook_matmul(p: "formats.QuantizedLinear", x: jnp.ndarray) -> jnp.ndarray:
    Kp, Np = p.qw.shape[0] * 2, p.qw.shape[1]
    bs = p.group_size
    k_tile = _pick_k_tile(Kp)
    if Kp % formats.PACK_BLOCK or k_tile % bs:
        return _xla_dequant(p, x)
    x2, batch_shape, M, m_tile = _prep_x(x, Kp, k_tile)
    nt = _pick_n_tile(Np, k_tile // 2, m_tile, Kp // bs)
    n_k = -(-Kp // k_tile)
    # double-quant: fold the second-level scale into f32 absmax in XLA —
    # Mosaic cannot dynamic-load sub-tile i8 rows (vector<4x128xi8>), and the
    # f32 absmax adds only ~6% to the streamed bytes in -dq mode
    if p.scales2 is not None:
        scales_arr = p.scales.astype(jnp.float32) * p.scales2
    else:
        scales_arr = p.scales.astype(jnp.float32)
    scale2 = jnp.ones((1, 1), jnp.float32)
    kernel = functools.partial(
        _codebook_kernel, n_k=n_k, bs=bs, code=formats._CODEBOOKS[p.fmt],
        k_tile=k_tile, total_blocks=Kp // bs,
    )
    y = _common_call(
        kernel, x2, x2.shape[0], Kp, Np, m_tile, k_tile,
        [
            pl.BlockSpec((1, 1), lambda m, n, k: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (k_tile // 2, nt), lambda m, n, k: (k, n), memory_space=pltpu.VMEM
            ),
            # all absmax rows for this n-tile; k-tile rows sliced in-kernel
            pl.BlockSpec(
                (Kp // bs, nt), lambda m, n, k: (0, n), memory_space=pltpu.VMEM
            ),
        ],
        [scale2, p.qw, scales_arr],
        x.dtype,
        nt=nt,
    )
    return y[:M, : p.out_features].reshape(batch_shape + (p.out_features,))


# -- XLA fallbacks ----------------------------------------------------------


def _xla_int8(p, x):
    Kp = p.qw.shape[0]
    if x.shape[-1] != Kp:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Kp - x.shape[-1])])
    y = jnp.dot(x, p.qw.astype(x.dtype))
    y = (y.astype(jnp.float32) * p.scales.astype(jnp.float32)).astype(x.dtype)
    return y[..., : p.out_features]


def _xla_dequant(p, x):
    w = formats.dequantize(p, dtype=x.dtype)
    return jnp.dot(x, w)
