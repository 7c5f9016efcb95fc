"""The GPT model family as pure functions over a parameter pytree.

Covers every architecture knob of the reference's single-file GPT
(``lit_gpt/model.py``): MHA/GQA/MQA via a group-interleaved fused QKV
projection (``model.py:186,207-224``), partial-rotary RoPE with positional
interpolation (``model.py:226-232,304-327``), parallel vs sequential residual
and the falcon-7b shared attention norm (``model.py:158-180``), LayerNorm or
RMSNorm, and the two MLP variants (``model.py:278-301``).

TPU-first design decisions (vs the reference's mutable nn.Module):

- **Parameters are a pytree** with every per-layer tensor stacked along a
  leading ``n_layer`` axis, and the layer loop is a ``lax.scan`` — one Block
  gets traced/compiled once regardless of depth, keeping XLA compile time flat
  in ``n_layer``.
- **The KV cache is a functional value** (``KVCache``) threaded through the
  forward pass, stored with *unrepeated* ``n_query_groups`` heads in
  ``[L, B, S, groups, H]`` layout (the reference stores repeated heads,
  ``model.py:130-144``) — 1/q_per_kv the HBM traffic for GQA models.
- **The rolling window is a circular buffer**: slot ``pos % S`` with modular
  masking, replacing the reference's O(S) full-cache ``torch.roll`` per token
  (``model.py:238-242``). Attention is permutation-invariant over key slots,
  so results match exactly.
- Activations are BTNH; norms/softmax accumulate in fp32; matmuls run in the
  activation dtype (bf16 → MXU native).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax import lax

from parrot_tpu.config import Config
from parrot_tpu.models.norms import apply_norm
from parrot_tpu.models.rope import apply_rope, build_rope_cache
from parrot_tpu.ops.attention import attention
from parrot_tpu.ops.linear import apply_linear

Params = dict


@struct.dataclass
class KVCache:
    """Functional KV cache: ``k``/``v`` of shape ``[L, B, S, groups, H]``.

    ``dtype=jnp.int8`` selects the INT8 cache (absent from the reference; per
    BASELINE.json north star): entries are absmax-quantized per (token, head)
    at write time with fp scales in ``k_scale``/``v_scale``
    ``[L, B, S, groups]``, and the scales fold into the attention math (scores
    for K, probabilities for V) so the cache reads stay int8 — halving decode
    HBM traffic from the cache vs bf16.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: Optional[jnp.ndarray] = None
    v_scale: Optional[jnp.ndarray] = None

    @property
    def max_seq_length(self) -> int:
        return self.k.shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @classmethod
    def init(
        cls,
        config: Config,
        batch_size: int,
        max_seq_length: int,
        dtype: jnp.dtype = jnp.bfloat16,
    ) -> "KVCache":
        shape = (
            config.n_layer,
            batch_size,
            max_seq_length,
            config.n_query_groups,
            config.head_size,
        )
        if dtype == jnp.int8:
            return cls(
                k=jnp.zeros(shape, jnp.int8),
                v=jnp.zeros(shape, jnp.int8),
                k_scale=jnp.ones(shape[:-1], jnp.float32),
                v_scale=jnp.ones(shape[:-1], jnp.float32),
            )
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def _quantize_kv(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Absmax int8 per (batch, token, head): ``[B, T, G, H]`` ->
    (codes int8, scales f32 [B, T, G])."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    codes = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127)
    return codes.astype(jnp.int8), scale


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def init_params(
    config: Config, rng: jax.Array, dtype: jnp.dtype = jnp.float32
) -> Params:
    """Random init matching the reference (normal(0, 0.02) linears/embeddings,
    unit norms — ``lit_gpt/model.py:41-54``). Per-layer tensors are stacked
    along a leading ``n_layer`` axis."""
    L, D = config.n_layer, config.n_embd
    I = config.intermediate_size
    V = config.padded_vocab_size
    keys = iter(jax.random.split(rng, 16))

    def linear(key, shape_in, shape_out, stacked=True):
        shape = (L, shape_in, shape_out) if stacked else (shape_in, shape_out)
        p = {"w": (jax.random.normal(key, shape) * 0.02).astype(dtype)}
        if config.bias:
            p["b"] = jnp.zeros(shape[:-2] + (shape_out,), dtype)
        return p

    def norm(stacked=True):
        shape = (L, D) if stacked else (D,)
        p = {"scale": jnp.ones(shape, dtype)}
        if config.norm_class == "LayerNorm":
            p["bias"] = jnp.zeros(shape, dtype)
        return p

    blocks: Params = {
        "norm_1": norm(),
        "attn": {
            "qkv": linear(next(keys), D, config.qkv_out_size),
            "proj": linear(next(keys), D, D),
        },
    }
    if not config.shared_attention_norm:
        blocks["norm_2"] = norm()
    if config.mlp_class == "LLaMAMLP":
        blocks["mlp"] = {
            "fc_1": linear(next(keys), D, I),
            "fc_2": linear(next(keys), D, I),
            "proj": linear(next(keys), I, D),
        }
    else:
        blocks["mlp"] = {
            "fc": linear(next(keys), D, I),
            "proj": linear(next(keys), I, D),
        }

    return {
        "wte": {"weight": (jax.random.normal(next(keys), (V, D)) * 0.02).astype(dtype)},
        "blocks": blocks,
        "ln_f": norm(stacked=False),
        "lm_head": {"w": (jax.random.normal(next(keys), (D, V)) * 0.02).astype(dtype)},
    }


def num_params(params: Params) -> int:
    return sum(x.size for x in jax.tree.leaves(params) if hasattr(x, "size"))


# ---------------------------------------------------------------------------
# Forward pieces
# ---------------------------------------------------------------------------


def split_qkv(config: Config, qkv: jnp.ndarray):
    """Split the fused projection into (q, k, v) in BTNH layout.

    The fused layout is group-interleaved exactly like the reference
    (``model.py:207-214``): per query group, ``q_per_kv`` query heads, one key
    head, one value head.
    """
    B, T = qkv.shape[:2]
    G, Q, H = config.n_query_groups, config.q_per_kv, config.head_size
    qkv = qkv.reshape(B, T, G, Q + 2, H)
    q = qkv[:, :, :, :Q].reshape(B, T, G * Q, H)
    k = qkv[:, :, :, Q]
    v = qkv[:, :, :, Q + 1]
    return q, k, v


def rope_qk(config: Config, q, k, cos, sin):
    """Apply partial rotary: rope the first ``rope_n_elem`` dims, pass the rest
    through unchanged (``model.py:226-232``)."""
    n_elem = config.rope_n_elem
    if n_elem <= 0:
        return q, k
    H = config.head_size
    q_roped = apply_rope(q[..., :n_elem], cos, sin)
    k_roped = apply_rope(k[..., :n_elem], cos, sin)
    if n_elem == H:
        return q_roped, k_roped
    q = jnp.concatenate([q_roped, q[..., n_elem:]], axis=-1)
    k = jnp.concatenate([k_roped, k[..., n_elem:]], axis=-1)
    return q, k


def _qkv_with_lora(
    p: Params, config: Config, x: jnp.ndarray, rng: Optional[jax.Array]
) -> jnp.ndarray:
    """Fused QKV projection plus optional per-projection LoRA deltas.

    The reference scatters LoRA deltas into the fused output through a
    ``lora_ind`` index buffer (``lit_gpt/lora.py:296-336``); here the deltas
    are added in the natural [B, T, G, Q+2, H] grouped view, which XLA fuses
    without any gather/scatter.
    """
    qkv = apply_linear(p["qkv"], x, rng=rng, dropout=getattr(config, "dropout", 0.0))
    lora = p["qkv"].get("lora") if isinstance(p["qkv"], dict) else None
    if not lora:
        return qkv
    B, T = x.shape[:2]
    G, Q, H = config.n_query_groups, config.q_per_kv, config.head_size
    scaling = _lora_scaling(config)
    drop = getattr(config, "dropout", 0.0)
    qkv = qkv.reshape(B, T, G, Q + 2, H)
    for i, (name, width) in enumerate((("q", Q), ("k", 1), ("v", 1))):
        if name not in lora:
            continue
        branch_rng = None if rng is None else jax.random.fold_in(rng, 100 + i)
        xin = _lora_dropout(x, drop, branch_rng)
        delta = (xin @ lora[name]["a"].astype(x.dtype)) @ lora[name]["b"].astype(x.dtype)
        delta = (delta * scaling).reshape(B, T, G, width, H)
        start = {"q": 0, "k": Q, "v": Q + 1}[name]
        qkv = qkv.at[:, :, :, start : start + width].add(delta)
    return qkv.reshape(B, T, G * (Q + 2) * H)


def _lora_dropout(x: jnp.ndarray, rate: float, rng: Optional[jax.Array]) -> jnp.ndarray:
    if rng is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def attn_forward(
    p: Params,
    config: Config,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    *,
    kv: Optional[tuple[jnp.ndarray, jnp.ndarray]] = None,
    slot: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    q_offset: int | jnp.ndarray = 0,
    window: Optional[int] = None,
    layer_id: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    prefill: bool = False,
    context_parallel=None,  # (Mesh, axis_name): ring attention over that axis
    page_table: Optional[jnp.ndarray] = None,  # [B, max_pages]: paged KV decode
    positions: Optional[jnp.ndarray] = None,  # [B]: enables the fused paged kernel
):
    B, T, C = x.shape
    qkv = _qkv_with_lora(p, config, x, rng)
    q, k, v = split_qkv(config, qkv)
    q, k = rope_qk(config, q, k, cos, sin)
    scale = 1.0 / math.sqrt(config.head_size)

    new_kv = None
    if kv is not None and page_table is not None:
        # paged ragged decode (T == 1): ``kv`` holds the PAGE POOL — either
        # this layer's [P, page, G, H] slab (legacy per-layer form) or the
        # FULL STACKED [L, P, page, G, H] pool carried through the layer scan
        # (``layer_id`` names this layer). The stacked form is the fast path:
        # the pool never rides the scan's xs/ys, so XLA stops materializing a
        # full slab copy in and out per layer per decode step (PERF.md r5 —
        # that traffic, 2x pool size per step, dominated wide paged serving).
        # Sequences own disjoint pages via ``page_table``; page 0 is the
        # trash page for unallocated slots.
        stacked = kv[0].ndim == 5
        ps = kv[0].shape[2] if stacked else kv[0].shape[1]
        B_idx = jnp.arange(B)
        # the WRITE index needs the trash-page clamp too: a freed slot (its
        # request just preempted/retired mid-step) carries -1 entries, and an
        # unclamped negative scatter index would wrap onto the LAST pool page
        # — stomping whoever owns it
        page_of = jnp.maximum(page_table[B_idx, slot // ps], 0)  # [B]
        row = slot % ps
        pt = jnp.maximum(page_table, 0)  # trash-page clamp for unallocated
        S = page_table.shape[1] * ps
        G, H = kv[0].shape[-2], kv[0].shape[-1]
        from parrot_tpu.ops import paged_attention as pa
        from parrot_tpu.ops.quant_matmul import _on_tpu

        if stacked:
            # token write lands at [layer_id, page, row]; the scatter is in
            # place on the donated scan carry (XLA aliases it), so write
            # bytes stay O(token), not O(pool)
            widx = (layer_id, page_of, row)
            kw = dict(layer=layer_id)
            slab = lambda a: lax.dynamic_index_in_dim(a, layer_id, keepdims=False)
        else:
            widx = (page_of, row)
            kw = {}
            slab = lambda a: a

        # fused splash-style kernel (no page gather) when available: one grid
        # step per (slot, page), page ids via scalar prefetch, online softmax
        # across pages — removes the [B, S, G, H] gather copy that cost ~6%
        # in the round-4 A/B. The XLA gather path below remains the oracle.
        fused = positions is not None and pa.use_kernel(_on_tpu(), ps, H)
        if len(kv) == 4:
            cache_k, cache_v, ks, vs = kv
            kq, k_sc = _quantize_kv(k)
            vq, v_sc = _quantize_kv(v)
            if stacked and fused:
                # aliased Pallas write: XLA does NOT alias the .at[] scatter
                # on the stacked pool (full pool copy per layer, measured —
                # see pa.paged_kv_write docstring)
                cache_k, cache_v, ks, vs = pa.paged_kv_write(
                    cache_k, cache_v, kq[:, 0], vq[:, 0], page_of, row,
                    layer_id, pool_ks=ks, pool_vs=vs,
                    k_sc=k_sc[:, 0], v_sc=v_sc[:, 0])
            else:
                cache_k = cache_k.at[widx].set(kq[:, 0])
                cache_v = cache_v.at[widx].set(vq[:, 0])
                ks = ks.at[widx].set(k_sc[:, 0])
                vs = vs.at[widx].set(v_sc[:, 0])
            new_kv = (cache_k, cache_v, ks, vs)
            if fused:
                y = pa.paged_attention_decode(
                    q[:, 0], cache_k, cache_v, page_table, positions,
                    scale=scale, k_scale=ks, v_scale=vs, **kw,
                )[:, None]
            else:
                y = attention(
                    q, slab(cache_k)[pt].reshape(B, S, G, H),
                    slab(cache_v)[pt].reshape(B, S, G, H),
                    scale=scale, mask=mask,
                    k_scale=slab(ks)[pt].reshape(B, S, G),
                    v_scale=slab(vs)[pt].reshape(B, S, G),
                )
        else:
            cache_k, cache_v = kv
            if stacked and fused:
                cache_k, cache_v = pa.paged_kv_write(
                    cache_k, cache_v, k[:, 0].astype(cache_k.dtype),
                    v[:, 0].astype(cache_v.dtype), page_of, row, layer_id)
            else:
                cache_k = cache_k.at[widx].set(k[:, 0].astype(cache_k.dtype))
                cache_v = cache_v.at[widx].set(v[:, 0].astype(cache_v.dtype))
            new_kv = (cache_k, cache_v)
            if fused:
                # the kernel casts page blocks to f32 in VMEM — no pool-wide cast
                y = pa.paged_attention_decode(
                    q[:, 0], cache_k, cache_v, page_table, positions,
                    scale=scale, **kw,
                )[:, None]
            else:
                y = attention(
                    q, slab(cache_k)[pt].reshape(B, S, G, H).astype(q.dtype),
                    slab(cache_v)[pt].reshape(B, S, G, H).astype(q.dtype),
                    scale=scale, mask=mask,
                )
    elif kv is not None and slot is not None and getattr(slot, "ndim", 0) == 1:
        # ragged batched decode (T == 1): per-sequence cache slots
        B_idx = jnp.arange(B)
        if len(kv) == 4:
            cache_k, cache_v, ks, vs = kv
            kq, k_sc = _quantize_kv(k)
            vq, v_sc = _quantize_kv(v)
            cache_k = cache_k.at[B_idx, slot].set(kq[:, 0])
            cache_v = cache_v.at[B_idx, slot].set(vq[:, 0])
            ks = ks.at[B_idx, slot].set(k_sc[:, 0])
            vs = vs.at[B_idx, slot].set(v_sc[:, 0])
            new_kv = (cache_k, cache_v, ks, vs)
            y = attention(q, cache_k, cache_v, scale=scale, mask=mask,
                          k_scale=ks, v_scale=vs)
        else:
            cache_k, cache_v = kv
            cache_k = cache_k.at[B_idx, slot].set(k[:, 0].astype(cache_k.dtype))
            cache_v = cache_v.at[B_idx, slot].set(v[:, 0].astype(cache_v.dtype))
            new_kv = (cache_k, cache_v)
            y = attention(q, cache_k.astype(q.dtype), cache_v.astype(q.dtype),
                          scale=scale, mask=mask)
    elif kv is not None:
        # circular-buffer write at `slot` (= pos % S); contiguous span —
        # prefill always starts at 0, decode writes exactly one token.
        if len(kv) == 4:  # int8 KV cache
            cache_k, cache_v, ks, vs = kv
            kq, k_sc = _quantize_kv(k)
            vq, v_sc = _quantize_kv(v)
            cache_k = lax.dynamic_update_slice(cache_k, kq, (0, slot, 0, 0))
            cache_v = lax.dynamic_update_slice(cache_v, vq, (0, slot, 0, 0))
            ks = lax.dynamic_update_slice(ks, k_sc, (0, slot, 0))
            vs = lax.dynamic_update_slice(vs, v_sc, (0, slot, 0))
            new_kv = (cache_k, cache_v, ks, vs)
            if prefill:
                # full-precision local K/V during prefill (also more accurate)
                y = attention(q, k, v, scale=scale, causal=True)
            else:
                y = attention(
                    q, cache_k, cache_v, scale=scale, mask=mask, k_scale=ks, v_scale=vs
                )
        else:
            cache_k, cache_v = kv
            cache_k = lax.dynamic_update_slice(cache_k, k.astype(cache_k.dtype), (0, slot, 0, 0))
            cache_v = lax.dynamic_update_slice(cache_v, v.astype(cache_v.dtype), (0, slot, 0, 0))
            new_kv = (cache_k, cache_v)
            if prefill:
                # prefill from position 0: attention over the cache equals
                # causal attention over the just-computed K/V (slots beyond T
                # are masked anyway) — the causal path is flash-eligible
                y = attention(q, k, v, scale=scale, causal=True)
            else:
                y = attention(
                    q, cache_k.astype(q.dtype), cache_v.astype(q.dtype), scale=scale, mask=mask
                )
    elif context_parallel is not None:
        from parrot_tpu.parallel.ring_attention import ring_attention

        # (mesh, axis) or (mesh, axis, batch_axes) — the training drivers
        # name the batch axes so GSPMD keeps the dp sharding across the ring
        cp_mesh, cp_axis, *cp_rest = context_parallel
        y = ring_attention(cp_mesh, q, k, v, scale=scale, axis_name=cp_axis,
                           batch_axes=cp_rest[0] if cp_rest else None)
    else:
        y = attention(q, k, v, scale=scale, causal=True, q_offset=q_offset, window=window)

    if "adapter" in p:
        y = y + _adapter_attention(p, config, x, q, scale, layer_id)

    y = y.reshape(B, T, C)
    return apply_linear(p["proj"], y, **_lora_kw(config, rng, 1)), new_kv


def _adapter_attention(
    p: Params, config: Config, x: jnp.ndarray, q: jnp.ndarray, scale: float,
    layer_id: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """LLaMA-Adapter v1 prefix attention (``lit_gpt/adapter.py:234-254``):
    the learnable prompt goes through the *same* fused QKV projection, its
    keys are NOT roped, the roped queries attend over them with a full mask,
    and the result is added scaled by a zero-init per-head gate.

    Layers below ``adapter_start_layer`` are disabled with a trace-level
    ``where`` on ``layer_id`` (the reference simply omits the parameters
    there; with stacked-scan params the inactive slices stay at init and
    receive zero gradient through the gate).
    """
    B, T = x.shape[:2]
    aT = p["adapter"]["wte"].shape[0]
    prefix = p["adapter"]["wte"].astype(x.dtype)[None]  # [1, aT, D]
    aqkv = apply_linear(p["qkv"], prefix)
    _, ak, av = split_qkv(config, aqkv)
    ak = jnp.broadcast_to(ak, (B,) + ak.shape[1:])
    av = jnp.broadcast_to(av, (B,) + av.shape[1:])
    ay = attention(q, ak, av, scale=scale)  # full visibility over the prefix
    gate = p["adapter"]["gate"].astype(x.dtype)  # [n_head]
    ay = ay * gate[None, None, :, None]
    if layer_id is not None:
        active = layer_id >= getattr(config, "adapter_start_layer", 0)
        ay = jnp.where(active, ay, jnp.zeros_like(ay))
    return ay


def _lora_scaling(config: Config) -> float:
    r = getattr(config, "r", 0)
    return (getattr(config, "alpha", 1) / r) if r else 1.0


def _lora_kw(config: Config, rng: Optional[jax.Array], salt: int) -> dict:
    return dict(
        rng=None if rng is None else jax.random.fold_in(rng, salt),
        dropout=getattr(config, "dropout", 0.0),
        lora_scaling=_lora_scaling(config),
    )


def mlp_forward(
    p: Params, config: Config, x: jnp.ndarray, rng: Optional[jax.Array] = None
) -> jnp.ndarray:
    if config.mlp_class == "LLaMAMLP":
        h = jax.nn.silu(apply_linear(p["fc_1"], x, **_lora_kw(config, rng, 2))) * apply_linear(
            p["fc_2"], x, **_lora_kw(config, rng, 3)
        )
        return apply_linear(p["proj"], h, **_lora_kw(config, rng, 4))
    if config.mlp_class == "GptNeoxMLP":
        h = jax.nn.gelu(apply_linear(p["fc"], x, **_lora_kw(config, rng, 2)), approximate=False)
        return apply_linear(p["proj"], h, **_lora_kw(config, rng, 4))
    raise ValueError(f"Unknown MLP class {config.mlp_class!r}")


def block_forward(
    p: Params,
    config: Config,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    *,
    kv=None,
    slot=None,
    mask=None,
    q_offset: int | jnp.ndarray = 0,
    window: Optional[int] = None,
    layer_id: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    prefill: bool = False,
    context_parallel=None,
    page_table: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
):
    """One transformer block (``lit_gpt/model.py:158-180``)."""
    n_1 = apply_norm(p["norm_1"], x, config.norm_class, config.norm_eps)
    h, new_kv = attn_forward(
        p["attn"], config, n_1, cos, sin, kv=kv, slot=slot, mask=mask,
        q_offset=q_offset, window=window, layer_id=layer_id, rng=rng,
        prefill=prefill, context_parallel=context_parallel, page_table=page_table,
        positions=positions,
    )
    mlp_rng = None if rng is None else jax.random.fold_in(rng, 7)
    if config.parallel_residual:
        n_2 = n_1 if config.shared_attention_norm else apply_norm(
            p["norm_2"], x, config.norm_class, config.norm_eps
        )
        x = x + h + mlp_forward(p["mlp"], config, n_2, mlp_rng)
    else:
        x = x + h
        x = x + mlp_forward(
            p["mlp"], config,
            apply_norm(p["norm_2"], x, config.norm_class, config.norm_eps), mlp_rng,
        )
    return x, new_kv


# ---------------------------------------------------------------------------
# Full forwards
# ---------------------------------------------------------------------------


def _rope_tables(config: Config, dtype: jnp.dtype):
    return build_rope_cache(
        config.block_size,
        config.rope_n_elem,
        base=config.rope_base,
        condense_ratio=config.condense_ratio,
        dtype=jnp.float16 if dtype in (jnp.float16, jnp.bfloat16) else jnp.float32,
    )


def forward(
    params: Params,
    config: Config,
    idx: jnp.ndarray,  # [B, T] int32
    *,
    remat: bool = False,
    window: Optional[int] = None,
    dropout_rng: Optional[jax.Array] = None,
    return_hidden: bool = False,
    context_parallel=None,
) -> jnp.ndarray:
    """Full-context causal forward (training / eval). Returns logits [B, T, V]
    (or the final hidden states when ``return_hidden`` — used for chunked
    lm_head loss, ``lit_gpt/lora.py:561-564``).

    ``window=W`` restricts attention to a sliding window of the last ``W``
    positions — the full-context equivalent of rolling-KV-cache decoding.
    ``dropout_rng`` enables PEFT branch dropout (training only).
    ``context_parallel=(mesh, axis)`` shards the sequence over that mesh axis
    and runs ring attention (long-context training).
    """
    T = idx.shape[1]
    L = config.n_layer
    x = jnp.take(params["wte"]["weight"], idx, axis=0)
    cos, sin = _rope_tables(config, x.dtype)
    cos, sin = cos[:T], sin[:T]

    layer_ids = jnp.arange(L)
    layer_rngs = None if dropout_rng is None else jax.random.split(dropout_rng, L)

    def step(x, layer):
        p_layer, layer_id, rng = layer if layer_rngs is not None else (*layer, None)
        x, _ = block_forward(
            p_layer, config, x, cos, sin, window=window, layer_id=layer_id, rng=rng,
            context_parallel=context_parallel,
        )
        return x, None

    if remat:
        # remat policy space (VERDICT r4 #7): True/"full" saves nothing and
        # recomputes the whole block in backward (min memory); "dots" saves
        # matmul outputs (jax.checkpoint_policies.dots_with_no_batch_dims_
        # saveable) so backward skips the forward matmul replays — more HBM,
        # fewer recomputed MXU FLOPs. Swept on-chip via scripts/sweep_mfu.py.
        if remat == "dots":
            step = jax.checkpoint(
                step,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            )
        else:
            step = jax.checkpoint(step)  # rematerialize each Block's activations
    xs = (params["blocks"], layer_ids) + ((layer_rngs,) if layer_rngs is not None else ())
    x, _ = lax.scan(step, x, xs)

    x = apply_norm(params["ln_f"], x, config.norm_class, config.norm_eps)
    if return_hidden:
        return x
    return apply_linear(params["lm_head"], x, **_lora_kw(config, dropout_rng, 99))


def _split_qlin(blocks):
    """Split the stacked blocks tree into ``(rest, qmap)``: quantized-linear
    leaf-groups are pulled out (kept stacked, closed over by the scan body)
    and replaced with None in the scanned tree. The Pallas kernels then DMA
    each layer's slab straight from the stacked arrays via scalar-prefetch
    index maps instead of XLA materializing a per-layer copy every decode
    step — the copies were ~44% of the int4 decode step (PERF.md round 3)."""
    from parrot_tpu.quantize import formats

    qmap = {}

    def walk(node, path):
        if isinstance(node, formats.QuantizedLinear):
            qmap[path] = node
            return None
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return node

    return walk(blocks, ()), qmap


def _merge_qlin(rest, qmap, layer_id):
    """Rebuild a per-layer param tree: scan-sliced small leaves plus
    stacked-quantized markers carrying the traced layer index."""
    if not qmap:
        return rest
    from parrot_tpu.quantize import formats

    def walk(node, path):
        if path in qmap:
            return formats.StackedQuantizedLinear(qmap[path], layer_id)
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return node

    return walk(rest, ())


def forward_cached(
    params: Params,
    config: Config,
    idx: jnp.ndarray,  # [B, T] int32
    cache: KVCache,
    input_pos: jnp.ndarray,  # scalar int32: absolute position of idx[:, 0]
    *,
    prefill: bool = False,
) -> tuple[jnp.ndarray, KVCache]:
    """KV-cached forward for generation. ``idx`` holds ``T`` consecutive tokens
    starting at absolute position ``input_pos``. Returns (logits, new cache).

    Prefill calls this with the whole prompt at ``input_pos=0`` (pass the
    static ``prefill=True`` hint to route attention through the flash-eligible
    causal path); decode calls it with one token per step. Once
    ``input_pos >= S`` the cache behaves as a rolling window over the last
    ``S`` tokens (reference: ``model.py:238-242``).

    ``params["blocks"]`` may be a tuple of stacked sub-trees (see
    :func:`segment_blocks`): each segment scans separately, capping the size
    of any single stacked weight buffer / scan carry — the full-speed
    workaround for backends that reject large stacked decode programs
    (PERF.md round 4) and a knob for scan-carry memory in general.
    """
    segs = (
        list(params["blocks"])
        if isinstance(params["blocks"], (list, tuple))
        else [params["blocks"]]
    )
    x = jnp.take(params["wte"]["weight"], idx, axis=0)
    off = 0
    parts = []
    for seg_tree in segs:
        Lseg = jax.tree.leaves(seg_tree)[0].shape[0]
        cache_seg = (
            cache if len(segs) == 1
            else jax.tree.map(lambda a, o=off, n=Lseg: a[o : o + n], cache)
        )
        x, cache_seg = forward_layers_cached(
            seg_tree, config, x, cache_seg, input_pos, layer_offset=off,
            prefill=prefill,
        )
        parts.append(cache_seg)
        off += Lseg
    new_cache = (
        parts[0] if len(parts) == 1
        else jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)
    )
    x = apply_norm(params["ln_f"], x, config.norm_class, config.norm_eps)
    logits = apply_linear(params["lm_head"], x, lora_scaling=_lora_scaling(config))
    return logits, new_cache


def segment_blocks(params: Params, max_layers: int) -> Params:
    """Split ``params["blocks"]`` into a tuple of stacked sub-trees of at most
    ``max_layers`` layers each (consumed by :func:`forward_cached`). Shallow:
    segments are slices (copies) of the stacked arrays."""
    blocks = params["blocks"]
    if isinstance(blocks, (list, tuple)):
        return params
    L = jax.tree.leaves(blocks)[0].shape[0]
    if L <= max_layers:
        return params
    from parrot_tpu.generate.swap import _tree_slice_layers

    out = dict(params)
    out["blocks"] = tuple(
        _tree_slice_layers(blocks, lo, min(lo + max_layers, L))
        for lo in range(0, L, max_layers)
    )
    return out


def forward_layers_cached(
    blocks: Params,
    config: Config,
    x: jnp.ndarray,  # [B, T, D] — already embedded hidden states
    cache: KVCache,  # covering exactly these layers: [L', B, S, ...]
    input_pos: jnp.ndarray,  # scalar int32
    *,
    layer_offset: int = 0,
    prefill: bool = False,
) -> tuple[jnp.ndarray, KVCache]:
    """The block-scan middle of :func:`forward_cached` over a SLICE of layers
    (``blocks`` holds a stacked ``[L', ...]`` subtree; ``layer_offset`` is its
    absolute first layer id). Embedding and head are the caller's — this is
    the building block of the residency-capped swap executor
    (:mod:`parrot_tpu.generate.swap`), which streams layer chunks through a
    small device arena when a model's quantized weights exceed what the
    backend lets a single decode program hold resident."""
    B, T, _ = x.shape
    S = cache.max_seq_length
    L = jax.tree.leaves(blocks)[0].shape[0]

    cos_t, sin_t = _rope_tables(config, x.dtype)
    positions = input_pos + jnp.arange(T)
    cos = jnp.take(cos_t, positions, axis=0)
    sin = jnp.take(sin_t, positions, axis=0)

    slots = jnp.arange(S)[None, :]
    visible = (slots <= positions[:, None]) | (positions[:, None] >= S)
    mask = jnp.broadcast_to(visible[None], (B, T, S))
    slot = jnp.where(input_pos >= S, input_pos % S, input_pos)

    layer_ids = layer_offset + jnp.arange(L)
    rest, qmap = _split_qlin(blocks)
    if cache.quantized:
        def step(x, layer):
            rest_l, layer_id, k_l, v_l, ks_l, vs_l = layer
            p_layer = _merge_qlin(rest_l, qmap, layer_id - layer_offset)
            x, new_kv = block_forward(
                p_layer, config, x, cos, sin, kv=(k_l, v_l, ks_l, vs_l),
                slot=slot, mask=mask, layer_id=layer_id, prefill=prefill,
            )
            return x, new_kv

        x, (nk, nv, nks, nvs) = lax.scan(
            step, x,
            (rest, layer_ids, cache.k, cache.v, cache.k_scale, cache.v_scale),
        )
        return x, KVCache(k=nk, v=nv, k_scale=nks, v_scale=nvs)

    def step(x, layer):
        rest_l, layer_id, k_l, v_l = layer
        p_layer = _merge_qlin(rest_l, qmap, layer_id - layer_offset)
        x, new_kv = block_forward(
            p_layer, config, x, cos, sin, kv=(k_l, v_l), slot=slot, mask=mask,
            layer_id=layer_id, prefill=prefill,
        )
        return x, new_kv

    x, (nk, nv) = lax.scan(step, x, (rest, layer_ids, cache.k, cache.v))
    return x, KVCache(k=nk, v=nv)


def forward_decode_batched(
    params: Params,
    config: Config,
    idx: jnp.ndarray,  # [B, 1] int32
    cache,  # KVCache, or a paged pool when page_table is given
    positions: jnp.ndarray,  # [B] int32: absolute position of each sequence
    page_table: Optional[jnp.ndarray] = None,  # [B, pages_per_slot] int32
):
    """Single-token decode with *per-sequence* positions — the ragged-batch
    step behind continuous batching (no reference counterpart; the reference
    decodes batch-size 1 only). Each sequence writes its K/V at its own slot
    and ropes at its own position; attention masks slots >= that sequence's
    current length.

    With ``page_table``, ``cache`` is a block-paged pool
    (:class:`parrot_tpu.models.paged_kv.PagedKVCache`): each sequence's K/V
    lives in its table's pages instead of a contiguous slot row; everything
    else (mask, rolling window, scan) is identical.
    """
    B = idx.shape[0]
    if page_table is None:
        S = cache.max_seq_length
    else:
        S = page_table.shape[1] * cache.page_size
    x = jnp.take(params["wte"]["weight"], idx, axis=0)

    cos_t, sin_t = _rope_tables(config, x.dtype)
    safe_pos = jnp.minimum(positions, config.block_size - 1)
    cos = jnp.take(cos_t, safe_pos, axis=0)[:, None]  # [B, 1, d]
    sin = jnp.take(sin_t, safe_pos, axis=0)[:, None]

    slots = jnp.arange(S)[None, :]
    visible = (slots <= positions[:, None]) | (positions[:, None] >= S)  # [B, S]
    mask = visible[:, None, :]  # [B, 1, S]
    slot = jnp.where(positions >= S, positions % S, positions)  # [B]

    layer_ids = jnp.arange(config.n_layer)
    rest, qmap = _split_qlin(params["blocks"])
    cache_cls = type(cache)
    # NOTE (measured, PERF.md round 5): routing the CONTIGUOUS path through
    # the carry scan via an identity-page-table view of the cache (free
    # reshape, live-page DMA clamp) was tried and is 4% SLOWER than this
    # xs/ys form at S=512/64 slots, S=2048/16 slots, and at the pure-step
    # level — the kernel's per-(slot,page) grid overhead at MHA shapes
    # outweighs the slab-copy savings, i.e. XLA already handles the xs/ys
    # threading of the contiguous cache well. Reverted; see git history.
    if page_table is not None:
        # the page POOL rides the scan CARRY (full stacked [L, P, ps, G, H]
        # arrays, updated by a layer-indexed in-place scatter) instead of
        # being split into per-layer xs/ys — the xs/ys form made XLA
        # materialize every layer's full pool slab on the way in and write a
        # full slab on the way out each decode step, so paged HBM traffic
        # scaled with pool size instead of live tokens (PERF.md round 5: THE
        # wide-paged-serving bottleneck). The splash kernel reads pages from
        # the stacked pool via a layer scalar-prefetch index map, mirroring
        # the stacked quantized-weight treatment in _split_qlin.
        #
        # unroll=True: a rolled lax.scan DOUBLE-BUFFERS the pool carry — the
        # probe_paged_step ablation showed step time proportional to POOL
        # size (80 ms at 513 pages vs 61 ms at 321, fill-invariant), i.e.
        # XLA copies the carried pool arrays every layer iteration instead
        # of aliasing the scatter. Fully unrolling collapses the loop to a
        # straight-line chain of scatters that buffer-assignment aliases in
        # place. Weights stay compact: the quantized slabs are closed over
        # via _split_qlin either way, so unrolling only duplicates the tiny
        # per-layer `rest` slices and block-call graph, not weight bytes.
        if cache.quantized:
            def step(carry, layer):
                x, pk, pv, pks, pvs = carry
                rest_l, layer_id = layer
                p_layer = _merge_qlin(rest_l, qmap, layer_id)
                x, (pk, pv, pks, pvs) = block_forward(
                    p_layer, config, x, cos, sin, kv=(pk, pv, pks, pvs),
                    slot=slot, mask=mask, layer_id=layer_id,
                    page_table=page_table, positions=positions,
                )
                return (x, pk, pv, pks, pvs), None

            (x, nk, nv, nks, nvs), _ = lax.scan(
                step, (x, cache.k, cache.v, cache.k_scale, cache.v_scale),
                (rest, layer_ids), unroll=True,
            )
            new_cache = cache_cls(k=nk, v=nv, k_scale=nks, v_scale=nvs)
        else:
            def step(carry, layer):
                x, pk, pv = carry
                rest_l, layer_id = layer
                p_layer = _merge_qlin(rest_l, qmap, layer_id)
                x, (pk, pv) = block_forward(
                    p_layer, config, x, cos, sin, kv=(pk, pv), slot=slot,
                    mask=mask, layer_id=layer_id, page_table=page_table,
                    positions=positions,
                )
                return (x, pk, pv), None

            (x, nk, nv), _ = lax.scan(
                step, (x, cache.k, cache.v), (rest, layer_ids), unroll=True)
            new_cache = cache_cls(k=nk, v=nv)
    elif cache.quantized:
        def step(x, layer):
            rest_l, layer_id, k_l, v_l, ks_l, vs_l = layer
            p_layer = _merge_qlin(rest_l, qmap, layer_id)
            x, new_kv = block_forward(
                p_layer, config, x, cos, sin, kv=(k_l, v_l, ks_l, vs_l),
                slot=slot, mask=mask, layer_id=layer_id,
            )
            return x, new_kv

        x, (nk, nv, nks, nvs) = lax.scan(
            step, x,
            (rest, layer_ids, cache.k, cache.v, cache.k_scale, cache.v_scale),
        )
        new_cache = cache_cls(k=nk, v=nv, k_scale=nks, v_scale=nvs)
    else:
        def step(x, layer):
            rest_l, layer_id, k_l, v_l = layer
            p_layer = _merge_qlin(rest_l, qmap, layer_id)
            x, new_kv = block_forward(
                p_layer, config, x, cos, sin, kv=(k_l, v_l), slot=slot, mask=mask,
                layer_id=layer_id,
            )
            return x, new_kv

        x, (nk, nv) = lax.scan(step, x, (rest, layer_ids, cache.k, cache.v))
        new_cache = cache_cls(k=nk, v=nv)

    x = apply_norm(params["ln_f"], x, config.norm_class, config.norm_eps)
    logits = apply_linear(params["lm_head"], x, lora_scaling=_lora_scaling(config))
    return logits, new_cache
