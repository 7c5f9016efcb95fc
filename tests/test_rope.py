"""RoPE cache parity vs HF's rotary embedding (reference analogue:
tests/test_rope.py vs GPTNeoXRotaryEmbedding)."""

import numpy as np
import torch

from parrot_tpu.models.rope import apply_rope, build_rope_cache


def test_rope_cache_matches_hf_neox():
    from transformers.models.gpt_neox.modeling_gpt_neox import GPTNeoXRotaryEmbedding
    from transformers import GPTNeoXConfig

    head_size, seq_len = 32, 16
    config = GPTNeoXConfig(
        hidden_size=head_size * 4, num_attention_heads=4,
        max_position_embeddings=seq_len, rotary_pct=1.0,
    )
    rot = GPTNeoXRotaryEmbedding(config=config)
    x = torch.zeros(1, 1, seq_len, head_size)
    position_ids = torch.arange(seq_len)[None]
    hf_cos, hf_sin = rot(x, position_ids)

    cos, sin = build_rope_cache(seq_len, head_size)
    np.testing.assert_allclose(np.asarray(cos), hf_cos[0].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sin), hf_sin[0].numpy(), atol=1e-5)


def test_apply_rope_matches_hf_rotate_half():
    from transformers.models.gpt_neox.modeling_gpt_neox import apply_rotary_pos_emb

    B, T, N, H = 2, 8, 4, 16
    rng = np.random.RandomState(0)
    q = rng.randn(B, N, T, H).astype(np.float32)  # HF layout [B, N, T, H]
    k = rng.randn(B, N, T, H).astype(np.float32)
    cos, sin = build_rope_cache(T, H)
    cos_t = torch.tensor(np.asarray(cos))[None]
    sin_t = torch.tensor(np.asarray(sin))[None]
    hf_q, hf_k = apply_rotary_pos_emb(
        torch.tensor(q), torch.tensor(k), cos_t, sin_t, unsqueeze_dim=1
    )

    # ours uses BTNH
    import jax.numpy as jnp

    mine_q = apply_rope(jnp.asarray(q.transpose(0, 2, 1, 3)), cos, sin)
    np.testing.assert_allclose(
        np.asarray(mine_q).transpose(0, 2, 1, 3), hf_q.numpy(), atol=1e-5
    )


def test_condense_ratio_divides_positions():
    cos1, _ = build_rope_cache(8, 16, condense_ratio=1)
    cos2, _ = build_rope_cache(16, 16, condense_ratio=2)
    # position 2k with ratio 2 equals position k with ratio 1
    np.testing.assert_allclose(np.asarray(cos2)[::2], np.asarray(cos1), atol=1e-7)
