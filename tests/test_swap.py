"""Residency-capped swap decoder (generate/swap.py): greedy parity with the
fused engine while holding only a fraction of the layers on device."""

import jax
import jax.numpy as jnp
import numpy as np

from parrot_tpu.config import Config
from parrot_tpu.generate import engine
from parrot_tpu.generate.swap import SwapDecoder
from parrot_tpu.models import gpt
from parrot_tpu.quantize import api

CFG = Config(
    name="swap-tiny",
    block_size=64,
    vocab_size=64,
    padded_vocab_size=64,
    n_layer=8,
    n_head=2,
    n_embd=32,
    rotary_percentage=1.0,
)


def _reference(params, prompt, max_new, cache_dtype):
    toks, n = engine.generate(
        params, CFG, jnp.asarray(prompt, jnp.int32), jax.random.PRNGKey(0),
        max_returned_tokens=len(prompt) + max_new, temperature=0.0,
        cache_dtype=cache_dtype, max_seq_length=32,
    )
    return np.asarray(toks[len(prompt):int(n)]).tolist()


def test_swap_decoder_greedy_parity_fp():
    params = gpt.init_params(CFG, jax.random.PRNGKey(0))
    prompt = [3, 1, 4, 1, 5]
    want = _reference(params, prompt, 8, jnp.float32)
    dec = SwapDecoder(
        params, CFG, resident_layers=2, chunk_layers=3, max_seq_length=32,
        cache_dtype=jnp.float32, temperature=0.0,
    )
    got = dec.generate(prompt, 8)
    assert got == want, (got, want)


def test_swap_decoder_greedy_parity_int4_int8kv():
    """The 7B-wall configuration in miniature: int4 weights + INT8 KV,
    2 resident layers, 6 streamed through the arena in chunks of 2."""
    params = gpt.init_params(CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
    qparams = api.quantize_params(params, CFG, "gptq.int4")
    prompt = [5, 2, 7]
    want = _reference(qparams, prompt, 8, jnp.int8)
    dec = SwapDecoder(
        qparams, CFG, resident_layers=2, chunk_layers=2, max_seq_length=32,
        cache_dtype=jnp.int8, temperature=0.0,
    )
    got = dec.generate(prompt, 8)
    assert got == want, (got, want)


def test_swap_decoder_zero_resident():
    """Everything streamed (resident_layers=0) still decodes correctly."""
    params = gpt.init_params(CFG, jax.random.PRNGKey(2))
    prompt = [9, 9, 9]
    want = _reference(params, prompt, 6, jnp.float32)
    dec = SwapDecoder(
        params, CFG, resident_layers=0, chunk_layers=4, max_seq_length=32,
        cache_dtype=jnp.float32, temperature=0.0,
    )
    assert dec.generate(prompt, 6) == want


def test_segmented_blocks_generate_parity():
    """engine.generate with blocks split into stacked segments
    (gpt.segment_blocks) must produce identical greedy tokens."""
    params = gpt.init_params(CFG, jax.random.PRNGKey(3), dtype=jnp.float32)
    qparams = api.quantize_params(params, CFG, "gptq.int4")
    prompt = jnp.array([2, 7, 1, 8], jnp.int32)
    kw = dict(max_returned_tokens=12, temperature=0.0, cache_dtype=jnp.int8)
    expected, n = engine.generate(qparams, CFG, prompt, jax.random.PRNGKey(0), **kw)
    seg = gpt.segment_blocks(qparams, max_layers=3)  # 8 layers -> 3+3+2
    assert isinstance(seg["blocks"], tuple) and len(seg["blocks"]) == 3
    actual, n2 = engine.generate(seg, CFG, prompt, jax.random.PRNGKey(0), **kw)
    np.testing.assert_array_equal(np.asarray(actual), np.asarray(expected))
    assert int(n) == int(n2)


def test_swap_decoder_prefetch_parity():
    params = gpt.init_params(CFG, jax.random.PRNGKey(4))
    prompt = [4, 2]
    want = _reference(params, prompt, 6, jnp.float32)
    dec = SwapDecoder(
        params, CFG, resident_layers=2, chunk_layers=2, max_seq_length=32,
        cache_dtype=jnp.float32, temperature=0.0, prefetch=True,
    )
    assert dec.generate(prompt, 6) == want


def test_generate_cli_swap_and_segment(tmp_path, capsys):
    """scripts/generate.py --swap_resident_layers / --segment_layers run end
    to end on a tiny checkpoint."""
    import sys as _sys
    from pathlib import Path as _P

    _sys.path.insert(0, str(_P(__file__).parent.parent / "scripts"))
    from helpers import make_checkpoint

    import generate as generate_script

    checkpoint_dir, _ = make_checkpoint(tmp_path)
    generate_script.main(
        prompt="Hi", num_samples=1, max_new_tokens=6,
        checkpoint_dir=checkpoint_dir, precision="32-true", temperature=0.0,
        swap_resident_layers=1, swap_chunk_layers=1, kv_cache="int8",
    )
    out, err = capsys.readouterr()
    assert "tokens/sec" in err
    generate_script.main(
        prompt="Hi", num_samples=1, max_new_tokens=6,
        checkpoint_dir=checkpoint_dir, precision="32-true", temperature=0.0,
        segment_layers=1,
    )
    out, err = capsys.readouterr()
    assert "tokens/sec" in err
