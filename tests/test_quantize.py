"""Quantized format tests: pack/unpack exactness, dequant error bounds,
quantized matmul vs dense (reference analogue: implicit in quantize/gptq.py
pack_weight/get_weight round-trips)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parrot_tpu.ops.linear import apply_linear
from parrot_tpu.quantize import formats


def rand_w(k=64, n=48, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (k, n)) * 0.1


def test_pack_unpack_nibbles_roundtrip():
    q = jnp.asarray(np.random.RandomState(0).randint(0, 16, size=(32, 8)), jnp.uint8)
    np.testing.assert_array_equal(
        np.asarray(formats.unpack_nibbles(formats.pack_nibbles(q))), np.asarray(q)
    )


def test_int8_dequant_error():
    w = rand_w()
    p = formats.quantize_int8(w)
    wd = formats.dequantize(p)
    assert wd.shape == w.shape  # storage padding sliced away
    # absmax/127 per-channel quantization: error bounded by scale/2
    bound = np.asarray(p.scales)[: w.shape[1]] / 2 + 1e-7
    assert (np.abs(np.asarray(wd - w)) <= bound[None, :]).all()


@pytest.mark.parametrize("group_size", [-1, 32])
def test_int4_dequant_error(group_size):
    w = rand_w()
    K, N = w.shape
    p = formats.quantize_int4(w, group_size=group_size)
    wd = formats.dequantize(p)
    assert wd.shape == w.shape
    Kp = p.qw.shape[0] * 2
    gs = Kp if group_size == -1 else group_size
    scales = np.asarray(p.scales)[:, :N]
    bound = np.repeat(scales, gs, axis=0)[:K] / 2 + 1e-6
    assert (np.abs(np.asarray(wd - w)) <= bound).all()


@pytest.mark.parametrize("double_quant", [False, True])
def test_nf4_dequant_reasonable(double_quant):
    w = rand_w()
    p = formats.quantize_nf4(w, block_size=32, double_quant=double_quant)
    wd = formats.dequantize(p)
    err = np.abs(np.asarray(wd - w))
    # NF4 with 16 levels per [-absmax, absmax] block: worst adjacent-level gap
    # is ~0.28*absmax; typical error far smaller
    assert err.max() < 0.28 * np.abs(np.asarray(w)).max() + (0.01 if double_quant else 0.0)
    assert err.mean() < 0.02


@pytest.mark.parametrize("fmt", ["int8", "int4", "nf4"])
def test_quantized_matmul_matches_dequant_dense(fmt):
    w = rand_w()
    b = jnp.ones((48,)) * 0.5
    if fmt == "int8":
        p = formats.quantize_int8(w, bias=b)
    elif fmt == "int4":
        p = formats.quantize_int4(w, group_size=32, bias=b)
    else:
        p = formats.quantize_nf4(w, block_size=32, bias=b)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
    expected = x @ formats.dequantize(p) + b
    actual = apply_linear(p, x)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), rtol=1e-5, atol=1e-5)


def test_quantized_linear_is_pytree():
    p = formats.quantize_int4(rand_w(), group_size=32)
    leaves = jax.tree.leaves(p)
    assert len(leaves) == 3  # qw, scales, zeros
    rebuilt = jax.tree.map(lambda x: x, p)
    assert rebuilt.fmt == "int4" and rebuilt.group_size == 32


def test_pack_unpack_crumbs_roundtrip():
    q = jnp.asarray(np.random.RandomState(1).randint(0, 4, size=(512, 8)), jnp.uint8)
    np.testing.assert_array_equal(
        np.asarray(formats.unpack_crumbs(formats.pack_crumbs(q))), np.asarray(q)
    )


@pytest.mark.parametrize("bits", [2, 8])
@pytest.mark.parametrize("group_size", [-1, 32])
def test_int2_int8g_dequant_error(bits, group_size):
    w = rand_w()
    K, N = w.shape
    qfn = formats.quantize_int2 if bits == 2 else formats.quantize_int8g
    p = qfn(w, group_size=group_size)
    wd = formats.dequantize(p)
    assert wd.shape == w.shape
    Kp = p.qw.shape[0] * formats.PACK_RATIO[p.fmt]
    gs = Kp if group_size == -1 else group_size
    scales = np.asarray(p.scales)[:, :N]
    bound = np.repeat(scales, gs, axis=0)[:K] / 2 + 1e-6
    assert (np.abs(np.asarray(wd - w)) <= bound).all()


@pytest.mark.parametrize("fmt", ["int2", "int8g"])
def test_int2_int8g_matmul_matches_dequant_dense(fmt):
    w = rand_w()
    b = jnp.ones((48,)) * 0.5
    qfn = formats.quantize_int2 if fmt == "int2" else formats.quantize_int8g
    p = qfn(w, group_size=32, bias=b)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
    expected = x @ formats.dequantize(p) + b
    actual = apply_linear(p, x)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), rtol=1e-5, atol=1e-5)


def test_llm_int8_outlier_columns_roundtrip_exactly():
    """LLM.int8 decomposition (reference quantize/bnb.py:38-44): activation
    columns above the 6.0 threshold pass through in FULL precision — for an
    input supported only on outlier columns the result equals the exact
    dequantized matmul bit-for-bit."""
    w = rand_w(64, 48, seed=7)
    p = formats.quantize_int8(w, llm_int8=True)
    assert p.fmt == "int8-llm"
    x = np.zeros((3, 64), np.float32)
    x[:, 5] = [7.0, -8.5, 100.0]   # outlier column (>6.0)
    x[:, 20] = [9.1, 6.5, -12.0]   # another outlier column
    x = jnp.asarray(x)
    exact = x @ formats.dequantize(p)
    got = formats.llm_int8_matmul(p, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exact))


def test_llm_int8_beats_naive_w8a8_with_outliers():
    """With outlier features present, the threshold decomposition must beat
    quantizing ALL activation columns to int8 (threshold=inf ≙ naive W8A8)."""
    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randn(64, 48) * 0.1, jnp.float32)
    p = formats.quantize_int8(w, llm_int8=True)
    x = rng.randn(8, 64).astype(np.float32)
    x[:, 11] *= 60.0  # systematic outlier feature (the LLM.int8 motivation)
    x = jnp.asarray(x)
    exact = x @ formats.dequantize(p)
    err_llm = float(jnp.mean((formats.llm_int8_matmul(p, x) - exact) ** 2))
    err_naive = float(jnp.mean(
        (formats.llm_int8_matmul(p, x, threshold=np.inf) - exact) ** 2))
    assert err_llm < err_naive / 4, (err_llm, err_naive)


def test_llm_int8_mode_end_to_end():
    """bnb.int8-llm quantizes a model tree and runs a forward pass."""
    from parrot_tpu.config import Config
    from parrot_tpu.models import gpt
    from parrot_tpu.quantize import api

    config = Config(
        name="llm8-tiny", block_size=32, vocab_size=64, padded_vocab_size=64,
        n_layer=2, n_head=2, n_embd=64,
    )
    params = gpt.init_params(config, jax.random.PRNGKey(0))
    q = api.quantize_params(params, config, "bnb.int8-llm")
    assert q["lm_head"].fmt == "int8-llm"
    idx = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    logits_fp = gpt.forward(params, config, idx)
    logits_q = gpt.forward(q, config, idx)
    assert logits_q.shape == logits_fp.shape
    # int8 weight-quantization noise only: logits stay close
    assert float(jnp.mean(jnp.abs(logits_q - logits_fp))) < 0.15
