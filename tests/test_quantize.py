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
