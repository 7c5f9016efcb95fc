"""Pallas dequant-matmul kernels vs the XLA dequantize-then-dot oracle,
run in interpreter mode on CPU (the kernels themselves are exercised on real
TPU by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parrot_tpu.ops import pallas_quant
from parrot_tpu.quantize import formats


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pallas_quant, "_INTERPRET", True)


def mk_x(m, k, seed=0, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(seed), (m, k), dtype) * 0.5


@pytest.mark.parametrize("m", [1, 4])
def test_int8_kernel(m):
    K, N = 512, 384
    w = jax.random.normal(jax.random.PRNGKey(1), (K, N)) * 0.1
    p = formats.quantize_int8(w)
    x = mk_x(m, K)
    expected = x @ formats.dequantize(p)
    actual = pallas_quant.int8_matmul(p, x)
    assert actual.shape == (m, N)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("variant", ["2dot", "grouped"])
@pytest.mark.parametrize("group_size", [-1, 128, 256, 512])
@pytest.mark.parametrize("m", [1, 4])
def test_int4_kernel(variant, group_size, m, monkeypatch):
    monkeypatch.setattr(pallas_quant, "INT4_VARIANT", variant)
    K, N = 512, 384
    w = jax.random.normal(jax.random.PRNGKey(2), (K, N)) * 0.1
    p = formats.quantize_int4(w, group_size=group_size)
    x = mk_x(m, K, seed=3)
    expected = x @ formats.dequantize(p)
    actual = pallas_quant.int4_matmul(p, x)
    assert actual.shape == (m, N)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("dot_f32", [False, True])
def test_int4_2dot_exact_on_integer_activations(dot_f32, monkeypatch):
    """The 2-dot rewrite (xa@lo + xb@hi == (xa-xb/16)@lo + (xb/16)@p) must be
    EXACT when activations are small integers (u, v, codes all exactly
    representable), proving the algebra rather than hiding in tolerance."""
    monkeypatch.setattr(pallas_quant, "INT4_VARIANT", "2dot")
    monkeypatch.setattr(pallas_quant, "DOT_F32", dot_f32)
    K, N = 512, 256
    rng = np.random.RandomState(11)
    w = jnp.asarray(rng.randint(-8, 8, (K, N)), jnp.float32)
    p = formats.quantize_int4(w, group_size=-1)
    x = jnp.asarray(rng.randint(-4, 4, (1, K)) * 16.0, jnp.float32)
    expected = x @ formats.dequantize(p)
    actual = pallas_quant.int4_matmul(p, x)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), rtol=0, atol=1e-3)


@pytest.mark.parametrize("fmt", ["nf4", "fp4"])
@pytest.mark.parametrize("double_quant", [False, True])
def test_codebook_kernel(fmt, double_quant):
    K, N = 512, 256
    w = jax.random.normal(jax.random.PRNGKey(4), (K, N)) * 0.1
    p = formats.quantize_codebook(w, fmt, block_size=64, double_quant=double_quant)
    x = mk_x(2, K, seed=5)
    expected = x @ formats.dequantize(p)
    actual = pallas_quant.int4_matmul(p, x)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("group_size", [-1, 512])
def test_int4_w8a8_kernel(group_size):
    K, N = 512, 256
    w = jax.random.normal(jax.random.PRNGKey(8), (K, N)) * 0.1
    p = formats.quantize_int4(w, group_size=group_size)
    x = mk_x(1, K, seed=9)
    expected = x @ formats.dequantize(p)
    actual = pallas_quant.int4_matmul_w8a8(p, x)
    # activations are int8-quantized per (row, tile): ~1% relative error
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), rtol=5e-2, atol=5e-2)
    err = np.abs(np.asarray(actual) - np.asarray(expected)).max()
    scale = np.abs(np.asarray(expected)).max()
    assert err / scale < 0.02


def test_batched_input_shape():
    K, N = 512, 128
    w = jax.random.normal(jax.random.PRNGKey(6), (K, N)) * 0.1
    p = formats.quantize_int8(w)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 3, K)) * 0.5
    y = pallas_quant.int8_matmul(p, x)
    assert y.shape == (2, 3, N)
    expected = x @ formats.dequantize(p)
    np.testing.assert_allclose(np.asarray(y), np.asarray(expected), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("variant", ["2dot-f32", "grouped", "w8a8"])
def test_int4_stacked_layer_prefetch(variant, monkeypatch):
    """Stacked [L, ...] weights + runtime layer index (scalar prefetch) must
    match the per-layer-sliced kernel call — the copy-free decode path."""
    monkeypatch.setattr(pallas_quant, "INT4_VARIANT",
                        "grouped" if variant == "grouped" else "2dot")
    monkeypatch.setattr(pallas_quant, "DOT_F32", variant == "2dot-f32")
    L, K, N = 3, 512, 384
    ws = [jax.random.normal(jax.random.PRNGKey(i), (K, N)) * 0.1 for i in range(L)]
    ps = [formats.quantize_int4(w, group_size=-1) for w in ws]
    stacked = jax.tree.map(lambda *a: jnp.stack(a), *ps)
    x = mk_x(1, K, seed=3)
    fn = pallas_quant.int4_matmul_w8a8 if variant == "w8a8" else pallas_quant.int4_matmul
    for l in range(L):
        expected = fn(ps[l], x)
        got = fn(stacked, x, layer=jnp.asarray(l, jnp.int32))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), rtol=2e-2, atol=2e-2)


def test_int8_stacked_layer_prefetch():
    L, K, N = 3, 512, 384
    ws = [jax.random.normal(jax.random.PRNGKey(10 + i), (K, N)) * 0.1 for i in range(L)]
    ps = [formats.quantize_int8(w) for w in ws]
    stacked = jax.tree.map(lambda *a: jnp.stack(a), *ps)
    x = mk_x(2, K, seed=4)
    for l in range(L):
        expected = pallas_quant.int8_matmul(ps[l], x)
        got = pallas_quant.int8_matmul(stacked, x, layer=jnp.asarray(l, jnp.int32))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), rtol=2e-2, atol=2e-2)


def test_decode_stacked_path_matches_sliced(monkeypatch):
    """forward_cached routes stacked quantized weights through the
    scalar-prefetch kernels (interpret): greedy decode tokens must match the
    XLA fallback path bit-for-bit."""
    from parrot_tpu.config import Config
    from parrot_tpu.models import gpt
    from parrot_tpu.ops import quant_matmul
    from parrot_tpu.quantize import api

    config = Config(
        name="stack-tiny", block_size=64, vocab_size=64, padded_vocab_size=64,
        n_layer=2, n_head=2, n_embd=256,  # K=256 aligns with PACK_BLOCK
    )
    params = gpt.init_params(config, jax.random.PRNGKey(0))
    q = api.quantize_params(params, config, "gptq.int4")

    def run():
        cache = gpt.KVCache.init(config, 1, 32, dtype=jnp.float32)
        toks = [5]
        logits, cache = gpt.forward_cached(
            q, config, jnp.asarray([[5]], jnp.int32), cache, jnp.asarray(0))
        for pos in range(1, 8):
            tok = int(jnp.argmax(logits[0, -1]))
            toks.append(tok)
            logits, cache = gpt.forward_cached(
                q, config, jnp.asarray([[tok]], jnp.int32), cache,
                jnp.asarray(pos))
        return toks

    ref = run()  # XLA fallback (CPU backend)
    monkeypatch.setattr(pallas_quant, "_INTERPRET", True)
    monkeypatch.setattr(quant_matmul, "_on_tpu", lambda: True)
    got = run()  # stacked scalar-prefetch kernels in interpret mode
    assert ref == got, (ref, got)


def test_ragged_decode_stacked_path_matches_sliced(monkeypatch):
    """forward_decode_batched (the serving ragged step) through the stacked
    scalar-prefetch kernels must match the XLA fallback bit-for-bit."""
    from parrot_tpu.config import Config
    from parrot_tpu.models import gpt
    from parrot_tpu.ops import quant_matmul
    from parrot_tpu.quantize import api

    config = Config(
        name="stack-ragged-tiny", block_size=64, vocab_size=64,
        padded_vocab_size=64, n_layer=2, n_head=2, n_embd=256,
    )
    params = gpt.init_params(config, jax.random.PRNGKey(1))
    q = api.quantize_params(params, config, "gptq.int4")

    def run():
        cache = gpt.KVCache.init(config, 3, 16, dtype=jnp.float32)
        toks = jnp.asarray([[5], [9], [2]], jnp.int32)
        positions = jnp.asarray([0, 3, 1], jnp.int32)
        out = []
        for _ in range(4):
            logits, cache = gpt.forward_decode_batched(
                q, config, toks, cache, positions)
            toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            positions = positions + 1
            out.append(np.asarray(toks)[:, 0].tolist())
        return out

    ref = run()
    monkeypatch.setattr(pallas_quant, "_INTERPRET", True)
    monkeypatch.setattr(quant_matmul, "_on_tpu", lambda: True)
    got = run()
    assert ref == got, (ref, got)


@pytest.mark.parametrize("group_size", [-1, 256, 512])
@pytest.mark.parametrize("m", [1, 4])
def test_int2_kernel(group_size, m):
    K, N = 512, 384
    w = jax.random.normal(jax.random.PRNGKey(12), (K, N)) * 0.1
    p = formats.quantize_int2(w, group_size=group_size)
    x = mk_x(m, K, seed=13)
    expected = x @ formats.dequantize(p)
    actual = pallas_quant.int2_matmul(p, x)
    assert actual.shape == (m, N)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("dot_f32", [False, True])
def test_int2_telescoped_identity_exact_on_integer_activations(dot_f32, monkeypatch):
    """The telescoped-shift rewrite (sum_j x_j q_j == x_0 t_0 +
    sum_{j>=1} (x_j - 4 x_{j-1}) t_j with t_j = p >> 2j) must be EXACT when
    activations are small multiples of 4 (coefficients and plane values all
    exactly representable), proving the algebra rather than hiding in
    tolerance."""
    monkeypatch.setattr(pallas_quant, "DOT_F32", dot_f32)
    K, N = 512, 256
    rng = np.random.RandomState(14)
    w = jnp.asarray(rng.randint(-2, 2, (K, N)), jnp.float32)
    p = formats.quantize_int2(w, group_size=-1)
    x = jnp.asarray(rng.randint(-4, 4, (1, K)) * 16.0, jnp.float32)
    expected = x @ formats.dequantize(p)
    actual = pallas_quant.int2_matmul(p, x)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), rtol=0, atol=1e-3)


@pytest.mark.parametrize("group_size", [-1, 128, 512])
@pytest.mark.parametrize("m", [1, 4])
def test_uint8g_kernel(group_size, m):
    K, N = 512, 384
    w = jax.random.normal(jax.random.PRNGKey(15), (K, N)) * 0.1
    p = formats.quantize_int8g(w, group_size=group_size)
    x = mk_x(m, K, seed=16)
    expected = x @ formats.dequantize(p)
    actual = pallas_quant.uint8g_matmul(p, x)
    assert actual.shape == (m, N)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("fmt", ["int2", "int8g"])
def test_int2_int8g_stacked_layer_prefetch(fmt):
    """Stacked [L, ...] 2-bit / grouped-8-bit weights via scalar prefetch must
    match the per-layer-sliced call (the decode path for sub-4-bit 7B)."""
    L, K, N = 3, 512, 384
    qfn = formats.quantize_int2 if fmt == "int2" else formats.quantize_int8g
    fn = pallas_quant.int2_matmul if fmt == "int2" else pallas_quant.uint8g_matmul
    ws = [jax.random.normal(jax.random.PRNGKey(20 + i), (K, N)) * 0.1 for i in range(L)]
    ps = [qfn(w, group_size=-1) for w in ws]
    stacked = jax.tree.map(lambda *a: jnp.stack(a), *ps)
    x = mk_x(1, K, seed=21)
    for l in range(L):
        expected = fn(ps[l], x)
        got = fn(stacked, x, layer=jnp.asarray(l, jnp.int32))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("group_size", [-1, 256, 512])
def test_int2_w8a8_kernel(group_size, monkeypatch):
    """The mask-telescoped int8-MXU int2 kernel tracks the dequant oracle
    within W8A8 activation-quantization noise."""
    monkeypatch.setattr(pallas_quant, "W8A8", True)
    K, N = 512, 384
    w = jax.random.normal(jax.random.PRNGKey(30), (K, N)) * 0.1
    p = formats.quantize_int2(w, group_size=group_size)
    x = mk_x(1, K, seed=31)
    expected = x @ formats.dequantize(p)
    actual = pallas_quant.int2_matmul(p, x)
    err = np.abs(np.asarray(actual) - np.asarray(expected)).max()
    scale = np.abs(np.asarray(expected)).max()
    assert err / scale < 0.02, err / scale


def test_int2_w8a8_mask_telescope_exact_on_integer_activations(monkeypatch):
    """With activation quarters that quantize exactly (integer coefficients
    that fit int8 scales), the mask-telescoped identity is EXACT — proving
    q1=(m1-m0)/4, q2=(m2-m1)/16, q3=(p-m2)/64 and the p-128 correction."""
    monkeypatch.setattr(pallas_quant, "W8A8", True)
    K, N = 256, 256
    rng = np.random.RandomState(32)
    w = jnp.asarray(rng.randint(-2, 2, (K, N)), jnp.float32)
    p = formats.quantize_int2(w, group_size=-1)
    # build the COEFFICIENTS as integers with absmax exactly 127 (so the
    # per-row scale is 1.0 and int8 quantization is bit-lossless), then
    # invert the telescoping to get the activation quarters:
    #   x3 = 64 c3;  x2 = 16(c2 + c3);  x1 = 4(c1 + c2 + c3);
    #   x0 = c0 + c1 + c2 + c3
    c = rng.randint(-40, 41, (4, 64)).astype(np.float64)
    for i in range(4):
        c[i, i] = 127.0  # pin each row's absmax to exactly 127
    x = np.zeros((1, K), np.float64)
    x[0, :64] = c[0] + c[1] + c[2] + c[3]
    x[0, 64:128] = 4.0 * (c[1] + c[2] + c[3])
    x[0, 128:192] = 16.0 * (c[2] + c[3])
    x[0, 192:] = 64.0 * c[3]
    x = jnp.asarray(x, jnp.float32)
    expected = x @ formats.dequantize(p)
    actual = pallas_quant.int2_matmul(p, x)
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(expected), rtol=0, atol=2e-1)


def test_int2_w8a8_stacked_layer_prefetch(monkeypatch):
    monkeypatch.setattr(pallas_quant, "W8A8", True)
    L, K, N = 3, 512, 384
    ws = [jax.random.normal(jax.random.PRNGKey(40 + i), (K, N)) * 0.1 for i in range(L)]
    ps = [formats.quantize_int2(w, group_size=-1) for w in ws]
    stacked = jax.tree.map(lambda *a: jnp.stack(a), *ps)
    x = mk_x(1, K, seed=41)
    for l in range(L):
        expected = pallas_quant.int2_matmul(ps[l], x)
        got = pallas_quant.int2_matmul(stacked, x, layer=jnp.asarray(l, jnp.int32))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("fmt", ["int2", "int4", "int8", "int8g", "nf4"])
@pytest.mark.parametrize("m", [1, 4])
def test_ragged_k_partial_edge_tile(fmt, m, monkeypatch):
    """K that is a PACK_BLOCK multiple but NOT a K_TILE multiple (falcon
    18176 = 256x71, llama 11008) must run the Pallas path with a partial K
    edge tile — zero-padded activations against finite garbage weights —
    and match the oracle. Fallback to XLA dequant would hide a regression,
    so it is forbidden here."""
    def forbid(p, x):
        raise AssertionError("ragged-K shape fell back to XLA dequant")

    monkeypatch.setattr(pallas_quant, "_xla_dequant", forbid)
    monkeypatch.setattr(pallas_quant, "_xla_int8", forbid)
    K, N = 1280, 384  # Kp = 1280 = 2.5 * K_TILE
    w = jax.random.normal(jax.random.PRNGKey(50), (K, N)) * 0.1
    x = mk_x(m, K, seed=51)
    if fmt == "int2":
        p = formats.quantize_int2(w)
        fn = pallas_quant.int2_matmul
    elif fmt == "int4":
        p = formats.quantize_int4(w)
        fn = pallas_quant.int4_matmul
    elif fmt == "int8":
        p = formats.quantize_int8(w)
        fn = pallas_quant.int8_matmul
    elif fmt == "int8g":
        p = formats.quantize_int8g(w)
        fn = pallas_quant.uint8g_matmul
    else:
        p = formats.quantize_nf4(w, block_size=64)
        fn = pallas_quant.int4_matmul
    expected = x @ formats.dequantize(p)
    actual = fn(p, x)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected),
                               rtol=2e-2, atol=2e-2)


def test_ragged_k_grouped_int4(monkeypatch):
    """Grouped scales + ragged K: real blocks resolve their true scale rows;
    garbage blocks clamp (and contribute nothing)."""
    monkeypatch.setattr(
        pallas_quant, "_xla_dequant",
        lambda p, x: (_ for _ in ()).throw(AssertionError("fell back")))
    K, N = 1280, 256
    w = jax.random.normal(jax.random.PRNGKey(52), (K, N)) * 0.1
    p = formats.quantize_int4(w, group_size=256)
    x = mk_x(2, K, seed=53)
    expected = x @ formats.dequantize(p)
    actual = pallas_quant.int4_matmul(p, x)
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected),
                               rtol=2e-2, atol=2e-2)
