"""GPTQ algorithm tests: RTN-equivalence under identity Hessian, error
improvement over RTN on correlated inputs, blockwise end-to-end driver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parrot_tpu.config import Config
from parrot_tpu.models import gpt as gpt_model
from parrot_tpu.quantize import api, formats, gptq


def test_identity_hessian_reduces_to_rtn():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 0.1
    H = jnp.eye(64)
    codes, scales, zeros, err = gptq.gptq_quantize_matrix(w, H, blocksize=16)
    rtn = formats.quantize_int4(w, group_size=-1)
    K, N = w.shape
    np.testing.assert_array_equal(
        np.asarray(codes), np.asarray(formats.unpack_nibbles(rtn.qw))[:K, :N]
    )
    np.testing.assert_allclose(
        np.asarray(scales[0]), np.asarray(rtn.scales[0])[:N], rtol=1e-6
    )
    assert float(err) > 0


def _calib_error(w, wq_dequant, x):
    return float(jnp.mean((x @ w - x @ wq_dequant) ** 2))


@pytest.mark.parametrize("groupsize", [-1, 32])
def test_gptq_beats_rtn_on_correlated_inputs(groupsize):
    rng = np.random.RandomState(0)
    K, N, S = 64, 48, 512
    # strongly correlated calibration inputs
    basis = rng.randn(8, K)
    x = jnp.asarray(rng.randn(S, 8) @ basis + 0.1 * rng.randn(S, K), jnp.float32)
    w = jnp.asarray(rng.randn(K, N) * 0.1, jnp.float32)

    H, n = gptq.init_hessian(K)
    H, n = gptq.accumulate_hessian(H, n, x[None])
    codes, scales, zeros, _ = gptq.gptq_quantize_matrix(
        w, H, blocksize=16, groupsize=groupsize
    )
    q = formats.QuantizedLinear(
        qw=formats.pack_nibbles(codes), scales=scales, zeros=zeros,
        fmt="int4", group_size=groupsize, in_features=K, out_features=N,
    )
    gptq_err = _calib_error(w, formats.dequantize(q), x)

    rtn = formats.quantize_int4(w, group_size=groupsize)
    rtn_err = _calib_error(w, formats.dequantize(rtn), x)
    assert gptq_err < rtn_err, (gptq_err, rtn_err)


def test_gptq_actorder_runs_and_helps_or_matches():
    rng = np.random.RandomState(1)
    K, N, S = 64, 32, 256
    # wildly uneven per-column activation scales: actorder's target case
    col_scale = np.exp(rng.randn(K) * 2)
    x = jnp.asarray(rng.randn(S, K) * col_scale[None, :], jnp.float32)
    w = jnp.asarray(rng.randn(K, N) * 0.1, jnp.float32)
    H, n = gptq.init_hessian(K)
    H, n = gptq.accumulate_hessian(H, n, x[None])

    def err_of(actorder):
        codes, scales, zeros, _ = gptq.gptq_quantize_matrix(
            w, H, blocksize=16, actorder=actorder
        )
        q = formats.QuantizedLinear(
            qw=formats.pack_nibbles(codes), scales=scales, zeros=zeros,
            fmt="int4", group_size=-1, in_features=K, out_features=N,
        )
        return _calib_error(w, formats.dequantize(q), x)

    plain, ordered = err_of(False), err_of(True)
    assert np.isfinite(ordered)
    assert ordered <= plain * 1.5  # typically better; never catastrophically worse


def test_gptq_actorder_rejects_grouping():
    w = jnp.zeros((64, 32))
    H = jnp.eye(64)
    with pytest.raises(ValueError, match="actorder"):
        gptq.gptq_quantize_matrix(w, H, groupsize=32, actorder=True)


def test_blockwise_gptq_end_to_end():
    config = Config(
        name="gptq-tiny",
        block_size=32,
        vocab_size=64,
        padded_vocab_size=64,
        n_layer=2,
        n_head=4,
        n_embd=32,
        intermediate_size=64,
        rotary_percentage=1.0,
        parallel_residual=False,
        bias=True,
        _mlp_class="GptNeoxMLP",
    )
    params = gpt_model.init_params(config, jax.random.PRNGKey(0))
    calib = jnp.asarray(np.random.RandomState(0).randint(0, 64, (8, 16)), jnp.int32)
    qparams, stats = api.quantize_model_gptq(
        params, config, calib, blocksize=16, batch_size=4, log=None
    )
    assert isinstance(qparams["lm_head"], formats.QuantizedLinear)
    assert isinstance(qparams["blocks"]["attn"]["qkv"], formats.QuantizedLinear)
    assert qparams["blocks"]["attn"]["qkv"].qw.shape[0] == config.n_layer
    assert all(np.isfinite(v) for v in stats.values())

    tokens = jnp.asarray(np.random.RandomState(1).randint(0, 64, (2, 16)), jnp.int32)
    fp_logits = gpt_model.forward(params, config, tokens)
    q_logits = gpt_model.forward(qparams, config, tokens)
    # int4 model must stay close in probability space
    fp_lp = jax.nn.log_softmax(fp_logits)
    q_lp = jax.nn.log_softmax(q_logits)
    kl = float(jnp.mean(jnp.sum(jnp.exp(fp_lp) * (fp_lp - q_lp), axis=-1)))
    assert np.isfinite(kl) and kl < 0.5, kl

    # quantized generation runs
    from parrot_tpu.generate import engine

    toks, n = engine.generate(
        qparams, config, tokens[0, :4], jax.random.PRNGKey(0),
        max_returned_tokens=10, temperature=0.0, cache_dtype=jnp.float32,
    )
    assert int(n) == 10


@pytest.mark.parametrize("mode", ["bnb.int8", "bnb.nf4", "bnb.nf4-dq", "bnb.fp4", "gptq.int4"])
def test_quantize_params_modes(mode):
    config = Config(
        name="rtn-tiny", block_size=16, vocab_size=64, padded_vocab_size=64,
        n_layer=2, n_head=2, n_embd=32, intermediate_size=128, bias=False,
    )
    params = gpt_model.init_params(config, jax.random.PRNGKey(0))
    qparams = api.quantize_params(params, config, mode)
    assert isinstance(qparams["blocks"]["mlp"]["fc"], formats.QuantizedLinear)
    tokens = jnp.ones((1, 8), jnp.int32)
    fp = np.asarray(gpt_model.forward(params, config, tokens))
    q = np.asarray(gpt_model.forward(qparams, config, tokens))
    # weight-only RTN at >=4 bits keeps logits roughly in place
    assert np.isfinite(q).all()
    assert np.abs(q - fp).mean() < 0.5


def test_reversal_identity_matches_gram_chain():
    """The one-cholesky construction U = J chol(JHJ)^-1 J equals the
    reference's chol -> inverse -> gram -> chol(upper) chain."""
    rng = np.random.RandomState(3)
    K = 96
    A = rng.randn(K, 2 * K).astype(np.float32)
    H = jnp.asarray(A @ A.T / (2 * K) + 0.05 * np.eye(K, dtype=np.float32))
    W = jnp.asarray(rng.randn(8, K).astype(np.float32))
    _, U, _ = gptq._prepare_hinv(H, W, percdamp=0.01, actorder=False, offload=False)
    # oracle: explicit H^-1 then upper cholesky factor with H^-1 = U^T U
    Hd, _, _ = gptq._dead_damp(H, W, percdamp=0.01, actorder=False)
    Hinv = jnp.linalg.inv(Hd)
    U_ref = jnp.linalg.cholesky(Hinv).T
    np.testing.assert_allclose(np.asarray(U), np.asarray(U_ref), atol=2e-3, rtol=2e-2)
    # and U is what the block loop assumes: upper-triangular, H^-1 = U^T U
    np.testing.assert_allclose(np.asarray(U), np.triu(np.asarray(U)), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(U.T @ U), np.asarray(Hinv), atol=2e-3, rtol=2e-2
    )


def test_host_offload_path_matches_on_device():
    """offload=True (70B-class layers) streams inverse chunks through host
    RAM and must produce the same quantization as the on-device path."""
    rng = np.random.RandomState(4)
    K, N, S = 128, 32, 256
    x = jnp.asarray(rng.randn(S, K).astype(np.float32))
    w = jnp.asarray(rng.randn(K, N).astype(np.float32) * 0.1)
    H, n = gptq.init_hessian(K)
    H, n = gptq.accumulate_hessian(H, n, x[None])
    on_dev = gptq.gptq_quantize_matrix(w, H, blocksize=16, offload=False)
    off = gptq.gptq_quantize_matrix(w, H, blocksize=16, offload=True)
    for a, b in zip(on_dev[:3], off[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("bits", [2, 8])
def test_gptq_linear_multibit_packs_and_matches_oracle(bits):
    """bits=2/8 packing parity with the reference's ColBlockQuantizedLinear
    menu (quantize/gptq.py:205-230): the packed QuantizedLinear must
    dequantize to exactly what the GPTQ codes said, and GPTQ must beat RTN at
    the same width on correlated inputs."""
    rng = np.random.RandomState(2)
    K, N, S = 64, 48, 512
    basis = rng.randn(8, K)
    x = jnp.asarray(rng.randn(S, 8) @ basis + 0.1 * rng.randn(S, K), jnp.float32)
    w = jnp.asarray(rng.randn(K, N) * 0.1, jnp.float32)
    H, n = gptq.init_hessian(K)
    H, n = gptq.accumulate_hessian(H, n, x[None])
    q, err = gptq.gptq_quantize_linear({"w": w}, H, bits=bits, blocksize=16)
    assert q.fmt == {2: "int2", 8: "int8g"}[bits]
    assert q.in_features == K and q.out_features == N
    # packed roundtrip: dequant matches the codes' dequant at logical shape
    codes, scales, zeros, _ = gptq.gptq_quantize_matrix(w, H, bits=bits, blocksize=16)
    manual = (codes.astype(jnp.float32) - zeros[0][None, :]) * scales[0][None, :]
    np.testing.assert_allclose(
        np.asarray(formats.dequantize(q)), np.asarray(manual), rtol=1e-5, atol=1e-6
    )
    rtn_fn = formats.quantize_int2 if bits == 2 else formats.quantize_int8g
    gptq_err = _calib_error(w, formats.dequantize(q), x)
    rtn_err = _calib_error(w, formats.dequantize(rtn_fn(w)), x)
    assert gptq_err < rtn_err, (gptq_err, rtn_err)
