"""Checkpoint round-trip tests (reference analogue: tests/test_utils.py
lazy_load / incremental_save round-trips)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parrot_tpu.config import Config
from parrot_tpu.models import gpt
from parrot_tpu.quantize import formats
from parrot_tpu.utils import checkpoint


def tree_equal(a, b):
    fa, _ = checkpoint.flatten_params(a)
    fb, _ = checkpoint.flatten_params(b)
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]), err_msg=k)


def test_roundtrip_fp32(tmp_path):
    cfg = Config(name="t", block_size=8, vocab_size=32, padded_vocab_size=32,
                 n_layer=2, n_head=2, n_embd=16)
    params = gpt.init_params(cfg, jax.random.PRNGKey(0))
    checkpoint.save_checkpoint(tmp_path / "ckpt", params, config=cfg)
    loaded = checkpoint.load_checkpoint(tmp_path / "ckpt")
    tree_equal(params, loaded)
    cfg2 = Config.from_json(tmp_path / "ckpt" / "lit_config.json")
    assert cfg2.n_layer == 2 and cfg2.name == "t"


def test_roundtrip_bf16(tmp_path):
    params = {"a": {"w": jnp.arange(8, dtype=jnp.bfloat16).reshape(2, 4) / 3}}
    checkpoint.save_checkpoint(tmp_path / "m.safetensors", params)
    loaded = checkpoint.load_checkpoint(tmp_path / "m.safetensors")
    assert loaded["a"]["w"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(loaded["a"]["w"], np.float32), np.asarray(params["a"]["w"], np.float32)
    )


def test_roundtrip_quantized(tmp_path):
    w = jax.random.normal(jax.random.PRNGKey(0), (32, 16))
    params = {
        "blocks": {
            "attn": {"qkv": formats.quantize_int4(w, group_size=16)},
            "proj": formats.quantize_int8(w, bias=jnp.ones((16,))),
        },
        "ln": {"scale": jnp.ones((16,))},
    }
    checkpoint.save_checkpoint(tmp_path / "q.safetensors", params)
    loaded = checkpoint.load_checkpoint(tmp_path / "q.safetensors")
    q = loaded["blocks"]["attn"]["qkv"]
    assert isinstance(q, formats.QuantizedLinear)
    assert q.fmt == "int4" and q.group_size == 16 and q.in_features == 32
    np.testing.assert_array_equal(np.asarray(q.qw), np.asarray(params["blocks"]["attn"]["qkv"].qw))
    p8 = loaded["blocks"]["proj"]
    assert p8.fmt == "int8" and p8.b is not None
    np.testing.assert_allclose(
        np.asarray(formats.dequantize(p8)),
        np.asarray(formats.dequantize(params["blocks"]["proj"])),
    )


def test_check_valid_checkpoint_dir_error(tmp_path):
    with pytest.raises(OSError, match="missing the files"):
        d = tmp_path / "ckpt"
        d.mkdir()
        checkpoint.check_valid_checkpoint_dir(d)
    with pytest.raises(OSError, match="not a checkpoint directory"):
        checkpoint.check_valid_checkpoint_dir(tmp_path / "nope")
