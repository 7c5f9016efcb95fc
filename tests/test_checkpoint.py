"""Checkpoint round-trip tests (reference analogue: tests/test_utils.py
lazy_load / incremental_save round-trips)."""

from pathlib import Path

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


def test_sharded_writer_roundtrip(tmp_path):
    """Multi-shard save (index json) loads back identically, including bf16
    view-tagged tensors and __layer__-split stacked leaves."""
    writer = checkpoint.ShardedSafetensorsWriter(tmp_path, max_shard_bytes=4096)
    rng = np.random.RandomState(0)
    stacked = rng.randn(3, 64, 16).astype(np.float32)
    for i in range(3):
        writer.add(f"blocks.mlp.fc.w.__layer__.{i:05d}", stacked[i])
    bf16 = jnp.asarray(rng.randn(128, 8), jnp.bfloat16)
    writer.add("wte.weight", np.asarray(bf16))
    out = writer.finish()
    assert out.name == checkpoint.INDEX_FILE  # 4 KiB cap -> several shards
    assert not (tmp_path / checkpoint.MODEL_FILE).exists()

    tree = checkpoint.load_checkpoint(tmp_path)
    np.testing.assert_array_equal(np.asarray(tree["blocks"]["mlp"]["fc"]["w"]), stacked)
    assert tree["wte"]["weight"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(tree["wte"]["weight"], np.float32), np.asarray(bf16, np.float32)
    )


def test_sharded_writer_single_shard_is_plain_file(tmp_path):
    writer = checkpoint.ShardedSafetensorsWriter(tmp_path)  # huge default cap
    writer.add("ln_f.scale", np.ones(8, np.float32))
    out = writer.finish()
    assert out.name == checkpoint.MODEL_FILE
    assert not (tmp_path / checkpoint.INDEX_FILE).exists()
    tree = checkpoint.load_checkpoint(tmp_path)
    np.testing.assert_array_equal(np.asarray(tree["ln_f"]["scale"]), np.ones(8))


def test_save_checkpoint_sharded_quantized(tmp_path):
    """save_checkpoint(max_shard_bytes=...) shards a quantized tree and the
    loader reassembles QuantizedLinear groups across shard files."""
    w = jnp.asarray(np.random.RandomState(1).randn(256, 128), jnp.float32)
    q = formats.quantize_int8(w)
    params = {"lm_head": q, "ln_f": {"scale": jnp.ones(128)}}
    checkpoint.save_checkpoint(tmp_path, params, max_shard_bytes=16 * 1024)
    assert (tmp_path / checkpoint.INDEX_FILE).exists()
    tree = checkpoint.load_checkpoint(tmp_path)
    assert isinstance(tree["lm_head"], formats.QuantizedLinear)
    assert tree["lm_head"].fmt == "int8"
    np.testing.assert_array_equal(np.asarray(tree["lm_head"].qw), np.asarray(q.qw))


def test_streaming_conversion_bounded_rss(tmp_path):
    """Converting a multi-shard HF checkpoint streams: peak RSS stays at
    ~(baseline + one source shard), far below the full model size — the
    property the reference built incremental_save for (utils.py:262-399)."""
    import subprocess
    import sys

    from safetensors.numpy import save_file

    rng = np.random.RandomState(0)
    D, I, V, L = 1536, 6144, 8192, 2
    hf = tmp_path / "hf"
    hf.mkdir()

    def layer(i):
        pre = f"gpt_neox.layers.{i}"
        return {
            f"{pre}.input_layernorm.weight": np.ones(D, np.float32),
            f"{pre}.attention.query_key_value.weight": rng.randn(3 * D, D).astype(np.float32),
            f"{pre}.attention.dense.weight": rng.randn(D, D).astype(np.float32),
            f"{pre}.post_attention_layernorm.weight": np.ones(D, np.float32),
            f"{pre}.mlp.dense_h_to_4h.weight": rng.randn(I, D).astype(np.float32),
            f"{pre}.mlp.dense_4h_to_h.weight": rng.randn(D, I).astype(np.float32),
        }

    shard0 = {"gpt_neox.embed_in.weight": rng.randn(V, D).astype(np.float32), **layer(0)}
    shard1 = {**layer(1), "gpt_neox.final_layer_norm.weight": np.ones(D, np.float32),
              "embed_out.weight": rng.randn(V, D).astype(np.float32)}
    save_file(shard0, str(hf / "model-00001-of-00002.safetensors"))
    save_file(shard1, str(hf / "model-00002-of-00002.safetensors"))
    total_mb = sum(a.nbytes for a in {**shard0, **shard1}.values()) / 2**20  # ~330 MB
    shard_mb = max(sum(a.nbytes for a in s.values()) for s in (shard0, shard1)) / 2**20

    code = f"""
import resource, sys
from parrot_tpu.config import Config
from parrot_tpu.utils.hf_convert import convert_hf_checkpoint_streaming
cfg = Config(name="pythia-rss", block_size=64, vocab_size={V}, padded_vocab_size={V},
             n_layer={L}, n_head=12, n_embd={D})
convert_hf_checkpoint_streaming(cfg, sys.argv[1], out_dir=sys.argv[2],
                                max_shard_bytes=64 << 20)
print(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss)
"""
    out = tmp_path / "out"
    repo = str(Path(__file__).parent.parent)
    base = subprocess.run(
        [sys.executable, "-c",
         "import resource; from parrot_tpu.utils.hf_convert import convert_hf_checkpoint_streaming;"
         "print(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss)"],
        capture_output=True, text=True, cwd=repo, check=True)
    base_mb = int(base.stdout) / 1024
    run = subprocess.run([sys.executable, "-c", code, str(hf), str(out)],
                         capture_output=True, text=True, cwd=repo, check=True)
    peak_mb = int(run.stdout) / 1024
    # full-tree conversion would hold all ~total_mb of converted tensors;
    # streaming holds ~one source shard + the 64 MB writer buffer
    assert peak_mb - base_mb < shard_mb + 100, (peak_mb, base_mb, shard_mb, total_mb)

    # and the streamed output loads back equal to the in-RAM conversion
    from parrot_tpu.config import Config as Cfg
    from parrot_tpu.utils.hf_convert import convert_hf_state_dict, iter_hf_shards

    cfg = Cfg(name="pythia-rss", block_size=64, vocab_size=V, padded_vocab_size=V,
              n_layer=L, n_head=12, n_embd=D)
    want = convert_hf_state_dict(cfg, iter_hf_shards(hf))
    got = checkpoint.load_checkpoint(out, as_jax=False)
    import jax

    key = lambda kv: str(kv[0])  # noqa: E731
    for (pw, w), (pg, g) in zip(
        sorted(jax.tree_util.tree_flatten_with_path(want)[0], key=key),
        sorted(jax.tree_util.tree_flatten_with_path(got)[0], key=key),
    ):
        assert pw == pg
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
