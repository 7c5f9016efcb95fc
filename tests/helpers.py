"""Shared test fixtures: build a complete tiny checkpoint directory (weights +
config + tokenizer) with no network access — the analogue of the reference's
``fake_checkpoint_dir`` fixture (``tests/conftest.py:16-25``), but real enough
to run the actual CLIs end-to-end."""

import json
import string
from pathlib import Path

import jax
import jax.numpy as jnp

from parrot_tpu.config import Config
from parrot_tpu.models import gpt
from parrot_tpu.utils import checkpoint as ckpt

TINY_CONFIG = dict(
    name="tiny-ckpt",
    block_size=512,
    vocab_size=256,
    padded_vocab_size=256,
    n_layer=2,
    n_head=2,
    n_embd=32,
    rotary_percentage=0.5,
    parallel_residual=True,
)


def write_char_tokenizer(checkpoint_dir: Path) -> None:
    """Character-level HF tokenizer covering printable ASCII."""
    from tokenizers import Regex, Tokenizer, decoders, models, pre_tokenizers

    chars = list(string.printable)
    vocab = {"<unk>": 0, "<eos>": 1, "<bos>": 2}
    for c in chars:
        vocab.setdefault(c, len(vocab))
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Split(Regex(r"[\s\S]"), "isolated")
    tok.decoder = decoders.Fuse()
    tok.save(str(checkpoint_dir / "tokenizer.json"))
    with open(checkpoint_dir / "tokenizer_config.json", "w") as f:
        json.dump({"bos_token": "<bos>", "eos_token": "<eos>"}, f)


def make_checkpoint(tmp_path: Path, config_overrides: dict | None = None,
                    dtype=jnp.float32) -> tuple[Path, Config]:
    conf = dict(TINY_CONFIG)
    conf.update(config_overrides or {})
    config = Config(**conf)
    checkpoint_dir = Path(tmp_path) / "checkpoints" / "tiny"
    checkpoint_dir.mkdir(parents=True, exist_ok=True)
    params = gpt.init_params(config, jax.random.PRNGKey(0), dtype=dtype)
    ckpt.save_checkpoint(checkpoint_dir, params, config=config)
    write_char_tokenizer(checkpoint_dir)
    return checkpoint_dir, config
