"""Model configuration registry.

The ``Config`` dataclass carries every architectural knob needed to describe the
checkpoint families supported by the reference framework (Lit-GPT,
``/root/reference/lit_gpt/config.py:11-92``): StableLM, Pythia, RedPajama-INCITE,
Falcon, OpenLLaMA, Vicuna, LongChat, Nous-Hermes, Llama-2 and FreeWilly2. The
field names and the set of registered checkpoint names are the compatibility
surface — they match the reference so that ``lit_config.json`` files and
converted checkpoints drop in unchanged.

Unlike the reference (which resolves ``_norm_class``/``_mlp_class`` to
``torch.nn`` types), this framework is purely functional: the string tags are
consumed directly by the forward pass in :mod:`parrot_tpu.models.gpt`.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Optional


def find_multiple(n: int, k: int) -> int:
    """Round ``n`` up to the nearest multiple of ``k``.

    Mirrors the vocab padding rule of the reference
    (``lit_gpt/utils.py:20-24``): padded vocab sizes land on hardware-friendly
    multiples, which on TPU keeps the lm_head matmul lane-aligned (128 divides
    every ``padding_multiple`` used by the registry).
    """
    assert k > 0
    if n % k == 0:
        return n
    return n + k - (n % k)


@dataclass(frozen=True)
class Config:
    """Frozen (hashable) so a Config can be a static argument to ``jax.jit``
    — the whole model architecture is compile-time constant on TPU."""

    org: str = "parrot-tpu"
    name: str = "parrot-tpu"
    block_size: int = 4096
    vocab_size: int = 50254
    padding_multiple: int = 512
    padded_vocab_size: Optional[int] = None
    n_layer: int = 16
    n_head: int = 32
    n_embd: int = 4096
    rotary_percentage: float = 0.25
    parallel_residual: bool = True
    bias: bool = True
    # n_query_groups == n_head -> MHA; == 1 -> MQA; in between -> GQA
    # (reference diagram: lit_gpt/config.py:25-45)
    n_query_groups: Optional[int] = None
    shared_attention_norm: bool = False
    _norm_class: str = "LayerNorm"
    norm_eps: float = 1e-5
    _mlp_class: str = "GptNeoxMLP"
    intermediate_size: Optional[int] = None
    # positional-interpolation divisor for long-context checkpoints
    # (longchat-*-16k use 8; reference lit_gpt/config.py:51,384)
    condense_ratio: int = 1
    rope_base: int = 10000

    def __post_init__(self) -> None:
        if self.n_embd % self.n_head != 0:
            raise ValueError(f"n_embd={self.n_embd} must divide n_head={self.n_head}")
        if self.padded_vocab_size is None:
            object.__setattr__(
                self, "padded_vocab_size", find_multiple(self.vocab_size, self.padding_multiple)
            )
        if self.n_query_groups is None:
            object.__setattr__(self, "n_query_groups", self.n_head)
        elif self.n_head % self.n_query_groups != 0:
            raise ValueError(
                f"n_head={self.n_head} must be divisible by n_query_groups={self.n_query_groups}"
            )
        if self.intermediate_size is None:
            if self._mlp_class == "LLaMAMLP":
                raise ValueError("LLaMAMLP requires an explicit `intermediate_size`")
            object.__setattr__(self, "intermediate_size", 4 * self.n_embd)

    def replace(self, **kwargs: Any) -> "Config":
        return dataclasses.replace(self, **kwargs)

    # -- derived geometry ---------------------------------------------------

    @property
    def head_size(self) -> int:
        return self.n_embd // self.n_head

    @property
    def rope_n_elem(self) -> int:
        """Number of head dims that receive rotary embedding (partial rotary)."""
        return int(self.rotary_percentage * self.head_size)

    @property
    def q_per_kv(self) -> int:
        return self.n_head // self.n_query_groups

    @property
    def qkv_out_size(self) -> int:
        """Output width of the fused QKV projection.

        Layout is group-interleaved, identical to the reference
        (``lit_gpt/model.py:186,207-214``): per query group, ``q_per_kv``
        query heads then one key head then one value head.
        """
        return (self.n_head + 2 * self.n_query_groups) * self.head_size

    @property
    def norm_class(self) -> str:
        return self._norm_class

    @property
    def mlp_class(self) -> str:
        return self._mlp_class

    # -- construction -------------------------------------------------------

    @classmethod
    def from_name(cls, name: str, **kwargs: Any) -> "Config":
        if name not in name_to_config:
            raise ValueError(
                f"Unknown model name {name!r}. Available: {sorted(name_to_config)}"
            )
        conf = dict(name_to_config[name])
        conf.update(kwargs)
        return cls(**conf)

    @classmethod
    def from_json(cls, path: Path, **kwargs: Any) -> "Config":
        with open(path) as f:
            conf = json.load(f)
        conf.update(kwargs)
        known = {f.name for f in dataclasses.fields(cls)}
        conf = {k: v for k, v in conf.items() if k in known}
        return cls(**conf)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def save_json(self, path: Path) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)


# ---------------------------------------------------------------------------
# Checkpoint registry. Hyperparameters transcribed from each family's
# published HF config.json (same sources the reference cites,
# lit_gpt/config.py:98-528).
# ---------------------------------------------------------------------------

_CONFIGS: list[dict] = []


def _register(**kwargs: Any) -> None:
    _CONFIGS.append(kwargs)


# -- Stability AI StableLM (NeoX-style, 25% rotary, parallel residual) ------
_register(org="stabilityai", name="stablelm-base-alpha-3b", padding_multiple=512)
_register(org="stabilityai", name="stablelm-base-alpha-7b", n_head=48, n_embd=6144,
          padding_multiple=256)
_register(org="stabilityai", name="stablelm-tuned-alpha-3b", n_head=32, padding_multiple=512)
_register(org="stabilityai", name="stablelm-tuned-alpha-7b", n_head=48, n_embd=6144,
          padding_multiple=256)

# -- EleutherAI Pythia ------------------------------------------------------
_PYTHIA = {
    "pythia-70m": dict(n_layer=6, n_embd=512, n_head=8),
    "pythia-160m": dict(n_layer=12, n_embd=768, n_head=12),
    "pythia-410m": dict(n_layer=24, n_embd=1024, n_head=16),
    "pythia-1b": dict(n_layer=16, n_embd=2048, n_head=8),
    "pythia-1.4b": dict(n_layer=24, n_embd=2048, n_head=16),
    "pythia-2.8b": dict(n_layer=32, n_embd=2560, n_head=32),
    "pythia-6.9b": dict(n_layer=32, n_embd=4096, n_head=32, padding_multiple=256),
    "pythia-12b": dict(n_layer=36, n_embd=5120, n_head=40, padding_multiple=512),
}
for _name, _hp in _PYTHIA.items():
    base = dict(org="EleutherAI", block_size=2048, padding_multiple=128)
    base.update(_hp)
    _register(name=_name, **base)
    _register(name=f"{_name}-deduped", **base)

# -- togethercomputer RedPajama-INCITE (full rotary, sequential residual) ---
_RPJ = {
    "RedPajama-INCITE-{}-3B-v1": dict(n_layer=32, n_embd=2560, n_head=32),
    "RedPajama-INCITE-7B-{}": dict(n_layer=32, n_embd=4096, n_head=32),
    "RedPajama-INCITE-{}-7B-v0.1": dict(n_layer=32, n_embd=4096, n_head=32),
}
for _tmpl, _hp in _RPJ.items():
    for _kind in ("Base", "Chat", "Instruct"):
        _register(org="togethercomputer", name=_tmpl.format(_kind), block_size=2048,
                  padding_multiple=256, rotary_percentage=1.0, parallel_residual=False,
                  **_hp)

# -- TII UAE Falcon ---------------------------------------------------------
for _kind in ("", "-instruct"):
    _register(org="tiiuae", name=f"falcon-7b{_kind}", block_size=2048,
              padded_vocab_size=65024, n_layer=32, n_head=71, n_embd=4544,
              rotary_percentage=1.0, parallel_residual=True, n_query_groups=1,
              bias=False,
              # MQA + one shared norm feeding both attn and mlp: only falcon-7b
              # (reference lit_gpt/config.py:213-215)
              shared_attention_norm=True)
    _register(org="tiiuae", name=f"falcon-40b{_kind}", block_size=2048,
              padded_vocab_size=65024, n_layer=60, n_head=128, n_embd=8192,
              rotary_percentage=1.0, parallel_residual=True, n_query_groups=8,
              bias=False)

# -- Llama-family base kwargs (RMSNorm + SwiGLU, full rotary) ---------------


def _llama_like(**kwargs: Any) -> dict:
    base = dict(vocab_size=32000, padding_multiple=64, rotary_percentage=1.0,
                parallel_residual=False, bias=False, _norm_class="RMSNorm",
                _mlp_class="LLaMAMLP")
    base.update(kwargs)
    return base


# -- OpenLM Research OpenLLaMA ----------------------------------------------
_register(org="openlm-research", name="open_llama_3b", block_size=2048,
          **_llama_like(n_layer=26, n_head=32, n_embd=3200, intermediate_size=8640,
                        norm_eps=1e-6))
_register(org="openlm-research", name="open_llama_7b", block_size=2048,
          **_llama_like(n_layer=32, n_head=32, n_embd=4096, intermediate_size=11008,
                        norm_eps=1e-6))
_register(org="openlm-research", name="open_llama_13b", block_size=2048,
          **_llama_like(n_layer=40, n_head=40, n_embd=5120, intermediate_size=13824,
                        norm_eps=1e-6))

# -- LMSYS Vicuna -----------------------------------------------------------
_register(org="lmsys", name="vicuna-7b-v1.3", block_size=2048,
          **_llama_like(n_layer=32, n_head=32, n_embd=4096, intermediate_size=11008,
                        norm_eps=1e-6))
_register(org="lmsys", name="vicuna-13b-v1.3", block_size=2048,
          **_llama_like(n_layer=40, n_head=40, n_embd=5120, intermediate_size=13824,
                        norm_eps=1e-6))
_register(org="lmsys", name="vicuna-33b-v1.3", block_size=2048,
          **_llama_like(n_layer=60, n_head=52, n_embd=6656, intermediate_size=17920,
                        norm_eps=1e-6))

# -- LMSYS LongChat (16k context via positional interpolation) --------------
_register(org="lmsys", name="longchat-7b-16k", block_size=16384,
          **_llama_like(n_layer=32, n_head=32, n_embd=4096, intermediate_size=11008,
                        norm_eps=1e-6, condense_ratio=8))
_register(org="lmsys", name="longchat-13b-16k", block_size=16384,
          **_llama_like(n_layer=40, n_head=40, n_embd=5120, intermediate_size=13824,
                        norm_eps=1e-6, condense_ratio=8))

# -- NousResearch Hermes ----------------------------------------------------
_register(org="NousResearch", name="Nous-Hermes-13b", block_size=2048,
          padded_vocab_size=32001,
          **_llama_like(n_layer=40, n_head=40, n_embd=5120, intermediate_size=13824,
                        norm_eps=1e-6))

# -- Meta Llama-2 -----------------------------------------------------------
_LLAMA2 = {
    "Llama-2-7b{}-hf": dict(n_layer=32, n_head=32, n_embd=4096, intermediate_size=11008),
    "Llama-2-13b{}-hf": dict(n_layer=40, n_head=40, n_embd=5120, intermediate_size=13824),
    "Llama-2-70b{}-hf": dict(n_layer=80, n_head=64, n_embd=8192, n_query_groups=8,
                             intermediate_size=28672),
}
for _tmpl, _hp in _LLAMA2.items():
    for _kind in ("", "-chat"):
        _register(org="meta-llama", name=_tmpl.format(_kind), block_size=4096,
                  **_llama_like(norm_eps=1e-5, **_hp))

# -- Stability AI FreeWilly2 (Llama-2-70b finetune) -------------------------
_register(org="stabilityai", name="FreeWilly2", block_size=4096,
          **_llama_like(n_layer=80, n_head=64, n_embd=8192, n_query_groups=8,
                        intermediate_size=28672, norm_eps=1e-5))


name_to_config: dict[str, dict] = {c["name"]: c for c in _CONFIGS}
