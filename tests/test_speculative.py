"""Speculative decoding: greedy output must be bit-identical to the target
model decoding alone (the core correctness property), acceptance bookkeeping
must be consistent, and the distribution-preserving rule must accept
everything when draft == target."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parrot_tpu.config import Config
from parrot_tpu.generate import engine
from parrot_tpu.generate.speculative import generate_speculative
from parrot_tpu.models import gpt

CFG = Config(
    name="spec-tiny",
    block_size=128,
    vocab_size=128,
    padded_vocab_size=128,
    n_layer=3,
    n_head=4,
    n_query_groups=4,
    n_embd=48,
    intermediate_size=96,
    rotary_percentage=1.0,
    parallel_residual=False,
    bias=False,
    _norm_class="RMSNorm",
    _mlp_class="LLaMAMLP",
)

DRAFT_CFG = Config(
    name="spec-draft-tiny",
    block_size=128,
    vocab_size=128,
    padded_vocab_size=128,
    n_layer=1,
    n_head=2,
    n_query_groups=2,
    n_embd=16,
    intermediate_size=32,
    rotary_percentage=1.0,
    parallel_residual=False,
    bias=False,
    _norm_class="RMSNorm",
    _mlp_class="LLaMAMLP",
)


@pytest.fixture(scope="module")
def models():
    params = gpt.init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    draft = gpt.init_params(DRAFT_CFG, jax.random.PRNGKey(1), dtype=jnp.float32)
    return params, draft


PROMPT = jnp.asarray([3, 17, 99, 4, 25, 60, 7], jnp.int32)


def test_greedy_matches_target_only_decoding(models):
    params, draft = models
    ref_tokens, ref_len = engine.generate(
        params, CFG, PROMPT, jax.random.PRNGKey(2),
        max_returned_tokens=40, temperature=0.0, cache_dtype=jnp.float32,
    )
    for k in (1, 3, 4):
        tokens, length, stats = generate_speculative(
            params, CFG, draft, DRAFT_CFG, PROMPT, jax.random.PRNGKey(2),
            max_returned_tokens=40, k=k, temperature=0.0, cache_dtype=jnp.float32,
        )
        assert int(length) == int(ref_len)
        np.testing.assert_array_equal(
            np.asarray(tokens)[: int(length)], np.asarray(ref_tokens)[: int(ref_len)]
        )
        assert stats["rounds"] >= 1
        assert stats["tokens_committed"] >= stats["rounds"]


def test_greedy_eos_truncation_matches(models):
    params, draft = models
    ref_tokens, ref_len = engine.generate(
        params, CFG, PROMPT, jax.random.PRNGKey(2),
        max_returned_tokens=40, temperature=0.0, cache_dtype=jnp.float32,
    )
    # pick a token the greedy stream actually produces mid-stream as "EOS"
    mid = int(np.asarray(ref_tokens)[int(ref_len) - 12])
    ref_e_tokens, ref_e_len = engine.generate(
        params, CFG, PROMPT, jax.random.PRNGKey(2),
        max_returned_tokens=40, temperature=0.0, eos_id=mid, cache_dtype=jnp.float32,
    )
    tokens, length, _ = generate_speculative(
        params, CFG, draft, DRAFT_CFG, PROMPT, jax.random.PRNGKey(2),
        max_returned_tokens=40, k=4, temperature=0.0, eos_id=mid,
        cache_dtype=jnp.float32,
    )
    assert int(length) == int(ref_e_len) < int(ref_len)
    np.testing.assert_array_equal(
        np.asarray(tokens)[: int(length)], np.asarray(ref_e_tokens)[: int(ref_e_len)]
    )


def test_self_draft_accepts_everything(models):
    params, _ = models
    # draft == target: p == q, the acceptance test u*q < p passes a.s., so
    # every round commits k+1 tokens (except possibly the budget-capped last)
    tokens, length, stats = generate_speculative(
        params, CFG, params, CFG, PROMPT, jax.random.PRNGKey(3),
        max_returned_tokens=33, k=4, temperature=0.8, top_k=50,
        cache_dtype=jnp.float32,
    )
    assert int(length) == 33
    gen = stats["tokens_committed"]
    assert gen >= (stats["rounds"] - 1) * 5 + 1
    toks = np.asarray(tokens)[: int(length)]
    assert (toks >= 0).all() and (toks < 128).all()


def test_stochastic_smoke_distinct_draft(models):
    params, draft = models
    tokens, length, stats = generate_speculative(
        params, CFG, draft, DRAFT_CFG, PROMPT, jax.random.PRNGKey(4),
        max_returned_tokens=25, k=3, temperature=1.0, top_p=0.9,
        cache_dtype=jnp.float32,
    )
    assert int(length) == 25
    assert stats["rounds"] >= 1
    # committed = length - prompt + (uncounted trailing cur) bookkeeping sanity
    assert stats["tokens_committed"] >= int(length) - PROMPT.shape[0]


def test_generate_cli_with_draft(tmp_path, capsys):
    """generate.py --draft_dir: greedy speculative output through the real
    CLI equals the plain CLI output."""
    import sys
    from pathlib import Path

    from helpers import make_checkpoint

    sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
    import generate as generate_script

    checkpoint_dir, _ = make_checkpoint(tmp_path)
    draft_dir, _ = make_checkpoint(
        tmp_path / "draft", config_overrides=dict(name="tiny-draft", n_layer=1, n_head=2)
    )
    kwargs = dict(
        prompt="Hello", max_new_tokens=8, temperature=0.0,
        checkpoint_dir=checkpoint_dir, precision="32-true",
    )
    generate_script.main(**kwargs)
    plain = capsys.readouterr().out
    generate_script.main(**kwargs, draft_dir=draft_dir, speculative_k=3)
    spec = capsys.readouterr().out
    assert spec == plain and len(plain) > 0


def test_vocab_mismatch_rejected(models):
    params, _ = models
    bad = Config(
        name="bad-vocab", block_size=64, vocab_size=100, padded_vocab_size=100,
        n_layer=1, n_head=2, n_query_groups=2, n_embd=16, intermediate_size=32,
        rotary_percentage=1.0, parallel_residual=False, bias=False,
        _norm_class="RMSNorm", _mlp_class="LLaMAMLP",
    )
    draft_bad = gpt.init_params(bad, jax.random.PRNGKey(9), dtype=jnp.float32)
    with pytest.raises(ValueError):
        generate_speculative(
            params, CFG, draft_bad, bad, PROMPT, jax.random.PRNGKey(5),
            max_returned_tokens=20, temperature=0.0,
        )


def test_stream_greedy_matches_plain_stream(models):
    from parrot_tpu.generate.speculative import generate_stream_speculative

    params, draft = models
    ref = list(engine.generate_stream(
        params, CFG, PROMPT, jax.random.PRNGKey(7),
        max_returned_tokens=40, temperature=0.0, cache_dtype=jnp.float32,
    ))
    for k in (1, 3):
        got = list(generate_stream_speculative(
            params, CFG, draft, DRAFT_CFG, PROMPT, jax.random.PRNGKey(7),
            max_returned_tokens=40, k=k, temperature=0.0, cache_dtype=jnp.float32,
        ))
        assert got == ref and len(ref) > 0


def test_stream_stop_tokens_withheld(models):
    from parrot_tpu.generate.speculative import generate_stream_speculative

    params, draft = models
    ref = list(engine.generate_stream(
        params, CFG, PROMPT, jax.random.PRNGKey(7),
        max_returned_tokens=40, temperature=0.0, cache_dtype=jnp.float32,
    ))
    # stop at a 2-token sequence the greedy stream actually produces
    stop = (tuple(ref[8:10]),)
    ref_stop = list(engine.generate_stream(
        params, CFG, PROMPT, jax.random.PRNGKey(7),
        max_returned_tokens=40, temperature=0.0, stop_tokens=stop,
        cache_dtype=jnp.float32,
    ))
    got = list(generate_stream_speculative(
        params, CFG, draft, DRAFT_CFG, PROMPT, jax.random.PRNGKey(7),
        max_returned_tokens=40, k=3, temperature=0.0, stop_tokens=stop,
        cache_dtype=jnp.float32,
    ))
    assert got == ref_stop
    assert got == ref[:8]  # stop sequence itself withheld


def test_distilled_draft_benchmark_measures_real_alpha(capsys):
    """The distilled-draft harness (VERDICT r3 #4) must produce a draft whose
    measured acceptance is REAL and nonzero: train target on a Markov corpus,
    sample a distill set from it, distill a draft, A/B speculative decode."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
    import benchmark_distilled_draft as bd

    from parrot_tpu.config import name_to_config

    name_to_config.setdefault("spec-tiny-test", dict(
        name="spec-tiny-test", block_size=128, vocab_size=16,
        padded_vocab_size=16, n_layer=2, n_head=2, n_embd=48,
        rotary_percentage=1.0,
    ))
    res = bd.main(
        target_model="spec-tiny-test", draft_layers=1, draft_embd=32,
        draft_heads=2, corpus_vocab=16, corpus_len=16384, corpus_dep=1,
        target_steps=250, draft_steps=150, distill_seqs=32, distill_len=128,
        distill_temperature=0.8, seq=48, batch=8, k=4, new_tokens=32,
        reps=1, precision="32-true", target_lr=3e-3, draft_lr=3e-3,
        temperature=0.8,
    )
    capsys.readouterr()
    summaries = [r for r in res if r.get("phase") == "summary"]
    assert summaries, res
    # a genuinely distilled draft beats the round-3 random-draft floor (0.0)
    assert summaries[0]["alpha"] > 0.2, summaries
    assert summaries[0]["alpha"] <= 1.0


def test_chat_repl_with_draft(tmp_path, capsys, monkeypatch):
    """chat.py --draft_dir streams a reply through speculative decoding."""
    import sys
    from pathlib import Path

    from helpers import make_checkpoint

    sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
    import chat as chat_script

    checkpoint_dir, _ = make_checkpoint(tmp_path)
    draft_dir, _ = make_checkpoint(
        tmp_path / "draft", config_overrides=dict(name="tiny-draft", n_layer=1, n_head=2)
    )
    prompts = iter(["Hi there", ""])
    monkeypatch.setattr("builtins.input", lambda *_: next(prompts))
    chat_script.main(
        checkpoint_dir=checkpoint_dir, precision="32-true", max_new_tokens=6,
        temperature=0.0, draft_dir=draft_dir, speculative_k=2,
    )
    out = capsys.readouterr().out
    assert ">> Reply:" in out
