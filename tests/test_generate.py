"""Generation engine tests (reference analogue: tests/test_generate.py +
test_chat.py stop-token table tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from parrot_tpu.config import Config
from parrot_tpu.generate import engine
from parrot_tpu.models import gpt

CFG = Config(
    name="tiny",
    block_size=32,
    vocab_size=64,
    padded_vocab_size=64,
    n_layer=2,
    n_head=2,
    n_embd=32,
    rotary_percentage=1.0,
)


def make_params():
    return gpt.init_params(CFG, jax.random.PRNGKey(0))


def test_generate_greedy_deterministic():
    params = make_params()
    prompt = jnp.array([1, 2, 3, 4], jnp.int32)
    toks1, n1 = engine.generate(
        params, CFG, prompt, jax.random.PRNGKey(1),
        max_returned_tokens=12, temperature=0.0, cache_dtype=jnp.float32,
    )
    toks2, n2 = engine.generate(
        params, CFG, prompt, jax.random.PRNGKey(2),
        max_returned_tokens=12, temperature=0.0, cache_dtype=jnp.float32,
    )
    assert int(n1) == 12 and int(n2) == 12
    np.testing.assert_array_equal(np.asarray(toks1), np.asarray(toks2))
    np.testing.assert_array_equal(np.asarray(toks1[:4]), np.asarray(prompt))


def test_generate_matches_stepwise_forward():
    """The fused while_loop decode must equal a hand-rolled python loop."""
    params = make_params()
    prompt = jnp.array([5, 9, 2], jnp.int32)
    R = 10
    toks, n = engine.generate(
        params, CFG, prompt, jax.random.PRNGKey(0),
        max_returned_tokens=R, temperature=0.0, cache_dtype=jnp.float32,
    )

    cache = gpt.KVCache.init(CFG, 1, R, dtype=jnp.float32)
    logits, cache = gpt.forward_cached(params, CFG, prompt[None], cache, jnp.asarray(0))
    out = list(np.asarray(prompt))
    tok = int(jnp.argmax(logits[0, -1]))
    for pos in range(3, R):
        out.append(tok)
        if pos == R - 1:
            break
        logits, cache = gpt.forward_cached(
            params, CFG, jnp.asarray([[tok]], jnp.int32), cache, jnp.asarray(pos)
        )
        tok = int(jnp.argmax(logits[0, -1]))
    np.testing.assert_array_equal(np.asarray(toks)[:R], np.asarray(out))


def test_generate_sampled_reproducible_by_key():
    params = make_params()
    prompt = jnp.array([1, 2], jnp.int32)
    kw = dict(max_returned_tokens=10, temperature=0.8, top_k=5, cache_dtype=jnp.float32)
    t1, _ = engine.generate(params, CFG, prompt, jax.random.PRNGKey(7), **kw)
    t2, _ = engine.generate(params, CFG, prompt, jax.random.PRNGKey(7), **kw)
    t3, _ = engine.generate(params, CFG, prompt, jax.random.PRNGKey(8), **kw)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert not np.array_equal(np.asarray(t1), np.asarray(t3))  # overwhelmingly likely


def test_generate_eos_early_exit():
    params = make_params()
    prompt = jnp.array([1, 2, 3], jnp.int32)
    # find what greedy generates first, then use it as the "eos"
    toks, _ = engine.generate(
        params, CFG, prompt, jax.random.PRNGKey(0),
        max_returned_tokens=12, temperature=0.0, cache_dtype=jnp.float32,
    )
    first_gen = int(toks[3])
    toks2, n2 = engine.generate(
        params, CFG, prompt, jax.random.PRNGKey(0),
        max_returned_tokens=12, temperature=0.0, eos_id=first_gen,
        cache_dtype=jnp.float32,
    )
    assert int(n2) == 4  # prompt + the eos token
    assert int(toks2[3]) == first_gen


def test_generate_batch_matches_single():
    """Ragged batched generation must reproduce per-sequence single
    generation exactly (greedy)."""
    params = make_params()
    prompts = [
        jnp.array([1, 2, 3, 4], jnp.int32),
        jnp.array([9, 8], jnp.int32),
        jnp.array([5, 5, 5], jnp.int32),
    ]
    R = 12
    singles = [
        np.asarray(engine.generate(
            params, CFG, p, jax.random.PRNGKey(0),
            max_returned_tokens=R, temperature=0.0, cache_dtype=jnp.float32,
        )[0])
        for p in prompts
    ]

    T_max = max(p.shape[0] for p in prompts)
    padded = jnp.stack([
        jnp.pad(p, (0, T_max - p.shape[0])) for p in prompts
    ])
    lengths = jnp.asarray([p.shape[0] for p in prompts], jnp.int32)
    toks, out_lens = engine.generate_batch(
        params, CFG, padded, lengths, jax.random.PRNGKey(0),
        max_returned_tokens=R, temperature=0.0, cache_dtype=jnp.float32,
    )
    for b in range(3):
        np.testing.assert_array_equal(
            np.asarray(toks[b]), singles[b], err_msg=f"sequence {b}"
        )
        assert int(out_lens[b]) == R


def test_generate_batch_eos_retirement():
    params = make_params()
    prompts = jnp.array([[1, 2, 3], [7, 6, 5]], jnp.int32)
    lengths = jnp.array([3, 3], jnp.int32)
    # find each row's first greedy token, use row 0's as "eos"
    toks, _ = engine.generate_batch(
        params, CFG, prompts, lengths, jax.random.PRNGKey(0),
        max_returned_tokens=10, temperature=0.0, cache_dtype=jnp.float32,
    )
    eos = int(toks[0, 3])
    toks2, lens2 = engine.generate_batch(
        params, CFG, prompts, lengths, jax.random.PRNGKey(0),
        max_returned_tokens=10, temperature=0.0, eos_id=eos,
        cache_dtype=jnp.float32,
    )
    assert int(lens2[0]) == 4  # prompt + eos
    # row 1 keeps generating unless it also hits eos
    assert int(lens2[1]) >= 4


def test_stream_matches_generate():
    params = make_params()
    prompt = jnp.array([4, 4, 8], jnp.int32)
    toks, n = engine.generate(
        params, CFG, prompt, jax.random.PRNGKey(0),
        max_returned_tokens=11, temperature=0.0, cache_dtype=jnp.float32,
    )
    streamed = list(engine.generate_stream(
        params, CFG, prompt, jax.random.PRNGKey(0),
        max_returned_tokens=11, temperature=0.0, cache_dtype=jnp.float32,
    ))
    np.testing.assert_array_equal(np.asarray(toks)[3:int(n)], np.asarray(streamed))


def test_stream_stop_sequence():
    params = make_params()
    prompt = jnp.array([4, 4, 8], jnp.int32)
    full = list(engine.generate_stream(
        params, CFG, prompt, jax.random.PRNGKey(0),
        max_returned_tokens=11, temperature=0.0, cache_dtype=jnp.float32,
    ))
    assert len(full) >= 3
    # stop on the 2-token sequence ending at position 2 of the generation
    stop = (int(full[1]), int(full[2]))
    stopped = list(engine.generate_stream(
        params, CFG, prompt, jax.random.PRNGKey(0),
        max_returned_tokens=11, temperature=0.0, stop_tokens=(stop,),
        cache_dtype=jnp.float32,
    ))
    assert stopped == [full[0]]


def test_bucketed_no_recompile():
    """Different prompt lengths within one bucket reuse the compiled program:
    the compile count is O(log T), not O(#distinct lengths) (the reference
    pads to fixed shapes for exactly this reason, finetune/full.py:247-248)."""
    params = make_params()
    kw = dict(max_returned_tokens=24, temperature=0.0)

    def run(n):
        prompt = jnp.arange(1, n + 1, dtype=jnp.int32)
        return engine.generate(params, CFG, prompt, jax.random.PRNGKey(0), **kw)

    run(4)
    n0 = engine._generate_padded._cache_size()
    toks, length = run(7)  # same 16-bucket: must not add a cache entry
    assert engine._generate_padded._cache_size() == n0
    assert int(length) == 24
    # prompt is preserved un-padded in the output buffer
    np.testing.assert_array_equal(np.asarray(toks[:7]), np.arange(1, 8))
    run(20)  # next bucket: exactly one new compile
    assert engine._generate_padded._cache_size() == n0 + 1


def test_bucketed_prefill_matches_unpadded_numerics():
    """Padded prefill + masked decode must produce the same tokens as an
    explicitly exact-length run (max_seq_length pins the cache size so both
    runs share shapes where possible)."""
    params = make_params()
    prompt = jnp.array([1, 2, 3, 4, 5], jnp.int32)
    kw = dict(max_returned_tokens=20, temperature=0.0, max_seq_length=32)
    t1, n1 = engine.generate(params, CFG, prompt, jax.random.PRNGKey(0), **kw)
    # same prompt via the stream path (shares the bucketing); greedy => equal
    streamed = list(engine.generate_stream(
        params, CFG, prompt, jax.random.PRNGKey(0),
        max_returned_tokens=20, temperature=0.0, max_seq_length=32,
    ))
    np.testing.assert_array_equal(np.asarray(t1[5:int(n1)]), np.asarray(streamed))


def test_stream_second_turn_no_recompile():
    """Chat turn 2 with a different prompt length must reuse both the prefill
    and decode programs (module-level jits + bucketing)."""
    params = make_params()
    kw = dict(max_returned_tokens=24, temperature=0.0)
    list(engine.generate_stream(
        params, CFG, jnp.array([1, 2, 3], jnp.int32), jax.random.PRNGKey(0), **kw))
    n_pre = engine._prefill_jit._cache_size()
    n_dec = engine._decode_step._cache_size()
    list(engine.generate_stream(
        params, CFG, jnp.array([4, 5, 6, 7, 8], jnp.int32), jax.random.PRNGKey(1), **kw))
    assert engine._prefill_jit._cache_size() == n_pre
    assert engine._decode_step._cache_size() == n_dec


def test_decode_steps_matches_stepwise():
    """The fused scan chunk must reproduce the per-token _decode_step chain."""
    params = make_params()
    n = 6

    def run_stepwise():
        cache = gpt.KVCache.init(CFG, 1, 16, dtype=jnp.float32)
        tok = jnp.asarray(1, jnp.int32)
        rng = jax.random.PRNGKey(7)
        out = []
        for pos in range(n):
            rng, r = jax.random.split(rng)
            tok, cache = engine._decode_step(
                params, tok, cache, jnp.asarray(pos, jnp.int32), r,
                config=CFG, temperature=0.8, top_k=8,
            )
            out.append(int(tok))
        return out

    cache = gpt.KVCache.init(CFG, 1, 16, dtype=jnp.float32)
    toks, _, _ = engine.decode_steps(
        params, jnp.asarray(1, jnp.int32), cache, jnp.asarray(0, jnp.int32),
        jax.random.PRNGKey(7), config=CFG, n_steps=n, temperature=0.8, top_k=8,
    )
    assert run_stepwise() == [int(t) for t in toks]


def test_decode_steps_chunks_chain():
    """Two chained chunks equal one double-length chunk (cache + rng thread)."""
    params = make_params()
    cache = gpt.KVCache.init(CFG, 1, 16, dtype=jnp.float32)
    toks_a, cache, rng = engine.decode_steps(
        params, jnp.asarray(2, jnp.int32), cache, jnp.asarray(0, jnp.int32),
        jax.random.PRNGKey(3), config=CFG, n_steps=4, temperature=0.0, top_k=None,
    )
    toks_b, _, _ = engine.decode_steps(
        params, toks_a[-1], cache, jnp.asarray(4, jnp.int32), rng,
        config=CFG, n_steps=4, temperature=0.0, top_k=None,
    )
    cache2 = gpt.KVCache.init(CFG, 1, 16, dtype=jnp.float32)
    toks_full, _, _ = engine.decode_steps(
        params, jnp.asarray(2, jnp.int32), cache2, jnp.asarray(0, jnp.int32),
        jax.random.PRNGKey(3), config=CFG, n_steps=8, temperature=0.0, top_k=None,
    )
    got = [int(t) for t in toks_a] + [int(t) for t in toks_b]
    assert got == [int(t) for t in toks_full]


def test_stream_burst_matches_single_greedy():
    params = make_params()
    prompt = jnp.array([1, 2, 3], jnp.int32)
    kw = dict(max_returned_tokens=14, temperature=0.0, cache_dtype=jnp.float32)
    single = list(engine.generate_stream(params, CFG, prompt, jax.random.PRNGKey(0), **kw))
    for burst in (2, 4, 8):
        bursty = list(engine.generate_stream(
            params, CFG, prompt, jax.random.PRNGKey(0), burst=burst, **kw))
        assert bursty == single, (burst, bursty, single)


def test_stream_burst_stop_sequence_mid_burst():
    """A stop sequence completed mid-burst must truncate exactly as the
    per-token stream does, dropping tokens decoded past the stop."""
    params = make_params()
    prompt = jnp.array([1, 2, 3], jnp.int32)
    kw = dict(max_returned_tokens=16, temperature=0.0, cache_dtype=jnp.float32)
    full = list(engine.generate_stream(params, CFG, prompt, jax.random.PRNGKey(0), **kw))
    assert len(full) >= 3
    stop = (tuple(full[2:4]),)  # stops mid-stream, inside a burst of 8
    want = list(engine.generate_stream(
        params, CFG, prompt, jax.random.PRNGKey(0), stop_tokens=stop, **kw))
    got = list(engine.generate_stream(
        params, CFG, prompt, jax.random.PRNGKey(0), stop_tokens=stop, burst=8, **kw))
    assert got == want == full[:2], (got, want)
