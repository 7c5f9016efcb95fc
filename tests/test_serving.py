"""Continuous-batching serving engine tests: greedy parity with the one-shot
engine, slot reuse after EOS/budget retirement, staggered admission."""

import jax
import jax.numpy as jnp
import numpy as np

from parrot_tpu.config import Config
from parrot_tpu.generate import engine
from parrot_tpu.generate.serving import ServingEngine
from parrot_tpu.models import gpt

CFG = Config(
    name="serve-tiny",
    block_size=64,
    vocab_size=64,
    padded_vocab_size=64,
    n_layer=2,
    n_head=2,
    n_embd=32,
    rotary_percentage=1.0,
)


def make_params():
    return gpt.init_params(CFG, jax.random.PRNGKey(0))


def _reference_tokens(params, prompt, max_new):
    toks, n = engine.generate(
        params, CFG, jnp.asarray(prompt, jnp.int32), jax.random.PRNGKey(0),
        max_returned_tokens=len(prompt) + max_new, temperature=0.0,
    )
    return np.asarray(toks[len(prompt):int(n)]).tolist()


def test_continuous_matches_single_stream_greedy():
    params = make_params()
    prompts = [[1, 2, 3], [7, 6, 5, 4, 3], [9, 9]]
    expected = [_reference_tokens(params, p, 8) for p in prompts]

    eng = ServingEngine(params, CFG, slots=4, temperature=0.0)
    reqs = [eng.submit(p, max_new_tokens=8) for p in prompts]
    eng.run_until_drained(max_steps=100)
    for req, want in zip(reqs, expected):
        assert req.done
        assert req.produced == want, (req.produced, want)


def test_slot_reuse_after_retirement():
    """More requests than slots: retired slots must be reused, and late
    requests (admitted mid-decode of others) still match the single-stream
    reference."""
    params = make_params()
    prompts = [[i + 1, i + 2] for i in range(6)]
    expected = [_reference_tokens(params, p, 5) for p in prompts]

    eng = ServingEngine(params, CFG, slots=2, temperature=0.0)
    reqs = [eng.submit(p, max_new_tokens=5) for p in prompts]
    eng.run_until_drained(max_steps=200)
    assert all(r.done for r in reqs)
    for req, want in zip(reqs, expected):
        assert req.produced == want, (req.produced, want)
    # TTFT ordering: later queue entries cannot beat the first admissions
    assert all(r.ttft is not None for r in reqs)


def test_eos_retires_immediately():
    params = make_params()
    # discover the greedy continuation, then declare its 2nd token to be EOS
    probe = _reference_tokens(params, [1, 2, 3], 6)
    eos = probe[1]
    eng = ServingEngine(params, CFG, slots=2, temperature=0.0, eos_id=eos)
    req = eng.submit([1, 2, 3], max_new_tokens=6)
    eng.run_until_drained(max_steps=50)
    assert req.done
    assert req.produced == probe[:2]  # stops AT the eos token, included
    assert eng.n_active == 0


def test_staggered_admission_mid_decode():
    """A request submitted while another is mid-decode joins without
    disturbing the first stream's tokens."""
    params = make_params()
    want_a = _reference_tokens(params, [5, 4, 3], 10)
    want_b = _reference_tokens(params, [8, 8, 8, 8], 6)

    eng = ServingEngine(params, CFG, slots=2, temperature=0.0)
    ra = eng.submit([5, 4, 3], max_new_tokens=10)
    for _ in range(4):
        eng.step()
    rb = eng.submit([8, 8, 8, 8], max_new_tokens=6)
    eng.run_until_drained(max_steps=100)
    assert ra.produced == want_a
    assert rb.produced == want_b


def test_burst_matches_single_stream_greedy():
    """step_burst(n) must produce the same greedy tokens as per-step serving,
    with mid-burst retirements truncated host-side."""
    params = make_params()
    prompts = [[1, 2, 3], [7, 6, 5, 4, 3], [9, 9], [2, 4]]
    expected = [_reference_tokens(params, p, 7) for p in prompts]

    eng = ServingEngine(params, CFG, slots=2, temperature=0.0)
    reqs = [eng.submit(p, max_new_tokens=7) for p in prompts]
    eng.run_until_drained(max_steps=100, burst=4)
    for req, want in zip(reqs, expected):
        assert req.done
        assert req.produced == want, (req.produced, want)
        assert req.ttft is not None and req.t_done is not None


def test_burst_budget_exact():
    """A request whose budget ends mid-burst must stop at exactly
    max_new_tokens produced."""
    params = make_params()
    eng = ServingEngine(params, CFG, slots=1, temperature=0.0)
    req = eng.submit([1, 2, 3], max_new_tokens=5)  # 1 from admit + 4 decodes
    eng.run_until_drained(max_steps=50, burst=8)   # burst overshoots budget
    assert req.done and len(req.produced) == 5
    assert req.produced == _reference_tokens(params, [1, 2, 3], 5)


def test_sharded_serving_matches_single_device():
    """The full admission/burst/retirement cycle on an 8-device mesh (params
    tensor/fsdp-sharded, slot KV cache sharded slots x kv-heads) produces the
    same token streams as the single-device engine — the BASELINE
    "continuous batching across hosts" composition (VERDICT r3 #2)."""
    import pytest

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from parrot_tpu.parallel import mesh as mesh_lib

    cfg = CFG.replace(n_head=4, n_query_groups=2)
    params = gpt.init_params(cfg, jax.random.PRNGKey(0))
    prompts = [[1, 2, 3], [7, 6, 5, 4, 3], [9, 9], [2, 4], [11, 3, 5], [6, 1]]

    def run(mesh, burst, paged=False):
        eng = ServingEngine(
            params, cfg, slots=4, temperature=0.0, cache_dtype=jnp.int8,
            mesh=mesh, paged_kv=paged, max_seq_length=32, page_size=8,
        )
        reqs = [eng.submit(p, max_new_tokens=7) for p in prompts]
        eng.run_until_drained(max_steps=200, burst=burst)
        assert all(r.done for r in reqs)
        return [r.produced for r in reqs]

    mesh = mesh_lib.make_mesh(1, 2, 4)
    for burst in (1, 4):  # step() and step_burst() paths
        expected = run(None, burst)
        assert run(mesh, burst) == expected, burst
        # paged pool on the mesh (kv heads over tensor)
        assert run(mesh, burst, paged=True) == expected, burst


def test_paged_kv_matches_contiguous():
    """The block-paged INT8 KV pool must reproduce the contiguous cache's
    token streams exactly through the full admit/decode/retire cycle, in both
    step() and step_burst() modes (VERDICT r3 #3)."""
    params = make_params()
    prompts = [[1, 2, 3], [7, 6, 5, 4, 3], [9, 9], [2, 4], [11, 3, 5], [6, 1]]

    def run(paged, burst, **kw):
        eng = ServingEngine(
            params, CFG, slots=2, temperature=0.0, cache_dtype=jnp.int8,
            max_seq_length=32, paged_kv=paged, page_size=8, **kw,
        )
        reqs = [eng.submit(p, max_new_tokens=9) for p in prompts]
        eng.run_until_drained(max_steps=300, burst=burst)
        assert all(r.done for r in reqs)
        return [r.produced for r in reqs]

    for burst in (1, 4):
        expected = run(False, burst)
        assert run(True, burst) == expected, burst
        # oversubscribed pool: fewer pages than slots * pages_per_slot still
        # drains (backpressure defers admission until pages free up)
        assert run(True, burst, total_pages=5) == expected, burst


def test_paged_pool_exhaustion_raises():
    """A running request that cannot get a page must fail loudly with sizing
    guidance, not corrupt another slot's pages."""
    import pytest

    params = make_params()
    eng = ServingEngine(
        params, CFG, slots=2, temperature=0.0, cache_dtype=jnp.int8,
        max_seq_length=32, paged_kv=True, page_size=8, total_pages=2,
    )
    # two concurrent requests: each gets 1 page (8 rows); both need a second
    # page mid-decode but the pool is empty
    eng.submit([1, 2, 3], max_new_tokens=20)
    eng.submit([4, 5, 6], max_new_tokens=20)
    with pytest.raises(RuntimeError, match="page pool exhausted"):
        eng.run_until_drained(max_steps=50)


def test_paged_pages_freed_on_retirement():
    params = make_params()
    eng = ServingEngine(
        params, CFG, slots=2, temperature=0.0, cache_dtype=jnp.int8,
        max_seq_length=32, paged_kv=True, page_size=8,
    )
    free0 = eng.alloc.n_free
    reqs = [eng.submit([1, 2, 3], max_new_tokens=4) for _ in range(4)]
    eng.run_until_drained(max_steps=100)
    assert all(r.done for r in reqs)
    assert eng.alloc.n_free == free0  # every page returned
    assert (eng.alloc.table == -1).all()


def test_admission_retirees_reported_both_modes():
    """A request whose budget is exhausted by its admission first token must
    be returned from step() in BOTH admission modes (the sync path used to
    drop it from the finished list)."""
    params = make_params()
    for sync in (False, True):
        eng = ServingEngine(
            params, CFG, slots=2, temperature=0.0, cache_dtype=jnp.float32,
            max_seq_length=32, sync_admission=sync,
        )
        req = eng.submit(np.asarray([1, 2, 3], np.int32), max_new_tokens=1)
        finished = eng.step()
        assert req.done and len(req.produced) == 1, (sync, req.produced)
        assert req in finished, f"sync={sync}: retiree not reported"
        assert req.ttft is not None


def test_paged_rolling_window_matches_contiguous():
    """Requests that exceed the cache window (positions wrap, slot = pos % S)
    must produce identical tokens through the paged pool — by wrap time every
    page of the slot is allocated and every row was written by this request."""
    params = make_params()

    def run(paged):
        eng = ServingEngine(
            params, CFG, slots=2, temperature=0.0, cache_dtype=jnp.int8,
            max_seq_length=16, paged_kv=paged, page_size=8,
        )
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # window-roll warning is expected
            reqs = [eng.submit([1, 2, 3, 4, 5], max_new_tokens=20),
                    eng.submit([9, 8], max_new_tokens=20)]
        eng.run_until_drained(max_steps=200, burst=4)
        assert all(r.done and len(r.produced) == 20 for r in reqs)
        return [r.produced for r in reqs]

    assert run(True) == run(False)


def test_preemption_swaps_pages_to_host_and_resumes_exactly():
    """Host-tier paging ("paged across hosts"): when the pool can't grow a
    running request, another request's pages swap OUT to host RAM, it
    requeues, and later resumes from its saved pages — greedy token streams
    identical to an unconstrained run, no re-prefill."""
    params = make_params()
    prompts = [[1, 2, 3], [7, 6, 5, 4, 3], [9, 9]]
    expected = [_reference_tokens(params, p, 12) for p in prompts]

    # pool: 6 pages of 4 rows = 24 rows for 3 requests needing (3+12)+(5+12)
    # +(2+12) = 46 rows of coverage — preemption is forced
    eng = ServingEngine(
        params, CFG, slots=3, temperature=0.0, cache_dtype=jnp.int8,
        max_seq_length=16, paged_kv=True, page_size=4, total_pages=6,
    )
    reqs = [eng.submit(p, max_new_tokens=12) for p in prompts]
    eng.run_until_drained(max_steps=500)
    assert all(r.done for r in reqs)
    assert [r.produced for r in reqs] == expected
    assert sum(r.preemptions for r in reqs) > 0  # the pool was actually tight
    assert eng.alloc.n_free == 6  # all 6 allocatable pages returned
    assert (eng.alloc.table == -1).all()


def test_preemption_burst_mode_parity():
    params = make_params()
    prompts = [[1, 2, 3], [7, 6, 5, 4, 3], [9, 9], [2, 4]]
    expected = [_reference_tokens(params, p, 10) for p in prompts]
    eng = ServingEngine(
        params, CFG, slots=2, temperature=0.0, cache_dtype=jnp.int8,
        max_seq_length=16, paged_kv=True, page_size=4, total_pages=5,
    )
    reqs = [eng.submit(p, max_new_tokens=10) for p in prompts]
    eng.run_until_drained(max_steps=500, burst=4)
    assert all(r.done for r in reqs)
    assert [r.produced for r in reqs] == expected


def test_paged_admission_unsatisfiable_prompt_raises():
    """A prompt that can never fit the pool must raise instead of starving
    has_work() forever (round-4 review finding)."""
    import pytest

    params = make_params()
    eng = ServingEngine(
        params, CFG, slots=2, temperature=0.0, cache_dtype=jnp.int8,
        max_seq_length=32, paged_kv=True, page_size=8, total_pages=2,
    )
    eng.submit(list(range(1, 21)), max_new_tokens=4)  # needs 3 pages, pool has 2
    with pytest.raises(ValueError, match="raise total_pages"):
        eng.step()


def test_paged_sampled_stream_matches_contiguous_step_mode():
    """With identical seeds at temperature > 0, paged step() must consume the
    rng exactly like contiguous step() (round-4 review finding)."""
    params = make_params()

    def run(paged):
        eng = ServingEngine(
            params, CFG, slots=2, temperature=0.9, top_k=20,
            cache_dtype=jnp.int8, max_seq_length=32, paged_kv=paged,
            page_size=8, rng=jax.random.PRNGKey(7),
        )
        reqs = [eng.submit([1, 2, 3], max_new_tokens=6),
                eng.submit([9, 9], max_new_tokens=6)]
        eng.run_until_drained(max_steps=100)
        return [r.produced for r in reqs]

    assert run(True) == run(False)


def test_stop_sequences_through_serving_engine():
    """Multi-token stop sequences retire the request and are excluded from
    ``produced`` — the generate_stream contract (≙ reference chat/base.py
    stop handling), now available per-request in continuous batching."""
    params = make_params()
    prompt = [1, 2, 3]
    full = _reference_tokens(params, prompt, 8)
    # pick the 3rd+4th produced tokens as the stop sequence
    stop = tuple(full[2:4])

    eng = ServingEngine(params, CFG, slots=2, temperature=0.0)
    req = eng.submit(prompt, max_new_tokens=8, stop_tokens=(stop,))
    other = eng.submit([5, 6], max_new_tokens=8)  # unaffected neighbour
    eng.run_until_drained(max_steps=100)
    assert req.done
    assert req.produced == full[:2], (req.produced, full)
    assert other.produced == _reference_tokens(params, [5, 6], 8)
    # burst mode: same truncation across burst boundaries
    eng2 = ServingEngine(params, CFG, slots=2, temperature=0.0)
    req2 = eng2.submit(prompt, max_new_tokens=8, stop_tokens=(stop,))
    while eng2.has_work():
        eng2.step_burst(3)
    assert req2.done and req2.produced == full[:2]


def test_stop_on_admission_first_token():
    """A stop sequence of length 1 matching the very first produced token
    retires the request at the admission barrier."""
    params = make_params()
    prompt = [1, 2, 3]
    full = _reference_tokens(params, prompt, 4)
    eng = ServingEngine(params, CFG, slots=1, temperature=0.0)
    req = eng.submit(prompt, max_new_tokens=4, stop_tokens=((full[0],),))
    eng.run_until_drained(max_steps=20)
    assert req.done and req.produced == []


def test_per_request_sampling_overrides():
    """A greedy-override request decodes its reference stream even while a
    high-temperature request shares the batch (per-slot sampling arrays)."""
    params = make_params()
    prompt = [1, 2, 3]
    want = _reference_tokens(params, prompt, 6)

    eng = ServingEngine(params, CFG, slots=2, temperature=0.9, top_k=8)
    greedy_req = eng.submit(prompt, max_new_tokens=6, temperature=0.0)
    hot_req = eng.submit([4, 5], max_new_tokens=6, top_p=0.9)  # engine temp
    eng.run_until_drained(max_steps=100)
    assert greedy_req.produced == want, (greedy_req.produced, want)
    assert hot_req.done and len(hot_req.produced) == 6
    assert all(0 <= t < CFG.padded_vocab_size for t in hot_req.produced)


def test_per_slot_sampler_matches_static_sample():
    """sample_per_slot must reproduce sample() row-for-row given the same
    scalar parameters (bisect top-k ≡ sort top-k, traced top-p ≡ static)."""
    from parrot_tpu.ops.sampling import sample, sample_per_slot

    rng = jax.random.PRNGKey(3)
    logits = jax.random.normal(jax.random.PRNGKey(4), (5, 128)) * 3.0
    for t, k, p in [(1.0, 7, None), (0.7, 20, 0.9), (1.3, None, 0.5),
                    (0.0, 5, 0.9), (1.0, None, None)]:
        want = sample(rng, logits, t, k, p)
        got = sample_per_slot(
            rng, logits,
            jnp.full((5,), t, jnp.float32),
            jnp.full((5,), 0 if k is None else k, jnp.int32),
            jnp.full((5,), 1.0 if p is None else p, jnp.float32),
            use_top_k=k is not None,
            use_top_p=p is not None and p < 1.0,
        )
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got)), (t, k, p)
