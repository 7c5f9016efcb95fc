#!/usr/bin/env python
"""On-chip quantization-quality harness at pythia-70m scale (VERDICT r4 #4).

The reference's quality table is measured on real falcon-7b
(``tutorials/quantize.md:18-128``). This environment has no network egress,
so no real checkpoint can be downloaded; the strongest in-env proxy is a
model of a REAL registry shape (``pythia-70m``: 6 layers, d=512 — an order
of magnitude past the 2-layer/d=64 toy in ``tests/test_quality.py``) trained
on-chip on a structured synthetic corpus until it has genuine predictive
structure, then evaluated across the full quantization-mode matrix with the
REAL TPU kernels (Pallas paths included, so kernel numerics are measured,
not just format rounding).

Prints one JSON line per mode: {"mode", "ppl", "delta", "rel_delta"} and a
final summary line. Run on the chip:

    python scripts/quality_eval.py            # ~2-4 min end to end
    python scripts/quality_eval.py --steps 200 --model pythia-70m
"""

import json
import sys
import time
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))


def make_corpus(vocab: int, n_tokens: int, seed: int = 0):
    """Structured stream: a 2nd-order deterministic skeleton with 15% noise
    and periodic 'phrase' repeats — learnable far below uniform entropy, but
    with enough conditional uncertainty that small logit perturbations
    (quantization noise) move measured perplexity."""
    import numpy as np

    rng = np.random.RandomState(seed)
    toks = np.zeros(n_tokens, np.int64)
    toks[0], toks[1] = 1, 2
    phrase = rng.randint(0, vocab, size=32)
    for i in range(2, n_tokens):
        if i % 256 < 32:  # periodic exact phrase (long-range structure)
            toks[i] = phrase[i % 256]
        elif rng.rand() < 0.15:  # noise floor
            toks[i] = rng.randint(0, vocab)
        else:  # 2nd-order deterministic rule
            toks[i] = (3 * toks[i - 1] + 5 * toks[i - 2] + 7) % vocab
    return toks.astype(np.int32)


def main(
    model: str = "pythia-70m",
    steps: int = 400,
    batch_size: int = 8,
    seq_len: int = 512,
    vocab_used: int = 4096,
    lr: float = 3e-3,
    calib_samples: int = 32,
    seed: int = 0,
) -> None:
    """Train a registry-shape model on-chip, then measure ppl deltas for the
    quantization-mode matrix (the reference's quality bar, BASELINE.md).

    Args:
        model: Registry config name (shape source; pythia-70m = 6L/d512).
        steps: Training steps (a few hundred suffice on the chip).
        batch_size: Training batch.
        seq_len: Training/eval sequence length.
        vocab_used: Portion of the vocab the corpus draws from.
        lr: AdamW learning rate.
        calib_samples: GPTQ calibration sequences.
        seed: Corpus/init seed.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from parrot_tpu.config import Config
    from parrot_tpu.models import gpt
    from parrot_tpu.ops.cross_entropy import cross_entropy
    from parrot_tpu.quantize import api
    from parrot_tpu.training import optim, train

    t_start = time.time()
    config = Config.from_name(model)
    vocab_used = min(vocab_used, config.vocab_size)
    corpus = make_corpus(vocab_used, steps * batch_size * 4 + 64 * seq_len, seed)

    # -- train on-chip -------------------------------------------------------
    params = gpt.init_params(config, jax.random.PRNGKey(seed), dtype=jnp.bfloat16)
    optimizer = optim.adamw(lr, weight_decay=0.0)
    opt_state = optimizer.init(params)
    step = jax.jit(train.make_train_step(config, optimizer, remat=False),
                   donate_argnums=(0, 1))
    rng = np.random.RandomState(seed + 1)
    loss = None
    for it in range(steps):
        ix = rng.randint(0, len(corpus) - seq_len - 1, size=batch_size)
        batch_tokens = np.stack([corpus[i : i + seq_len] for i in ix])
        batch = {"input_ids": jnp.asarray(batch_tokens),
                 "labels": jnp.asarray(batch_tokens)}
        params, opt_state, loss = step(params, opt_state, batch)
        if it % 100 == 0:
            print(f"# step {it}: loss {float(loss):.3f}", file=sys.stderr)
    final_loss = float(loss)
    uniform = float(np.log(vocab_used))
    print(f"# trained {model}-shape: loss {final_loss:.3f} "
          f"(uniform {uniform:.2f}) in {time.time() - t_start:.0f}s",
          file=sys.stderr)
    assert final_loss < 0.6 * uniform, "model failed to learn — deltas meaningless"

    # held-out eval batch (tail of the corpus, never sampled for training)
    eval_tokens = jnp.asarray(np.stack(
        [corpus[-(i + 1) * seq_len - 1 : -(i + 1) * seq_len - 1 + seq_len]
         for i in range(8)]
    ))

    fwd = jax.jit(lambda p, t: gpt.forward(p, config, t),
                  static_argnames=())

    def ppl(p) -> float:
        logits = fwd(p, eval_tokens)
        return float(jnp.exp(cross_entropy(
            logits[:, :-1].astype(jnp.float32), eval_tokens[:, 1:])))

    rows = []

    def report(mode: str, value: float, fp_ppl: float) -> None:
        row = {"mode": mode, "ppl": round(value, 4),
               "delta": round(value - fp_ppl, 4),
               "rel_delta": round((value - fp_ppl) / fp_ppl, 4)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    fp_ppl = ppl(params)
    report("bf16 (baseline)", fp_ppl, fp_ppl)

    # RTN mode matrix (the reference's `--quantize` menu + the TPU extras)
    for mode in ("bnb.int8", "bnb.int8-llm", "bnb.nf4", "bnb.nf4-dq",
                 "bnb.fp4", "bnb.fp4-dq", "gptq.int4", "gptq.int2",
                 "gptq.int8"):
        q = api.quantize_params(params, config, mode)
        label = mode + (" (RTN)" if mode.startswith("gptq") else "")
        report(label, ppl(q), fp_ppl)
        del q

    # calibrated GPTQ at 4 and 2 bit (the reference's actual gptq flow)
    calib = jnp.asarray(np.stack(
        [corpus[i * seq_len : (i + 1) * seq_len] for i in range(calib_samples)]
    ))
    for bits in (4, 2):
        t0 = time.time()
        qc, _stats = api.quantize_model_gptq(
            params, config, calib, bits=bits, batch_size=8, log=None,
            stream_from_host=False,
        )
        report(f"gptq.int{bits} (calibrated, {time.time() - t0:.0f}s)",
               ppl(qc), fp_ppl)
        del qc

    # W8A8 decode variant on the int4 weights (opt-in kernel numerics).
    # FRESH jit: the kernel variant is a module global read at trace time —
    # reusing `fwd` would silently re-run the cached 2dot-f32 executable
    # (same param treedef), reporting int4-RTN's ppl as W8A8's.
    from parrot_tpu.ops import pallas_quant

    if jax.default_backend() == "tpu":
        pallas_quant.set_int4_variant("w8a8")
        try:
            for mode, label in (("gptq.int4", "gptq.int4 + W8A8 kernel"),
                                ("gptq.int2", "gptq.int2 + W8A8 kernel")):
                qm = api.quantize_params(params, config, mode)
                fwd_w8a8 = jax.jit(lambda p, t: gpt.forward(p, config, t))
                logits = fwd_w8a8(qm, eval_tokens)
                v = float(jnp.exp(cross_entropy(
                    logits[:, :-1].astype(jnp.float32), eval_tokens[:, 1:])))
                report(label, v, fp_ppl)
                del qm
        finally:
            pallas_quant.set_int4_variant("2dot-f32")

    # int8 KV-cache effect (greedy top-1 agreement + cached ppl proxy)
    tok = eval_tokens[:1]
    fp_cache = gpt.KVCache.init(config, 1, seq_len, dtype=jnp.bfloat16)
    q_cache = gpt.KVCache.init(config, 1, seq_len, dtype=jnp.int8)
    lf, _ = gpt.forward_cached(params, config, tok, fp_cache, jnp.asarray(0))
    lq, _ = gpt.forward_cached(params, config, tok, q_cache, jnp.asarray(0))
    agree = float((jnp.argmax(lf, -1) == jnp.argmax(lq, -1)).mean())
    print(json.dumps({"mode": "int8-KV top1 agreement vs bf16-KV",
                      "value": round(agree, 4)}), flush=True)

    print(json.dumps({
        "harness": f"{model}-shape ({config.n_layer}L, d={config.n_embd}), "
                   f"{steps} steps on {jax.devices()[0].device_kind}",
        "train_loss": round(final_loss, 3),
        "fp_ppl": round(fp_ppl, 3),
        "runtime_s": round(time.time() - t_start, 1),
    }), flush=True)


if __name__ == "__main__":
    from parrot_tpu.utils.cli import cli

    cli(main)
