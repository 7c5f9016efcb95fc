"""Worker for the 2-process jax.distributed test (run via subprocess).

Each process owns 4 virtual CPU devices; ``jax.distributed.initialize``
joins them into one 8-device runtime. The worker then runs the real
multi-host code paths the SURVEY §7 hard-parts list calls out:

- a sharded train step over a (data=2, fsdp=4) mesh whose gradient
  reductions cross the process boundary;
- a short jitted generate() on fsdp-sharded params, where the sampled
  token must come back identical on every process each step.

Prints ``RESULT <loss> <tokens-csv>`` for the parent to compare across
processes. Usage: ``python _distributed_worker.py <proc_id> <n_proc> <coord>``.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
proc_id, n_proc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.pop("JAX_NUM_PROCESSES", None)

import jax

# a sitecustomize may have registered a TPU plugin and pinned jax_platforms
# at interpreter start (same workaround as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

jax.distributed.initialize(
    coordinator_address=coord, num_processes=n_proc, process_id=proc_id
)
assert jax.process_count() == n_proc, jax.process_count()
assert jax.device_count() == 4 * n_proc, jax.device_count()
assert jax.local_device_count() == 4

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from parrot_tpu.config import Config
from parrot_tpu.models import gpt
from parrot_tpu.parallel import mesh as mesh_lib
from parrot_tpu.parallel import sharding
from parrot_tpu.training import optim, train

config = Config(
    name="mp-tiny", block_size=32, vocab_size=128, padded_vocab_size=128,
    n_layer=2, n_head=4, n_query_groups=2, n_embd=32,
)
mesh = mesh_lib.make_mesh(2, 4, 1)

# identical init on every process; shard_params places local shards
params = gpt.init_params(config, jax.random.PRNGKey(0))
params = sharding.shard_params(mesh, params)

optimizer = optim.adamw(optim.warmup_cosine(1e-3, 2, 10))
opt_state = optimizer.init(params)
step = jax.jit(
    train.make_train_step(config, optimizer, accumulate_steps=1, remat=True),
    donate_argnums=(0, 1),
)

batch_sh = NamedSharding(mesh, P(("data", "fsdp"), None))
rng = np.random.RandomState(0)  # same stream everywhere
batch = {
    "input_ids": jax.device_put(
        rng.randint(0, 128, (8, 32)).astype(np.int32), batch_sh),
    "labels": jax.device_put(
        rng.randint(0, 128, (8, 32)).astype(np.int32), batch_sh),
}
loss = None
for _ in range(2):
    params, opt_state, loss = step(params, opt_state, batch)
loss = float(loss)  # replicated scalar: same on all processes
assert np.isfinite(loss), loss

# short multi-process generate on fsdp-sharded weights: the per-step sampled
# token is produced on the mesh and fetched on every host
from parrot_tpu.generate import engine

replicated = NamedSharding(mesh, P())
prompt = jax.device_put(np.asarray([3, 1, 4, 1, 5], np.int32), replicated)
tokens, n = engine.generate(
    params, config, prompt, jax.random.PRNGKey(2),
    max_returned_tokens=12, temperature=0.0,
)
toks = np.asarray(jax.device_get(tokens))[: int(n)]
assert len(toks) > 5, toks

# continuous batching across the process boundary: the ServingEngine's
# admission/burst/retirement cycle with mesh-sharded params + slot KV cache;
# every host must observe identical token streams (VERDICT r3 #2)
from parrot_tpu.generate.serving import ServingEngine

seng = ServingEngine(
    params, config, slots=2, temperature=0.0, cache_dtype=jnp.int8,
    max_seq_length=32, mesh=mesh,
)
sreqs = [seng.submit(np.asarray(p, np.int32), max_new_tokens=4)
         for p in ([3, 1, 4], [2, 7], [9, 8, 6])]
seng.run_until_drained(max_steps=50, burst=2)
assert all(r.done and len(r.produced) == 4 for r in sreqs), [
    (r.done, r.produced) for r in sreqs]
serve_csv = ";".join(",".join(map(str, r.produced)) for r in sreqs)

print(
    f"RESULT {loss:.6f} {','.join(map(str, toks.tolist()))} {serve_csv}",
    flush=True,
)
