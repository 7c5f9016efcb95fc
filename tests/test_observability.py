"""Speed monitor + CSV logger tests."""

import csv

import numpy as np

from parrot_tpu.config import Config
from parrot_tpu.utils.csv_logger import StepCSVLogger
from parrot_tpu.utils.speed_monitor import SpeedMonitor, estimate_flops, measure_flops


def test_speed_monitor_window_math():
    logged = []
    mon = SpeedMonitor(flops_available=100e12, log_dict=lambda m, s: logged.append((s, m)),
                       window_size=2, time_unit="seconds")
    # 1 batch/sec, 4 samples/batch, 64 tokens/sample, 1e12 flops/batch
    for i in range(4):
        mon.on_train_batch_end(
            samples=(i + 1) * 4, train_elapsed=float(i + 1), world_size=2,
            flops_per_batch=1e12, lengths=(i + 1) * 4 * 64,
        )
    step, m = logged[-1]
    assert step == 3
    assert np.isclose(m["throughput/device/batches_per_sec"], 1.0)
    assert np.isclose(m["throughput/batches_per_sec"], 2.0)
    assert np.isclose(m["throughput/device/samples_per_sec"], 4.0)
    assert np.isclose(m["throughput/device/tokens_per_sec"], 256.0)
    assert np.isclose(m["throughput/device/flops_per_sec"], 1e12)
    assert np.isclose(m["throughput/device/mfu"], 0.01)
    assert m["time/train"] == 4.0


def test_estimate_and_measure_flops():
    cfg = Config(name="t", block_size=128, vocab_size=64, padded_vocab_size=64,
                 n_layer=2, n_head=2, n_embd=64)
    est = estimate_flops(n_params=1_000_000, config=cfg, training=True)
    assert est == 3 * (2 * 1_000_000 * 128 + 2 * 2 * 2 * (64 * 128**2))

    import jax.numpy as jnp

    measured = measure_flops(lambda x: (x @ x).sum(), jnp.ones((64, 64)))
    if measured is not None:  # cost analysis availability differs by backend
        assert measured >= 2 * 64**3 * 0.9


def test_csv_logger_merges_steps(tmp_path):
    logger = StepCSVLogger(tmp_path, name="run", flush_every=100)
    logger.log_dict({"loss": 1.0}, step=0)
    logger.log_dict({"lr": 0.1}, step=0)  # same step, new column -> one row
    logger.log_dict({"loss": 0.5, "lr": 0.2}, step=1)
    logger.finalize()
    with open(logger.path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert rows[0]["loss"] == "1.0" and rows[0]["lr"] == "0.1"
    assert rows[1]["loss"] == "0.5"
    # second logger gets a new version dir
    logger2 = StepCSVLogger(tmp_path, name="run")
    assert logger2.log_dir != logger.log_dir


def test_profile_trace_writes_tensorboard_dir(tmp_path):
    """The jax.profiler hook (SURVEY §5) captures a trace directory that
    tensorboard/xprof can open (plugins/profile/<run>/...)."""
    import jax.numpy as jnp

    from parrot_tpu.utils.profiling import StepProfiler, profile_trace

    with profile_trace(tmp_path / "trace"):
        jnp.ones((8, 8)).sum().block_until_ready()
    produced = list((tmp_path / "trace").rglob("*.xplane.pb"))
    assert produced, "no xplane captured"
    assert any("plugins/profile" in str(p) for p in produced)

    sp = StepProfiler(tmp_path / "steps", start_step=1, n_steps=1)
    for step in range(3):
        sp.maybe_start(step)
        jnp.ones((4, 4)).sum().block_until_ready()
        sp.maybe_stop(step)
    sp.close()
    assert list((tmp_path / "steps").rglob("*.xplane.pb"))
