"""Throughput / MFU monitoring (TPU-native port of ``lit_gpt/speed_monitor.py``).

Same rolling-window metric set (``speed_monitor.py:121-275``): throughput/*
(batches, samples, tokens, flops, per-device variants, MFU) and time/* —
logged through any ``log_dict(metrics, step)`` callable.

Differences:
- peak-FLOPs table covers the TPU generations the reference ships
  (``speed_monitor.py:60-70``: v2/v3/v4) plus v5e/v5p/v6e, with int8 peaks
  where the hardware has them; device kind comes from ``jax.devices()``;
- ``measure_flops`` uses XLA's compiled cost analysis instead of torch's
  FlopCounterMode (``speed_monitor.py:362-370``);
- fixes the reference's tokens/sec formula (``speed_monitor.py:244-249``
  multiplies samples/sec by the token count instead of dividing elapsed
  tokens by elapsed time).
"""

from __future__ import annotations

import time
from collections import deque
from typing import Any, Callable, Deque, Optional

import jax

# peak FLOP/s per chip
TPU_AVAILABLE_FLOPS = {
    "v2": {"bf16": 45e12},
    "v3": {"bf16": 123e12},
    "v4": {"bf16": 275e12},
    "v5e": {"bf16": 197e12, "int8": 394e12},
    "v5p": {"bf16": 459e12, "int8": 918e12},
    "v6e": {"bf16": 918e12, "int8": 1836e12},
}

_KIND_ALIASES = {
    "tpu v2": "v2",
    "tpu v3": "v3",
    "tpu v4": "v4",
    "tpu v5 lite": "v5e",
    "tpu v5e": "v5e",
    "tpu v5": "v5p",
    "tpu v5p": "v5p",
    "tpu v6 lite": "v6e",
    "tpu v6e": "v6e",
}


def get_flops_available(device: Optional[jax.Device] = None, precision: str = "bf16") -> Optional[float]:
    device = device or jax.devices()[0]
    kind = device.device_kind.lower()
    gen = _KIND_ALIASES.get(kind)
    if gen is None:
        for alias, g in sorted(_KIND_ALIASES.items(), key=lambda kv: -len(kv[0])):
            if kind.startswith(alias):
                gen = g
                break
    if gen is None:
        return None
    table = TPU_AVAILABLE_FLOPS[gen]
    return table.get(precision, table["bf16"])


class SpeedMonitor:
    """Rolling-window throughput monitor (``SpeedMonitorBase``,
    ``speed_monitor.py:121-275``)."""

    def __init__(
        self,
        flops_available: Optional[float] = None,
        log_dict: Optional[Callable[[dict, int], None]] = None,
        window_size: int = 100,
        time_unit: str = "hours",
    ):
        self.flops_available = flops_available
        self.log_dict = log_dict or (lambda metrics, step: None)
        n = window_size + 1
        self.history_samples: Deque[int] = deque(maxlen=n)
        self.history_wct: Deque[float] = deque(maxlen=n)
        self.history_lengths: Deque[int] = deque(maxlen=n)
        self.history_flops: Deque[float] = deque(maxlen=n)
        self.divider = {"seconds": 1, "minutes": 60, "hours": 3600, "days": 86400}[time_unit]
        self.total_eval_wct = 0.0
        self.step = -1

    def on_train_batch_end(
        self,
        samples: int,
        train_elapsed: float,
        world_size: int,
        flops_per_batch: Optional[float] = None,
        lengths: Optional[int] = None,
    ) -> dict:
        self.step += 1
        metrics: dict[str, Any] = {}

        self.history_samples.append(samples)
        if lengths is not None:
            self.history_lengths.append(lengths)
        self.history_wct.append(train_elapsed)
        if len(self.history_wct) == self.history_wct.maxlen:
            elapsed_batches = len(self.history_samples) - 1
            elapsed_samples = self.history_samples[-1] - self.history_samples[0]
            elapsed_wct = self.history_wct[-1] - self.history_wct[0]
            dev_samples_per_sec = elapsed_samples / elapsed_wct
            metrics.update({
                "throughput/batches_per_sec": elapsed_batches * world_size / elapsed_wct,
                "throughput/samples_per_sec": dev_samples_per_sec * world_size,
                "throughput/device/batches_per_sec": elapsed_batches / elapsed_wct,
                "throughput/device/samples_per_sec": dev_samples_per_sec,
            })
            if lengths is not None and len(self.history_lengths) == self.history_lengths.maxlen:
                elapsed_lengths = self.history_lengths[-1] - self.history_lengths[0]
                dev_tokens_per_sec = elapsed_lengths / elapsed_wct
                metrics.update({
                    "throughput/tokens_per_sec": dev_tokens_per_sec * world_size,
                    "throughput/device/tokens_per_sec": dev_tokens_per_sec,
                })

        if flops_per_batch is not None:
            self.history_flops.append(flops_per_batch * world_size)
        if len(self.history_flops) == self.history_flops.maxlen:
            elapsed_flops = sum(self.history_flops) - self.history_flops[0]
            elapsed_wct = self.history_wct[-1] - self.history_wct[0]
            flops_per_sec = elapsed_flops / elapsed_wct
            device_flops_per_sec = flops_per_sec / world_size
            metrics.update({
                "throughput/flops_per_sec": flops_per_sec,
                "throughput/device/flops_per_sec": device_flops_per_sec,
            })
            if self.flops_available:
                metrics["throughput/device/mfu"] = device_flops_per_sec / self.flops_available

        metrics.update({
            "time/train": train_elapsed / self.divider,
            "time/val": self.total_eval_wct / self.divider,
            "time/total": (train_elapsed + self.total_eval_wct) / self.divider,
            "samples": samples,
        })
        self.log_dict(metrics, self.step)
        return metrics

    def eval_end(self, eval_elapsed: float) -> None:
        self.total_eval_wct += eval_elapsed


def estimate_flops(n_params: int, config, training: bool = True) -> float:
    """Analytic FLOPs per sequence for MFU (``speed_monitor.py:347-359``):
    ``2 * n_params`` per token plus the quadratic attention term, x3 when
    training (fwd + bwd)."""
    flops_per_token = 2 * n_params
    flops_per_seq = flops_per_token * config.block_size
    attn_flops_per_seq = config.n_layer * 2 * 2 * (config.n_embd * config.block_size**2)
    mult = 3 if training else 1
    return mult * (flops_per_seq + attn_flops_per_seq)


def measure_flops(fn: Callable, *args) -> Optional[float]:
    """Compiled-program FLOPs from XLA's cost analysis — the TPU-native
    equivalent of torch's FlopCounterMode (``speed_monitor.py:362-370``)."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis["flops"])
    except Exception:
        return None


def monotonic() -> float:
    return time.perf_counter()
