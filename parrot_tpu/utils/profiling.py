"""Profiler integration (SURVEY §5): a thin wrapper over ``jax.profiler``
replacing the reference's ``torch.profiler`` usage in
``pretrain/openwebtext_trainer.py`` — traces render in TensorBoard/XProf and
capture XLA HLO + TPU hardware counters, which is what kernel roofline work
needs (PERF.md)."""

from __future__ import annotations

import contextlib
from pathlib import Path
from typing import Iterator, Optional


@contextlib.contextmanager
def profile_trace(trace_dir: Optional[Path]) -> Iterator[None]:
    """Capture a ``jax.profiler`` trace into ``trace_dir`` (no-op when None).

    View with ``tensorboard --logdir <trace_dir>`` (Profile tab) or xprof.
    """
    if trace_dir is None:
        yield
        return
    import jax

    trace_dir = Path(trace_dir)
    trace_dir.mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(trace_dir)):
        yield


class StepProfiler:
    """Window profiler for training loops: starts at ``start_step``, stops
    after ``n_steps`` (profiling every step would produce gigabyte traces)."""

    def __init__(self, trace_dir: Optional[Path], start_step: int = 2, n_steps: int = 3):
        self.trace_dir = None if trace_dir is None else Path(trace_dir)
        self.start_step = start_step
        self.stop_step = start_step + n_steps
        self._active = False

    def maybe_start(self, step: int) -> None:
        if self.trace_dir is None or self._active or step != self.start_step:
            return
        import jax

        self.trace_dir.mkdir(parents=True, exist_ok=True)
        jax.profiler.start_trace(str(self.trace_dir))
        self._active = True

    def maybe_stop(self, step: int) -> None:
        if not self._active or step < self.stop_step:
            return
        import jax

        jax.profiler.stop_trace()
        self._active = False

    def close(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
