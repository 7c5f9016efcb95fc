"""Test harness: force the JAX CPU backend with a virtual 8-device mesh.

Mirrors the reference's CI discipline of running everything on CPU
(``.github/workflows/cpu-tests.yml``) while going beyond it: multi-chip
sharding paths are exercised on ``--xla_force_host_platform_device_count=8``
virtual devices, which the reference (no distributed tests at all,
SURVEY.md §4) never does.
"""

import os
import sys
from pathlib import Path

# must be set before jax initializes its backend
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = f"{flags} --xla_force_host_platform_device_count=8".strip()

# some environments ship a sitecustomize that registers a TPU plugin and pins
# jax_platforms to it at interpreter start; the config update wins over it
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

wd = Path(__file__).parent.parent.resolve()
if str(wd) not in sys.path:
    sys.path.insert(0, str(wd))
