"""Test harness: force an 8-device CPU platform so sharding/collective logic
is exercised without TPU hardware (SURVEY.md §4 plan, item d).

Note: this environment's site customization pins JAX to the 'axon' TPU
platform via env vars, so the env-var route is not enough — we must
config.update after importing jax (before any computation runs).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
