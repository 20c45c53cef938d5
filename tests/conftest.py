"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4).

NOTE: this environment's sitecustomize force-registers a tunneled TPU backend
and calls jax.config.update("jax_platforms", "axon,cpu") at interpreter start,
which overrides the JAX_PLATFORMS env var. Tests must therefore counter-update
the config AFTER importing jax (before any backend initialization).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

# scripts/ importable for harness-driving tests (quality gate)
import sys as _sys

_SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
if _SCRIPTS not in _sys.path:
    _sys.path.insert(0, _SCRIPTS)
