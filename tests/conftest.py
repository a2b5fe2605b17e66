"""Test configuration: force CPU with a virtual 8-device mesh.

Multi-chip sharding tests run on a fake 8-device CPU backend — the mechanism
the reference repo lacks entirely (it has no distributed tests; see SURVEY.md
section 4). Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Allow float64 oracles on CPU; runtime code is dtype-explicit (float32 on TPU).
jax.config.update("jax_enable_x64", True)
