"""Test harness: force an 8-virtual-device CPU JAX platform.

jax may already be imported at interpreter startup (the axon TPU integration
auto-imports it), so setting JAX_PLATFORMS in os.environ is not enough — the
backend is switched via jax.config before it initializes lazily. This lets
the multi-chip sharding layer be exercised without TPU hardware (the driver
separately dry-runs the multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
