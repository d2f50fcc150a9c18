"""Test harness: force an 8-virtual-device CPU JAX platform.

jax may already be imported at interpreter startup (the axon TPU integration
auto-imports it), so setting JAX_PLATFORMS in os.environ is not enough — the
backend is switched via jax.config before it initializes lazily. This lets
the multi-chip sharding layer be exercised without TPU hardware (the driver
separately dry-runs the multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

if os.environ.get("SDT_TPU_TESTS") == "1":
    # opt-in real-hardware mode: only the @pytest.mark tpu-gated tests make
    # sense here (e.g. the VMEM-guard boundary sweep, tests/test_vmem_guard.py)
    pass
else:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
