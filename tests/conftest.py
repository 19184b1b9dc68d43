"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware isn't available in CI; sharding correctness is validated
on host-platform virtual devices (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).

The container's sitecustomize imports jax and registers the axon TPU backend
at interpreter startup, so env vars alone are too late — we flip the platform
with jax.config.update before any backend initialization (safe: backends
initialize lazily at first jax.devices()).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

if os.environ.get("CORTICALL_TPU_TESTS_ON_TPU") != "1":
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_TESTDATA = "/root/reference/testdata"
