"""Test configuration: force a virtual 8-device CPU mesh.

Must run before JAX is imported anywhere (SURVEY.md build plan: multi-chip
sharding is validated on a host-platform device mesh; real-TPU benches run via
bench.py, not pytest).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
