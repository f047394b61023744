"""Test configuration: force a virtual 8-device CPU mesh.

Must run before JAX is imported anywhere (SURVEY.md build plan: multi-chip
sharding is validated on a host-platform device mesh; real-TPU benches run via
bench.py, not pytest).
"""

import os

# force CPU: the session env presets JAX_PLATFORMS=axon (the real-TPU
# tunnel, single-chip, exclusive); tests must run on the host platform
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compilation cache: the limb-arithmetic kernels produce large HLO
# graphs; caching makes test reruns seconds-class instead of minutes
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".cache", "jax")
os.makedirs(_cache, exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# The axon TPU plugin's sitecustomize calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start, which
# overrides the env var — force it back to pure CPU for the test suite.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge as _xb  # noqa: E402

if _xb.backends_are_initialized():
    from jax.extend.backend import clear_backends

    clear_backends()
assert jax.devices()[0].platform == "cpu", jax.devices()


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running host-oracle tests")
