"""Backend dispatch: native FFI on CPU, Pallas kernels on TPU.

All functions take limb-major uint32 arrays ([L, ...batch], Montgomery form)
and are traceable (usable under jit / shard_map).  Dispatch is resolved at
trace time from `jax.default_backend()` — the same decision ICICLE's
`check_device()` makes once per process in the reference
(`libs/src/utils/mod.rs:88-113`).
"""

from __future__ import annotations

import functools

import jax


@functools.lru_cache(maxsize=1)
def backend_kind() -> str:
    import os

    forced = os.environ.get("TZK_BACKEND")
    if forced in ("cpu", "tpu"):
        return forced
    return "tpu" if jax.default_backend() == "tpu" else "cpu"


def _impl():
    if backend_kind() == "tpu":
        from . import pallas_kernels as mod
    else:
        from . import native as mod
    return mod


def __getattr__(name):
    ops = (
        "fr_add", "fr_sub", "fr_mul", "fr_neg", "fr_inv",
        "fq_add", "fq_sub", "fq_mul", "fq_neg", "fq_inv",
        "fr_prefix_prod", "fr_suffix_prod", "fr_batch_inv", "fr_ntt",
        "g1_add", "g1_dbl", "g1_to_affine", "g1_msm", "g1_fixed_base",
    )
    if name in ops:
        return getattr(_impl(), name)
    if name in ("g1_msm_start", "g1_msm_finish"):
        mod = _impl()
        if hasattr(mod, name):
            return getattr(mod, name)
        # synchronous backend: start computes, finish passes through
        if name == "g1_msm_start":
            return mod.g1_msm
        return lambda h: h
    raise AttributeError(name)
