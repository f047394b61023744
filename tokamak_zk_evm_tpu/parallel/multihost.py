"""Multi-host runtime: `jax.distributed` + DCN-aware meshes.

The reference is single-process (SURVEY.md §2.4 — no NCCL/MPI anywhere);
N>=2-host scaling is this framework's addition.  The pattern is standard
JAX SPMD: every host runs the same program, `jax.distributed.initialize`
forms the global runtime, `jax.devices()` then spans all processes, and a
mesh built over those devices makes the existing `shard_map` dist ops
(parallel/ntt_dist.py, parallel/msm_dist.py) multi-host transparently —
XLA routes the intra-host collective legs over ICI and the cross-host legs
over DCN.

Launch (one process per host):

    TZK_COORDINATOR=host0:1234 TZK_NUM_PROCESSES=2 TZK_PROCESS_ID=0 \
        python -m tokamak_zk_evm_tpu prove ...
"""

from __future__ import annotations

import os

import jax

from .mesh import make_mesh, make_mesh_2d

_INITIALIZED = False


def init_from_env() -> bool:
    """`jax.distributed.initialize` from TZK_COORDINATOR /
    TZK_NUM_PROCESSES / TZK_PROCESS_ID (no-op when unset or already
    initialized).  Returns True when a multi-process runtime is active."""
    global _INITIALIZED
    addr = os.environ.get("TZK_COORDINATOR")
    if addr and not _INITIALIZED:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ["TZK_NUM_PROCESSES"]),
            process_id=int(os.environ["TZK_PROCESS_ID"]),
        )
        _INITIALIZED = True
    return jax.process_count() > 1


def global_mesh(two_d: bool | None = None):
    """The whole runtime's compute mesh: 1-D over every global device, or,
    with `two_d` (default on multi-process runtimes), the explicit
    (hosts x chips) mesh whose outer axis crosses DCN."""
    if two_d is None:
        two_d = jax.process_count() > 1
    return make_mesh_2d() if two_d else make_mesh()
