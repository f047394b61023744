"""Mesh-sharded Pippenger MSM.

Points (and their scalars) are sharded across chips; each chip runs its full
local MSM (one backend op — the native Pippenger on CPU, the Pallas bucket
pipeline on TPU), and the per-chip partial results (one jacobian point each)
are combined exactly on the host.  This is the standard distributed-MSM
decomposition: sum_i k_i P_i = sum_chips (local MSM), with O(n_dev) final
combines — communication is one point per chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..backend import api as B
from ..ops import field as F
from .mesh import compute_axes, mesh_size


@functools.lru_cache(maxsize=None)
def _local_msm_fn(mesh):
    P = jax.sharding.PartitionSpec

    def body(scalars, px, py, pinf):
        return B.g1_msm(scalars, px, py, pinf)  # [3, 24] per shard

    axes = compute_axes(mesh)
    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axes), P(None, axes), P(None, axes), P(axes)),
        out_specs=P(axes, None),
        check_vma=False,
    )
    return jax.jit(mapped)


def msm_dist(scalars_canonical, px, py, pinf, mesh):
    """Distributed MSM; same contract as `ops.msm.msm`."""
    import numpy as np

    from ..host.curve import G1

    n_dev = mesh_size(mesh)
    out = _local_msm_fn(mesh)(scalars_canonical, px, py, pinf)
    rows = np.asarray(out).reshape(n_dev, 3, 24)
    acc = G1.infinity
    for d in range(n_dev):
        X = int(F.unpack_fq(rows[d, 0].reshape(24, 1)).reshape(-1)[0])
        Y = int(F.unpack_fq(rows[d, 1].reshape(24, 1)).reshape(-1)[0])
        Z = int(F.unpack_fq(rows[d, 2].reshape(24, 1)).reshape(-1)[0])
        acc = G1.add(acc, (X, Y, Z))
    return G1.to_affine(acc)
