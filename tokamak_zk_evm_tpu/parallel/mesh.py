"""Device-mesh helpers for multi-chip scale-out.

The reference is single-device (SURVEY.md §2.4); the scale-out dimension is
TPU-native: a 1-D mesh over the NTT grid's X axis (rows) with the bivariate
transform's transpose realized as an ICI all-to-all, and MSM points sharded
with bucket tables combined by jacobian tree-reduction.
"""

from __future__ import annotations

import jax
import numpy as np

AXIS = "chips"


def make_mesh(n_devices: int | None = None) -> jax.sharding.Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return jax.sharding.Mesh(np.asarray(devices), (AXIS,))


def row_sharding(mesh):
    """Shard the X-row axis of a limb-major [16, x, y] grid across the mesh
    (matches bintt_dist's in_specs)."""
    return jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, AXIS, None)
    )


def col_sharding(mesh):
    """Shard the Y-column axis of a limb-major [16, x, y] grid."""
    return jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, None, AXIS)
    )
