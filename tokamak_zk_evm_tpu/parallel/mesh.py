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
DCN_AXIS = "hosts"


def make_mesh(n_devices: int | None = None) -> jax.sharding.Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return jax.sharding.Mesh(np.asarray(devices), (AXIS,))


def make_mesh_2d(n_hosts: int | None = None,
                 per_host: int | None = None) -> jax.sharding.Mesh:
    """2-D (hosts x chips) mesh: the outer axis crosses DCN (host
    boundaries), the inner axis rides ICI.  On a multi-host runtime
    (`multihost.init_from_env`) jax.devices() spans every process and
    devices group per host; on a single host this still produces a logical
    2-D mesh for testing the DCN-axis code path."""
    devices = np.asarray(jax.devices())
    if n_hosts is None:
        n_hosts = max(1, jax.process_count())
    if per_host is None:
        per_host = len(devices) // n_hosts
    devices = devices[: n_hosts * per_host]
    return jax.sharding.Mesh(devices.reshape(n_hosts, per_host),
                             (DCN_AXIS, AXIS))


def compute_axes(mesh) -> tuple:
    """Every mesh axis, outer (DCN) first — the compute shard axes for the
    dist ops.  Collectives spanning the tuple cross DCN once per step; XLA
    routes the intra-host legs over ICI."""
    return tuple(mesh.axis_names)


def mesh_size(mesh) -> int:
    return int(np.prod([mesh.shape[a] for a in mesh.axis_names]))


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
