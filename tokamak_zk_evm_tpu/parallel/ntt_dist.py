"""Mesh-sharded bivariate NTT.

The reference's `_biNTT` (Y-batched pass, then X-batched pass,
`bivariate_polynomial/mod.rs:1466-1478`) is exactly the transpose-based
distributed FFT (SURVEY.md §5 "long-context" row): shard the grid's X rows
across chips, run the Y-pass locally, exchange an all-to-all over ICI to
re-shard by Y columns, then run the X-pass locally.  One all-to-all per
transform — the same communication pattern as sequence-parallel attention.

Grids are limb-major [16, x_size, y_size]; each local pass is ONE backend op
(FFI on CPU, Pallas on TPU), so the sharded graph is a handful of HLO ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import ntt as ntt_mod
from .mesh import compute_axes, mesh_size


def _bintt_sharded_body(grid, x_size: int, y_size: int, inverse: bool, axes=None):
    """shard_map body.  grid: local [16, x_size/n, y_size] rows.

    Output: local [16, x_size, y_size/n] columns (Y-sharded)."""
    # pass 1: Y-axis NTT on local rows (batched, no comm)
    if y_size > 1:
        grid = ntt_mod.ntt_batched(grid, inverse=inverse)
    # transpose shards: split Y locally, all-to-all over ICI, gather X
    # local [16, x/n, y] -> [16, x, y/n]
    grid = jax.lax.all_to_all(grid, axes, split_axis=2, concat_axis=1, tiled=True)
    # pass 2: X-axis NTT on local columns
    if x_size > 1:
        g = jnp.swapaxes(grid, 1, 2)  # [16, y/n, x]
        g = ntt_mod.ntt_batched(g, inverse=inverse)
        grid = jnp.swapaxes(g, 1, 2)
    return grid


@functools.lru_cache(maxsize=None)
def _bintt_dist_fn(mesh, x_size: int, y_size: int, inverse: bool):
    P = jax.sharding.PartitionSpec
    axes = compute_axes(mesh)
    body = functools.partial(
        _bintt_sharded_body, x_size=x_size, y_size=y_size, inverse=inverse,
        axes=axes,
    )
    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=P(None, axes, None),
        out_specs=P(None, None, axes),
        check_vma=False,
    )
    return jax.jit(mapped)


def bintt_dist(grid, mesh, inverse: bool = False):
    """Distributed bivariate NTT.

    Input grid [16, x_size, y_size] sharded (or shardable) by X rows; returns
    the transformed grid sharded by Y columns.  Mathematically identical to
    `ops.ntt.bintt` (tested against it on a host-platform mesh).
    """
    L, x_size, y_size = grid.shape
    n_dev = mesh_size(mesh)
    assert x_size % n_dev == 0 and y_size % n_dev == 0
    return _bintt_dist_fn(mesh, x_size, y_size, inverse)(grid)
