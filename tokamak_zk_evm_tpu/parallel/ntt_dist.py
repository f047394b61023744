"""Mesh-sharded bivariate NTT.

The reference's `_biNTT` (Y-batched pass, then X-batched pass,
`bivariate_polynomial/mod.rs:1466-1477`) is exactly the transpose-based
distributed FFT (SURVEY.md §5 "long-context" row): shard the grid's X rows
across chips, run the Y-pass locally, exchange an all-to-all over ICI to
re-shard by Y columns, then run the X-pass locally.  One all-to-all per
transform — the same communication pattern as sequence-parallel attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import ntt as ntt_mod
from .mesh import AXIS


def _bintt_sharded_body(grid, x_size, y_size, inverse, n_dev):
    """shard_map body.  grid: local [x_size/n, y_size, L] rows.

    Output: local [x_size, y_size/n, L] columns (Y-sharded)."""
    # pass 1: Y-axis NTT on local rows (batched, no comm)
    if y_size > 1:
        grid = ntt_mod._ntt_core(grid, y_size, inverse)
    # transpose shards: split Y locally, all-to-all over ICI, gather X
    # local [x/n, y, L] -> [x, y/n, L]
    grid = jax.lax.all_to_all(
        grid, AXIS, split_axis=1, concat_axis=0, tiled=True
    )
    # pass 2: X-axis NTT on local columns
    if x_size > 1:
        g = jnp.transpose(grid, (1, 0, 2))  # [y/n, x, L]
        g = ntt_mod._ntt_core(g, x_size, inverse)
        grid = jnp.transpose(g, (1, 0, 2))
    if inverse:
        pass  # n^-1 scaling already applied inside _ntt_core per axis
    return grid


@functools.lru_cache(maxsize=None)
def _bintt_dist_fn(mesh, x_size: int, y_size: int, inverse: bool):
    n_dev = mesh.shape[AXIS]
    P = jax.sharding.PartitionSpec
    body = functools.partial(
        _bintt_sharded_body, x_size=x_size, y_size=y_size,
        inverse=inverse, n_dev=n_dev,
    )
    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=P(AXIS, None, None),
        out_specs=P(None, AXIS, None),
        check_vma=False,
    )
    return jax.jit(mapped)


def bintt_dist(grid, mesh, inverse: bool = False):
    """Distributed bivariate NTT.

    Input grid [x_size, y_size, L] sharded (or shardable) by rows; returns
    the transformed grid sharded by columns.  Mathematically identical to
    `ops.ntt.bintt` (tested against it on a host-platform mesh).
    """
    x_size, y_size, L = grid.shape
    n_dev = mesh.shape[AXIS]
    assert x_size % n_dev == 0 and y_size % n_dev == 0
    return _bintt_dist_fn(mesh, x_size, y_size, inverse)(grid)
