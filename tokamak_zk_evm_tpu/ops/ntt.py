"""Batched radix-2 NTT over Fr (limb-major, backend-dispatched).

TPU-native replacement for ICICLE's `ntt::ntt` with `batch_size`/
`columns_batch`/`coset_gen` as used by the reference's 2-D `_biNTT`
(`libs/src/bivariate_polynomial/mod.rs:1422-1478`): the bivariate transform is
a Y-axis batched pass followed by an X-axis batched pass.

Layout: arrays are `[16, batch, n]` uint32 Fr Montgomery; the transform runs
along the last axis.  The whole transform is ONE backend op (an FFI call on
CPU, a Pallas kernel on TPU) — twiddles are precomputed host-side as exact
Python ints and passed as Montgomery tables.

Semantics (matching ICICLE natural-order kNN):
  forward:  evals[i]  = sum_j coeffs[j] * omega^(i*j),  omega = fr_root_of_unity(n)
  inverse:  coeffs[j] = (1/n) * sum_i evals[i] * omega^(-i*j)
  coset c:  forward evaluates at points c*omega^i (coefficient pre-scaling by
            c^j); inverse undoes it (post-scaling by c^(-j)).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from ..backend import api as B
from ..fields import R_MOD, fr_root_of_unity
from . import field as F


@functools.lru_cache(maxsize=None)
def _tables(n: int, inverse: bool):
    omega = fr_root_of_unity(n)
    if inverse:
        omega = pow(omega, -1, R_MOD)
    pows = F.fr_powers(omega, n)
    scale = F.fr_mont(pow(n, -1, R_MOD) if inverse else 1)
    return pows, scale


def ntt_batched(a, inverse: bool = False, coset: int | None = None):
    """NTT along the last axis of `a` ([16, ..., n])."""
    n = a.shape[-1]
    if n == 1:
        return a
    shape = a.shape
    a = a.reshape(shape[0], -1, n)
    if coset is not None and coset % R_MOD != 1 and not inverse:
        a = F.fr_mul(a, jnp.asarray(F.fr_powers(coset, n)))
    pows, scale = _tables(n, inverse)
    a = B.fr_ntt(a, jnp.asarray(pows), jnp.asarray(scale))
    if coset is not None and coset % R_MOD != 1 and inverse:
        a = F.fr_mul(a, jnp.asarray(F.fr_powers(pow(coset, -1, R_MOD), n)))
    return a.reshape(shape)


def bintt(
    grid,
    inverse: bool = False,
    coset_x: int | None = None,
    coset_y: int | None = None,
):
    """Bivariate NTT of a coefficient/eval grid `[16, x_size, y_size]`.

    Equivalent to the reference `_biNTT`: transform along Y (rows batched over
    X), then along X (batched over Y).  Both passes are local; when a mesh
    context is active (`parallel.context.use_mesh`) and the grid divides
    evenly, the transform routes through `parallel/ntt_dist.py` (local Y
    pass, ICI all-to-all transpose, local X pass) with the coset scalings
    applied as elementwise (GSPMD-partitioned) multiplies outside the
    shard_map.
    """
    L, x_size, y_size = grid.shape
    mesh = _active_mesh(x_size, y_size)
    if mesh is not None:
        from ..parallel import ntt_dist

        cx = coset_x if (coset_x is not None and coset_x % R_MOD != 1) else None
        cy = coset_y if (coset_y is not None and coset_y % R_MOD != 1) else None
        if not inverse:
            grid = _coset_scale(grid, cx, cy, inverse=False)
        grid = ntt_dist.bintt_dist(grid, mesh, inverse=inverse)
        if inverse:
            grid = _coset_scale(grid, cx, cy, inverse=True)
        return grid
    if y_size > 1:
        grid = ntt_batched(grid, inverse=inverse, coset=coset_y)
    if x_size > 1:
        g = jnp.swapaxes(grid, 1, 2)
        g = ntt_batched(g, inverse=inverse, coset=coset_x)
        grid = jnp.swapaxes(g, 1, 2)
    return grid


def _active_mesh(x_size: int, y_size: int):
    """The context mesh, if the grid can be row- and column-sharded on it."""
    from ..parallel import context
    from ..parallel.mesh import mesh_size

    mesh = context.get_mesh()
    if mesh is None:
        return None
    n_dev = mesh_size(mesh)
    if n_dev <= 1 or x_size % n_dev or y_size % n_dev:
        return None
    return mesh


def _coset_scale(grid, coset_x, coset_y, inverse: bool):
    """Elementwise coset pre/post-scaling of a [16, x, y] grid: forward
    multiplies coeffs by c_x^i * c_y^j, inverse by the inverse powers —
    identical to the per-pass scaling inside ntt_batched."""
    L, x_size, y_size = grid.shape
    flat = grid.reshape(L, -1)
    if coset_y is not None:
        cy = pow(coset_y, -1, R_MOD) if inverse else coset_y
        flat = F.fr_mul(flat, jnp.asarray(F.fr_powers(cy, y_size)))
    if coset_x is not None:
        cx = pow(coset_x, -1, R_MOD) if inverse else coset_x
        flat = F.fr_mul(flat, jnp.asarray(F.fr_powers(cx, x_size)), rep=y_size)
    return flat.reshape(grid.shape)
