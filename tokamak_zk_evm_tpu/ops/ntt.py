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
    X), then along X (batched over Y).  Both passes are local; the multi-chip
    variant in `parallel/ntt_dist.py` inserts an all-to-all transpose between
    the passes.
    """
    L, x_size, y_size = grid.shape
    if y_size > 1:
        grid = ntt_batched(grid, inverse=inverse, coset=coset_y)
    if x_size > 1:
        g = jnp.swapaxes(grid, 1, 2)
        g = ntt_batched(g, inverse=inverse, coset=coset_x)
        grid = jnp.swapaxes(g, 1, 2)
    return grid
