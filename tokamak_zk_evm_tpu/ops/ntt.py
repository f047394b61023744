"""Batched radix-2 NTT over Fr for TPU.

TPU-native replacement for ICICLE's `ntt::ntt` with `batch_size`/
`columns_batch`/`coset_gen` as used by the reference's 2-D `_biNTT`
(`libs/src/bivariate_polynomial/mod.rs:1422-1478`): the bivariate transform is
a Y-axis batched pass followed by an X-axis batched pass.

Layout: arrays are `[batch, N, LIMBS]` uint32, Fr Montgomery form.  The
decimation-in-time butterflies run over static per-stage reshapes so one jit
compiles the full transform; twiddles are precomputed host-side (exact Python
ints) and cached on device in Montgomery form.

Semantics (matching ICICLE natural-order kNN):
  forward:  evals[i]  = sum_j coeffs[j] * omega^(i*j),  omega = fr_root_of_unity(N)
  inverse:  coeffs[j] = (1/N) * sum_i evals[i] * omega^(-i*j)
  coset c:  forward evaluates at points c*omega^i (coefficient pre-scaling by
            c^j); inverse undoes it (post-scaling by c^(-j)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FR, fr_root_of_unity
from .bigint import fr_ops


def _bit_reverse_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _twiddles(n: int, inverse: bool):
    """Per-stage DIT twiddle tables for size n, packed Montgomery uint32."""
    ops = fr_ops()
    omega = fr_root_of_unity(n)
    if inverse:
        omega = pow(omega, -1, FR.modulus)
    stages = []
    m = 1
    while m < n:
        w = pow(omega, n // (2 * m), FR.modulus)
        tw = [pow(w, j, FR.modulus) for j in range(m)]
        stages.append(ops.pack(tw))
        m *= 2
    return stages


@functools.lru_cache(maxsize=None)
def _n_inv_mont(n: int):
    ops = fr_ops()
    return ops.pack([pow(n, -1, FR.modulus)])[0]


@functools.lru_cache(maxsize=None)
def _brev(n: int):
    return _bit_reverse_perm(n)


def _ntt_core(a, n: int, inverse: bool):
    """a: [batch, n, L] -> transformed [batch, n, L]."""
    ops = fr_ops()
    if n == 1:
        return a
    a = jnp.take(a, _brev(n), axis=1)
    stages = _twiddles(n, inverse)
    batch = a.shape[0]
    L = a.shape[-1]
    m = 1
    for tw in stages:
        nb = n // (2 * m)
        x = a.reshape(batch, nb, 2, m, L)
        lo = x[:, :, 0]
        hi = ops.mont_mul(x[:, :, 1], tw)  # tw: [m, L] broadcasts over [batch, nb, m, L]
        a = jnp.stack([ops.add(lo, hi), ops.sub(lo, hi)], axis=2).reshape(batch, n, L)
        m *= 2
    if inverse:
        a = ops.mont_mul(a, _n_inv_mont(n))
    return a


@functools.lru_cache(maxsize=None)
def _ntt_jit(n: int, inverse: bool):
    return jax.jit(lambda a: _ntt_core(a, n, inverse))


@functools.lru_cache(maxsize=None)
def _scale_axis_jit(n: int):
    """Multiply along axis 1 by a powers table [n, L]."""
    ops = fr_ops()
    return jax.jit(lambda a, pows: ops.mont_mul(a, pows))


@functools.lru_cache(maxsize=None)
def _coset_pows(coset: int, n: int, invert: bool):
    ops = fr_ops()
    c = pow(coset, -1, FR.modulus) if invert else coset % FR.modulus
    pows = []
    acc = 1
    for _ in range(n):
        pows.append(acc)
        acc = (acc * c) % FR.modulus
    return ops.pack(pows)


def ntt_batched(a, inverse: bool = False, coset: int | None = None):
    """NTT along axis 1 of `a` ([batch, N, L]).

    `coset` is a Python int (exact): forward pre-scales coefficients by
    coset^j, inverse post-scales by coset^(-j).
    """
    n = a.shape[1]
    if coset is not None and coset % FR.modulus != 1:
        if not inverse:
            a = _scale_axis_jit(n)(a, _coset_pows(coset, n, invert=False))
    a = _ntt_jit(n, inverse)(a)
    if coset is not None and coset % FR.modulus != 1:
        if inverse:
            a = _scale_axis_jit(n)(a, _coset_pows(coset, n, invert=True))
    return a


def bintt(
    grid,
    inverse: bool = False,
    coset_x: int | None = None,
    coset_y: int | None = None,
):
    """Bivariate NTT of a coefficient/eval grid `[x_size, y_size, L]`.

    Equivalent to the reference `_biNTT`: transform along Y (rows batched over
    X), then along X (batched over Y).  Both passes are local; the multi-chip
    variant in `parallel/ntt_dist.py` inserts an all-to-all transpose between
    the passes.
    """
    x_size, y_size, L = grid.shape
    # pass 1: along Y
    if y_size > 1:
        grid = ntt_batched(grid, inverse=inverse, coset=coset_y)
    # pass 2: along X (move X to axis 1)
    if x_size > 1:
        g = jnp.transpose(grid, (1, 0, 2))
        g = ntt_batched(g, inverse=inverse, coset=coset_x)
        grid = jnp.transpose(g, (1, 0, 2))
    return grid
