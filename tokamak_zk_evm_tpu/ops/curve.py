"""Device BLS12-381 G1 arithmetic (limb-major, backend-dispatched).

Points are triples (X, Y, Z) of limb-major Fq arrays `[24, ...batch]` in
jacobian coordinates; Z == 0 encodes infinity.  Affine batches are
(x, y, inf) with inf a uint32 {0,1} mask of the batch shape.

Replaces ICICLE's curve kernels (SURVEY.md §2, device-backend row); the
complete-addition semantics (inf / double / cancel handled uniformly) match
the reference's icicle affine/projective ops so bucket accumulations agree
bit-exactly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..backend import api as B
from . import field as F

LQ = F.FQ_L


def jac_infinity(batch_shape=()):
    one = jnp.asarray(
        np.broadcast_to(
            F.pack_fq([1]).reshape((LQ,) + (1,) * len(batch_shape)),
            (LQ,) + batch_shape,
        ).copy()
    )
    zero = jnp.zeros((LQ,) + batch_shape, dtype=jnp.uint32)
    return (one, one, zero)


def affine_to_jac(x, y, inf):
    """(x, y, inf-mask) -> jacobian; inf has the batch shape."""
    one = jnp.asarray(
        np.broadcast_to(
            F.pack_fq([1]).reshape((LQ,) + (1,) * (x.ndim - 1)), x.shape
        ).copy()
    )
    z = jnp.where(jnp.asarray(inf)[None].astype(bool), jnp.zeros_like(one), one)
    return (x, y, z)


def _flat(p):
    return tuple(c.reshape(LQ, -1) for c in p)


def jac_add(p, q):
    shape = p[0].shape
    out = B.g1_add(_flat(p), _flat(q), rep=1)
    return tuple(c.reshape(shape) for c in out)


def jac_double(p):
    shape = p[0].shape
    out = B.g1_dbl(_flat(p))
    return tuple(c.reshape(shape) for c in out)


def jac_to_affine(p):
    """Batched jacobian -> affine (x, y, inf) via shared-inversion."""
    shape = p[0].shape
    x, y, inf = B.g1_to_affine(_flat(p))
    return x.reshape(shape), y.reshape(shape), inf.reshape(shape[1:])


def jac_sum_tree(p):
    """Reduce an array of jacobian points (batch axis 1) to one by halving."""
    X, Y, Z = p
    n = X.shape[1]
    while n > 1:
        if n % 2 == 1:
            iX, iY, iZ = jac_infinity(X.shape[2:])
            X = jnp.concatenate([X, iX[:, None]], axis=1)
            Y = jnp.concatenate([Y, iY[:, None]], axis=1)
            Z = jnp.concatenate([Z, iZ[:, None]], axis=1)
            n += 1
        h = n // 2
        X, Y, Z = jac_add(
            (X[:, :h], Y[:, :h], Z[:, :h]), (X[:, h:], Y[:, h:], Z[:, h:])
        )
        n = h
    return (X[:, 0], Y[:, 0], Z[:, 0])


# ----------------------------------------------------------------------
# host <-> device conversion
# ----------------------------------------------------------------------


def pack_affine(points):
    """List of host affine points ((x, y) ints or None) -> device arrays."""
    n = len(points)
    xs, ys = [], []
    infs = np.zeros(n, dtype=np.uint32)
    for i, p in enumerate(points):
        if p is None:
            xs.append(0)
            ys.append(0)
            infs[i] = 1
        else:
            xs.append(p[0])
            ys.append(p[1])
    return (
        jnp.asarray(F.pack_fq(xs)),
        jnp.asarray(F.pack_fq(ys)),
        jnp.asarray(infs),
    )


def unpack_affine(aff):
    """Device affine (x, y, inf) -> list of host ((x, y) ints or None)."""
    x, y, inf = aff
    xs = F.unpack_fq(np.asarray(x))
    ys = F.unpack_fq(np.asarray(y))
    infs = np.asarray(inf).reshape(-1).astype(bool)
    xs = np.reshape(xs, (-1,))
    ys = np.reshape(ys, (-1,))
    return [None if i else (int(a), int(b)) for a, b, i in zip(xs, ys, infs)]


def unpack_jac(p):
    """Device jacobian point(s) -> host affine ints (or None) via exact math."""
    from ..host.curve import G1

    X = F.unpack_fq(np.asarray(p[0]))
    Y = F.unpack_fq(np.asarray(p[1]))
    Z = F.unpack_fq(np.asarray(p[2]))
    if np.ndim(X) == 0:
        return G1.to_affine((int(X), int(Y), int(Z)))
    flatX, flatY, flatZ = (np.reshape(a, (-1,)) for a in (X, Y, Z))
    return [
        G1.to_affine((int(x), int(y), int(z)))
        for x, y, z in zip(flatX, flatY, flatZ)
    ]
