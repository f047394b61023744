"""Vectorized BLS12-381 G1 arithmetic on TPU.

Jacobian-coordinate point kernels over the Fq limb engine, fully branchless
(infinity and doubling cases resolved with selects) so they are valid as
`associative_scan` combiners — the MSM bucket accumulation in `msm.py` relies
on this.

Point layout:
  affine:   (x, y, inf)  with x, y: [..., 24] uint32 Montgomery, inf: [...]
            bool
  jacobian: (X, Y, Z): [..., 24];  Z == 0 encodes infinity.

Replaces ICICLE's `msm`/curve kernels (SURVEY.md §2 device backend row).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FQ
from .bigint import fq_ops

_fq = fq_ops()
LQ = _fq.L


def jac_infinity(batch_shape=()):
    one = jnp.broadcast_to(jnp.asarray(_fq.one_mont), batch_shape + (LQ,))
    zero = jnp.zeros(batch_shape + (LQ,), dtype=jnp.uint32)
    return (one, one, zero)


def affine_to_jac(x, y, inf):
    """inf: bool array with the batch shape."""
    one = jnp.broadcast_to(jnp.asarray(_fq.one_mont), x.shape)
    z = jnp.where(inf[..., None], jnp.zeros_like(one), one)
    return (x, y, z)


def jac_is_inf(p):
    return _fq.is_zero(p[2])


def jac_neg(p):
    X, Y, Z = p
    return (X, _fq.neg(Y), Z)


def jac_double(p):
    """2P, branchless (Z=0 or Y=0 -> infinity via Z3 = 2YZ = 0)."""
    X, Y, Z = p
    A = _fq.mont_mul(X, X)
    B = _fq.mont_mul(Y, Y)
    C = _fq.mont_mul(B, B)
    t = _fq.add(X, B)
    D = _fq.sub(_fq.sub(_fq.mont_mul(t, t), A), C)
    D = _fq.add(D, D)
    E = _fq.add(_fq.add(A, A), A)
    F = _fq.mont_mul(E, E)
    X3 = _fq.sub(F, _fq.add(D, D))
    C2 = _fq.add(C, C)
    C8 = _fq.add(_fq.add(C2, C2), _fq.add(C2, C2))
    Y3 = _fq.sub(_fq.mont_mul(E, _fq.sub(D, X3)), C8)
    YZ = _fq.mont_mul(Y, Z)
    Z3 = _fq.add(YZ, YZ)
    return (X3, Y3, Z3)


def jac_add(p, q):
    """P + Q, complete via selects: handles P=inf, Q=inf, P=Q, P=-Q."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    p_inf = _fq.is_zero(Z1)
    q_inf = _fq.is_zero(Z2)

    Z1Z1 = _fq.mont_mul(Z1, Z1)
    Z2Z2 = _fq.mont_mul(Z2, Z2)
    U1 = _fq.mont_mul(X1, Z2Z2)
    U2 = _fq.mont_mul(X2, Z1Z1)
    S1 = _fq.mont_mul(Y1, _fq.mont_mul(Z2, Z2Z2))
    S2 = _fq.mont_mul(Y2, _fq.mont_mul(Z1, Z1Z1))
    H = _fq.sub(U2, U1)
    R = _fq.sub(S2, S1)
    h_zero = _fq.is_zero(H)
    r_zero = _fq.is_zero(R)

    HH = _fq.mont_mul(H, H)
    HHH = _fq.mont_mul(H, HH)
    V = _fq.mont_mul(U1, HH)
    RR = _fq.mont_mul(R, R)
    X3 = _fq.sub(_fq.sub(RR, HHH), _fq.add(V, V))
    Y3 = _fq.sub(_fq.mont_mul(R, _fq.sub(V, X3)), _fq.mont_mul(S1, HHH))
    Z3 = _fq.mont_mul(_fq.mont_mul(Z1, Z2), H)

    dX, dY, dZ = jac_double(p)

    # case select (order matters):
    #   p_inf -> q;  q_inf -> p;  H=0,R=0 -> double;  H=0,R!=0 -> infinity
    is_double = h_zero & r_zero & ~p_inf & ~q_inf
    is_cancel = h_zero & ~r_zero & ~p_inf & ~q_inf

    def sel(cond, a, b):
        return _fq.select(cond, a, b)

    X = sel(p_inf, X2, sel(q_inf, X1, sel(is_double, dX, X3)))
    Y = sel(p_inf, Y2, sel(q_inf, Y1, sel(is_double, dY, Y3)))
    Z = sel(p_inf, Z2, sel(q_inf, Z1, sel(is_double, dZ, Z3)))
    Z = sel(is_cancel, jnp.zeros_like(Z), Z)
    return (X, Y, Z)


jac_add_jit = jax.jit(jac_add)
jac_double_jit = jax.jit(jac_double)


@jax.jit
def jac_sum_tree(p):
    """Reduce an array of jacobian points ([N, ...]) to one by halving."""
    X, Y, Z = p
    n = X.shape[0]
    while n > 1:
        if n % 2 == 1:
            iX, iY, iZ = jac_infinity(X.shape[1:-1] if X.ndim > 2 else ())
            X = jnp.concatenate([X, iX[None]], axis=0)
            Y = jnp.concatenate([Y, iY[None]], axis=0)
            Z = jnp.concatenate([Z, iZ[None]], axis=0)
            n += 1
        h = n // 2
        X, Y, Z = jac_add((X[:h], Y[:h], Z[:h]), (X[h:], Y[h:], Z[h:]))
        n = h
    return (X[0], Y[0], Z[0])


# ----------------------------------------------------------------------
# host <-> device conversion
# ----------------------------------------------------------------------


def pack_affine(points):
    """List of host affine points ((x, y) ints or None) -> device arrays."""
    n = len(points)
    xs, ys, infs = [], [], np.zeros(n, dtype=bool)
    for i, p in enumerate(points):
        if p is None:
            xs.append(0)
            ys.append(0)
            infs[i] = True
        else:
            xs.append(p[0])
            ys.append(p[1])
    return (
        jnp.asarray(_fq.pack(xs)),
        jnp.asarray(_fq.pack(ys)),
        jnp.asarray(infs),
    )


def unpack_jac(p):
    """Device jacobian point(s) -> host affine ints (or None) via exact math."""
    from ..host.curve import G1
    from ..fields import Q_MOD

    X = _fq.unpack(np.asarray(p[0]))
    Y = _fq.unpack(np.asarray(p[1]))
    Z = _fq.unpack(np.asarray(p[2]))
    if np.ndim(X) == 0:
        return G1.to_affine((int(X), int(Y), int(Z)))
    flatX, flatY, flatZ = (np.reshape(a, (-1,)) for a in (X, Y, Z))
    out = [
        G1.to_affine((int(x), int(y), int(z)))
        for x, y, z in zip(flatX, flatY, flatZ)
    ]
    return out
