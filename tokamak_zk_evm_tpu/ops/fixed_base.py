"""Batched fixed-base G1 scalar multiplication on TPU.

Used by trusted setup to generate the large CRS families (xy_powers is 2^22
points = tau-monomial multiples of one generator, `group_structures/
mod.rs:385-394`): precompute a host-side window table T[w][d] = d * 2^(c*w) * G
(c = 8 -> 32 windows x 256 entries = 8192 host points, seconds once per
generator), then every output point is a 32-way table-gather + jacobian
tree-add, fully batched on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import R_MOD
from ..host import curve as hc
from . import curve as cv
from .bigint import fq_ops, fr_ops

_fq = fq_ops()
_fr = fr_ops()

TABLE_WINDOW = 8
N_WINDOWS = 32  # 256 bits / 8


@functools.lru_cache(maxsize=4)
def _window_table(gen):
    """Host table -> device arrays [N_WINDOWS, 256] affine."""
    pts = []
    base = hc.G1.from_affine(gen)
    for w in range(N_WINDOWS):
        row = [None]
        acc = hc.G1.infinity
        for d in range(1, 256):
            acc = hc.G1.add(acc, base)
            row.append(hc.G1.to_affine(acc))
        pts.extend(row)
        # base <<= 8
        for _ in range(TABLE_WINDOW):
            base = hc.G1.double(base)
    px, py, pinf = cv.pack_affine(pts)
    return (
        px.reshape(N_WINDOWS, 256, cv.LQ),
        py.reshape(N_WINDOWS, 256, cv.LQ),
        pinf.reshape(N_WINDOWS, 256),
    )


@functools.partial(jax.jit, static_argnums=())
def _fixed_base_kernel(digits, tx, ty, tinf):
    """digits: [N, 32] uint8-valued int32; table rows [32, 256, ...].

    Returns jacobian [N, 3, LQ]-style tuple: sum_w T[w][digit_w]."""
    n = digits.shape[0]

    def gather(w):
        d = digits[:, w]
        return (
            tx[w][d],  # [N, LQ]
            ty[w][d],
            tinf[w][d],
        )

    acc = None
    parts = []
    for w in range(N_WINDOWS):
        x, y, inf = gather(w)
        parts.append(cv.affine_to_jac(x, y, inf))
    # tree-reduce the 32 window contributions
    while len(parts) > 1:
        nxt = []
        for i in range(0, len(parts) - 1, 2):
            nxt.append(cv.jac_add(parts[i], parts[i + 1]))
        if len(parts) % 2 == 1:
            nxt.append(parts[-1])
        parts = nxt
    return parts[0]


def fixed_base_msm_points(scalars_ints, gen=None, batch: int = 1 << 18):
    """Compute [k_i * G] for a host list/array of scalars; returns device
    jacobian arrays (X, Y, Z) each [N, LQ]."""
    gen = gen or hc.G1.gen
    tx, ty, tinf = _window_table(gen)
    scalars = np.asarray(
        [[(int(s) >> (8 * w)) & 0xFF for w in range(N_WINDOWS)] for s in scalars_ints],
        dtype=np.int32,
    )
    outs_x, outs_y, outs_z = [], [], []
    for s in range(0, scalars.shape[0], batch):
        X, Y, Z = _fixed_base_kernel(
            jnp.asarray(scalars[s : s + batch]), tx, ty, tinf
        )
        outs_x.append(X)
        outs_y.append(Y)
        outs_z.append(Z)
    return (
        jnp.concatenate(outs_x, axis=0),
        jnp.concatenate(outs_y, axis=0),
        jnp.concatenate(outs_z, axis=0),
    )


@jax.jit
def jac_to_affine_batch(P):
    """Batched jacobian -> affine via Montgomery batch inversion of Z."""
    from .poly import fr_batch_inv  # noqa: F401  (pattern reference)

    X, Y, Z = P
    inf = _fq.is_zero(Z)
    # batch-invert Z (Fermat per element is fine here: one-time setup cost)
    zinv = _fq.inv(Z)
    zinv2 = _fq.mont_mul(zinv, zinv)
    x = _fq.mont_mul(X, zinv2)
    y = _fq.mont_mul(Y, _fq.mont_mul(zinv2, zinv))
    one = jnp.broadcast_to(jnp.asarray(_fq.one_mont), x.shape)
    x = _fq.select(inf, jnp.zeros_like(x), x)
    y = _fq.select(inf, jnp.zeros_like(y), y)
    return x, y, inf
