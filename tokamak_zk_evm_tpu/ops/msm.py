"""Pippenger multi-scalar multiplication on TPU.

Replaces ICICLE `msm::msm` (the reference's `encode_poly` commitment engine,
`libs/src/group_structures/mod.rs:59-119`).  TPU-native formulation:

  * window size = 16 bits, so each window's digit IS one uint32 scalar limb —
    no cross-limb bit surgery;
  * bucket accumulation avoids data-dependent scatter-adds (hostile to TPU):
    points are sorted by digit, then a *segmented inclusive scan* with the
    branchless jacobian-add combiner (`curve.jac_add`) produces per-bucket
    sums in O(N) work / O(log N) depth;
  * the 2^16-entry bucket triangle sum uses suffix scans (sum_b b*B_b =
    sum of suffix sums);
  * the 16 window results are combined on host with exact Horner doubling
    (255 single-point ops are latency-bound on device, free on host).

Multi-chip: points are sharded across the mesh; per-chip bucket arrays are
jacobian-summed with `psum`-style tree reduction (parallel/msm_dist.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FR, R_MOD
from .bigint import fr_ops, fq_ops
from . import curve as cv

_fr = fr_ops()
_fq = fq_ops()

WINDOW_BITS = 16
NUM_WINDOWS = 16  # 256 bits / 16


def _segmented_scan_combine(a, b):
    """Combiner for segmented inclusive scan over (point, flag).

    flag = 1 marks a segment head.  (v1,f1) . (v2,f2) = (f2 ? v2 : v1+v2,
    f1|f2) — associative; the branchless jac_add makes it a valid scan op.
    """
    (X1, Y1, Z1, f1) = a
    (X2, Y2, Z2, f2) = b
    s = cv.jac_add((X1, Y1, Z1), (X2, Y2, Z2))
    keep = f2.astype(bool)
    X = _fq.select(keep, X2, s[0])
    Y = _fq.select(keep, Y2, s[1])
    Z = _fq.select(keep, Z2, s[2])
    return (X, Y, Z, f1 | f2)


@functools.lru_cache(maxsize=None)
def _window_kernel():
    """jit: (digits [N], px, py, pinf) -> bucket sums as a single point."""

    def kernel(digits, px, py, pinf):
        n = digits.shape[0]
        order = jnp.argsort(digits)
        d = digits[order]
        X, Y, Z = cv.affine_to_jac(px[order], py[order], pinf[order])
        # zero digits contribute nothing: force them to infinity
        zero_mask = d == 0
        Z = jnp.where(zero_mask[:, None], jnp.zeros_like(Z), Z)
        # segment heads: first element or digit change
        prev = jnp.concatenate([jnp.full((1,), -1, dtype=d.dtype), d[:-1]])
        heads = (d != prev).astype(jnp.uint32)
        Xs, Ys, Zs, _ = jax.lax.associative_scan(
            _segmented_scan_combine, (X, Y, Z, heads), axis=0
        )
        # segment tails hold bucket totals
        nxt = jnp.concatenate([d[1:], jnp.full((1,), -1, dtype=d.dtype)])
        is_tail = d != nxt
        # scatter tails into the bucket table (indices unique; zero-digit and
        # non-tail entries go to a dump slot)
        nbuckets = 1 << WINDOW_BITS
        idx = jnp.where(is_tail & ~zero_mask, d.astype(jnp.int32), nbuckets)
        bX = jnp.zeros((nbuckets + 1, cv.LQ), dtype=jnp.uint32).at[idx].set(Xs)
        bY = jnp.zeros((nbuckets + 1, cv.LQ), dtype=jnp.uint32).at[idx].set(Ys)
        bZ = jnp.zeros((nbuckets + 1, cv.LQ), dtype=jnp.uint32).at[idx].set(Zs)
        bX, bY, bZ = bX[:nbuckets], bY[:nbuckets], bZ[:nbuckets]
        return bucket_triangle_sum((bX, bY, bZ))

    return jax.jit(kernel)


def bucket_triangle_sum(buckets):
    """sum_{b>=1} b * B_b via suffix scan: T_j = sum_{b>=j} B_b, result =
    sum_{j>=1} T_j."""
    bX, bY, bZ = buckets

    def comb(a, b):
        return cv.jac_add(a, b)

    TX, TY, TZ = jax.lax.associative_scan(
        lambda a, b: cv.jac_add(a, b), (bX, bY, bZ), axis=0, reverse=True
    )
    # drop T_0 (bucket 0 unused)
    return cv.jac_sum_tree((TX[1:], TY[1:], TZ[1:]))


def msm(scalars_canonical, px, py, pinf, chunk: int | None = None):
    """MSM of canonical (non-Montgomery) Fr scalars against affine points.

    scalars_canonical: [N, 16] uint32 limb array (little-endian 16-bit limbs)
    px, py: [N, 24] uint32 Fq Montgomery; pinf: [N] bool
    Returns a host affine point ((x, y) ints) or None.
    """
    from ..host.curve import G1

    n = scalars_canonical.shape[0]
    kernel = _window_kernel()
    window_results = []  # host jacobian points per window
    for w in range(NUM_WINDOWS):
        digits = scalars_canonical[:, w].astype(jnp.int32)
        if chunk is None or n <= chunk:
            pt = kernel(digits, px, py, pinf)
            window_results.append(_to_host_jac(pt))
        else:
            acc = G1.infinity
            for s in range(0, n, chunk):
                pt = kernel(digits[s : s + chunk], px[s : s + chunk],
                            py[s : s + chunk], pinf[s : s + chunk])
                acc = G1.add(acc, _to_host_jac(pt))
            window_results.append(acc)

    # Horner combine on host: R = sum_w 2^(16w) W_w
    acc = G1.infinity
    for w in reversed(range(NUM_WINDOWS)):
        for _ in range(WINDOW_BITS):
            acc = G1.double(acc)
        acc = G1.add(acc, window_results[w])
    return G1.to_affine(acc)


def _to_host_jac(pt):
    X = int(_fq.unpack(np.asarray(pt[0])))
    Y = int(_fq.unpack(np.asarray(pt[1])))
    Z = int(_fq.unpack(np.asarray(pt[2])))
    return (X, Y, Z)


def scalars_from_ints(ints):
    """Host ints -> canonical limb array [N, 16]."""
    return jnp.asarray(_fr.pack(ints, mont=False))


def scalars_from_mont(mont_arr):
    """Device Montgomery Fr array [..., 16] -> canonical limbs (device)."""
    return _fr.from_mont(mont_arr)
