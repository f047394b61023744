"""Pippenger multi-scalar multiplication on TPU.

Replaces ICICLE `msm::msm` (the reference's `encode_poly` commitment engine,
`libs/src/group_structures/mod.rs:59-119`).  TPU-native formulation:

  * adaptive window size: w ~ log2(N) - 3 (clamped to [2, 16]); at the
    reference's headline 2^22-point MSM this gives the classic 16-bit
    windows where each digit IS one uint32 scalar limb;
  * bucket accumulation avoids data-dependent scatter-adds (hostile to TPU):
    points are sorted by digit, then a *segmented inclusive scan* with the
    branchless jacobian-add combiner (`curve.jac_add`) produces per-bucket
    sums in O(N) work / O(log N) depth;
  * the bucket triangle sum uses suffix scans (sum_b b*B_b = sum of suffix
    sums);
  * the window results are combined on host with exact Horner doubling
    (single-point ops are latency-bound on device, free on host).

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

SCALAR_BITS = 256  # 16 limbs x 16 bits


def pick_window_bits(n: int) -> int:
    """Pippenger window size for an n-point MSM: ~log2(n) - 3, in [2, 16].

    Bucket-phase cost ~ n per window; triangle-sum cost ~ 2^w per window;
    total ~ (256/w) * (n + 2^w) — minimized near w = log2(n) - log2(log2(n)).
    """
    if n <= 0:
        return 2
    return max(2, min(16, n.bit_length() - 3))


def _digits_for_window(scalars, w: int, wbits: int):
    """Extract digit w (wbits wide) from [N, 16] uint32 16-bit-limb scalars."""
    off = w * wbits
    lo_limb, lo_shift = off // 16, off % 16
    d = scalars[:, lo_limb] >> lo_shift
    have = 16 - lo_shift
    if have < wbits and lo_limb + 1 < scalars.shape[1]:
        d = d | (scalars[:, lo_limb + 1] << have)
    return (d & np.uint32((1 << wbits) - 1)).astype(jnp.int32)


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
def _window_kernel(wbits: int):
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
        nbuckets = 1 << wbits
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
    TX, TY, TZ = jax.lax.associative_scan(
        lambda a, b: cv.jac_add(a, b), (bX, bY, bZ), axis=0, reverse=True
    )
    # drop T_0 (bucket 0 unused)
    return cv.jac_sum_tree((TX[1:], TY[1:], TZ[1:]))


def msm(scalars_canonical, px, py, pinf, chunk: int | None = None,
        window_bits: int | None = None):
    """MSM of canonical (non-Montgomery) Fr scalars against affine points.

    scalars_canonical: [N, 16] uint32 limb array (little-endian 16-bit limbs)
    px, py: [N, 24] uint32 Fq Montgomery; pinf: [N] bool
    Returns a host affine point ((x, y) ints) or None.
    """
    from ..host.curve import G1

    n = scalars_canonical.shape[0]
    wbits = window_bits if window_bits is not None else pick_window_bits(
        min(n, chunk) if chunk is not None else n
    )
    nwin = -(-SCALAR_BITS // wbits)
    kernel = _window_kernel(wbits)
    window_results = []  # host jacobian points per window
    for w in range(nwin):
        digits = _digits_for_window(scalars_canonical, w, wbits)
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

    # Horner combine on host: R = sum_w 2^(wbits*w) W_w
    acc = G1.infinity
    for w in reversed(range(nwin)):
        for _ in range(wbits):
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
