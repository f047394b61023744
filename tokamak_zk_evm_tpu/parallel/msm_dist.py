"""Mesh-sharded Pippenger MSM.

Points (and their scalars) are sharded across chips; each chip runs the
local sort + segmented-scan bucket accumulation (`ops/msm.py`) for a window,
then per-chip bucket tables are combined with a jacobian-add reduction over
ICI (psum is additive in the group, implemented as all_gather + local tree
reduce since EC addition is not an XLA collective primitive).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import curve as cv
from ..ops import msm as msm_mod
from .mesh import AXIS


def _local_buckets(digits, px, py, pinf, nbuckets):
    """Per-chip bucket jacobian sums [nbuckets, 3, LQ] via segmented scan."""
    order = jnp.argsort(digits)
    d = digits[order]
    X, Y, Z = cv.affine_to_jac(px[order], py[order], pinf[order])
    zero_mask = d == 0
    Z = jnp.where(zero_mask[:, None], jnp.zeros_like(Z), Z)
    prev = jnp.concatenate([jnp.full((1,), -1, dtype=d.dtype), d[:-1]])
    heads = (d != prev).astype(jnp.uint32)
    Xs, Ys, Zs, _ = jax.lax.associative_scan(
        msm_mod._segmented_scan_combine, (X, Y, Z, heads), axis=0
    )
    nxt = jnp.concatenate([d[1:], jnp.full((1,), -1, dtype=d.dtype)])
    is_tail = d != nxt
    idx = jnp.where(is_tail & ~zero_mask, d.astype(jnp.int32), nbuckets)
    bX = jnp.zeros((nbuckets + 1, cv.LQ), dtype=jnp.uint32).at[idx].set(Xs)
    bY = jnp.zeros((nbuckets + 1, cv.LQ), dtype=jnp.uint32).at[idx].set(Ys)
    bZ = jnp.zeros((nbuckets + 1, cv.LQ), dtype=jnp.uint32).at[idx].set(Zs)
    return bX[:nbuckets], bY[:nbuckets], bZ[:nbuckets]


def _window_body(digits, px, py, pinf, nbuckets):
    bX, bY, bZ = _local_buckets(digits, px, py, pinf, nbuckets)
    # combine bucket tables across chips: gather then jacobian tree-reduce
    gX = jax.lax.all_gather(bX, AXIS)  # [n_dev, nbuckets, LQ]
    gY = jax.lax.all_gather(bY, AXIS)
    gZ = jax.lax.all_gather(bZ, AXIS)
    X, Y, Z = cv.jac_sum_tree((gX, gY, gZ))  # reduce over device axis
    return msm_mod.bucket_triangle_sum((X, Y, Z))


@functools.lru_cache(maxsize=None)
def _window_fn(mesh, nbuckets: int):
    P = jax.sharding.PartitionSpec
    body = functools.partial(_window_body, nbuckets=nbuckets)
    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS, None), P(AXIS, None), P(AXIS)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def msm_dist(scalars_canonical, px, py, pinf, mesh,
             window_bits: int | None = None):
    """Distributed MSM; same contract as `ops.msm.msm`."""
    from ..host.curve import G1

    n_local = scalars_canonical.shape[0] // mesh.shape[AXIS]
    wbits = window_bits if window_bits is not None else \
        msm_mod.pick_window_bits(n_local)
    nwin = -(-msm_mod.SCALAR_BITS // wbits)
    fn = _window_fn(mesh, 1 << wbits)
    window_results = []
    for w in range(nwin):
        digits = msm_mod._digits_for_window(scalars_canonical, w, wbits)
        pt = fn(digits, px, py, pinf)
        window_results.append(msm_mod._to_host_jac(pt))
    acc = G1.infinity
    for w in reversed(range(nwin)):
        for _ in range(wbits):
            acc = G1.double(acc)
        acc = G1.add(acc, window_results[w])
    return G1.to_affine(acc)
