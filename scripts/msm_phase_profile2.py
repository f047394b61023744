"""Phase timing of the PACKED MSM pipeline at 2^22 (wb=2), host-pull syncs.

Each phase is timed as its own jitted program with warmed compile:
  sortkey   : variadic sort + bitrev takes
  gather    : [n,128]-row take + slice/transpose + dead-zero
  merge     : full merge tree, flush rows REPLACED by cheap sums (no
              scatter, no reduce) so only the adds are timed
  flushscat : the 23 per-level scatters alone (static inputs)
  reduce    : the pairwise level-row reduction alone
  tail      : weighted bucket tail alone
Run: python scripts/msm_phase_profile2.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
os.makedirs(".cache/jax", exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tokamak_zk_evm_tpu.backend import pallas_kernels as P  # noqa: E402

FQ_P = P.FQ_P
LANES = P.LANES


def log(*a):
    print(*a, flush=True)


def sync(r):
    leaves = jax.tree_util.tree_leaves(r)
    np.asarray(jax.device_get(jnp.ravel(leaves[0])[:1]))


def timeit(name, fn, *args, iters=2):
    t0 = time.time()
    sync(fn(*args))
    log(f"[{name}] first {time.time()-t0:.2f}s")
    t0 = time.time()
    for _ in range(iters):
        sync(fn(*args))
    log(f"[{name}] warm {(time.time()-t0)/iters:.3f}s")


def main():
    logn = 22
    n = 1 << logn
    c, W, wb = P._msm_config(n)
    NB = 1 << c
    log(f"n=2^{logn} c={c} W={W} wb={wb}")
    rng = np.random.default_rng(7)
    br = jnp.asarray(P._bitrev_idx(n))

    digits = jnp.asarray(rng.integers(0, NB, (wb, n), dtype=np.uint32))
    rows = jnp.asarray(rng.integers(0, 1 << 31, (n, 128), dtype=np.uint32))

    @jax.jit
    def sortkey(digits):
        iota = jax.lax.broadcasted_iota(jnp.int32, (wb, n), 1)
        key, order = jax.lax.sort((digits, iota), dimension=1, num_keys=1)
        return jnp.take(key, br, axis=1), jnp.take(order, br, axis=1)

    timeit("sortkey", sortkey, digits)

    order0 = jnp.asarray(
        rng.permuted(np.tile(np.arange(n, dtype=np.int32), (wb, 1)), axis=1))
    key0 = jnp.sort(digits, axis=1)[:, P._bitrev_idx(n)]

    @jax.jit
    def gather(rows, order, key):
        flat = order.reshape(-1)
        chunk = min(wb * n, 1 << 21)
        parts = []
        for i in range(0, wb * n, chunk):
            g = jnp.take(rows, flat[i:i + chunk], axis=0)
            parts.append(g[:, : 2 * FQ_P].T)
        g24 = jnp.concatenate(parts, axis=1)
        X, Y = g24[:FQ_P], g24[FQ_P:]
        dead = (key == jnp.uint32(0)).reshape(1, wb * n)
        return (jnp.where(dead, jnp.uint32(0), X),
                jnp.where(dead, jnp.uint32(0), Y))

    timeit("gather", gather, rows, order0, key0)

    Xg = jnp.asarray(rng.integers(0, 1 << 31, (FQ_P, wb * n), dtype=np.uint32))
    Yg = jnp.asarray(rng.integers(0, 1 << 31, (FQ_P, wb * n), dtype=np.uint32))

    def merge_only(key, X, Y):
        Z = None
        m = n
        cheap = jnp.zeros((FQ_P, wb * NB), jnp.uint32)
        while m > 1:
            h = m // 2
            kl, kr = key[:, :h], key[:, h:]
            lX, rX = _halves(X, m)
            lY, rY = _halves(Y, m)
            same2 = kl == kr
            mask = same2.reshape(wb * h).astype(jnp.uint32)
            if Z is None and wb * h < P._JAC_TH:
                Z = P._jac_z_of_affine_pk(X, Y)
            if Z is None:
                # stand-in for the flush: fold the leftovers into a cheap
                # lane-sum so XLA cannot DCE the adds
                cheap = cheap + jnp.sum(lX) + jnp.sum(lY)
                X, Y = P.aff_add_packed((lX, lY), (rX, rY), mask=mask)
            else:
                lZ, rZ = _halves(Z, m)
                cheap = cheap + jnp.sum(lZ)
                X, Y, Z = P.jac_add_packed((lX, lY, lZ), (rX, rY, rZ),
                                           mask=mask)
            key = kr
            m = h
        return X, Y, Z, cheap

    def _halves(a, m):
        h = m // 2
        lefts = jnp.concatenate(
            [a[:, w * m: w * m + h] for w in range(wb)], axis=1)
        rights = jnp.concatenate(
            [a[:, w * m + h: (w + 1) * m] for w in range(wb)], axis=1)
        return lefts, rights

    timeit("merge_only", jax.jit(merge_only), key0, Xg, Yg, iters=1)

    # flush scatters alone: 23 levels at halving sizes
    woff = (jnp.arange(wb, dtype=jnp.uint32) * jnp.uint32(NB))[:, None]

    def flushscat(key, X, Y):
        outs = []
        m = n
        while m > 1:
            h = m // 2
            lk = key[:, :h]
            fx = X[:, : wb * h]
            fy = Y[:, : wb * h]
            fz = fx
            flatk = (lk + woff).reshape(-1)
            outs.append(tuple(
                jnp.zeros((FQ_P, wb * NB), jnp.uint32).at[:, flatk].set(v)
                for v in (fx, fy, fz)))
            key = key[:, h:]
            m = h
        return outs

    timeit("flushscat", jax.jit(flushscat), key0, Xg, Yg, iters=1)

    # reduce alone
    FX = jnp.asarray(rng.integers(0, 1 << 31, (23, FQ_P, wb * NB),
                                  dtype=np.uint32))

    def reduce_rows(FX, FY, FZ):
        nlev = FX.shape[0]
        while nlev > 1:
            if nlev % 2 == 1:
                pad = ((0, 1), (0, 0), (0, 0))
                FX, FY, FZ = (jnp.pad(v, pad) for v in (FX, FY, FZ))
                nlev += 1
            h2 = nlev // 2
            a1 = tuple(
                jnp.moveaxis(v[0::2], 0, 2).reshape(FQ_P, h2 * wb * NB)
                for v in (FX, FY, FZ))
            a2 = tuple(
                jnp.moveaxis(v[1::2], 0, 2).reshape(FQ_P, h2 * wb * NB)
                for v in (FX, FY, FZ))
            o = P.jac_add_packed(a1, a2)
            FX, FY, FZ = (
                jnp.moveaxis(v.reshape(FQ_P, wb * NB, h2), 2, 0) for v in o)
            nlev = h2
        return FX[0], FY[0], FZ[0]

    timeit("reduce", jax.jit(reduce_rows), FX, FX, FX, iters=1)

    # tail alone
    bX = jnp.asarray(rng.integers(0, 1 << 31, (FQ_P, W, NB), dtype=np.uint32))
    timeit("tail", jax.jit(P._weighted_bucket_tail_jac_pk), bX, bX, bX,
           iters=1)


if __name__ == "__main__":
    main()
