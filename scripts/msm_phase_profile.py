"""Phase-level timing of the 2^22 MSM on the real chip, with HOST-PULL syncs
(block_until_ready does not sync through the axon tunnel).

Times, as separate jitted programs (each warmed, then timed with a 1-element
host pull as the sync):
  1. full _msm_full_fn (the production pipeline)
  2. one scan step's argsort+bitrev+gather alone
  3. the merge tree alone (no sort: identity order) for one step
  4. the flush scatters alone for one step
  5. one g1_aff_add_batch at top width
Run: python scripts/msm_phase_profile.py [logn]
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


def log(*a):
    print(*a, flush=True)


def sync(r):
    leaves = jax.tree_util.tree_leaves(r)
    np.asarray(jax.device_get(jnp.ravel(leaves[0])[:1]))


def timeit(name, fn, iters=2):
    t0 = time.time()
    sync(fn())
    log(f"[{name}] first(+compile) {time.time()-t0:.2f}s")
    t0 = time.time()
    for _ in range(iters):
        sync(fn())
    log(f"[{name}] warm {(time.time()-t0)/iters:.3f}s")


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    n = 1 << logn
    c, W, wb = P._msm_config(n)
    steps = -(-W // wb)
    log(f"n=2^{logn} c={c} W={W} wb={wb} steps={steps}")
    rng = np.random.default_rng(7)

    scalars = jnp.asarray(rng.integers(0, 1 << 16, (16, n), dtype=np.uint32))
    xp = jnp.asarray(rng.integers(0, 1 << 16, (24, n), dtype=np.uint32))
    yp = jnp.asarray(rng.integers(0, 1 << 16, (24, n), dtype=np.uint32))
    pinf = jnp.zeros((n,), jnp.uint32)
    digits = jnp.asarray(rng.integers(0, 1 << c, (wb, n), dtype=np.uint32))

    br = jnp.asarray(P._bitrev_idx(n))

    # --- 2. argsort + gather (one step) ---
    @jax.jit
    def sort_gather(digits, xp, yp):
        order = jnp.argsort(digits, axis=1)
        order = jnp.take(order, br, axis=1)
        key = jnp.take_along_axis(digits, order, axis=1)
        src = jnp.concatenate([xp, yp], axis=0)
        g = jnp.take(src, order.reshape(-1), axis=1)
        return key, g

    @jax.jit
    def sort_only(digits):
        return jnp.argsort(digits, axis=1)

    @jax.jit
    def gather_only(order, xp, yp):
        src = jnp.concatenate([xp, yp], axis=0)
        return jnp.take(src, order.reshape(-1), axis=1)

    order0 = jnp.asarray(
        rng.permuted(np.tile(np.arange(n, dtype=np.int32), (wb, 1)), axis=1))

    timeit("argsort only (one step)", lambda: sort_only(digits))
    timeit("gather 48-row only (one step)", lambda: gather_only(order0, xp, yp))
    timeit("argsort+bitrev+gather (one step)",
           lambda: sort_gather(digits, xp, yp))

    # --- 3/4. merge tree alone vs with flush, one step ---
    NB = 1 << c
    key_s = jnp.sort(digits, axis=1)[:, P._bitrev_idx(n)]
    Xg = jnp.asarray(rng.integers(0, 1 << 16, (24, wb * n), dtype=np.uint32))
    Yg = jnp.asarray(rng.integers(0, 1 << 16, (24, wb * n), dtype=np.uint32))

    def merge_core(key, X, Y, do_flush):
        woff = (jnp.arange(wb, dtype=jnp.uint32) * jnp.uint32(NB))[:, None]
        bX = jnp.zeros((24, wb * NB), jnp.uint32)
        bY = jnp.zeros((24, wb * NB), jnp.uint32)

        def flush_and_add(acc, lk, pX, pY):
            flatk = (lk + woff).reshape(-1)
            row = tuple(
                jnp.zeros((24, wb * NB), jnp.uint32).at[:, flatk].set(p)
                for p in (pX, pY)
            )
            return P.g1_aff_add_batch(acc, row)

        m = n
        while m > 1:
            h = m // 2
            kl, kr = key[:, :h], key[:, h:]
            lX, rX = _halves(X, wb, m)
            lY, rY = _halves(Y, wb, m)
            same2 = kl == kr
            same = same2.reshape(1, wb * h)
            mX, mY = P.g1_aff_add_batch((lX, lY), (rX, rY))
            X = jnp.where(same, mX, rX)
            Y = jnp.where(same, mY, rY)
            if do_flush:
                lk = jnp.where(same2, jnp.uint32(0), kl)
                bX, bY = flush_and_add((bX, bY), lk, lX, lY)
            key = kr
            m = h
        return X, Y, bX, bY

    def _halves(a, wb_, m):
        h = m // 2
        if wb_ == 1:
            return a[:, :h], a[:, h:]
        lefts = jnp.concatenate(
            [a[:, w * m: w * m + h] for w in range(wb_)], axis=1)
        rights = jnp.concatenate(
            [a[:, w * m + h: (w + 1) * m] for w in range(wb_)], axis=1)
        return lefts, rights

    merge_noflush = jax.jit(lambda k, X, Y: merge_core(k, X, Y, False))
    merge_flush = jax.jit(lambda k, X, Y: merge_core(k, X, Y, True))
    timeit("merge tree NO flush (one step)",
           lambda: merge_noflush(key_s, Xg, Yg), iters=1)
    timeit("merge tree WITH flush (one step)",
           lambda: merge_flush(key_s, Xg, Yg), iters=1)

    # --- 5. single top-width affine add ---
    jadd = jax.jit(lambda a, b, cc, d: P.g1_aff_add_batch((a, b), (cc, d)))
    timeit(f"aff_add_batch w=2^{logn}*wb",
           lambda: jadd(Xg, Yg, Yg, Xg), iters=2)

    # --- 1. full pipeline ---
    timeit("FULL _msm_full_fn", lambda: P._msm_full_fn(n, wb, c)(
        scalars, xp, yp, pinf), iters=1)


if __name__ == "__main__":
    main()
