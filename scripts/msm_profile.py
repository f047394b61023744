"""Per-stage timing of the Pallas MSM pipeline on the real chip.

Times, for a given n: the per-window argsort+gather, one merge level's
affine add at top width, the batch inversion alone, the scatter flush, and
the full _msm_windows_fn — so regressions attribute to a stage instead of a
guess.  Run: python scripts/msm_profile.py [logn]
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


def timeit(name, fn, iters=3):
    r = fn()
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
    t0 = time.time()
    for _ in range(iters):
        r = fn()
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
    log(f"[{name}] {(time.time()-t0)/iters*1e3:.1f} ms")


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << logn
    c = P._msm_c(n)
    W = -(-255 // c)
    wb = P._msm_wb(n, c, W)
    log(f"n=2^{logn} c={c} W={W} wb={wb} steps={-(-W//wb)}")
    rng = np.random.default_rng(7)

    digits = jnp.asarray(rng.integers(0, 1 << c, (wb, n), dtype=np.uint32))
    xp = jnp.asarray(rng.integers(0, 1 << 16, (24, n), dtype=np.uint32))
    yp = jnp.asarray(rng.integers(0, 1 << 16, (24, n), dtype=np.uint32))

    br = jnp.asarray(P._bitrev_idx(n))

    @jax.jit
    def sort_gather(digits, xp, yp):
        order = jnp.argsort(digits, axis=1)
        order = jnp.take(order, br, axis=1)
        key = jnp.take_along_axis(digits, order, axis=1)
        src = jnp.concatenate([xp, yp], axis=0)
        g = jnp.take(src, order.reshape(-1), axis=1)
        return key, g

    timeit("argsort+gather (one step)", lambda: sort_gather(digits, xp, yp))

    B = wb * n
    X1 = jnp.asarray(rng.integers(0, 1 << 16, (24, B), dtype=np.uint32))
    Y1 = jnp.asarray(rng.integers(0, 1 << 16, (24, B), dtype=np.uint32))
    X2 = jnp.asarray(rng.integers(0, 1 << 16, (24, B), dtype=np.uint32))
    Y2 = jnp.asarray(rng.integers(0, 1 << 16, (24, B), dtype=np.uint32))

    jadd = jax.jit(lambda a, b, cc, d: P.g1_aff_add_batch((a, b), (cc, d)))
    timeit(f"aff_add_batch w={B:.2e}", lambda: jadd(X1, Y1, X2, Y2))

    jinv = jax.jit(lambda a: P._batch_inv_nz("fq", a))
    timeit(f"batch_inv w={B:.2e}", lambda: jinv(X1))

    jjac = jax.jit(lambda a, b, cc, d, e, f: P.g1_add_fused((a, b, cc), (d, e, f)))
    timeit(f"jac_add_fused w={B:.2e}", lambda: jjac(X1, Y1, X1, X2, Y2, X2))

    NB = 1 << c
    keys = jnp.asarray(rng.integers(0, NB, (wb, B // wb), dtype=np.uint32))
    woff = (jnp.arange(wb, dtype=jnp.uint32) * jnp.uint32(NB))[:, None]

    @jax.jit
    def scat(keys, X1):
        flatk = (keys + woff).reshape(-1)
        return jnp.zeros((24, wb * NB), jnp.uint32).at[:, flatk].set(X1)

    timeit(f"scatter flush w={B:.2e}->NB={NB}", lambda: scat(keys, X1))

    # full MSM core
    sc = jnp.asarray(rng.integers(0, 1 << 16, (16, n), dtype=np.uint32))
    infp = jnp.zeros((n,), jnp.uint32)
    fn = P._msm_windows_fn(n, wb, c)
    timeit("msm_windows full", lambda: fn(sc, xp, yp, infp), iters=1)


if __name__ == "__main__":
    main()
