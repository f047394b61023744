"""Measure gather/scatter layout variants for the MSM on the real chip.

Variants (8M indices into 4M source, the 2^22 wb=2 shape):
  g_48xn   : src [48, n], take axis=1  (current production layout)
  g_24xn   : src [24, n] packed, take axis=1
  g_nx48   : src [n, 48], take axis=0 (row gather)
  g_nx24   : src [n, 24] packed, take axis=0
  g_nx128  : src [n, 128] (lane-padded rows), take axis=0
  s_48     : scatter-set 4M cols into [48, 131072] axis=1 (current flush)
  s_24     : packed scatter-set into [24, 131072]
  s_rows   : scatter-set 4M rows into [131072, 48] axis=0
Run: python scripts/gather_probe.py
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


def log(*a):
    print(*a, flush=True)


def sync(r):
    leaves = jax.tree_util.tree_leaves(r)
    np.asarray(jax.device_get(jnp.ravel(leaves[0])[:1]))


def timeit(name, fn, iters=3):
    t0 = time.time()
    sync(fn())
    log(f"[{name}] first {time.time()-t0:.2f}s")
    t0 = time.time()
    for _ in range(iters):
        sync(fn())
    log(f"[{name}] warm {(time.time()-t0)/iters:.3f}s")


def main():
    n = 1 << 22
    m = 2 * n  # 8M indices (wb=2)
    rng = np.random.default_rng(3)
    idx = jnp.asarray(rng.integers(0, n, (m,), dtype=np.int32))

    ga1 = jax.jit(lambda s, i: jnp.take(s, i, axis=1))
    ga0 = jax.jit(lambda s, i: jnp.take(s, i, axis=0))

    src48 = jnp.asarray(rng.integers(0, 1 << 16, (48, n), dtype=np.uint32))
    timeit("g_48xn", lambda: ga1(src48, idx))

    src24 = jnp.asarray(rng.integers(0, 1 << 31, (24, n), dtype=np.uint32))
    timeit("g_24xn", lambda: ga1(src24, idx))

    srcn48 = jnp.asarray(rng.integers(0, 1 << 16, (n, 48), dtype=np.uint32))
    timeit("g_nx48", lambda: ga0(srcn48, idx))

    srcn24 = jnp.asarray(rng.integers(0, 1 << 16, (n, 24), dtype=np.uint32))
    timeit("g_nx24", lambda: ga0(srcn24, idx))

    srcn128 = jnp.asarray(rng.integers(0, 1 << 16, (n, 128), dtype=np.uint32))
    timeit("g_nx128", lambda: ga0(srcn128, idx))

    NB = 131072
    upd = n  # one level's worth of scattered columns
    keys = jnp.asarray(rng.integers(0, NB, (upd,), dtype=np.int32))
    sc1 = jax.jit(lambda k, v: jnp.zeros((48, NB), jnp.uint32).at[:, k].set(v))
    sc2 = jax.jit(lambda k, v: jnp.zeros((24, NB), jnp.uint32).at[:, k].set(v))
    sc3 = jax.jit(lambda k, v: jnp.zeros((NB, 48), jnp.uint32).at[k].set(v))
    v48 = jnp.asarray(rng.integers(0, 1 << 16, (48, upd), dtype=np.uint32))
    timeit("s_48", lambda: sc1(keys, v48))
    v24 = v48[:24]
    timeit("s_24", lambda: sc2(keys, v24))
    vr = jnp.asarray(rng.integers(0, 1 << 16, (upd, 48), dtype=np.uint32))
    timeit("s_rows", lambda: sc3(keys, vr))


if __name__ == "__main__":
    main()
