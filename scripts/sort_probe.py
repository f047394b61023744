"""Probe XLA TPU sort/gather/scatter primitive costs for the MSM design.

Compares: stable argsort (u32 keys) vs single-array sort of packed
key<<bits|idx u32 (payload-free, stability by construction) vs variadic
lax.sort, plus gather/scatter baselines.  Run on the chip:
    python scripts/sort_probe.py
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


def timeit(name, fn, iters=5):
    r = fn()
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
    t0 = time.time()
    for _ in range(iters):
        r = fn()
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
    log(f"[{name}] {(time.time()-t0)/iters*1e3:.1f} ms")


def main():
    rng = np.random.default_rng(3)
    for logn in (20, 22):
        n = 1 << logn
        keys = jnp.asarray(rng.integers(0, 1 << 16, (n,), dtype=np.uint32))
        log(f"--- n=2^{logn} ---")
        timeit("argsort u32 (stable)", jax.jit(lambda k=keys: jnp.argsort(k)))
        timeit("argsort u32 (unstable)",
               jax.jit(lambda k=keys: jnp.argsort(k, stable=False)))
        timeit("sort u32 single", jax.jit(lambda k=keys: jnp.sort(k)))
        if logn <= 20:
            packed = jnp.asarray(
                ((rng.integers(0, 1 << 12, (n,), dtype=np.uint32)) << logn)
                | np.arange(n, dtype=np.uint32)
            )
            timeit("sort packed key|idx u32",
                   jax.jit(lambda k=packed: jnp.sort(k)))
        k16 = keys.astype(jnp.uint16)
        timeit("sort u16 single", jax.jit(lambda k=k16: jnp.sort(k)))
        pts = jnp.asarray(rng.integers(0, 1 << 16, (48, n), dtype=np.uint32))
        order = jnp.argsort(keys)
        order.block_until_ready()
        timeit("gather [48,n] by perm", jax.jit(lambda p=pts, o=order: p[:, o]))
        sk = jnp.asarray(rng.integers(0, 1 << 16, (n,), dtype=np.uint32))
        vals24 = pts[:24]
        timeit("scatter-set [24,n]->[24,65536]",
               jax.jit(lambda k=sk, v=vals24:
                       jnp.zeros((24, 65536), jnp.uint32).at[:, k].set(v)))
        timeit("scatter-set iota [n]->[n]",
               jax.jit(lambda o=order:
                       jnp.zeros((n,), jnp.uint32).at[o].set(
                           jnp.arange(n, dtype=jnp.uint32))))


if __name__ == "__main__":
    main()
