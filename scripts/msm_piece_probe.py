"""Probe individual MSM pipeline pieces at the widths of a faulting config.

    python scripts/msm_piece_probe.py <piece> <width>

pieces: affadd (g1_aff_add_batch), binv (_batch_inv_nz), scatter
(flush-style scatter-set into [48, W]), sortgather (argsort + 48-row take).
"""

import os
import sys
import time

sys.path.insert(0, ".")
os.makedirs(".cache/jax", exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tokamak_zk_evm_tpu.backend import pallas_kernels as P  # noqa: E402


def sync(r):
    if isinstance(r, (tuple, list)):
        r = r[0]
    np.asarray(jax.device_get(jnp.ravel(r)[:1]))


def main():
    piece = sys.argv[1]
    B = int(sys.argv[2])
    rng = np.random.default_rng(5)
    t0 = time.time()
    if piece == "affadd":
        a = [jnp.asarray(rng.integers(0, 1 << 16, (24, B), dtype=np.uint32))
             for _ in range(4)]
        fn = jax.jit(lambda x1, y1, x2, y2: P.g1_aff_add_batch((x1, y1),
                                                               (x2, y2)))
        sync(fn(*a))
        print(f"affadd B={B} first OK {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        sync(fn(*a))
        print(f"affadd warm {time.time()-t0:.3f}s", flush=True)
    elif piece == "binv":
        a = jnp.asarray(rng.integers(1, 1 << 16, (24, B), dtype=np.uint32))
        fn = jax.jit(lambda x: P._batch_inv_nz("fq", x))
        sync(fn(a))
        print(f"binv B={B} first OK {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        sync(fn(a))
        print(f"binv warm {time.time()-t0:.3f}s", flush=True)
    elif piece == "scatter":
        upd = int(sys.argv[3])
        keys = jnp.asarray(rng.integers(0, B, (upd,), dtype=np.uint32))
        vals = jnp.asarray(rng.integers(0, 1 << 16, (48, upd),
                                        dtype=np.uint32))
        fn = jax.jit(
            lambda k, v: jnp.zeros((48, B), jnp.uint32).at[:, k].set(v))
        sync(fn(keys, vals))
        print(f"scatter B={B} upd={upd} first OK {time.time()-t0:.1f}s",
              flush=True)
    elif piece == "sortgather":
        wb = int(sys.argv[3])
        n = B // wb
        dig = jnp.asarray(rng.integers(0, 4096, (wb, n), dtype=np.uint32))
        src = jnp.asarray(rng.integers(0, 1 << 16, (48, n), dtype=np.uint32))
        br = jnp.asarray(P._bitrev_idx(n))

        def f(d, s):
            o = jnp.argsort(d, axis=1)
            o = jnp.take(o, br, axis=1)
            k = jnp.take_along_axis(d, o, axis=1)
            g = jnp.take(s, o.reshape(-1), axis=1)
            return k, g

        fn = jax.jit(f)
        sync(fn(dig, src))
        print(f"sortgather wb={wb} n={n} first OK {time.time()-t0:.1f}s",
              flush=True)
    else:
        raise SystemExit(f"unknown piece {piece}")


if __name__ == "__main__":
    main()
