"""Bisect the TPU MSM kernel fault: run the windows core at an explicit
(n, c, wb) with random data.  Crash/no-crash is the signal; each crash
kills the TPU worker (allow ~2 min recovery between runs).

    python scripts/msm_bisect.py <logn> [c] [wb]
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


def main():
    logn = int(sys.argv[1])
    n = 1 << logn
    c = int(sys.argv[2]) if len(sys.argv) > 2 else P._msm_c(n)
    W = -(-255 // c)
    wb = int(sys.argv[3]) if len(sys.argv) > 3 else P._msm_wb(n, c, W)
    print(f"n=2^{logn} c={c} W={W} wb={wb}", flush=True)
    rng = np.random.default_rng(3)
    sc = jnp.asarray(rng.integers(0, 1 << 16, (16, n), dtype=np.uint32))
    xp = jnp.asarray(rng.integers(0, 1 << 16, (24, n), dtype=np.uint32))
    yp = jnp.asarray(rng.integers(0, 1 << 16, (24, n), dtype=np.uint32))
    infp = jnp.zeros((n,), jnp.uint32)
    fn = P._msm_windows_fn(n, wb, c)
    t0 = time.time()
    sX, sY = fn(sc, xp, yp, infp)
    np.asarray(sX)
    print(f"OK first {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    sX, sY = fn(sc, xp, yp, infp)
    np.asarray(sX)
    print(f"OK warm {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
