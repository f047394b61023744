"""Correctness check of the packed fused MSM path on the real chip.

1. aff_add_packed vs the host oracle on mixed lanes (inf/mask/regular).
2. Full packed g1_msm vs the sum-check oracle at a few sizes.
Run: python scripts/pk_check.py [logn ...]
"""

import os
import sys
import time

sys.path.insert(0, ".")
os.makedirs(".cache/jax", exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tokamak_zk_evm_tpu.backend import pallas_kernels as P  # noqa: E402
from tokamak_zk_evm_tpu.fields import FQ, R_MOD  # noqa: E402
from tokamak_zk_evm_tpu.host import curve as C  # noqa: E402
from tokamak_zk_evm_tpu.ops import curve as cv  # noqa: E402
from tokamak_zk_evm_tpu.ops import field as F  # noqa: E402

RNG = np.random.default_rng(1234)


def rand_points(n):
    return [
        C.g1_scalar_mul_affine(
            C.G1.gen, int.from_bytes(RNG.bytes(16), "little"))
        for _ in range(n)
    ]


def unpack_cols(a):
    h = np.asarray(a)
    lo, hi = h & 0xFFFF, h >> 16
    limbs = np.stack([lo, hi], axis=1).reshape(24, -1)
    return [FQ.from_mont(FQ.from_limbs(limbs[:, i]))
            for i in range(limbs.shape[1])]


def check_add():
    n = 300
    pts1 = rand_points(n)
    pts2 = rand_points(n)
    for i in (0, 1, 4):
        pts1[i] = None
    for i in (2, 3, 4):
        pts2[i] = None

    def pk(x, y, inf):
        m = jnp.asarray(np.asarray(inf, np.uint32)[None, :] != 0)
        xz = jnp.where(m, jnp.uint32(0), x)
        yz = jnp.where(m, jnp.uint32(0), y)
        return P.pack_fq_rows(xz), P.pack_fq_rows(yz)

    x1, y1, i1 = cv.pack_affine(pts1)
    x2, y2, i2 = cv.pack_affine(pts2)
    p1, p2 = pk(x1, y1, i1), pk(x2, y2, i2)
    mask = np.ones(n, np.uint32)
    mask[7:20] = 0
    t0 = time.time()
    ox, oy = P.aff_add_packed(p1, p2, mask=jnp.asarray(mask))
    gx, gy = unpack_cols(ox), unpack_cols(oy)
    bad = 0
    for i in range(n):
        if mask[i] == 0:
            want = pts2[i]
        else:
            a = C.G1.from_affine(pts1[i]) if pts1[i] else C.G1.infinity
            b = C.G1.from_affine(pts2[i]) if pts2[i] else C.G1.infinity
            want = C.G1.to_affine(C.G1.add(a, b))
        got = None if (gx[i] == 0 and gy[i] == 0) else (gx[i], gy[i])
        if got != want:
            bad += 1
            if bad < 4:
                print(f"  lane {i}: got {got} want {want}")
    print(f"[pk_check] aff_add_packed: {'OK' if bad == 0 else f'{bad} BAD'}"
          f" ({time.time()-t0:.1f}s)", flush=True)
    return bad == 0


def check_msm(logn):
    N = logn if logn > 30 else (1 << logn)  # big args are raw counts
    cs = [int.from_bytes(RNG.bytes(32), "little") % R_MOD for _ in range(N)]
    from tokamak_zk_evm_tpu.ops import msm as msm_mod

    fam = msm_mod.fixed_base_msm_points(cs, C.G1.gen)
    np.asarray(fam[0][:1, :1])  # sync
    ks = [int.from_bytes(RNG.bytes(32), "little") % R_MOD for _ in range(N)]
    ks[0] = 0
    fam = (fam[0].at[:, 1].set(0), fam[1].at[:, 1].set(0),
           fam[2].at[1].set(1))
    cs[1] = 0
    t0 = time.time()
    got = msm_mod.msm(msm_mod.scalars_from_ints(ks), *fam)
    dt = time.time() - t0
    total = sum(k * c for k, c in zip(ks, cs)) % R_MOD
    want = C.g1_scalar_mul_affine(C.G1.gen, total)
    ok = got == want
    print(f"[pk_check] msm N={N}: {'OK' if ok else 'MISMATCH'} ({dt:.2f}s)",
          flush=True)
    return ok


def main():
    logns = [int(a) for a in sys.argv[1:]] or [6, 10]
    ok = check_add()
    for ln in logns:
        ok &= check_msm(ln)
    print(f"[pk_check] {'ALL OK' if ok else 'FAILURES'}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
