"""Hardware oracle over the EXACT MSM point counts the prover emits.

VERDICT r03 weak #2: the batched-affine MSM was hardware-validated only at
isolated standalone sizes and faulted the chip at prove-emitted shapes.
This runs g1_msm at every point count collected by collect_msm_shapes.py
(raw, unpadded — padding happens inside g1_msm exactly as at prove time)
with the O(1) sum-check oracle: points are built as P_i = c_i * G on device,
so sum k_i P_i must equal ((sum k_i c_i) mod r) * G.

    python scripts/msm_shape_check.py 7 8 31 62 3600 ...
    python scripts/msm_shape_check.py --from-json shapes.json
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")
os.makedirs(".cache/jax", exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402
import jax  # noqa: E402

from tokamak_zk_evm_tpu.fields import R_MOD  # noqa: E402
from tokamak_zk_evm_tpu.host import curve as C  # noqa: E402
from tokamak_zk_evm_tpu.ops import msm as msm_mod  # noqa: E402


def check_one(N, rng):
    cs = [int.from_bytes(rng.bytes(32), "little") % R_MOD for _ in range(N)]
    fam = msm_mod.fixed_base_msm_points(cs, C.G1.gen)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), list(fam))
    ks = [int.from_bytes(rng.bytes(32), "little") % R_MOD for _ in range(N)]
    if N > 2:  # exercise zero scalars + infinity points like real encodes
        ks[0] = 0
        cs_inf_idx = 1
        fam = (
            fam[0].at[:, cs_inf_idx].set(0),
            fam[1].at[:, cs_inf_idx].set(0),
            fam[2].at[cs_inf_idx].set(1),
        )
        cs[cs_inf_idx] = 0
    t0 = time.time()
    got = msm_mod.msm(msm_mod.scalars_from_ints(ks), *fam)
    dt = time.time() - t0
    total = sum(k * c for k, c in zip(ks, cs)) % R_MOD
    want = C.g1_scalar_mul_affine(C.G1.gen, total)
    ok = got == want
    print(f"[shape-check] N={N}: {'OK' if ok else 'MISMATCH'} ({dt:.2f}s)",
          flush=True)
    return ok


def main():
    args = sys.argv[1:]
    if args and args[0] == "--from-json":
        with open(args[1]) as f:
            counts = json.load(f)["counts"]
    else:
        counts = [int(a) for a in args]
    if not counts:
        print("usage: msm_shape_check.py N [N ...]")
        return 1
    print(f"platform: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(11)
    bad = [N for N in counts if not check_one(N, rng)]
    if bad:
        print(f"[shape-check] FAILED at: {bad}")
        return 1
    print(f"[shape-check] all {len(counts)} shapes OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
