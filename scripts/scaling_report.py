"""Multi-chip scaling-efficiency report (BASELINE.md north star: report
1-chip vs N-chip throughput for the 2^23 NTT domain and sharded MSM).

Runs on whatever devices are available:
  * on the TPU host there is one physical chip, so N>1 rows use the
    virtual CPU mesh (set SCALE_PLATFORM=cpu VIRT_DEVICES=8);
  * on a real pod slice the same script reports ICI scaling unchanged.

Usage:
    SCALE_PLATFORM=cpu VIRT_DEVICES=8 python scripts/scaling_report.py
Writes scaling_report.json and prints one row per (op, n_devices).
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

if os.environ.get("SCALE_PLATFORM") == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    n_virt = int(os.environ.get("VIRT_DEVICES", "8"))
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_virt}"
        ).strip()

import jax  # noqa: E402

if os.environ.get("SCALE_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tokamak_zk_evm_tpu.fields import R_MOD  # noqa: E402
from tokamak_zk_evm_tpu.host import curve as C  # noqa: E402
from tokamak_zk_evm_tpu.ops import field as F  # noqa: E402
from tokamak_zk_evm_tpu.ops import msm as msm_mod  # noqa: E402
from tokamak_zk_evm_tpu.ops import ntt as ntt_mod  # noqa: E402
from tokamak_zk_evm_tpu.parallel import msm_dist, ntt_dist  # noqa: E402
from tokamak_zk_evm_tpu.parallel.mesh import make_mesh, row_sharding  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, iters=3):
    fn()  # compile
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.time() - t0) / iters


def main():
    devs = jax.devices()
    log(f"platform={devs[0].platform} devices={len(devs)}")
    x_size, y_size = 16384, 512  # the real 2^23 prover NTT domain
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 1 << 16, (16, x_size, y_size), dtype=np.uint32)
    grid = F.fr_mul(jnp.asarray(raw).reshape(16, -1),
                    jnp.asarray(F.fr_mont(1))).reshape(16, x_size, y_size)

    rows = []
    t1 = timeit(lambda: ntt_mod.bintt(grid))
    rows.append({"op": f"bintt_{x_size}x{y_size}", "n_devices": 1,
                 "seconds": round(t1, 4), "efficiency": 1.0})
    log(f"bintt {x_size}x{y_size} 1-dev: {t1*1e3:.1f} ms")

    counts = sorted({n for n in (2, 4, 8) if n <= len(devs)})
    for n in counts:
        mesh = make_mesh(n)
        g = jax.device_put(grid, row_sharding(mesh))
        tn = timeit(lambda: ntt_dist.bintt_dist(g, mesh))
        eff = t1 / (tn * n)
        ceiling = min(n, os.cpu_count()) / n
        rows.append({"op": f"bintt_{x_size}x{y_size}", "n_devices": n,
                     "seconds": round(tn, 4), "efficiency": round(eff, 3),
                     "efficiency_vs_host_ceiling": round(eff / ceiling, 3)})
        log(f"bintt {x_size}x{y_size} {n}-dev: {tn*1e3:.1f} ms "
            f"(eff {eff:.2f}, vs host ceiling {eff/ceiling:.2f})")

    # MSM: 2^18 points (fixed-base family, O(1)-verifiable)
    N = 1 << int(os.environ.get("SCALE_MSM_LOG2", "18"))
    cs = [int.from_bytes(rng.bytes(32), "little") % R_MOD for _ in range(N)]
    fam = msm_mod.fixed_base_msm_points(cs, C.G1.gen)
    ks = [int.from_bytes(rng.bytes(32), "little") % R_MOD for _ in range(N)]
    s = msm_mod.scalars_from_ints(ks)

    t0 = time.time()
    got1 = msm_mod.msm(s, *fam)
    t1m = time.time() - t0
    t0 = time.time()
    got1 = msm_mod.msm(s, *fam)
    t1m = time.time() - t0
    rows.append({"op": f"msm_2^{N.bit_length()-1}", "n_devices": 1,
                 "seconds": round(t1m, 4), "efficiency": 1.0})
    log(f"msm 2^{N.bit_length()-1} 1-dev: {t1m:.3f} s")
    total = sum(k * c for k, c in zip(ks, cs)) % R_MOD
    want = C.g1_scalar_mul_affine(C.G1.gen, total)
    assert got1 == want, "1-dev MSM oracle mismatch"

    for n in counts:
        mesh = make_mesh(n)
        msm_dist.msm_dist(s, *fam, mesh)  # compile
        t0 = time.time()
        got = msm_dist.msm_dist(s, *fam, mesh)
        tn = time.time() - t0
        assert got == want, f"{n}-dev MSM oracle mismatch"
        eff = t1m / (tn * n)
        ceiling = min(n, os.cpu_count()) / n
        rows.append({"op": f"msm_2^{N.bit_length()-1}", "n_devices": n,
                     "seconds": round(tn, 4), "efficiency": round(eff, 3),
                     "efficiency_vs_host_ceiling": round(eff / ceiling, 3)})
        log(f"msm 2^{N.bit_length()-1} {n}-dev: {tn:.3f} s (eff {eff:.2f}, "
            f"vs host ceiling {eff/ceiling:.2f})")

    out = {"platform": devs[0].platform, "host_cpu_cores": os.cpu_count(),
           "note": ("virtual CPU devices share the host's physical cores: "
                    "N-device efficiency is capped at cores/N (this host "
                    f"has {os.cpu_count()} cores, so 0.25 is the 8-device "
                    "ceiling); efficiency_vs_host_ceiling normalizes by "
                    "that bound and is the number comparable to real-chip "
                    "scaling"),
           "rows": rows}
    with open("scaling_report.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
