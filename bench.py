"""Headline benchmark: full synthetic prove at the reference workload shape.

Runs setup (cached), then measures end-to-end prove wall-clock — witness
polynomial construction, all five rounds, commitments and binding MSMs —
at the reference's shape (n=4096, s_max=256, m_i=4096, m_D≈20k, 256
placements) with a constraint-satisfying synthetic fixture
(tokamak_zk_evm_tpu/testing/synthetic.py).  Baseline: the reference Rust
backend's published full-prove wall-clock of 45.698 s on CPU
(BASELINE.md row 1; the CUDA number is 21.082 s).

Prints ONE JSON line on stdout; diagnostics go to stderr.  When
TOKAMAK_BENCH_SCALE is unset the bench runs an auto ladder: it tries the
full shape in a subprocess under a time budget, and on timeout/crash falls
back to mid, then small — so the driver's run always yields *some* number
(VERDICT round-2 item 1c).  Per-op TPU throughput (2^22 MSM, 2^23 biNTT)
is measured alongside and reported in the "detail" field (item 5).

Environment knobs:
  TOKAMAK_BENCH_SCALE=full|mid|small  skip the ladder, run one scale inline
  TOKAMAK_BENCH_VERIFY=1              also verify the proof (not timed)
  TOKAMAK_BENCH_BUDGET_S=N            per-rung subprocess budget (default 2400)
  TOKAMAK_BENCH_PLATFORM=cpu|tpu      force the jax platform (the axon TPU
                                      plugin overrides JAX_PLATFORMS, so plain
                                      env vars do not work; this uses
                                      jax.config directly)
  TOKAMAK_BENCH_PEROP=0               skip the per-op probes
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


BASELINE_CPU_S = 45.698
BASELINE_CUDA_S = 21.082

SHAPES = {
    "full": dict(n=4096, s_max=256, m_i=4096, n_synth_kinds=6, priv_per_synth=2700),
    "mid": dict(n=1024, s_max=64, m_i=1024, n_synth_kinds=4, priv_per_synth=700),
    "small": dict(n=256, s_max=32, m_i=256, n_synth_kinds=2, priv_per_synth=120),
}


def run_ladder():
    """ASCENDING ladder: small -> mid -> full, each in a subprocess, banking
    each rung's JSON line on stdout the moment it lands (the driver takes the
    LAST parseable line, so the largest completed rung wins).  Per-rung
    budgets derive from the remaining clock of TOKAMAK_BENCH_BUDGET_S — under
    a hard external timeout a number is always already banked (VERDICT r03
    weak #1: the descending ladder burned the whole clock on the full rung
    and banked nothing)."""
    budget = float(os.environ.get("TOKAMAK_BENCH_BUDGET_S", "2700"))
    deadline = time.time() + budget
    # caps assume a warm persistent compile cache (.cache/jax); a cold
    # cache pays ~1-3 min of Mosaic compile per distinct MSM shape through
    # the tunnel, which is why the small cap is not tighter
    caps = {"small": 900.0, "mid": 1500.0, "full": None}
    banked = 0
    for scale in ("small", "mid", "full"):
        remaining = deadline - time.time()
        if remaining < 60:
            log(f"[bench] ladder: {remaining:.0f}s left; stopping")
            break
        rung_budget = remaining if caps[scale] is None else min(
            remaining, caps[scale])
        log(f"[bench] ladder: scale={scale} (budget {rung_budget:.0f}s)")
        env = dict(os.environ, TOKAMAK_BENCH_SCALE=scale)
        t0 = time.time()
        try:
            p = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               stdout=subprocess.PIPE, timeout=rung_budget,
                               env=env)
        except subprocess.TimeoutExpired:
            log(f"[bench] ladder: scale={scale} timed out after "
                f"{time.time()-t0:.0f}s")
            break  # larger rungs would only take longer
        except Exception as e:
            log(f"[bench] ladder: scale={scale} failed: {e}")
            break
        out = p.stdout.decode().strip().splitlines()
        line = next((l for l in reversed(out) if l.startswith("{")), None)
        if p.returncode == 0 and line:
            print(line, flush=True)  # bank it NOW
            banked += 1
            log(f"[bench] ladder: scale={scale} banked in {time.time()-t0:.0f}s")
        else:
            log(f"[bench] ladder: scale={scale} rc={p.returncode}; stopping")
            break
    return 0 if banked else 1


def measure_per_op():
    """Per-op TPU throughput probes at the north-star sizes: one 2^22 MSM
    (full pipeline incl. host combine) and one 2^23-point bivariate NTT
    (4096 x 2048 grid), timed after a warm-up run so compile time is
    excluded.  Inputs are random 16-bit limb arrays — the kernels are
    data-oblivious, so throughput matches real CRS points."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tokamak_zk_evm_tpu.ops import msm as msm_mod
    from tokamak_zk_evm_tpu.ops import ntt as ntt_mod

    detail = {}
    rng = np.random.default_rng(5)
    try:
        n = 1 << 22
        sc = jnp.asarray(rng.integers(0, 1 << 16, (16, n), dtype=np.uint32))
        px = jnp.asarray(rng.integers(0, 1 << 16, (24, n), dtype=np.uint32))
        py = jnp.asarray(rng.integers(0, 1 << 16, (24, n), dtype=np.uint32))
        pinf = jnp.zeros((n,), jnp.uint32)
        msm_mod.msm(sc, px, py, pinf)  # warm-up (compile)
        t0 = time.time()
        msm_mod.msm(sc, px, py, pinf)  # msm returns host ints: synchronous
        detail["msm_2p22_s"] = round(time.time() - t0, 3)
        log(f"[bench] per-op: 2^22 MSM = {detail['msm_2p22_s']}s")
    except Exception as e:
        log(f"[bench] per-op MSM probe failed: {e}")

    try:
        X, Y = 4096, 2048  # 2^23 points
        a = jnp.asarray(rng.integers(0, 1 << 16, (16, X, Y), dtype=np.uint32))
        r = ntt_mod.bintt(a)
        jax.block_until_ready(r)
        t0 = time.time()
        r = ntt_mod.bintt(a)
        jax.block_until_ready(r)
        detail["bintt_2p23_s"] = round(time.time() - t0, 3)
        log(f"[bench] per-op: 2^23 biNTT = {detail['bintt_2p23_s']}s")
    except Exception as e:
        log(f"[bench] per-op biNTT probe failed: {e}")
    return detail


def main():
    scale = os.environ.get("TOKAMAK_BENCH_SCALE")
    if scale is None:
        raise SystemExit(run_ladder())

    t_start = time.time()
    # binding-only CRS families (~1.9 GB at full shape) are released after
    # the prover's init so prove2's peak fits HBM
    os.environ.setdefault("TZK_RELEASE_BINDING_FAMILIES", "1")
    _cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "jax")
    os.makedirs(_cache, exist_ok=True)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    platform = os.environ.get("TOKAMAK_BENCH_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
        from jax._src import xla_bridge as _xb

        if _xb.backends_are_initialized():
            from jax.extend.backend import clear_backends

            clear_backends()
    import numpy as np

    from tokamak_zk_evm_tpu.testing.synthetic import build_synthetic
    from tokamak_zk_evm_tpu.models.setup import Tau, generate_sigma
    from tokamak_zk_evm_tpu.models.prover import Prover
    from tokamak_zk_evm_tpu.models.protocol import Mixer
    from tokamak_zk_evm_tpu.utils import timing

    shape = SHAPES[scale]

    log(f"[bench] building synthetic fixture {shape} ...")
    t0 = time.time()
    fx = build_synthetic(**shape, seed=1)
    log(f"[bench] fixture built in {time.time()-t0:.1f}s; "
        f"placements={len(fx.placements)} perm={len(fx.permutation)} params={fx.params}")

    # ---- setup (cached on disk, excluded from the prove measurement) ----
    from tokamak_zk_evm_tpu.io import crs as crs_io

    cache_dir = os.path.join(os.path.dirname(__file__), ".cache",
                             f"crs_{scale}_{shape['n']}_{shape['s_max']}")
    crs_load_s = None
    if os.path.exists(os.path.join(cache_dir, "sigma_meta.json")):
        log(f"[bench] loading cached CRS from {cache_dir}")
        t0 = time.time()
        sigma = crs_io.load_sigma(cache_dir)
        crs_load_s = round(time.time() - t0, 3)
        log(f"[bench] CRS loaded in {crs_load_s}s")
    else:
        log("[bench] generating CRS (fixed tau) ...")
        t0 = time.time()
        sigma = generate_sigma(fx.params, Tau.fixed(), fx.library, fx.infos)
        log(f"[bench] CRS generated in {time.time()-t0:.1f}s")
        try:
            crs_io.save_sigma(sigma, cache_dir)
            log(f"[bench] CRS cached to {cache_dir}")
        except Exception as e:  # cache is best-effort
            log(f"[bench] CRS cache failed: {e}")

    # ---- warm-up prove (compilation; the reference numbers exclude JIT) ----
    warm = os.environ.get("TOKAMAK_BENCH_WARMUP", "1") == "1"
    if warm:
        log("[bench] warm-up prove (compilation) ...")
        t0 = time.time()
        prover = Prover(fx.params, sigma, fx.library, fx.infos, fx.placements,
                        fx.permutation, fx.instance, mixer=Mixer.zero())
        proof, proof4t = prover.prove()
        log(f"[bench] warm-up done in {time.time()-t0:.1f}s")

    # ---- timed prove ----
    log("[bench] timed prove ...")
    timing.reset()
    t0 = time.time()
    prover = Prover(fx.params, sigma, fx.library, fx.infos, fx.placements,
                    fx.permutation, fx.instance, mixer=Mixer.zero())
    proof, proof4t = prover.prove()
    prove_s = time.time() - t0
    log(f"[bench] prove took {prove_s:.3f}s (total script {time.time()-t_start:.0f}s)")
    summ = timing.summarize()
    by_cat = {k: round(v, 3) for k, v in summ["by_category"].items()}
    log(f"[bench] spans by_category: {json.dumps(by_cat)}")
    log(f"[bench] spans by_name: "
        f"{json.dumps({k: round(v, 3) for k, v in summ['by_name'].items()})}")

    if os.environ.get("TOKAMAK_BENCH_VERIFY", "0") == "1":
        from tokamak_zk_evm_tpu.models.preprocess import preprocess
        from tokamak_zk_evm_tpu.models.verifier import Verifier

        pre = preprocess(sigma, fx.permutation, fx.instance, fx.params)
        ok = Verifier(fx.params, sigma, pre, fx.instance, proof,
                      rng=np.random.default_rng(7)).verify_snark()
        log(f"[bench] verify_snark: {ok}")
        if not ok:
            raise SystemExit("proof did not verify")

    detail = {"spans": by_cat}
    if crs_load_s is not None:
        detail["crs_load_s"] = crs_load_s
    if os.environ.get("TOKAMAK_BENCH_PEROP", "1") == "1" and scale != "small":
        detail.update(measure_per_op())

    result = {
        "metric": f"prove_wall_clock_{scale}_shape_n{shape['n']}_smax{shape['s_max']}",
        "value": round(prove_s, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_CPU_S / prove_s, 3) if scale == "full" else 0.0,
        "detail": detail,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
