"""Headline benchmark: full prove at the reference workload shape.

The FULL rung runs the REAL shipped subcircuit library shape — n=4096,
s_max=256, l=728, s_D=14, m_D=26591 (`qap-compiler/subcircuits/library/
setupParams.json`), 256 placements with exact WASM witnesses and a
cross-placement copy web (testing/real_fixture.py) — the same circuit
family the reference's 45.698 s CPU / 21.082 s CUDA numbers are measured
on (BASELINE.md).  mid/small rungs use the synthetic fixture for fast
laddering.

Prints ONE JSON line on stdout per completed rung; diagnostics on stderr.
Ladder order: when `.cache/full_warm` matches the current code state (the
builder ran a full warm-up in-round, so the persistent compile cache holds
the full rung's executables), FULL RUNS FIRST — the headline number banks
before any budget is spent on smaller rungs (VERDICT r04 weak #1).
Otherwise ascending small -> mid -> full so *some* number always banks.

Environment knobs:
  TOKAMAK_BENCH_SCALE=full|mid|small  skip the ladder, run one scale inline
  TOKAMAK_BENCH_VERIFY=1              also verify the proof (not timed)
  TOKAMAK_BENCH_BUDGET_S=N            total budget (default 2700)
  TOKAMAK_BENCH_PLATFORM=cpu|tpu      force the jax platform (the axon TPU
                                      plugin overrides JAX_PLATFORMS; this
                                      uses jax.config directly)
  TOKAMAK_BENCH_PEROP=0               skip the per-op probes
  TOKAMAK_BENCH_WARMUP=0              skip the untimed warm-up prove
"""

from __future__ import annotations

import hashlib
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
    "full": dict(kind="real", n=4096, s_max=256),
    "mid": dict(kind="synthetic", n=1024, s_max=64, m_i=1024,
                n_synth_kinds=4, priv_per_synth=700),
    "small": dict(kind="synthetic", n=256, s_max=32, m_i=256,
                  n_synth_kinds=2, priv_per_synth=120),
}

_REPO = os.path.dirname(os.path.abspath(__file__))
WARM_MARKER = os.path.join(_REPO, ".cache", "full_warm")


def code_state_digest() -> str:
    """Digest of the COMPUTE-PATH sources only: the set of modules whose
    edits change compiled XLA executables.  Frontend/synthesizer/test edits
    do not invalidate the warm marker — the full rung's cached executables
    stay valid across them."""
    h = hashlib.sha256()
    pkg = os.path.join(_REPO, "tokamak_zk_evm_tpu")
    roots = [os.path.join(pkg, d) for d in
             ("ops", "backend", "parallel", "models", "utils")]
    files = [os.path.join(pkg, "fields.py")]
    for root in roots:
        for dirpath, _, fs in sorted(os.walk(root)):
            files += [os.path.join(dirpath, f) for f in sorted(fs)
                      if f.endswith(".py")]
    for p in files:
        h.update(p.encode())
        try:
            with open(p, "rb") as fh:
                h.update(fh.read())
        except OSError:
            pass
    return h.hexdigest()[:16]


def full_is_warm() -> bool:
    try:
        with open(WARM_MARKER) as f:
            return f.read().strip() == code_state_digest()
    except OSError:
        return False


def mark_full_warm():
    os.makedirs(os.path.dirname(WARM_MARKER), exist_ok=True)
    with open(WARM_MARKER, "w") as f:
        f.write(code_state_digest())


def run_ladder():
    """Bank each completed rung's JSON line immediately (the driver takes
    the LAST parseable line, so the best completed rung wins: ladder order
    puts the most valuable rung first when its caches are warm)."""
    budget = float(os.environ.get("TOKAMAK_BENCH_BUDGET_S", "2700"))
    deadline = time.time() + budget
    if full_is_warm():
        order = ("full", "mid", "small")
        caps = {"full": None, "mid": 900.0, "small": 600.0}
        log("[bench] ladder: full rung is WARM -> running full first")
    else:
        order = ("small", "mid", "full")
        caps = {"small": 900.0, "mid": 1500.0, "full": None}
        log("[bench] ladder: no warm marker -> ascending")
    banked = 0
    for scale in order:
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
            continue  # smaller rungs may still fit the remaining budget
        except Exception as e:
            log(f"[bench] ladder: scale={scale} failed: {e}")
            continue
        out = p.stdout.decode().strip().splitlines()
        line = next((l for l in reversed(out) if l.startswith("{")), None)
        if p.returncode == 0 and line:
            print(line, flush=True)  # bank it NOW
            banked += 1
            log(f"[bench] ladder: scale={scale} banked in {time.time()-t0:.0f}s")
            if scale == "full":
                break  # headline banked; smaller rungs add nothing
        else:
            log(f"[bench] ladder: scale={scale} rc={p.returncode}")
    return 0 if banked else 1


def measure_per_op():
    """Per-op TPU throughput at the north-star sizes: one 2^22 MSM (full
    pipeline incl. host combine) and one 2^23-point bivariate NTT, timed
    after a warm-up run.  Inputs are random 16-bit limb arrays — the
    kernels are data-oblivious, so throughput matches real CRS points."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tokamak_zk_evm_tpu.ops import msm as msm_mod
    from tokamak_zk_evm_tpu.ops import ntt as ntt_mod

    detail = {}
    scaling = {}
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
        scaling["msm_2p22_points_per_s"] = round(n / detail["msm_2p22_s"])
        log(f"[bench] per-op: 2^22 MSM = {detail['msm_2p22_s']}s "
            f"({scaling['msm_2p22_points_per_s']:.3g} pts/s)")
    except Exception as e:
        log(f"[bench] per-op MSM probe failed: {e}")

    try:
        X, Y = 4096, 2048  # 2^23 points
        a = jnp.asarray(rng.integers(0, 1 << 16, (16, X, Y), dtype=np.uint32))
        r = ntt_mod.bintt(a)
        np.asarray(jnp.ravel(r)[:1])  # host-pull sync (tunnel-safe)
        t0 = time.time()
        r = ntt_mod.bintt(a)
        np.asarray(jnp.ravel(r)[:1])
        detail["bintt_2p23_s"] = round(time.time() - t0, 3)
        # radix-2 along both axes: N/2 * log2(N) butterflies
        bf = (X * Y // 2) * 23
        scaling["bintt_2p23_butterflies_per_s"] = round(
            bf / detail["bintt_2p23_s"])
        log(f"[bench] per-op: 2^23 biNTT = {detail['bintt_2p23_s']}s")
    except Exception as e:
        log(f"[bench] per-op biNTT probe failed: {e}")

    # mesh-scaling efficiency table (1/2/4/8 virtual devices, refreshed by
    # scripts/scaling_report.py; included so the driver artifact carries the
    # scaling story, BASELINE.md north-star reporting)
    try:
        with open(os.path.join(_REPO, "scaling_report.json")) as f:
            scaling["mesh_efficiency"] = json.load(f)
    except OSError:
        pass
    if scaling:
        detail["scaling"] = scaling
    return detail


def build_shape(scale):
    shape = SHAPES[scale]
    if shape["kind"] == "real":
        import pickle

        from tokamak_zk_evm_tpu.testing.real_fixture import (
            build_real_tx_fixture)

        # the 256 exact WASM witnesses take minutes to compute; cache the
        # built fixture (deterministic: seeded PRNG + shipped library)
        cpath = os.path.join(
            _REPO, ".cache", f"fixture_real_{shape['s_max']}.pkl")
        if os.path.exists(cpath):
            with open(cpath, "rb") as f:
                return pickle.load(f)
        fx = build_real_tx_fixture(s_max=shape["s_max"])
        try:
            os.makedirs(os.path.dirname(cpath), exist_ok=True)
            with open(cpath, "wb") as f:
                pickle.dump(fx, f)
        except OSError as e:
            log(f"[bench] fixture cache failed: {e}")
        return fx
    from tokamak_zk_evm_tpu.testing.synthetic import build_synthetic

    args = {k: v for k, v in shape.items() if k != "kind"}
    return build_synthetic(**args, seed=1)


def main():
    scale = os.environ.get("TOKAMAK_BENCH_SCALE")
    if scale is None:
        raise SystemExit(run_ladder())

    t_start = time.time()
    # binding-only CRS families (~2 GB at full shape) are released after
    # the prover's init so prove2's peak fits HBM
    os.environ.setdefault("TZK_RELEASE_BINDING_FAMILIES", "1")
    _cache = os.path.join(_REPO, ".cache", "jax")
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

    from tokamak_zk_evm_tpu.models.setup import Tau, generate_sigma
    from tokamak_zk_evm_tpu.models.prover import Prover
    from tokamak_zk_evm_tpu.models.protocol import Mixer
    from tokamak_zk_evm_tpu.utils import timing

    shape = SHAPES[scale]
    log(f"[bench] building {shape['kind']} fixture for scale={scale} ...")
    t0 = time.time()
    fx = build_shape(scale)
    log(f"[bench] fixture built in {time.time()-t0:.1f}s; "
        f"placements={len(fx.placements)} perm={len(fx.permutation)} "
        f"params={fx.params}")

    # ---- setup (cached on disk, excluded from the prove measurement) ----
    from tokamak_zk_evm_tpu.io import crs as crs_io

    cache_dir = os.path.join(
        _REPO, ".cache",
        f"crs_{scale}_{shape['kind']}_{shape['n']}_{shape['s_max']}")
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
    if scale == "full":
        mark_full_warm()

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

    lib = "real_library" if shape["kind"] == "real" else "synthetic"
    result = {
        "metric": f"prove_wall_clock_{scale}_{lib}_n{shape['n']}_smax{shape['s_max']}",
        "value": round(prove_s, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_CPU_S / prove_s, 3) if scale == "full" else 0.0,
        "detail": detail,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
