"""Enumerate every MSM point-count the prover emits at a given bench scale.

Monkeypatches ops.msm.{msm,msm_start,msm_finish} with stubs that record the
raw point count and return the generator, then runs the full prove on CPU.
Shapes are structural (degrees resize to fixed grid sizes), so the set
collected here is exactly what the TPU run will emit for the same fixture.

    python scripts/collect_msm_shapes.py full|mid|small
"""

import json
import os
import sys

sys.path.insert(0, ".")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge as _xb

if _xb.backends_are_initialized():
    from jax.extend.backend import clear_backends

    clear_backends()
assert jax.devices()[0].platform == "cpu", jax.devices()


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "mid"

    from tokamak_zk_evm_tpu.ops import msm as msm_mod
    from tokamak_zk_evm_tpu.host.curve import G1

    seen = []

    def record(px):
        N = int(px.shape[1])
        seen.append(N)
        print(f"[shapes] msm N={N}", file=sys.stderr, flush=True)

    def stub_msm(scalars, px, py, pinf):
        record(px)
        return G1.gen

    def stub_start(scalars, px, py, pinf):
        record(px)
        return ("stub", None)

    def stub_finish(handle):
        return G1.gen

    msm_mod.msm = stub_msm
    msm_mod.msm_start = stub_start
    msm_mod.msm_finish = stub_finish
    # prover imports `msm_mod` as a module and calls through it -> patched.

    from tokamak_zk_evm_tpu.models.setup import Tau, generate_sigma
    from tokamak_zk_evm_tpu.models.prover import Prover
    from tokamak_zk_evm_tpu.models.protocol import Mixer

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    fx = bench.build_shape(scale)
    shape = bench.SHAPES[scale]
    cache_dir = os.path.join(
        bench._REPO, ".cache",
        f"crs_{scale}_{shape['kind']}_{shape['n']}_{shape['s_max']}")
    if os.path.exists(os.path.join(cache_dir, "sigma_meta.json")):
        from tokamak_zk_evm_tpu.io import crs as crs_io

        sigma = crs_io.load_sigma(cache_dir)
    else:
        sigma = generate_sigma(fx.params, Tau.fixed(), fx.library, fx.infos)
    prover = Prover(fx.params, sigma, fx.library, fx.infos, fx.placements,
                    fx.permutation, fx.instance, mixer=Mixer.zero())
    prover.prove()

    def pad(N):
        return max(2, 1 << (N - 1).bit_length())

    out = {
        "scale": scale,
        "counts": sorted(set(seen)),
        "padded": sorted({pad(N) for N in seen}),
        "all": seen,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
