"""Enumerate every MSM point-count the prover emits at a given bench scale.

Monkeypatches ops.msm.msm with a stub that records the padded point count
(and the raw N) and returns the generator, then runs the full prove on CPU.
Shapes are structural (degrees are resized to fixed grid sizes), so the set
collected here is exactly what the TPU run will emit for the same fixture.

    JAX_PLATFORMS=cpu python scripts/collect_msm_shapes.py mid
"""

import json
import os
import sys

sys.path.insert(0, ".")
# force CPU: the axon plugin overrides the env var at interpreter
# start (see tests/conftest.py) — must use jax.config directly
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge as _xb

if _xb.backends_are_initialized():
    from jax.extend.backend import clear_backends

    clear_backends()
assert jax.devices()[0].platform == "cpu", jax.devices()

SHAPES = {
    "full": dict(n=4096, s_max=256, m_i=4096, n_synth_kinds=6, priv_per_synth=2700),
    "mid": dict(n=1024, s_max=64, m_i=1024, n_synth_kinds=4, priv_per_synth=700),
    "small": dict(n=256, s_max=32, m_i=256, n_synth_kinds=2, priv_per_synth=120),
}


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "mid"
    shape = SHAPES[scale]

    from tokamak_zk_evm_tpu.ops import msm as msm_mod
    from tokamak_zk_evm_tpu.host.curve import G1

    seen = []

    def stub_msm(scalars, px, py, pinf):
        N = px.shape[1]
        seen.append(int(N))
        print(f"[shapes] msm N={N}", file=sys.stderr, flush=True)
        return G1.gen

    msm_mod.msm = stub_msm
    # prover imports `msm_mod` as module and calls msm_mod.msm -> patched.

    from tokamak_zk_evm_tpu.testing.synthetic import build_synthetic
    from tokamak_zk_evm_tpu.models.setup import Tau, generate_sigma
    from tokamak_zk_evm_tpu.models.prover import Prover
    from tokamak_zk_evm_tpu.models.protocol import Mixer

    fx = build_synthetic(**shape, seed=1)
    sigma = generate_sigma(fx.params, Tau.fixed(), fx.library, fx.infos)
    prover = Prover(fx.params, sigma, fx.library, fx.infos, fx.placements,
                    fx.permutation, fx.instance, mixer=Mixer.zero())
    prover.prove()
    out = {"scale": scale, "counts": sorted(set(seen)), "all": seen}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
