"""Debug the synthesized-transfer verification failure (VERDICT r03 weak #4).

Runs the exact pipeline of tests/test_synthesizer.py::
test_prove_verify_synthesized_transfer but with testing-mode proof output and
the decomposed verifier checks, to isolate which claim breaks.
"""

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

import numpy as np

from tests.test_synthesizer import (  # noqa: E402
    TRANSFER, SENDER, RECIPIENT, CONTRACT, asm, _slot_key, _transfer_calldata,
)
from tokamak_zk_evm_tpu.testing.real_fixture import REFERENCE_LIBRARY
from tokamak_zk_evm_tpu.frontend.synthesizer import Synthesizer, TxEnv
from tokamak_zk_evm_tpu.models.preprocess import preprocess
from tokamak_zk_evm_tpu.models.protocol import Mixer
from tokamak_zk_evm_tpu.models.prover import Prover
from tokamak_zk_evm_tpu.models.setup import Tau, generate_sigma
from tokamak_zk_evm_tpu.models.verifier import Verifier


def main():
    code = asm(TRANSFER)
    key_s, key_r = _slot_key(SENDER, 0), _slot_key(RECIPIENT, 0)
    storage = {key_s: 1000, key_r: 7}
    env = TxEnv(caller=SENDER, address=CONTRACT,
                calldata=_transfer_calldata(RECIPIENT, 250))
    syn = Synthesizer(REFERENCE_LIBRARY, s_max=16)
    res = syn.run(code, env, storage)
    print("placements:", len(res.placements), "perm:", len(res.permutation),
          flush=True)

    from tokamak_zk_evm_tpu.io import crs as crs_io
    cache = ".cache/crs_reallib_smax16"
    if os.path.exists(os.path.join(cache, "sigma_meta.json")):
        sigma = crs_io.load_sigma(cache)
        print("sigma loaded from cache", flush=True)
    else:
        sigma = generate_sigma(res.params, Tau.fixed(), res.library, res.infos)
        crs_io.save_sigma(sigma, cache)
        print("sigma generated + cached", flush=True)
    pre = preprocess(sigma, res.permutation, res.instance, res.params)
    prover = Prover(
        res.params, sigma, res.library, res.infos, res.placements,
        res.permutation, res.instance,
        mixer=Mixer.random(np.random.default_rng(13)),
    )
    proof, proof4t = prover.prove()
    v = Verifier(res.params, sigma, pre, res.instance, proof,
                 rng=np.random.default_rng(21))
    for name in ("verify_arith", "verify_copy", "verify_binding"):
        try:
            print(name, ":", getattr(v, name)(proof4t))
        except Exception as e:
            print(name, ": raised", e)
    print("verify_snark:", v.verify_snark())


if __name__ == "__main__":
    main()
