"""Golden proof bytes: the offline analog of the reference's
check-prover-fixture.ts (backend-wasm/test/checks/), which pins a browser
proof against a native proof byte for byte.

With a fixed tau, a zero mixer, and the deterministic small fixture, the
entire prove pipeline — witness build, NTT/MSM kernels, Fiat-Shamir
transcript, Solidity split-limb serialization — must reproduce the exact
same proof.json content.  Any cross-round regression in transcript layout,
encode order, or field/limb encoding breaks this test instead of a bench.

If a protocol-level change legitimately alters the proof, regenerate with:
    python -m pytest tests/test_golden_proof.py -x -q --golden-update
(or run the body below by hand) and commit the new digest with the change
that explains it.
"""

import hashlib
import json

import numpy as np

from tokamak_zk_evm_tpu.io import artifacts
from tokamak_zk_evm_tpu.models.preprocess import preprocess
from tokamak_zk_evm_tpu.models.protocol import Mixer
from tokamak_zk_evm_tpu.models.prover import Prover
from tokamak_zk_evm_tpu.models.setup import Tau, generate_sigma
from tokamak_zk_evm_tpu.models.verifier import Verifier
from tokamak_zk_evm_tpu.testing.fixtures import build_fixture

GOLDEN_SHA256 = (
    "1e12b801f425aef040d3957a95f391e65212c044586b93ad1a90495daeccf4ca")


def canonical_proof_bytes(proof) -> bytes:
    d = artifacts.proof_to_solidity(proof)
    return json.dumps(d, sort_keys=True, separators=(",", ":")).encode()


def test_golden_proof_bytes():
    fx = build_fixture()
    sigma = generate_sigma(fx.params, Tau.fixed(), fx.library, fx.infos)
    prover = Prover(fx.params, sigma, fx.library, fx.infos, fx.placements,
                    fx.permutation, fx.instance, mixer=Mixer.zero())
    proof, _ = prover.prove()
    pre = preprocess(sigma, fx.permutation, fx.instance, fx.params)
    assert Verifier(fx.params, sigma, pre, fx.instance, proof,
                    rng=np.random.default_rng(7)).verify_snark()
    digest = hashlib.sha256(canonical_proof_bytes(proof)).hexdigest()
    assert GOLDEN_SHA256 is not None, (
        f"golden digest unset; generated digest is {digest}")
    assert digest == GOLDEN_SHA256, (
        f"proof bytes changed: {digest} != {GOLDEN_SHA256} — if a protocol "
        "change explains this, update GOLDEN_SHA256 in the same commit")
