"""In-round testing-mode asserts + proof4_test pipeline.

Mirrors the reference's `--features testing-mode` harness: runtime identity
asserts inside the prover rounds (`prove/src/lib.rs:1473-1546, 1864-1920,
2591-2606`), `proof4_test.json` emission (`prove/src/main.rs:83-90`), and the
verifier's decomposed arith/copy/binding checks consuming it
(`verify-rust/src/lib.rs:291-352`).
"""

import copy
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tokamak_zk_evm_tpu.io import artifacts as art
from tokamak_zk_evm_tpu.models.preprocess import preprocess
from tokamak_zk_evm_tpu.models.protocol import Mixer, Placement
from tokamak_zk_evm_tpu.models.prover import Prover
from tokamak_zk_evm_tpu.models.setup import Tau, generate_sigma
from tokamak_zk_evm_tpu.models.verifier import Verifier
from tokamak_zk_evm_tpu.testing.fixtures import build_fixture


@pytest.fixture(scope="module")
def ctx():
    fx = build_fixture()
    sigma = generate_sigma(fx.params, Tau.fixed(), fx.library, fx.infos)
    return fx, sigma


def test_testing_mode_prove_passes(ctx):
    fx, sigma = ctx
    prover = Prover(
        fx.params, sigma, fx.library, fx.infos, fx.placements,
        fx.permutation, fx.instance,
        mixer=Mixer.random(np.random.default_rng(2)), testing_mode=True,
    )
    proof, p4t = prover.prove()
    pre = preprocess(sigma, fx.permutation, fx.instance, fx.params)
    v = Verifier(fx.params, sigma, pre, fx.instance, proof,
                 rng=np.random.default_rng(4))
    assert v.verify_snark()
    assert v.verify_arith(p4t)
    assert v.verify_copy(p4t)
    assert v.verify_binding(p4t)


def test_testing_mode_catches_bad_witness(ctx):
    fx, sigma = ctx
    placements = [Placement(p.subcircuit_id, list(p.variables))
                  for p in fx.placements]
    placements[2].variables[1] += 1  # break the mul2 output
    prover = Prover(
        fx.params, sigma, fx.library, fx.infos, placements,
        fx.permutation, fx.instance, mixer=Mixer.zero(), testing_mode=True,
    )
    with pytest.raises(AssertionError, match="R1CS"):
        prover.prove0()


def test_proof4test_json_roundtrip(tmp_path, ctx):
    fx, sigma = ctx
    prover = Prover(
        fx.params, sigma, fx.library, fx.infos, fx.placements,
        fx.permutation, fx.instance, mixer=Mixer.zero(), testing_mode=True,
    )
    _, p4t = prover.prove()
    path = str(tmp_path / "proof4_test.json")
    art.save_proof4test(p4t, path)
    got = art.load_proof4test(path)
    for name in art._P4T_FIELDS:
        assert getattr(got, name) == getattr(p4t, name), name
    # hex fields follow the 0x-prefixed 96-nibble convention
    d = json.load(open(path))
    assert all(len(v["x"]) == 98 for v in d.values())


def test_decomposed_checks_reject_tampered_p4t(ctx):
    fx, sigma = ctx
    prover = Prover(
        fx.params, sigma, fx.library, fx.infos, fx.placements,
        fx.permutation, fx.instance, mixer=Mixer.zero(), testing_mode=True,
    )
    proof, p4t = prover.prove()
    pre = preprocess(sigma, fx.permutation, fx.instance, fx.params)
    v = Verifier(fx.params, sigma, pre, fx.instance, proof,
                 rng=np.random.default_rng(4))
    bad = copy.replace(p4t, Pi_AX=p4t.Pi_AY) if hasattr(copy, "replace") else None
    if bad is None:
        import dataclasses

        bad = dataclasses.replace(p4t, Pi_AX=p4t.Pi_AY)
    assert not v.verify_arith(bad)
