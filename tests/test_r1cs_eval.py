"""Compiled-R1CS evaluator vs the WASM calculators: bit-exact on random
inputs for every subcircuit that compiles (frontend/r1cs_eval.py)."""

import os
import random

import pytest

from tokamak_zk_evm_tpu.frontend.r1cs_eval import (
    UncompilableR1CS, compile_subcircuit)
from tokamak_zk_evm_tpu.frontend.witness_calculator import (
    SubcircuitCalculators)
from tokamak_zk_evm_tpu.io.artifacts import load_library
from tokamak_zk_evm_tpu.testing.real_fixture import REFERENCE_LIBRARY

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_LIBRARY), reason="no subcircuit library")

L128 = (1 << 128) - 1

# circuits the binding layer relies on MUST compile (witnesses through the
# fast path); others may legitimately fall back to WASM
REQUIRED = {"Poseidon", "VerifyMerkleProof", "JubjubExpBatch", "DecToBit",
            "EdDsaVerify"}

# structured inputs keep check-only constraints satisfiable (EdDsaVerify /
# VerifyMerkleProof verify real relations, so random inputs break their
# pure checks — compare only the computable circuits there)
RANDOM_OK = {"Poseidon", "DecToBit", "Accumulator", "bufferPubOut",
             "bufferPubIn", "bufferBlockIn", "bufferEVMIn", "bufferPrvIn",
             "JubjubExpBatch"}


def test_compiled_matches_wasm_on_random_inputs():
    params, infos, r1cs = load_library(REFERENCE_LIBRARY)
    calcs = SubcircuitCalculators(REFERENCE_LIBRARY)
    rng = random.Random(11)
    compiled_names = set()
    for info in infos:
        try:
            ce = compile_subcircuit(r1cs[info.id], info)
        except UncompilableR1CS:
            continue
        compiled_names.add(info.name)
        if info.name not in RANDOM_OK:
            continue
        ic = info.In_idx[1]
        for trial in range(2):
            if info.name == "Poseidon":
                ins = [1 << rng.randrange(6)] + [
                    rng.randrange(1 << 128) for _ in range(ic - 1)]
            elif info.name == "JubjubExpBatch":
                # identity points + bit scalars: valid curve inputs
                ins = [0, 0, 1, 0, 0, 0, 1, 0] + [
                    rng.randrange(2) for _ in range(ic - 8)]
            else:
                ins = [rng.randrange(1 << 128) for _ in range(ic)]
            got = ce.evaluate(ins)
            want = calcs.get(info.id).calculate_witness({"in": ins})
            assert got == want, f"{info.name} trial {trial}"
    assert REQUIRED <= compiled_names, compiled_names


def test_vmp_compiled_matches_wasm_on_real_path():
    from tokamak_zk_evm_tpu.frontend.merkle import PoseidonSMT
    from tokamak_zk_evm_tpu.frontend.witness_calculator import (
        poseidon2_from_calcs)

    params, infos, r1cs = load_library(REFERENCE_LIBRARY)
    calcs = SubcircuitCalculators(REFERENCE_LIBRARY)
    pos = next(i for i in infos if i.name == "Poseidon")
    vmp = next(i for i in infos if i.name == "VerifyMerkleProof")
    pose2 = poseidon2_from_calcs(calcs, pos)
    t = PoseidonSMT.from_storage(pose2, {3: 99}, depth=6)
    sibs = t.proof(3)
    parent = t.root()
    ins = [32, 3, 0, 99, 0]
    for s in sibs:
        ins += [s & L128, s >> 128]
    ins += [0, 0, parent & L128, parent >> 128]
    ce = compile_subcircuit(r1cs[vmp.id], vmp)
    got = ce.evaluate(ins)
    want = calcs.get(vmp.id).calculate_witness({"in": ins})
    assert got == want
