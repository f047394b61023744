"""Statement-binding tests: storage Merkle chains, EdDSA sender auth,
keccak preimage commitment (VERDICT r04 missing #3).

The key property: a tampered storage value / constant breaks the proof.
Tampering is exercised at the R1CS layer — the VerifyMerkleProof placement
witness with a flipped leaf no longer satisfies its constraint system, and
a flipped bufferPrvIn value breaks the copy web with the placement wire."""

import os

import pytest

from tokamak_zk_evm_tpu.frontend.merkle import (
    MT_DEPTH, TREE_SIZE, PoseidonSMT, memoized_pose2)
from tokamak_zk_evm_tpu.frontend.synthesizer import (
    AccountState, EdDsaAuth, Synthesizer, SynthesisError, TxEnv)
from tokamak_zk_evm_tpu.testing.real_fixture import (
    REFERENCE_LIBRARY, check_r1cs_satisfaction)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_LIBRARY), reason="no subcircuit library")

CONTRACT = 0xC04EC04EC04EC04EC04EC04EC04EC04EC04EC04E
CALLER = 0xCA11E4CA11E4CA11E4CA11E4CA11E4CA11E4CA11


def asm(*ops):
    NAMES = {"PUSH0": 0x5F, "PUSH1": 0x60, "PUSH2": 0x61, "SLOAD": 0x54,
             "SSTORE": 0x55, "ADD": 0x01, "STOP": 0x00, "CALLER": 0x33}
    out = bytearray()
    for op in ops:
        out.append(NAMES[op[0]])
        out.extend(op[1:])
    return bytes(out)


def _syn(s_max=128):
    return Synthesizer(REFERENCE_LIBRARY, s_max=s_max)


def test_merkle_tree_roundtrip():
    syn = _syn()
    t = PoseidonSMT.from_storage(syn._pose2, {5: 77, 9: 3})
    assert t.leaf(5) == 77
    # key congruence: leaves index mod 2^36 (reference MAX_MT_LEAVES)
    t.set((TREE_SIZE + 5) % TREE_SIZE, 8)
    assert t.leaf(5) == 8
    t.set(5, 77)
    proof = t.proof(5)
    assert len(proof) == MT_DEPTH
    assert t.verify(5, 77, proof)
    assert not t.verify(5, 78, proof)
    r0 = t.root()
    t.set(5, 78)
    assert t.root() != r0
    assert t.verify(5, 78, t.proof(5))


def test_sload_emits_merkle_chain_and_tamper_fails():
    code = asm(("PUSH1", 5), ("SLOAD",), ("PUSH1", 5), ("SSTORE",),
               ("STOP",))
    syn = _syn()
    env = TxEnv(caller=CALLER, address=CONTRACT)
    res = syn.run(code, env, {5: 1234}, max_steps=1000)
    vmp_id = syn.by_name["VerifyMerkleProof"].id
    vmps = [p for p in res.placements if p.subcircuit_id == vmp_id]
    # SLOAD: 6-placement chain; SSTORE: old-value chain + new-value chain
    assert len(vmps) == 18
    # initial root is public (bufferPubIn -> a_pub_user tail)
    ini_root = syn._mroots[CONTRACT][0].value
    pub_in = res.instance.a_pub_user[
        res.params.l_user_out:res.params.l_user]
    assert (ini_root & ((1 << 128) - 1)) in pub_in
    # all placements satisfy their R1CS...
    for p in vmps:
        assert check_r1cs_satisfaction(syn.library[p.subcircuit_id],
                                       p.variables)
    # ...and a tampered leaf value breaks the first chain's R1CS
    bad = list(vmps[0].variables)
    info = syn.by_name["VerifyMerkleProof"]
    child_lo_wire = info.In_idx[0] + 3  # [sel, idx.lo, idx.hi, child.lo, ..]
    bad[child_lo_wire] = (bad[child_lo_wire] + 1) % (1 << 128)
    assert not check_r1cs_satisfaction(syn.library[vmp_id], bad)


def test_sstore_final_root_is_public_and_matches():
    code = asm(("PUSH1", 9), ("PUSH1", 2), ("SSTORE",), ("STOP",))
    syn = _syn()
    env = TxEnv(caller=CALLER, address=CONTRACT)
    res = syn.run(code, env, {}, max_steps=1000)
    tree = syn._mtrees[CONTRACT]
    assert tree.leaf(2) == 9
    res_root = tree.root()
    outs = res.instance.a_pub_user[:res.params.l_user_out]
    assert (res_root & ((1 << 128) - 1)) in outs


def test_storage_tree_mismatch_rejected():
    # a prover claiming a different SLOAD value than the snapshot tree
    # holds must fail synthesis (the reference's 'Mismatch in storage
    # values' guard, instructionHandler.ts:520)
    from tokamak_zk_evm_tpu.frontend.synthesizer import DataPt

    syn = _syn()
    syn.world = {CONTRACT: AccountState(storage={5: 10})}
    syn._mtree(CONTRACT)
    syn._mtrees[CONTRACT].set(5, 999)  # desync tree vs claimed value
    with pytest.raises(SynthesisError):
        syn._storage_load(CONTRACT, DataPt(5), 10)


def test_eddsa_auth_verifies_shipped_signature():
    import json

    from tokamak_zk_evm_tpu.frontend.snapshot import (
        build_auth, load_snapshot_input, poseidon2_fn,
        sender_address_from_pubkey, _hb)

    ex = ("/root/reference/packages/frontend/synthesizer/examples/"
          "L2StateChannel")
    if not os.path.isdir(ex):
        pytest.skip("no shipped example")
    inp = load_snapshot_input(ex)
    auth = build_auth(inp)
    pose2 = poseidon2_fn(REFERENCE_LIBRARY)
    caller = sender_address_from_pubkey(
        _hb(inp.transaction["senderPubKey"]), pose2)
    syn = _syn(s_max=64)
    origin = syn._place_eddsa_auth(auth)
    assert origin.value == caller
    by_id = {}
    for p in syn.placements[5:]:
        by_id[p.subcircuit_id] = by_id.get(p.subcircuit_id, 0) + 1
    names = {syn.by_name[n].id: n for n in
             ("DecToBit", "JubjubExpBatch", "EdDsaVerify", "Poseidon")}
    counts = {names[k]: v for k, v in by_id.items() if k in names}
    assert counts["DecToBit"] == 2
    assert counts["JubjubExpBatch"] == 4
    assert counts["EdDsaVerify"] == 1
    for p in syn.placements[5:]:
        assert check_r1cs_satisfaction(syn.library[p.subcircuit_id],
                                       p.variables)


def test_eddsa_wrong_signature_rejected():
    from tokamak_zk_evm_tpu.frontend.snapshot import (
        build_auth, load_snapshot_input)

    ex = ("/root/reference/packages/frontend/synthesizer/examples/"
          "L2StateChannel")
    if not os.path.isdir(ex):
        pytest.skip("no shipped example")
    auth = build_auth(load_snapshot_input(ex))
    bad = EdDsaAuth(pubkey=auth.pubkey, randomizer=auth.randomizer,
                    s=auth.s + 1, msg_words=auth.msg_words)
    syn = _syn(s_max=64)
    with pytest.raises(Exception):
        syn._place_eddsa_auth(bad)


def test_keccak_mode_binds_preimage_commitment():
    # keccak mode: the preimage words get a public Poseidon commitment
    code = bytes([
        0x60, 0x11, 0x5F, 0x52,        # MSTORE(0, 0x11)
        0x60, 0x20, 0x5F, 0x20,        # KECCAK256(0, 32)
        0x5F, 0x55,                    # SSTORE(0, hash)
        0x00,
    ])
    syn = Synthesizer(REFERENCE_LIBRARY, s_max=64, hash_mode="keccak",
                      storage_binding=False)
    env = TxEnv(caller=CALLER, address=CONTRACT)
    res = syn.run(code, env, {}, max_steps=1000)
    pos_id = syn.by_name["Poseidon"].id
    assert any(p.subcircuit_id == pos_id for p in res.placements)
    # commitment surfaces in the public outputs
    from tokamak_zk_evm_tpu.frontend.witness_calculator import (
        poseidon2_from_calcs)
    pose2 = poseidon2_from_calcs(syn.calcs, syn.by_name["Poseidon"])
    commit = pose2(0x11, 0)
    outs = res.instance.a_pub_user[:res.params.l_user_out]
    assert (commit & ((1 << 128) - 1)) in outs


@pytest.mark.slow
def test_prove_verify_bound_synthesis():
    """Full prove+verify of a synthesis carrying the new statement
    bindings: nonzero bufferPubIn (INI_MERKLE_ROOT + EDDSA_SIGNATURE),
    VerifyMerkleProof chains, and the EdDSA sender-auth placements — the
    canonical-column instance binding must hold with a nonzero public
    user-input region."""
    import numpy as np

    from tokamak_zk_evm_tpu.frontend.snapshot import (
        build_auth, load_snapshot_input, poseidon2_fn,
        sender_address_from_pubkey, _hb)
    from tokamak_zk_evm_tpu.models.preprocess import preprocess
    from tokamak_zk_evm_tpu.models.protocol import Mixer
    from tokamak_zk_evm_tpu.models.prover import Prover
    from tokamak_zk_evm_tpu.models.setup import Tau, generate_sigma
    from tokamak_zk_evm_tpu.models.verifier import Verifier

    ex = ("/root/reference/packages/frontend/synthesizer/examples/"
          "L2StateChannel")
    if not os.path.isdir(ex):
        pytest.skip("no shipped example")
    inp = load_snapshot_input(ex)
    auth = build_auth(inp)
    pose2 = poseidon2_fn(REFERENCE_LIBRARY)
    caller = sender_address_from_pubkey(
        _hb(inp.transaction["senderPubKey"]), pose2)
    # one SLOAD + one SSTORE on a tiny contract, sender EdDSA-verified
    code = asm(("PUSH1", 5), ("SLOAD",), ("PUSH1", 5), ("SSTORE",),
               ("STOP",))
    syn = _syn(s_max=64)
    env = TxEnv(caller=caller, address=CONTRACT)
    world = {CONTRACT: AccountState(code=code, storage={5: 42})}
    res = syn.run_tx(env, world, max_steps=1000, auth=auth)
    assert not res.reverted
    names = {syn.by_name[n].id for n in ("VerifyMerkleProof", "EdDsaVerify")}
    assert names <= {p.subcircuit_id for p in res.placements}
    # nonzero public user-input region
    pubin = res.instance.a_pub_user[res.params.l_user_out:]
    assert any(v != 0 for v in pubin)

    sigma = generate_sigma(res.params, Tau.fixed(), res.library, res.infos)
    pre = preprocess(sigma, res.permutation, res.instance, res.params)
    prover = Prover(res.params, sigma, res.library, res.infos,
                    res.placements, res.permutation, res.instance,
                    mixer=Mixer.random(np.random.default_rng(3)))
    proof, _ = prover.prove()
    v = Verifier(res.params, sigma, pre, res.instance, proof,
                 rng=np.random.default_rng(8))
    assert v.verify_snark()
