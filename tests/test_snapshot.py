"""Snapshot-input synthesis over the reference's shipped fixture files.

Exercises the `synthesizeFromSnapshotInput` file contract
(`core/src/app/synthesize.ts:31`): previous_state_snapshot.json +
transaction.json + block_info.json + contract_codes.json from
`examples/L2StateChannel/` — a real OpenZeppelin-style ERC20 transfer on a
12 kB contract, replayed with Poseidon hashing and a Poseidon secure
storage trie.
"""

import os

import pytest

from tokamak_zk_evm_tpu.testing.real_fixture import REFERENCE_LIBRARY

FIXTURE = "/root/reference/packages/frontend/synthesizer/examples/L2StateChannel"

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(REFERENCE_LIBRARY) and os.path.isdir(FIXTURE)),
    reason="reference fixture not present",
)


@pytest.fixture(scope="module")
def result():
    from tokamak_zk_evm_tpu.frontend.snapshot import synthesize_from_snapshot

    return synthesize_from_snapshot(FIXTURE, REFERENCE_LIBRARY, s_max=256)


def test_trie_extraction():
    from tokamak_zk_evm_tpu.frontend import snapshot as S

    inp = S.load_snapshot_input(FIXTURE)
    pose2 = S.poseidon2_fn(REFERENCE_LIBRARY)
    world = S.build_world(
        inp, lambda k32: pose2(int.from_bytes(k32, "big"), 0)
        .to_bytes(32, "big"))
    token = world[0xA30FE40285B8F5C0457DBC3B7C8A280373C40044]
    assert len(token.code) == 12429
    # the three snapshot keys resolve through the Poseidon secure trie
    k1 = 0x2E251D8AFEF9C22B687FC248E7622C00835A0911A16925996A61350D3D22406D
    k2 = 0x5390CA30BB5CAC6421D67FC2591106C74D75C7247FC8F07E70FA17B26B2BA753
    assert token.storage[k1] == 0x8AC7230489E7FFFC
    assert token.storage[k2] == 0x8AC7230489E80004
    assert token.storage[7] == 0x12


def test_sender_address_derivation():
    from tokamak_zk_evm_tpu.frontend import snapshot as S

    pose2 = S.poseidon2_fn(REFERENCE_LIBRARY)
    pub = bytes.fromhex(
        "90c69902b2e0d20638ac1bddf8a2c433529b84a31a73a6423ab39cc6f67c2e13")
    addr = S.sender_address_from_pubkey(pub, pose2)
    # the derived address's balance-slot key must be the snapshot's key
    assert pose2(addr, 0) == \
        0x2E251D8AFEF9C22B687FC248E7622C00835A0911A16925996A61350D3D22406D


def test_replay_transfer_semantics(result):
    assert not result.reverted
    assert int.from_bytes(result.returndata, "big") == 1
    token = 0xA30FE40285B8F5C0457DBC3B7C8A280373C40044
    k1 = 0x2E251D8AFEF9C22B687FC248E7622C00835A0911A16925996A61350D3D22406D
    k2 = 0x5390CA30BB5CAC6421D67FC2591106C74D75C7247FC8F07E70FA17B26B2BA753
    # amount 4 moved sender -> recipient
    assert result.storage_writes[(token, k1)] == 0x8AC7230489E7FFF8
    assert result.storage_writes[(token, k2)] == 0x8AC7230489E80008


def test_replay_places_poseidon(result):
    from tokamak_zk_evm_tpu.testing.real_fixture import check_r1cs_satisfaction

    names = [result.infos[p.subcircuit_id].name for p in result.placements]
    assert names.count("Poseidon") >= 2  # balance-slot keys are in-circuit
    for p in result.placements:
        assert check_r1cs_satisfaction(result.library[p.subcircuit_id],
                                       p.variables)


def test_replay_copy_web_consistent(result):
    l = result.params.l
    vals = {}
    for col, pl in enumerate(result.placements):
        info = result.infos[pl.subcircuit_id]
        o0, oc = info.Out_idx
        i0, ic = info.In_idx
        for lw in list(range(o0, o0 + oc)) + list(range(i0, i0 + ic)):
            g = info.flattenMap[lw]
            if g >= l:
                vals[(g - l, col)] = pl.variables[lw]
    assert result.permutation
    for e in result.permutation:
        assert vals[(e.row, e.col)] == vals[(e.X, e.Y)]


PRIVATE_STATE = ("/root/reference/packages/frontend/synthesizer/examples/"
                 "privateState/transferNotes/transferNotes1To1")


@pytest.mark.skipif(not os.path.isdir(PRIVATE_STATE),
                    reason="privateState fixture not present")
def test_private_state_transfer_notes_replays():
    """The second shipped workload family: private-state note transfer
    (`examples/privateState/`), replayed through the same snapshot
    contract."""
    from tokamak_zk_evm_tpu.frontend.snapshot import synthesize_from_snapshot
    from tokamak_zk_evm_tpu.testing.real_fixture import check_r1cs_satisfaction

    res = synthesize_from_snapshot(PRIVATE_STATE, REFERENCE_LIBRARY,
                                   s_max=256)
    assert not res.reverted
    names = [res.infos[p.subcircuit_id].name for p in res.placements]
    assert names.count("Poseidon") >= 4  # note commitments are in-circuit
    for p in res.placements:
        assert check_r1cs_satisfaction(res.library[p.subcircuit_id],
                                       p.variables)
