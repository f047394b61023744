"""I/O layer tests: real shipped R1CS library + Solidity proof round trip."""

import json
import os

import pytest

from tokamak_zk_evm_tpu.fields import R_MOD
from tokamak_zk_evm_tpu.io.artifacts import (
    load_library,
    load_instance,
    load_permutation,
    load_placement_variables,
    parse_hex,
    parse_r1cs,
    proof_from_solidity,
    proof_to_solidity,
)
from tokamak_zk_evm_tpu.models.protocol import (
    Binding, Proof, Proof0, Proof1, Proof2, Proof3, Proof4,
)

LIB = "/root/reference/packages/frontend/qap-compiler/subcircuits/library"


def test_parse_hex_odd_nibble():
    # HexString semantics: odd-length hex pads a leading zero (iotools:128-158)
    assert parse_hex("0xf") == 15
    assert parse_hex("f") == 15
    assert parse_hex("0x0") == 0
    assert parse_hex("0x10") == 16
    assert parse_hex("") == 0


@pytest.mark.skipif(not os.path.isdir(LIB), reason="reference library not mounted")
def test_real_library_loads():
    params, infos, lib = load_library(LIB)
    assert params.n == 4096 and params.s_max == 256
    assert params.m_i == 4096
    assert params.s_D == len(infos) == len(lib) == 14
    # every R1CS wire index must be within Nwires and every flattenMap global
    # within m_D
    for info, r in zip(infos, lib):
        assert len(info.flattenMap) == info.Nwires
        assert all(0 <= g < params.m_D for g in info.flattenMap)
        for cols in (r.A_cols, r.B_cols, r.C_cols):
            assert all(0 <= w < info.Nwires for w in cols)
            for col in cols.values():
                assert all(0 <= k < params.n and 0 <= c < R_MOD for k, c in col)


@pytest.mark.skipif(not os.path.isdir(LIB), reason="reference library not mounted")
def test_real_buffer_r1cs_semantics():
    """bufferPubIn constraints are (out_i - in_i) * 1 = 0: witness with
    outs == ins satisfies every row."""
    params, infos, lib = load_library(LIB)
    info, r = infos[1], lib[1]
    n_io = info.Out_idx[1]
    wit = [0] * info.Nwires
    wit[0] = 1
    for i in range(n_io):
        wit[info.Out_idx[0] + i] = 1000 + i
        wit[info.In_idx[0] + i] = 1000 + i
    n_rows = max(
        k for cols in (r.A_cols, r.B_cols, r.C_cols)
        for col in cols.values() for k, _ in col
    ) + 1
    a = [0] * n_rows
    b = [0] * n_rows
    c = [0] * n_rows
    for vec, cols in ((a, r.A_cols), (b, r.B_cols), (c, r.C_cols)):
        for w, col in cols.items():
            for k, coeff in col:
                vec[k] = (vec[k] + wit[w] * coeff) % R_MOD
    for k in range(n_rows):
        assert (a[k] * b[k] - c[k]) % R_MOD == 0, f"row {k} unsatisfied"


def test_solidity_proof_round_trip(tmp_path):
    q = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB

    def pt(i):
        return (i * 123456789 % q, i * 987654321 % q)

    proof = Proof(
        binding=Binding(A_free=pt(1), O_pub_free=pt(2), O_mid=pt(3), O_prv=pt(4)),
        proof0=Proof0(U=pt(5), V=pt(6), W=pt(7), Q_AX=pt(8), Q_AY=pt(9), B=pt(10)),
        proof1=Proof1(R=pt(11)),
        proof2=Proof2(Q_CX=pt(12), Q_CY=pt(13)),
        proof3=Proof3(
            V_eval=41 % R_MOD, R_eval=42, R_omegaX_eval=43, R_omegaX_omegaY_eval=44
        ),
        proof4=Proof4(
            Pi_X=pt(14), Pi_Y=pt(15), M_X=pt(16), M_Y=pt(17), N_X=pt(18), N_Y=pt(19)
        ),
    )
    d = proof_to_solidity(proof)
    assert len(d["proof_entries_part1"]) == 38
    assert len(d["proof_entries_part2"]) == 42
    # limb widths: part1 = 16 bytes, part2 = 32 bytes
    assert all(len(s) == 2 + 32 for s in d["proof_entries_part1"])
    assert all(len(s) == 2 + 64 for s in d["proof_entries_part2"])
    rec = proof_from_solidity(json.loads(json.dumps(d)))
    assert rec == proof
