"""WASM->Python witness calculator tests against the shipped library.

The reference runs the shipped circom WASM calculators under Node
(`variableGenerator.ts:33,88,356`); frontend/wasm_vm.py translates the same
modules to Python.  These tests check the translator end-to-end: module
instantiation for all 14 subcircuits, protocol metadata (BLS12-381 prime,
witness sizes vs subcircuitInfo.json), and R1CS-satisfying witnesses with
correct EVM semantics for representative subcircuits.
"""

import pytest

from tokamak_zk_evm_tpu.io.artifacts import load_library
from tokamak_zk_evm_tpu.frontend.witness_calculator import (
    SubcircuitCalculators,
    WitnessCalcError,
)
from tokamak_zk_evm_tpu.testing.real_fixture import (
    REFERENCE_LIBRARY,
    check_r1cs_satisfaction,
)

M256 = 1 << 256
L128 = (1 << 128) - 1


@pytest.fixture(scope="module")
def lib():
    params, infos, library = load_library(REFERENCE_LIBRARY)
    return params, {i.name: i for i in infos}, library


@pytest.fixture(scope="module")
def calcs():
    return SubcircuitCalculators(REFERENCE_LIBRARY)


def test_all_modules_instantiate(lib, calcs):
    _, by_name, _ = lib
    r_mod = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
    for info in by_name.values():
        c = calcs.get(info.id)
        assert c.prime == r_mod, info.name  # BLS12-381 Fr
        assert c.witness_size == info.Nwires, info.name


def test_buffer_witness_copies_inputs(lib, calcs):
    _, by_name, library = lib
    info = by_name["bufferPubIn"]
    i0, ic = info.In_idx
    vals = [(11 * k + 5) % (1 << 64) for k in range(ic)]
    w = calcs.witness(info.id, vals)
    assert check_r1cs_satisfaction(library[info.id], w)
    assert w[0] == 1
    assert w[i0 : i0 + ic] == vals


def test_accumulator_semantics(lib, calcs):
    _, by_name, library = lib
    info = by_name["Accumulator"]
    i0, ic = info.In_idx
    vals, total = [], 0
    for k in range(0, ic, 2):
        v = (37 * k + 123456789) << 100
        total = (total + v) % M256
        vals += [v & L128, v >> 128]
    w = calcs.witness(info.id, vals)
    assert check_r1cs_satisfaction(library[info.id], w)
    o0 = info.Out_idx[0]
    assert w[o0] | (w[o0 + 1] << 128) == total


def test_dectobit_semantics(lib, calcs):
    _, by_name, library = lib
    info = by_name["DecToBit"]
    i0, ic = info.In_idx
    vals = [(0x9E3779B97F4A7C15 * (k + 1)) & L128 for k in range(ic)]
    w = calcs.witness(info.id, vals)
    assert check_r1cs_satisfaction(library[info.id], w)
    o0, oc = info.Out_idx
    bits = w[o0 : o0 + oc]
    assert all(b in (0, 1) for b in bits)


def test_alu1_wraparound_add(lib, calcs):
    """The carry-interlocked pair the pure-R1CS solver cannot propagate."""
    _, by_name, library = lib
    info = by_name["ALU1"]
    a, b = M256 - 5, 3
    w = calcs.witness(info.id, [1 << 1, a & L128, a >> 128, b & L128, b >> 128])
    assert check_r1cs_satisfaction(library[info.id], w)
    o0 = info.Out_idx[0]
    assert w[o0] | (w[o0 + 1] << 128) == (a + b) % M256


def test_alu2_div_semantics(lib, calcs):
    """ALU2 = div-based EVM op group: in = [selector, in1[2], in2[2],
    in3[2]] (`subcircuits/circom/ALU2_circuit.circom:4-21`).  DIV is
    selector bit 0."""
    _, by_name, library = lib
    info = by_name["ALU2"]
    a, b = (1 << 200) + 12345, (1 << 64) + 7
    # selector = 2^opcode; ALU2 covers DIV(4) SDIV(5) MOD(6) SMOD(7)
    # ADDMOD(8) MULMOD(9) (`templates/256bit/alu_safe.circom:129-136`)
    for sel_bit in (4, 5, 6):
        ins = [1 << sel_bit, a & L128, a >> 128, b & L128, b >> 128, 0, 0]
        w = calcs.witness(info.id, ins)
        assert check_r1cs_satisfaction(library[info.id], w), f"sel={sel_bit}"
    # DIV output check
    w = calcs.witness(info.id,
                      [1 << 4, a & L128, a >> 128, b & L128, b >> 128, 0, 0])
    o0 = info.Out_idx[0]
    assert w[o0] | (w[o0 + 1] << 128) == a // b


def test_poseidon_witness(lib, calcs):
    """Poseidon bus: in = [mode selector (one-hot of 6), 7 x 2-limb words]
    (`subcircuits/circom/Poseidon_circuit.circom:5-17`)."""
    _, by_name, library = lib
    info = by_name["Poseidon"]
    i0, ic = info.In_idx
    vals = [1] + [((k + 1) * 0x1234567) & L128 for k in range(ic - 1)]
    w = calcs.witness(info.id, vals)
    assert check_r1cs_satisfaction(library[info.id], w)


def test_wrong_input_count_raises(calcs):
    with pytest.raises(WitnessCalcError):
        calcs.get(5).calculate_witness({"in": [1, 2]})
    with pytest.raises(WitnessCalcError):
        calcs.get(5).calculate_witness({"nonexistent": [1]})
