"""Fixture over the REAL shipped subcircuit library.

Loads the reference's compiled library (`packages/frontend/qap-compiler/
subcircuits/library`: 14 circom subcircuits as binary R1CS) and constructs a
buffer-only placement set whose witnesses are computable in closed form —
each buffer constrains out_i == in_i (`subcircuits/circom/buffers.circom`
semantics, verified against the parsed R1CS in tests/test_io_artifacts.py).
This exercises the full protocol against the real circuit shapes
(n=4096, m_i=4096, l=728, m_D=26591) without the TS synthesizer.

Wire map of the public region [0, l) (from `subcircuitInfo.json` flattenMap):
  [0, 65)    bufferPubOut outs  -> a_pub_user[:l_user_out]
  [65, 85)   bufferPubIn  ins   -> a_pub_user[l_user_out:l_user]
  [85, 109)  bufferBlockIn ins  -> a_pub_block (padded to l_free - l_user)
  [109, 128) (unused by the shipped library; zero)
  [128, 728) bufferEVMIn  ins   -> a_pub_function (fixed instance, l - l_free)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

from ..fields import R_MOD
from ..io.artifacts import load_library
from ..models.protocol import (
    Instance, PermutationEntry, Placement, SetupParams, SubcircuitInfo,
    SubcircuitR1CS,
)

REFERENCE_LIBRARY = (
    "/root/reference/packages/frontend/qap-compiler/subcircuits/library"
)


@dataclass
class RealFixture:
    params: SetupParams
    library: list[SubcircuitR1CS]
    infos: list[SubcircuitInfo]
    placements: list[Placement]
    permutation: list[PermutationEntry]
    instance: Instance


def _buffer_placement(info: SubcircuitInfo, io_vals: list[int]) -> Placement:
    """[const=1] + outs + ins with outs == ins == io_vals."""
    o0, oc = info.Out_idx
    i0, ic = info.In_idx
    assert oc == ic == len(io_vals)
    vars_ = [0] * info.Nwires
    vars_[0] = 1
    for j, v in enumerate(io_vals):
        vars_[o0 + j] = v % R_MOD
        vars_[i0 + j] = v % R_MOD
    return Placement(subcircuit_id=info.id, variables=vars_)


def _dectobit_placement(info: SubcircuitInfo, lo: int, hi: int) -> Placement:
    """DecToBit witness built in closed form: wires are
    [const] + out[256] (bit decomposition) + in[2] (lower/upper 128-bit limbs)
    (`qap-compiler/subcircuits/circom/DecToBit_circuit.circom`: out[i] =
    bit i of in[0], out[i+128] = bit i of in[1]; no internal wires)."""
    assert 0 <= lo < (1 << 128) and 0 <= hi < (1 << 128)
    o0, oc = info.Out_idx
    i0, ic = info.In_idx
    assert oc == 256 and ic == 2 and info.Nwires == 259
    vars_ = [0] * info.Nwires
    vars_[0] = 1
    vars_[i0] = lo
    vars_[i0 + 1] = hi
    for b in range(128):
        vars_[o0 + b] = (lo >> b) & 1
        vars_[o0 + 128 + b] = (hi >> b) & 1
    return Placement(subcircuit_id=info.id, variables=vars_)


def check_r1cs_satisfaction(r1cs: SubcircuitR1CS, variables: list[int]) -> bool:
    """Host-exact R1CS check: (A w) * (B w) == (C w) per constraint row
    (the reference's testing-mode equivalent, `prove/src/lib.rs:1473-1518`,
    evaluated directly on the sparse columns instead of QAP evals)."""
    from collections import defaultdict

    sums = []
    for cols in (r1cs.A_cols, r1cs.B_cols, r1cs.C_cols):
        acc: dict[int, int] = defaultdict(int)
        for wire, col in cols.items():
            v = variables[wire] % R_MOD
            if v:
                for k, coeff in col:
                    acc[k] = (acc[k] + coeff * v) % R_MOD
        sums.append(acc)
    a, b, c = sums
    for k in set(a) | set(b) | set(c):
        if (a.get(k, 0) * b.get(k, 0)) % R_MOD != c.get(k, 0) % R_MOD:
            return False
    return True


def build_real_fixture(
    library_dir: str = REFERENCE_LIBRARY,
    s_max: int | None = None,
    seed: int = 11,
    include_dectobit: bool = False,
) -> RealFixture:
    """Buffer (+ optionally DecToBit) placements on the real library.

    `s_max` may be shrunk (power of two >= 4) to bound the NTT domain for
    tests; all wire-structure parameters (n, l, l_D, m_D) stay real.
    """
    params, infos, library = load_library(library_dir)
    if s_max is not None:
        assert s_max >= 4 and (s_max & (s_max - 1)) == 0
        params = dataclasses.replace(params, s_max=s_max)

    rng_state = seed
    def rand_fr():
        nonlocal rng_state
        rng_state = (rng_state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        return (rng_state * 0x9E3779B97F4A7C15) % R_MOD

    by_name = {i.name: i for i in infos}
    pub_out_i = by_name["bufferPubOut"]
    pub_in_i = by_name["bufferPubIn"]
    block_in_i = by_name["bufferBlockIn"]
    evm_in_i = by_name["bufferEVMIn"]

    pub_in_vals = [rand_fr() for _ in range(pub_in_i.In_idx[1])]
    block_vals = [rand_fr() for _ in range(block_in_i.In_idx[1])]
    evm_vals = [rand_fr() for _ in range(evm_in_i.In_idx[1])]

    # bufferPubOut echoes bufferPubIn's outputs cyclically so its inputs are
    # genuine copies of other placements' interface wires.
    n_out = pub_out_i.Out_idx[1]
    out_vals = [pub_in_vals[j % len(pub_in_vals)] for j in range(n_out)]

    placements = [
        _buffer_placement(pub_out_i, out_vals),
        _buffer_placement(pub_in_i, pub_in_vals),
        _buffer_placement(block_in_i, block_vals),
        _buffer_placement(evm_in_i, evm_vals),
    ]
    if include_dectobit:
        dec_i = by_name["DecToBit"]
        placements.append(
            _dectobit_placement(
                dec_i, rand_fr() % (1 << 128), rand_fr() % (1 << 128)
            )
        )
        placements.append(_dectobit_placement(dec_i, (1 << 128) - 1, 0))
    assert len(placements) <= params.s_max

    # Copy cycles: pubIn.out[j] (producer) <-> pubOut.in[k] for every k with
    # k % n_in == j (consumers), as (wire, placement) pairs on the interface
    # grid (row = global - l, col = placement index).
    l = params.l
    permutation: list[PermutationEntry] = []
    n_in = len(pub_in_vals)
    for j in range(n_in):
        cyc = [(pub_in_i.flattenMap[pub_in_i.Out_idx[0] + j] - l, 1)]
        for k in range(j, n_out, n_in):
            cyc.append((pub_out_i.flattenMap[pub_out_i.In_idx[0] + k] - l, 0))
        for t, (row, col) in enumerate(cyc):
            nrow, ncol = cyc[(t + 1) % len(cyc)]
            permutation.append(PermutationEntry(row=row, col=col, X=nrow, Y=ncol))

    # Instance arrays per the public wire map.
    a_pub_user = out_vals + pub_in_vals  # l_user = l_user_out + n_in
    assert len(a_pub_user) == params.l_user
    m_block = params.l_free - params.l_user
    a_pub_block = (block_vals + [0] * m_block)[:m_block]
    m_function = params.l - params.l_free
    # globals [109,128) carry no wires in the shipped library; the function
    # instance starts at l_free=128 and is exactly the EVMIn inputs.
    assert evm_in_i.flattenMap[evm_in_i.In_idx[0]] == params.l_free
    a_pub_function = evm_vals
    assert len(a_pub_function) == m_function

    instance = Instance(
        a_pub_user=a_pub_user,
        a_pub_block=a_pub_block,
        a_pub_function=a_pub_function,
    )
    return RealFixture(
        params=params, library=library, infos=infos, placements=placements,
        permutation=permutation, instance=instance,
    )
