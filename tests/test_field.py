"""Field-layer oracle tests: backend limb arithmetic vs Python-int ground truth.

Mirrors the reference's libs unit-test strategy (SURVEY.md §4): every backend
kernel is checked bit-exactly against an independent host implementation.
"""

import numpy as np
import pytest

from tokamak_zk_evm_tpu.fields import FR, FQ, R_MOD
from tokamak_zk_evm_tpu.ops import field as F

RNG = np.random.default_rng(7)


def rand_ints(spec, n):
    return [int.from_bytes(RNG.bytes(48), "little") % spec.modulus for _ in range(n)]


CASES = [
    (F.pack_fr, F.unpack_fr, F.fr_add, F.fr_sub, F.fr_mul, F.fr_neg, F.fr_inv, FR),
    (F.pack_fq, F.unpack_fq, F.fq_add, F.fq_sub, F.fq_mul, F.fq_neg, F.fq_inv, FQ),
]


@pytest.mark.parametrize("case", CASES, ids=["fr", "fq"])
def test_pack_unpack_roundtrip(case):
    pack, unpack, *_, spec = case
    xs = rand_ints(spec, 8) + [0, 1, spec.modulus - 1]
    assert list(unpack(pack(xs))) == [x % spec.modulus for x in xs]
    # non-Montgomery round trip
    assert list(unpack(pack(xs, mont=False), mont=False)) == [
        x % spec.modulus for x in xs
    ]


@pytest.mark.parametrize("case", CASES, ids=["fr", "fq"])
def test_add_sub_mul_neg(case):
    pack, unpack, add, sub, mul, neg, inv, spec = case
    n = 64
    a_int = rand_ints(spec, n)
    b_int = rand_ints(spec, n)
    a_int[:3] = [0, spec.modulus - 1, 1]
    b_int[:3] = [0, spec.modulus - 1, spec.modulus - 1]
    a = pack(a_int)
    b = pack(b_int)
    got_add = unpack(np.asarray(add(a, b)))
    got_sub = unpack(np.asarray(sub(a, b)))
    got_mul = unpack(np.asarray(mul(a, b)))
    got_neg = unpack(np.asarray(neg(a)))
    for i in range(n):
        assert got_add[i] == (a_int[i] + b_int[i]) % spec.modulus, f"add[{i}]"
        assert got_sub[i] == (a_int[i] - b_int[i]) % spec.modulus, f"sub[{i}]"
        assert got_mul[i] == (a_int[i] * b_int[i]) % spec.modulus, f"mul[{i}]"
        assert got_neg[i] == (-a_int[i]) % spec.modulus, f"neg[{i}]"


@pytest.mark.parametrize("case", CASES, ids=["fr", "fq"])
def test_inv(case):
    pack, unpack, add, sub, mul, neg, inv, spec = case
    n = 8
    a_int = rand_ints(spec, n)
    a_int[0] = 1
    a_int[1] = spec.modulus - 1
    a = pack(a_int)
    got = unpack(np.asarray(inv(a)))
    for i in range(n):
        assert got[i] == pow(a_int[i], -1, spec.modulus), f"inv[{i}]"
    assert unpack(np.asarray(inv(pack([0])))).reshape(-1)[0] == 0


def test_broadcast_modes():
    n = 12
    a_int = rand_ints(FR, n)
    a = F.pack_fr([a_int[:6], a_int[6:]])  # [16, 2, 6]
    # scalar broadcast
    s = 999983
    got = F.unpack_fr(np.asarray(F.fr_mul(a, F.fr_mont(s)[:, 0])))
    for i in range(2):
        for j in range(6):
            assert got[i][j] == a_int[6 * i + j] * s % R_MOD
    # suffix match (cyclic rows)
    row = rand_ints(FR, 6)
    got = F.unpack_fr(np.asarray(F.fr_mul(a, F.pack_fr(row))))
    for i in range(2):
        for j in range(6):
            assert got[i][j] == a_int[6 * i + j] * row[j] % R_MOD
    # prefix match (block broadcast)
    col = rand_ints(FR, 2)
    got = F.unpack_fr(np.asarray(F.fr_mul(a, F.pack_fr(col))))
    for i in range(2):
        for j in range(6):
            assert got[i][j] == a_int[6 * i + j] * col[i] % R_MOD


def test_scans_and_reductions():
    n = 33
    vals = rand_ints(FR, n)
    vals[5] = 0
    a = F.pack_fr(vals)
    inv = F.unpack_fr(np.asarray(F.fr_batch_inv(a)))
    for i in range(n):
        want = pow(vals[i], -1, R_MOD) if vals[i] else 0
        assert inv[i] == want, f"batch_inv[{i}]"
    pre = F.unpack_fr(np.asarray(F.fr_prefix_prod(a)))
    suf = F.unpack_fr(np.asarray(F.fr_suffix_prod(a)))
    acc = 1
    for i in range(n):
        acc = acc * vals[i] % R_MOD
        assert pre[i] == acc
    acc = 1
    for i in reversed(range(n)):
        acc = acc * vals[i] % R_MOD
        assert suf[i] == acc
    s = F.fr_sum(F.pack_fr([vals]), axis=1)
    assert int(F.unpack_fr(np.asarray(s).reshape(16, 1)).reshape(-1)[0]) == sum(vals) % R_MOD
    ss = F.unpack_fr(np.asarray(F.fr_suffix_sum(F.pack_fr([vals]), axis=1)))[0]
    for i in range(n):
        assert ss[i] == sum(vals[i:]) % R_MOD


def test_mont_canonical_conversion():
    from tokamak_zk_evm_tpu.ops import msm as M

    vals = rand_ints(FR, 5)
    mont = F.pack_fr(vals)
    canon = M.scalars_from_mont(np.asarray(mont))
    assert list(F.unpack_fr(np.asarray(canon), mont=False)) == vals


def test_hashing_keccak_to_fr():
    """`hashing()` parity with field_structures/mod.rs:11-23: keccak256,
    mask the top 2 bits of byte 31, interpret little-endian."""
    from tokamak_zk_evm_tpu.fields import R_MOD, hashing
    from tokamak_zk_evm_tpu.host.keccak import keccak256

    for seed in (b"", b"tokamak", bytes(range(100))):
        d = bytearray(keccak256(seed))
        d[31] &= 0x3F
        want = int.from_bytes(bytes(d), "little")
        got = hashing(seed)
        assert got == want
        assert 0 <= got < R_MOD  # 254-bit masked value always < r (255-bit)
