"""Field-kernel oracle tests: device limb arithmetic vs Python-int ground truth.

Mirrors the reference's libs unit-test strategy (SURVEY.md §4): every device
kernel is checked bit-exactly against an independent host implementation.
"""

import numpy as np
import pytest

from tokamak_zk_evm_tpu.fields import FR, FQ
from tokamak_zk_evm_tpu.ops.bigint import fr_ops, fq_ops

RNG = np.random.default_rng(7)


def rand_ints(spec, n):
    return [int.from_bytes(RNG.bytes(48), "little") % spec.modulus for _ in range(n)]


@pytest.mark.parametrize("ops_fn,spec", [(fr_ops, FR), (fq_ops, FQ)], ids=["fr", "fq"])
def test_pack_unpack_roundtrip(ops_fn, spec):
    ops = ops_fn()
    xs = rand_ints(spec, 8) + [0, 1, spec.modulus - 1]
    packed = ops.pack(xs)
    out = ops.unpack(packed)
    assert list(out) == [x % spec.modulus for x in xs]


@pytest.mark.parametrize("ops_fn,spec", [(fr_ops, FR), (fq_ops, FQ)], ids=["fr", "fq"])
def test_add_sub_mul(ops_fn, spec):
    ops = ops_fn()
    n = 64
    a_int = rand_ints(spec, n)
    b_int = rand_ints(spec, n)
    # include edge cases
    a_int[:3] = [0, spec.modulus - 1, 1]
    b_int[:3] = [0, spec.modulus - 1, spec.modulus - 1]
    a = ops.pack(a_int)
    b = ops.pack(b_int)

    add = ops.unpack(np.asarray(ops.add(a, b)))
    sub = ops.unpack(np.asarray(ops.sub(a, b)))
    mul = ops.unpack(np.asarray(ops.mont_mul(a, b)))
    neg = ops.unpack(np.asarray(ops.neg(a)))
    for i in range(n):
        assert add[i] == (a_int[i] + b_int[i]) % spec.modulus, f"add[{i}]"
        assert sub[i] == (a_int[i] - b_int[i]) % spec.modulus, f"sub[{i}]"
        assert mul[i] == (a_int[i] * b_int[i]) % spec.modulus, f"mul[{i}]"
        assert neg[i] == (-a_int[i]) % spec.modulus, f"neg[{i}]"


@pytest.mark.parametrize("ops_fn,spec", [(fr_ops, FR), (fq_ops, FQ)], ids=["fr", "fq"])
def test_inv(ops_fn, spec):
    ops = ops_fn()
    n = 16
    a_int = rand_ints(spec, n)
    a_int[0] = 1
    a_int[1] = spec.modulus - 1
    a = ops.pack(a_int)
    inv = ops.unpack(np.asarray(ops.inv(a)))
    for i in range(n):
        assert inv[i] == pow(a_int[i], -1, spec.modulus), f"inv[{i}]"
    # zero maps to zero
    z = ops.pack([0])
    assert ops.unpack(np.asarray(ops.inv(z))) == 0


def test_mont_roundtrip():
    ops = fr_ops()
    xs = rand_ints(FR, 8)
    raw = ops.pack(xs, mont=False)
    m = ops.to_mont(raw)
    back = ops.from_mont(m)
    out = ops.unpack(np.asarray(back), mont=False)
    assert list(out) == xs
