"""BiPoly engine tests vs host oracle and algebraic identities.

Mirrors the reference's libs tests + testing-mode identities (SURVEY.md §4):
round trips, product correctness, vanishing/ruffini division identities at
random points.
"""

import numpy as np

from tokamak_zk_evm_tpu.fields import R_MOD
from tokamak_zk_evm_tpu.host import reference as ref
from tokamak_zk_evm_tpu.ops import field as F
from tokamak_zk_evm_tpu.ops import poly as P

RNG = np.random.default_rng(23)


def rand_fr(n):
    return [int.from_bytes(RNG.bytes(32), "little") % R_MOD for _ in range(n)]


def rand_grid(x, y):
    return [rand_fr(y) for _ in range(x)]


def grids_equal(bp, grid):
    got = bp.to_ints()
    for i, row in enumerate(grid):
        for j, v in enumerate(row):
            if int(got[i][j]) != v % R_MOD:
                return False
    return True


def test_add_sub_resize():
    a = rand_grid(4, 2)
    b = rand_grid(2, 8)
    pa, pb = P.BiPoly.from_ints(a), P.BiPoly.from_ints(b)
    s = pa + pb
    assert s.x_size == 4 and s.y_size == 8
    want = [[0] * 8 for _ in range(4)]
    for i in range(4):
        for j in range(2):
            want[i][j] = (want[i][j] + a[i][j]) % R_MOD
    for i in range(2):
        for j in range(8):
            want[i][j] = (want[i][j] + b[i][j]) % R_MOD
    assert grids_equal(s, want)
    d = (pa + pb) - pb
    padded = [[a[i][j] if j < 2 and i < 4 else 0 for j in range(8)] for i in range(4)]
    assert grids_equal(d, padded)


def test_scalar_ops_and_eval():
    g = rand_grid(4, 4)
    p = P.BiPoly.from_ints(g)
    s = rand_fr(1)[0]
    ps = p.mul_scalar(s)
    x, y = rand_fr(2)
    assert ps.eval(x, y) == (s * ref.poly_eval_xy(g, x, y)) % R_MOD
    pc = p.add_scalar(s)
    assert pc.eval(x, y) == (s + ref.poly_eval_xy(g, x, y)) % R_MOD


def test_mul_matches_host_convolution():
    ga, gb = rand_grid(2, 4), rand_grid(4, 2)
    pa, pb = P.BiPoly.from_ints(ga), P.BiPoly.from_ints(gb)
    prod = pa * pb
    x, y = rand_fr(2)
    assert prod.eval(x, y) == (
        ref.poly_eval_xy(ga, x, y) * ref.poly_eval_xy(gb, x, y)
    ) % R_MOD


def test_mul_monomial():
    g = rand_grid(4, 4)
    p = P.BiPoly.from_ints(g).mul_monomial(3, 1)
    x, y = rand_fr(2)
    assert p.eval(x, y) == (
        ref.poly_eval_xy(g, x, y) * pow(x, 3, R_MOD) * y
    ) % R_MOD


def test_scale_coeffs():
    g = rand_grid(4, 8)
    p = P.BiPoly.from_ints(g)
    f = rand_fr(1)[0]
    x, y = rand_fr(2)
    assert p.scale_coeffs_x(f).eval(x, y) == ref.poly_eval_xy(g, (f * x) % R_MOD, y)
    assert p.scale_coeffs_y(f).eval(x, y) == ref.poly_eval_xy(g, x, (f * y) % R_MOD)


def test_rou_eval_roundtrip_and_lagrange():
    # from_rou_evals of a one-hot vector is a Lagrange basis polynomial
    m = 8
    evals = [[0] for _ in range(m)]
    evals[m - 1][0] = 1
    dev = P.BiPoly.from_rou_evals(np.asarray(F.pack_fr(evals)))
    from tokamak_zk_evm_tpu.fields import fr_root_of_unity

    w = fr_root_of_unity(m)
    for i in range(m):
        want = 1 if i == m - 1 else 0
        assert dev.eval(pow(w, i, R_MOD), 1) == want


def test_div_by_vanishing_opt_identity():
    c, d = 4, 4
    # P = A*(X^c - 1) + B*(Y^d - 1) with A: (2c, 2d), B: (c, 2d) shaped
    A = P.BiPoly.from_ints(rand_grid(2 * c, 2 * d))
    B = P.BiPoly.from_ints(rand_grid(c, 2 * d))
    tx = P.BiPoly.from_ints([[-1 % R_MOD]] + [[0]] * (c - 1) + [[1]] + [[0]] * (c - 1))
    ty = P.BiPoly.from_ints([([-1 % R_MOD] + [0] * (d - 1) + [1] + [0] * (d - 1))])
    numer = A * tx + B * ty
    qx, qy = numer.div_by_vanishing_opt(c, d)
    xe, ye = rand_fr(2)
    lhs = numer.eval(xe, ye)
    rhs = (
        qx.eval(xe, ye) * (pow(xe, c, R_MOD) - 1)
        + qy.eval(xe, ye) * (pow(ye, d, R_MOD) - 1)
    ) % R_MOD
    assert lhs == rhs


def test_div_by_ruffini_identity():
    g = rand_grid(8, 4)
    p = P.BiPoly.from_ints(g)
    x, y = rand_fr(2)
    qx, qy, rem = p.div_by_ruffini(x, y)
    xe, ye = rand_fr(2)
    lhs = ref.poly_eval_xy(g, xe, ye)
    rhs = (
        qx.eval(xe, ye) * ((xe - x) % R_MOD)
        + qy.eval(xe, ye) * ((ye - y) % R_MOD)
        + rem
    ) % R_MOD
    assert lhs == rhs
    assert rem == ref.poly_eval_xy(g, x, y)


def test_batch_inv_and_scans():
    n = 33
    vals = rand_fr(n)
    a = np.asarray(F.pack_fr(vals))
    inv = F.unpack_fr(np.asarray(F.fr_batch_inv(a)))
    for i in range(n):
        assert inv[i] == pow(vals[i], -1, R_MOD)
    suf = F.unpack_fr(np.asarray(F.fr_suffix_prod(a)))
    acc = 1
    want = [0] * n
    for i in reversed(range(n)):
        acc = (acc * vals[i]) % R_MOD
        want[i] = acc
    assert list(suf) == want
