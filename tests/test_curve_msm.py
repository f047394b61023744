"""Device G1 kernels + MSM vs host oracle."""

import numpy as np
import jax.numpy as jnp

from tokamak_zk_evm_tpu.fields import R_MOD
from tokamak_zk_evm_tpu.host import curve as C
from tokamak_zk_evm_tpu.ops import curve as cv
from tokamak_zk_evm_tpu.ops import msm as msm_mod

RNG = np.random.default_rng(31)


def rand_points(n):
    """n random G1 points (as multiples of the generator)."""
    out = []
    for _ in range(n):
        k = int.from_bytes(RNG.bytes(16), "little")
        out.append(C.g1_scalar_mul_affine(C.G1.gen, k))
    return out


def test_jac_add_double_matches_host():
    pts = rand_points(6)
    x, y, inf = cv.pack_affine(pts)
    P = cv.affine_to_jac(x, y, inf)
    # pairwise adds: [0..2] + [3..5]
    s = cv.jac_add_jit(
        (P[0][:3], P[1][:3], P[2][:3]), (P[0][3:], P[1][3:], P[2][3:])
    )
    got = cv.unpack_jac(s)
    for i in range(3):
        want = C.G1.to_affine(
            C.G1.add(C.G1.from_affine(pts[i]), C.G1.from_affine(pts[3 + i]))
        )
        assert got[i] == want
    d = cv.jac_double_jit(P)
    got_d = cv.unpack_jac(d)
    for i in range(6):
        assert got_d[i] == C.G1.to_affine(C.G1.double(C.G1.from_affine(pts[i])))


def test_jac_add_edge_cases():
    pts = rand_points(2)
    p = pts[0]
    x, y, inf = cv.pack_affine([p, p, p, None])
    P = cv.affine_to_jac(x, y, inf)
    # P + P (doubling path)
    s = cv.jac_add_jit(
        (P[0][:1], P[1][:1], P[2][:1]), (P[0][1:2], P[1][1:2], P[2][1:2])
    )
    assert cv.unpack_jac(s)[0] == C.G1.to_affine(C.G1.double(C.G1.from_affine(p)))
    # P + (-P) = infinity
    negp = C.G1.to_affine(C.G1.neg(C.G1.from_affine(p)))
    nx, ny, ninf = cv.pack_affine([negp])
    N = cv.affine_to_jac(nx, ny, ninf)
    s = cv.jac_add_jit((P[0][:1], P[1][:1], P[2][:1]), N)
    assert cv.unpack_jac(s)[0] is None
    # P + inf = P
    s = cv.jac_add_jit(
        (P[0][:1], P[1][:1], P[2][:1]), (P[0][3:4], P[1][3:4], P[2][3:4])
    )
    assert cv.unpack_jac(s)[0] == p
    # inf + P = P
    s = cv.jac_add_jit(
        (P[0][3:4], P[1][3:4], P[2][3:4]), (P[0][:1], P[1][:1], P[2][:1])
    )
    assert cv.unpack_jac(s)[0] == p


def test_msm_matches_oracle():
    n = 50
    pts = rand_points(n)
    scalars = [int.from_bytes(RNG.bytes(32), "little") % R_MOD for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    pts[2] = None  # infinity base
    x, y, inf = cv.pack_affine(pts)
    s = msm_mod.scalars_from_ints(scalars)
    got = msm_mod.msm(s, x, y, inf)
    want = C.G1.msm_affine(scalars, pts)
    assert got == want


def test_msm_duplicate_digits_same_bucket():
    # many identical small scalars stress the segmented scan + doubling path
    n = 16
    pts = rand_points(n)
    scalars = [3] * n
    x, y, inf = cv.pack_affine(pts)
    got = msm_mod.msm(msm_mod.scalars_from_ints(scalars), x, y, inf)
    want = C.G1.msm_affine(scalars, pts)
    assert got == want


def test_msm_chunked():
    n = 24
    pts = rand_points(n)
    scalars = [int.from_bytes(RNG.bytes(32), "little") % R_MOD for _ in range(n)]
    x, y, inf = cv.pack_affine(pts)
    got = msm_mod.msm(msm_mod.scalars_from_ints(scalars), x, y, inf, chunk=10)
    want = C.G1.msm_affine(scalars, pts)
    assert got == want
