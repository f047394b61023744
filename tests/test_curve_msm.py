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


def slice_pts(P, lo, hi):
    return tuple(c[:, lo:hi] for c in P)


def test_jac_add_double_matches_host():
    pts = rand_points(6)
    x, y, inf = cv.pack_affine(pts)
    P = cv.affine_to_jac(x, y, inf)
    s = cv.jac_add(slice_pts(P, 0, 3), slice_pts(P, 3, 6))
    got = cv.unpack_jac(s)
    for i in range(3):
        want = C.G1.to_affine(
            C.G1.add(C.G1.from_affine(pts[i]), C.G1.from_affine(pts[3 + i]))
        )
        assert got[i] == want
    d = cv.jac_double(P)
    got_d = cv.unpack_jac(d)
    for i in range(6):
        assert got_d[i] == C.G1.to_affine(C.G1.double(C.G1.from_affine(pts[i])))


def test_jac_add_edge_cases():
    pts = rand_points(2)
    p = pts[0]
    negp = C.G1.to_affine(C.G1.neg(C.G1.from_affine(p)))
    x, y, inf = cv.pack_affine([p, p, p, p, None])
    P = cv.affine_to_jac(x, y, inf)
    qx, qy, qinf = cv.pack_affine([p, negp, None, pts[1], p])
    Q = cv.affine_to_jac(qx, qy, qinf)
    got = cv.unpack_jac(cv.jac_add(P, Q))
    # P + P (doubling path)
    assert got[0] == C.G1.to_affine(C.G1.double(C.G1.from_affine(p)))
    # P + (-P) = infinity
    assert got[1] is None
    # P + inf = P
    assert got[2] == p
    # P + Q generic
    assert got[3] == C.G1.to_affine(
        C.G1.add(C.G1.from_affine(p), C.G1.from_affine(pts[1]))
    )
    # inf + P = P
    assert got[4] == p


def test_jac_sum_tree():
    pts = rand_points(7)
    x, y, inf = cv.pack_affine(pts)
    P = cv.affine_to_jac(x, y, inf)
    total = cv.unpack_jac(cv.jac_sum_tree(P))
    acc = C.G1.infinity
    for p in pts:
        acc = C.G1.add(acc, C.G1.from_affine(p))
    assert total == C.G1.to_affine(acc)


def test_to_affine_roundtrip():
    pts = rand_points(5) + [None]
    x, y, inf = cv.pack_affine(pts)
    P = cv.affine_to_jac(x, y, inf)
    D = cv.jac_double(P)
    aff = cv.jac_to_affine(D)
    got = cv.unpack_affine(aff)
    assert got == cv.unpack_jac(D)


def test_msm_matches_oracle():
    n = 100
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


def test_msm_all_zero_scalars():
    pts = rand_points(4)
    x, y, inf = cv.pack_affine(pts)
    s = msm_mod.scalars_from_ints([0, 0, 0, 0])
    assert msm_mod.msm(s, x, y, inf) is None


def test_fixed_base_family():
    ks = [0, 1, 5, R_MOD - 1, 123456789123456789]
    fam = msm_mod.fixed_base_msm_points(ks, C.G1.gen)
    got = cv.unpack_affine(fam)
    for k, g in zip(ks, got):
        want = C.g1_scalar_mul_affine(C.G1.gen, k % R_MOD) if k % R_MOD else None
        assert g == want
