"""Host curve + pairing sanity: group laws, on-curve checks, bilinearity."""

import pytest

from tokamak_zk_evm_tpu.fields import FIXED_G1_GEN, FIXED_G2_GEN, R_MOD
from tokamak_zk_evm_tpu.host import curve as C
from tokamak_zk_evm_tpu.host import pairing as PR


def test_generators_on_curve():
    assert C.G1.is_on_curve_affine(C.G1.gen)
    assert C.G2.is_on_curve_affine(C.G2.gen)
    assert C.G1.is_on_curve_affine(FIXED_G1_GEN)


def test_fixed_g2_gen_on_curve():
    # validates the Fq2 c0/c1 ordering of the fixed generator parse
    assert C.G2.is_on_curve_affine(FIXED_G2_GEN)


def test_group_law_g1():
    g = C.G1.from_affine(C.G1.gen)
    p2 = C.G1.add(g, g)
    assert C.G1.to_affine(p2) == C.G1.to_affine(C.G1.double(g))
    p5a = C.G1.scalar_mul(g, 5)
    p5b = C.G1.add(C.G1.add(p2, p2), g)
    assert C.G1.to_affine(p5a) == C.G1.to_affine(p5b)
    # order
    assert C.G1.to_affine(C.G1.scalar_mul(g, R_MOD)) is None


def test_group_law_g2():
    g = C.G2.from_affine(C.G2.gen)
    p3 = C.G2.add(C.G2.double(g), g)
    assert C.G2.to_affine(p3) == C.G2.to_affine(C.G2.scalar_mul(g, 3))
    assert C.G2.to_affine(C.G2.scalar_mul(g, R_MOD)) is None


@pytest.mark.slow
def test_pairing_bilinearity():
    a, b = 7, 11
    g1 = C.G1.gen
    g2 = C.G2.gen
    e = PR.pairing(g1, g2)
    e_ab = PR.pairing(
        C.g1_scalar_mul_affine(g1, a), C.g2_scalar_mul_affine(g2, b)
    )
    assert e_ab == e.pow(a * b)
    assert e != PR.Fq12.one()


def test_final_exp_chain_matches_direct_powering():
    """The cyclotomic easy+hard chain must equal the direct (q^12-1)/r
    powering cubed (the chain computes pairing^3; see host/pairing.py)."""
    ml = PR.miller_loop(C.G1.gen, C.G2.gen)
    fast = PR.final_exponentiation(ml)
    direct = PR.final_exponentiation_direct(ml)
    assert fast == direct * direct * direct
    assert fast != PR.Fq12.one()


@pytest.mark.slow
def test_multi_pairing_cancellation():
    # e(aG1, G2) * e(-aG1, G2) == 1
    g1 = C.G1.gen
    g2 = C.G2.gen
    p = C.g1_scalar_mul_affine(g1, 13)
    np_ = C.G1.to_affine(C.G1.neg(C.G1.from_affine(p)))
    out = PR.multi_pairing([p, np_], [g2, g2])
    assert out == PR.Fq12.one()


def test_msm_pow2_matches_msm_affine():
    # the power-of-two Horner combine used by the device MSM's host tail
    import numpy as np

    rng = np.random.default_rng(17)
    pts = [
        C.g1_scalar_mul_affine(C.G1.gen, int.from_bytes(rng.bytes(16), "little"))
        for _ in range(9)
    ]
    pts[4] = None
    exps = [0, 1, 3, 3, 7, 64, 131, 252, 0]
    got = C.G1.to_affine(C.G1.msm_pow2(exps, pts))
    want = C.G1.msm_affine([1 << e for e in exps], pts)
    assert got == want
    assert C.G1.to_affine(C.G1.msm_pow2([], [])) is None
    assert C.G1.to_affine(C.G1.msm_pow2([5], [None])) is None
