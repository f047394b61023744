"""End-to-end: setup -> preprocess -> prove -> verify on the toy fixture.

The TPU framework's equivalent of the reference's testing-mode pipeline
(SURVEY.md §4): fixed-tau CRS, full 5-round prove, pairing-based
verification (the single 5x5 multi-pairing check plus the decomposed
arith/copy/binding checks), and witness-identity assertions along the way.
"""

import numpy as np
import pytest

from tokamak_zk_evm_tpu.fields import R_MOD
from tokamak_zk_evm_tpu.models import witness as W
from tokamak_zk_evm_tpu.models.preprocess import preprocess
from tokamak_zk_evm_tpu.models.protocol import Mixer
from tokamak_zk_evm_tpu.models.prover import Prover
from tokamak_zk_evm_tpu.models.setup import Sigma, Tau, generate_sigma
from tokamak_zk_evm_tpu.models.verifier import Verifier
from tokamak_zk_evm_tpu.ops import field as F
from tokamak_zk_evm_tpu.testing.fixtures import build_fixture



@pytest.fixture(scope="module")
def ctx():
    fx = build_fixture()
    tau = Tau.fixed()
    sigma = generate_sigma(fx.params, tau, fx.library, fx.infos)
    return fx, tau, sigma


def test_witness_satisfies_r1cs(ctx):
    fx, tau, sigma = ctx
    u = W.gen_uXY(fx.placements, fx.library, fx.params)
    v = W.gen_vXY(fx.placements, fx.library, fx.params)
    w = W.gen_wXY(fx.placements, fx.library, fx.params)
    ue = F.unpack_fr(np.asarray(u.to_rou_evals()))
    ve = F.unpack_fr(np.asarray(v.to_rou_evals()))
    we = F.unpack_fr(np.asarray(w.to_rou_evals()))
    for k in range(fx.params.n):
        for i in range(fx.params.s_max):
            assert (int(ue[k][i]) * int(ve[k][i]) - int(we[k][i])) % R_MOD == 0, (k, i)


def test_copy_constraints_hold(ctx):
    fx, tau, sigma = ctx
    b = W.gen_bXY(fx.placements, fx.infos, fx.params)
    be = F.unpack_fr(np.asarray(b.to_rou_evals()))
    for e in fx.permutation:
        assert int(be[e.row][e.col]) == int(be[e.X][e.Y]), e


def test_binding_identity_at_tau(ctx):
    """gamma*O_pub + eta*O_mid + delta*O_prv == A + alpha*U + ... + alpha^4*B
    at tau (the trusted-setup testing-mode check,
    setup/trusted-setup/src/main.rs:262-292)."""
    from tokamak_zk_evm_tpu.models import prover as PM
    from tokamak_zk_evm_tpu.host.curve import G1

    fx, tau, sigma = ctx
    p = Prover(fx.params, sigma, fx.library, fx.infos, fx.placements,
               fx.permutation, fx.instance, mixer=Mixer.zero())
    a_enc = PM.encode_poly(sigma, p.a_free_X, fx.params)
    b_enc = PM.encode_poly(sigma, p.bXY, fx.params)
    u_enc = PM.encode_poly(sigma, p.uXY, fx.params)
    v_enc = PM.encode_poly(sigma, p.vXY, fx.params)
    w_enc = PM.encode_poly(sigma, p.wXY, fx.params)
    O_inst = PM.encode_O_pub_free(sigma, fx.placements, fx.infos, fx.params)
    O_mid = PM.encode_O_mid_no_zk(sigma, fx.placements, fx.infos, fx.params)
    O_prv = PM.encode_O_prv_no_zk(sigma, fx.placements, fx.infos, fx.params)
    lhs = PM._g1_lincomb((O_inst, tau.gamma), (O_mid, tau.eta), (O_prv, tau.delta))
    a = tau.alpha
    rhs = PM._g1_lincomb(
        (a_enc, 1), (u_enc, a), (v_enc, pow(a, 2, R_MOD)),
        (w_enc, pow(a, 3, R_MOD)), (b_enc, pow(a, 4, R_MOD)),
    )
    assert lhs == rhs


def test_encode_poly_matches_direct_eval(ctx):
    """encode_poly(P) == P(tau.x, tau.y) * G (trusted-setup main.rs:222-246)."""
    from tokamak_zk_evm_tpu.models import prover as PM
    from tokamak_zk_evm_tpu.host.curve import g1_scalar_mul_affine
    from tokamak_zk_evm_tpu.ops.poly import BiPoly

    fx, tau, sigma = ctx
    rng = np.random.default_rng(5)
    grid = [
        [int.from_bytes(rng.bytes(32), "little") % R_MOD for _ in range(4)]
        for _ in range(8)
    ]
    poly = BiPoly.from_ints(grid)
    enc = PM.encode_poly(sigma, poly, fx.params)
    want = g1_scalar_mul_affine(sigma.G, poly.eval(tau.x, tau.y))
    assert enc == want


@pytest.mark.parametrize("mixer_kind", ["zero", "random"])
def test_prove_and_verify(ctx, mixer_kind):
    fx, tau, sigma = ctx
    rng = np.random.default_rng(99)
    mixer = Mixer.zero() if mixer_kind == "zero" else Mixer.random(rng)
    prover = Prover(fx.params, sigma, fx.library, fx.infos, fx.placements,
                    fx.permutation, fx.instance, mixer=mixer)
    proof, proof4t = prover.prove()
    pre = preprocess(sigma, fx.permutation, fx.instance, fx.params)
    verifier = Verifier(fx.params, sigma, pre, fx.instance, proof,
                        rng=np.random.default_rng(7))
    assert verifier.verify_arith(proof4t), "decomposed arithmetic check failed"
    assert verifier.verify_copy(proof4t), "decomposed copy check failed"
    assert verifier.verify_binding(proof4t), "decomposed binding check failed"
    assert verifier.verify_snark(), "full SNARK pairing check failed"

    # tampered proof must fail
    bad = Proof_tampered(proof)
    bad_verifier = Verifier(fx.params, sigma, pre, fx.instance, bad,
                            rng=np.random.default_rng(7))
    assert not bad_verifier.verify_snark()


def Proof_tampered(proof):
    import copy
    from tokamak_zk_evm_tpu.host.curve import G1

    bad = copy.deepcopy(proof)
    bad.proof3.V_eval = (bad.proof3.V_eval + 1) % R_MOD
    return bad
