"""MPC setup ceremony tests (reference mpc-setup parity,
`setup/mpc-setup/src/accumulator.rs` + `flows/phase2_*.rs`).

The decisive check: a 2-contributor phase-1 + beacon-y phase-2 + 2
gamma/delta/eta contributions must produce a Sigma IDENTICAL (same points)
to `generate_sigma` with the equivalent combined trapdoor — the ceremony and
the trusted setup are two paths to the same CRS.
"""

import numpy as np
import pytest

from tokamak_zk_evm_tpu.fields import R_MOD
from tokamak_zk_evm_tpu.models import mpc_setup as M
from tokamak_zk_evm_tpu.models.setup import Tau, generate_sigma
from tokamak_zk_evm_tpu.testing.fixtures import build_fixture


@pytest.fixture(scope="module")
def fx():
    return build_fixture()


def test_schnorr_roundtrip():
    rng = np.random.default_rng(0)
    th = b"t" * 64
    p = M.schnorr_prove(12345, b"tag", th, rng)
    assert M.schnorr_verify(p, b"tag", th)
    assert not M.schnorr_verify(p, b"other", th)
    import dataclasses
    bad = dataclasses.replace(p, s=(p.s + 1) % R_MOD)
    assert not M.schnorr_verify(bad, b"tag", th)


@pytest.mark.slow
def test_phase1_contribute_verify_chain(fx, tmp_path):
    rng = np.random.default_rng(1)
    acc0 = M.Phase1Accumulator.initial(fx.params)
    acc1, proof1 = acc0.compute(rng)
    assert acc0.verify(acc1, proof1)
    acc2, proof2 = acc1.compute(rng)
    assert acc1.verify(acc2, proof2)
    # proofs don't transfer between links in the chain
    assert not acc0.verify(acc2, proof1)
    # persistence round trip preserves the hash chain
    path = str(tmp_path / "acc.json")
    acc2.save(path)
    loaded = M.Phase1Accumulator.load(path)
    assert loaded.hash() == acc2.hash()
    # tampering a power breaks verification
    import dataclasses
    bad = dataclasses.replace(
        acc2, x_g1=[acc2.x_g1[1]] + acc2.x_g1[1:]
    )
    assert not acc1.verify(bad, proof2)


@pytest.mark.slow
def test_ceremony_equals_trusted_setup(fx):
    """End gate: ceremony CRS == generate_sigma(combined trapdoor)."""

    class SeqRng:
        """Deterministic scalar feed so the combined trapdoor is known."""

        def __init__(self, seed):
            self._rng = np.random.default_rng(seed)

        def bytes(self, n):
            return self._rng.bytes(n)

    # phase 1: two contributors
    rng = SeqRng(7)
    acc = M.Phase1Accumulator.initial(fx.params)
    secrets = []
    for _ in range(2):
        # mirror compute()'s sampling order to recover the secrets
        probe = SeqRng(0)
        acc_new, proof = acc.compute(rng)
        assert acc.verify(acc_new, proof)
        acc = acc_new
    # recover combined (alpha, x) from the G1 points via the known seed
    rng2 = SeqRng(7)
    alpha = x = 1
    for _ in range(2):
        a_u = M._rand_fr(rng2)
        x_u = M._rand_fr(rng2)
        # skip the schnorr nonces (2 proofs x 1 nonce each)
        M._rand_fr(rng2)
        M._rand_fr(rng2)
        alpha = alpha * a_u % R_MOD
        x = x * x_u % R_MOD

    # phase 2: prepare with public beacon y, then two contributions
    y = 0x1234567
    sigma = M.phase2_prepare(acc, y, fx.params, fx.library, fx.infos)
    gamma = delta = eta = 1
    rng3 = SeqRng(9)
    rng3_shadow = SeqRng(9)
    for _ in range(2):
        prev = sigma
        sigma, proof = M.phase2_contribute(sigma, rng3)
        assert M.phase2_verify(prev, sigma, proof)
        g_u = M._rand_fr(rng3_shadow)
        d_u = M._rand_fr(rng3_shadow)
        e_u = M._rand_fr(rng3_shadow)
        for _ in range(3):  # schnorr nonces
            M._rand_fr(rng3_shadow)
        gamma = gamma * g_u % R_MOD
        delta = delta * d_u % R_MOD
        eta = eta * e_u % R_MOD

    tau = Tau(x=x, y=y, alpha=alpha, gamma=gamma, delta=delta, eta=eta)
    want = generate_sigma(fx.params, tau, fx.library, fx.infos)

    assert sigma.G == want.G and sigma.H == want.H
    assert sigma.lagrange_KL == want.lagrange_KL
    for f in ("x", "y", "delta", "eta"):
        assert getattr(sigma.sigma_1, f) == getattr(want.sigma_1, f), f
    for f in ("alpha", "alpha2", "alpha3", "alpha4", "gamma", "delta",
              "eta", "x", "y"):
        assert getattr(sigma.sigma_2, f) == getattr(want.sigma_2, f), f
    assert sigma.sigma_1.delta_inv_alphak_xh_tx == want.sigma_1.delta_inv_alphak_xh_tx
    assert sigma.sigma_1.delta_inv_alpha4_xj_tx == want.sigma_1.delta_inv_alpha4_xj_tx
    assert sigma.sigma_1.delta_inv_alphak_yi_ty == want.sigma_1.delta_inv_alphak_yi_ty
    from tokamak_zk_evm_tpu.ops import curve as cv
    for f in ("xy_powers", "gamma_inv_o_inst", "eta_inv_li_o_inter_alpha4_kj",
              "delta_inv_li_o_prv"):
        got_pts = cv.unpack_affine(getattr(sigma.sigma_1, f))
        want_pts = cv.unpack_affine(getattr(want.sigma_1, f))
        assert got_pts == want_pts, f


@pytest.mark.slow
def test_phase2_verify_rejects_tampering(fx):
    """Every phase-2 field class is guarded: immutable swaps, scaled-point
    substitutions, and single-point corruption in the big families must all
    fail verification (advisor finding: prior spot checks missed these)."""
    import dataclasses

    rng = np.random.default_rng(3)
    acc = M.Phase1Accumulator.initial(fx.params)
    acc, _ = acc.compute(rng)
    sigma = M.phase2_prepare(acc, 0xBEEF, fx.params, fx.library, fx.infos)
    cur, proof = M.phase2_contribute(sigma, rng)
    assert M.phase2_verify(sigma, cur, proof)

    # corrupt one point inside a big packed family
    from tokamak_zk_evm_tpu.ops import curve as cv
    pts = cv.unpack_affine(cur.sigma_1.delta_inv_li_o_prv)
    k = next(i for i, p in enumerate(pts) if p is not None)
    pts[k] = M.G1.gen  # valid curve point, wrong value
    bad_s1 = dataclasses.replace(
        cur.sigma_1, delta_inv_li_o_prv=cv.pack_affine(pts))
    bad = dataclasses.replace(cur, sigma_1=bad_s1)
    assert not M.phase2_verify(sigma, bad, proof)

    # tamper an "immutable" field (xy_powers row swap)
    xp = cv.unpack_affine(cur.sigma_1.xy_powers)
    xp[0], xp[1] = xp[1], xp[0]
    bad_s1 = dataclasses.replace(cur.sigma_1, xy_powers=cv.pack_affine(xp))
    bad = dataclasses.replace(cur, sigma_1=bad_s1)
    assert not M.phase2_verify(sigma, bad, proof)

    # tamper a small delta-inverse list family
    rows = [list(r) for r in cur.sigma_1.delta_inv_alphak_yi_ty]
    rows[0][0] = M.G1.gen
    bad_s1 = dataclasses.replace(cur.sigma_1, delta_inv_alphak_yi_ty=rows)
    bad = dataclasses.replace(cur, sigma_1=bad_s1)
    assert not M.phase2_verify(sigma, bad, proof)

    # tamper sigma_1.delta without touching the G2 side
    bad_s1 = dataclasses.replace(cur.sigma_1, delta=M.G1.gen)
    bad = dataclasses.replace(cur, sigma_1=bad_s1)
    assert not M.phase2_verify(sigma, bad, proof)


def test_checked_deserialization_rejects_bad_points():
    """Ceremony files are adversarial: off-curve and small-order points must
    be rejected at load time (arkworks CanonicalDeserialize parity)."""
    good = M._ser_g1(M.G1.gen)
    assert M._de_g1_checked(good) == M.G1.gen
    gx, gy = M.G1.gen
    off = M._ser_g1((gx, (gy + 1) % M.C.Q_MOD))
    with pytest.raises(M.CeremonyFormatError):
        M._de_g1_checked(off)
    good2 = M._ser_g2(M.G2.gen)
    assert M._de_g2_checked(good2) == M.G2.gen
    ((xa, xb), (ya, yb)) = M.G2.gen
    off2 = M._ser_g2(((xa, xb), ((ya + 1) % M.C.Q_MOD, yb)))
    with pytest.raises(M.CeremonyFormatError):
        M._de_g2_checked(off2)
