"""MPC setup ceremony — multi-party CRS generation.

Reimplements the cryptographic core of the reference's mpc-setup package
(`/root/reference/packages/backend/setup/mpc-setup/src/accumulator.rs:27,
288-321`, `flows/phase2_*.rs`): a phase-1 powers-of-tau accumulator with
per-contributor update proofs and a blake2b hash chain, and a phase-2
circuit-specific transform + delta/gamma/eta contribution flow, producing a
`Sigma` with exactly the trusted-setup layout (models/setup.py).

Differences from the reference, by design (we are not byte-compatible with
its ceremony transcript format):
  * update proofs are Schnorr proofs of knowledge of the update exponents
    (challenge from the blake2b transcript hash) instead of the
    hash-to-G2-based BGM17 PoK — same knowledge-soundness goal without a G2
    hash-to-curve; well-formedness is still enforced by pairing ratio
    checks;
  * the O(n) per-power pairing checks are batched into two pairings via a
    random linear combination (the reference checks powers pairwise).

Phase 1 covers (alpha, x) with y supplied as a public beacon value at
phase-2 prepare, mirroring the reference's "x-only" ceremony
(`flows/phase2_prepare.rs` `y_hex`); gamma/delta/eta are phase-2
contributions (`flows/phase2_next_contributor.rs:253-276`).
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field

from ..fields import R_MOD
from ..host import curve as C
from ..host.pairing import multi_pairing
from .protocol import SetupParams, SubcircuitInfo, SubcircuitR1CS
from .setup import (
    Sigma, Sigma1, Sigma2, gen_evaled_lagrange_bases,
)

G1 = C.G1
G2 = C.G2

N_ALPHA = 4  # Sigma needs alpha^1..alpha^4


def _ser_g1(p) -> str:
    return "inf" if p is None else f"{p[0]:x},{p[1]:x}"


def _ser_g2(p) -> str:
    if p is None:
        return "inf"
    return f"{p[0][0]:x},{p[0][1]:x},{p[1][0]:x},{p[1][1]:x}"


def _de_g1(s):
    if s == "inf":
        return None
    a, b = s.split(",")
    return (int(a, 16), int(b, 16))


def _de_g2(s):
    if s == "inf":
        return None
    a, b, c, d = s.split(",")
    return ((int(a, 16), int(b, 16)), (int(c, 16), int(d, 16)))


class CeremonyFormatError(ValueError):
    pass


def _de_g1_checked(s):
    """Deserialize + validate: on-curve and in the r-order subgroup.

    Ceremony files are adversarial inputs — a contributor could plant
    small-subgroup or off-curve points that pass the batched pairing
    checks (`accumulator.rs` deserializes through arkworks' checked
    CanonicalDeserialize; this is our equivalent)."""
    p = _de_g1(s)
    if p is None:
        return None
    if not G1.is_on_curve_affine(p):
        raise CeremonyFormatError(f"G1 point off-curve: {s[:32]}...")
    if C.g1_scalar_mul_affine(p, R_MOD) is not None:
        raise CeremonyFormatError(f"G1 point outside r-subgroup: {s[:32]}...")
    return p


def _de_g2_checked(s):
    p = _de_g2(s)
    if p is None:
        return None
    if not G2.is_on_curve_affine(p):
        raise CeremonyFormatError(f"G2 point off-curve: {s[:32]}...")
    if C.g2_scalar_mul_affine(p, R_MOD) is not None:
        raise CeremonyFormatError(f"G2 point outside r-subgroup: {s[:32]}...")
    return p


def _g1_mul(p, k):
    return C.g1_scalar_mul_affine(p, k % R_MOD)


def _g2_mul(p, k):
    return C.g2_scalar_mul_affine(p, k % R_MOD)


def _rand_fr(rng) -> int:
    v = 0
    while v == 0:
        v = int.from_bytes(rng.bytes(32), "little") % R_MOD
    return v


# ---------------------------------------------------------------------------
# Schnorr proof of knowledge of an exponent (over G1)
# ---------------------------------------------------------------------------


@dataclass
class SchnorrProof:
    X_g1: object  # x * G1 (the public update point)
    X_g2: object  # x * G2 (for the pairing ratio checks)
    R: object     # k * G1 commitment
    s: int        # k + c*x

    def to_json(self):
        return {"X_g1": _ser_g1(self.X_g1), "X_g2": _ser_g2(self.X_g2),
                "R": _ser_g1(self.R), "s": hex(self.s)}

    @staticmethod
    def from_json(d):
        return SchnorrProof(_de_g1_checked(d["X_g1"]), _de_g2_checked(d["X_g2"]),
                            _de_g1_checked(d["R"]), int(d["s"], 16))


def _schnorr_challenge(tag: bytes, transcript_hash: bytes, X_g1, X_g2, R) -> int:
    h = hashlib.blake2b(digest_size=32)
    h.update(tag)
    h.update(transcript_hash)
    for part in (_ser_g1(X_g1), _ser_g2(X_g2), _ser_g1(R)):
        h.update(part.encode())
    return int.from_bytes(h.digest(), "little") % R_MOD


def schnorr_prove(x: int, tag: bytes, transcript_hash: bytes, rng) -> SchnorrProof:
    X_g1 = _g1_mul(G1.gen, x)
    X_g2 = _g2_mul(G2.gen, x)
    k = _rand_fr(rng)
    R = _g1_mul(G1.gen, k)
    c = _schnorr_challenge(tag, transcript_hash, X_g1, X_g2, R)
    return SchnorrProof(X_g1, X_g2, R, (k + c * x) % R_MOD)


def schnorr_verify(proof: SchnorrProof, tag: bytes, transcript_hash: bytes) -> bool:
    c = _schnorr_challenge(tag, transcript_hash, proof.X_g1, proof.X_g2, proof.R)
    # s*G1 == R + c*X_g1
    lhs = G1.scalar_mul(G1.from_affine(G1.gen), proof.s)
    rhs = G1.add(G1.from_affine(proof.R),
                 G1.scalar_mul(G1.from_affine(proof.X_g1), c))
    if G1.to_affine(lhs) != G1.to_affine(rhs):
        return False
    # X_g1 and X_g2 carry the same exponent: e(X_g1, G2) == e(G1, X_g2)
    neg = G1.to_affine(G1.neg(G1.from_affine(proof.X_g1)))
    return multi_pairing([neg, G1.gen], [G2.gen, proof.X_g2]).is_one()


# ---------------------------------------------------------------------------
# Phase 1: powers-of-tau accumulator (alpha^1..4, x^1..x_len, alpha^k x^h)
# ---------------------------------------------------------------------------


@dataclass
class Phase1Proof:
    contributor_index: int
    proof_alpha: SchnorrProof
    proof_x: SchnorrProof

    def to_json(self):
        return {"contributor_index": self.contributor_index,
                "proof_alpha": self.proof_alpha.to_json(),
                "proof_x": self.proof_x.to_json()}

    @staticmethod
    def from_json(d):
        return Phase1Proof(d["contributor_index"],
                           SchnorrProof.from_json(d["proof_alpha"]),
                           SchnorrProof.from_json(d["proof_x"]))


@dataclass
class Phase1Accumulator:
    """Powers-of-tau state after `contributor_index` contributions.

    x_g1[h]       = x^(h+1) * G1,            h in [0, x_len)
    alpha_g1[k]   = alpha^(k+1) * G1,        k in [0, 4)
    alpha_g2[k]   = alpha^(k+1) * G2
    alpha_x_g1[k][h] = alpha^(k+1) x^(h+1) * G1,  h in [0, n)
    x_g2          = x * G2
    """

    contributor_index: int
    x_len: int
    ax_len: int
    x_g1: list
    x_g2: object
    alpha_g1: list
    alpha_g2: list
    alpha_x_g1: list

    @staticmethod
    def initial(params: SetupParams) -> "Phase1Accumulator":
        x_len = max(2 * params.n, 2 * params.m_i) - 1
        # cross powers serve the QAP mixture (x^0..x^(n-1)) AND the
        # vanishing-poly zk families (alpha^k x^(h + n | m_i), h <= 2)
        ax_len = max(params.n, params.m_i) + 2
        return Phase1Accumulator(
            contributor_index=0,
            x_len=x_len,
            ax_len=ax_len,
            x_g1=[G1.gen] * x_len,
            x_g2=G2.gen,
            alpha_g1=[G1.gen] * N_ALPHA,
            alpha_g2=[G2.gen] * N_ALPHA,
            alpha_x_g1=[[G1.gen] * ax_len for _ in range(N_ALPHA)],
        )

    @staticmethod
    def from_dusk(params: SetupParams, source) -> "Phase1Accumulator":
        """Seed phase 1 from a Dusk powers-of-tau transcript
        (models/dusk_pot.py) instead of the identity state — the
        reference's `dusk_backed_mpc_setup` flow (`phase1_source.rs`):
        x := tau, alpha^k := tau^(2nk), so the external ceremony's
        randomness is the first contribution.  Later contributors apply
        their updates on top exactly as in the native flow."""
        base = Phase1Accumulator.initial(params)
        n_src = max(params.n, params.m_i)
        assert source.n == n_src, "source sized for a different domain"
        # x_len = 2*max(n, m_i) - 1 < 2*n_src: no overlap with alpha=tau^2n
        return Phase1Accumulator(
            contributor_index=1,
            x_len=base.x_len,
            ax_len=base.ax_len,
            x_g1=source.x_g1_range(1, base.x_len),
            x_g2=source.x_g2(),
            alpha_g1=[source.alphax_g1(k + 1, 0) for k in range(N_ALPHA)],
            alpha_g2=[source.alpha_g2(k + 1) for k in range(N_ALPHA)],
            alpha_x_g1=[
                [source.alphax_g1(k + 1, h + 1) for h in range(base.ax_len)]
                for k in range(N_ALPHA)
            ],
        )

    # -- hash chain (accumulator.rs:322-345) ----------------------------
    def hash(self) -> bytes:
        h = hashlib.blake2b(digest_size=64)
        h.update(str(self.contributor_index).encode())
        for p in self.x_g1:
            h.update(_ser_g1(p).encode())
        h.update(_ser_g2(self.x_g2).encode())
        for p in self.alpha_g1:
            h.update(_ser_g1(p).encode())
        for p in self.alpha_g2:
            h.update(_ser_g2(p).encode())
        for row in self.alpha_x_g1:
            for p in row:
                h.update(_ser_g1(p).encode())
        return h.digest()

    # -- contribution (accumulator.rs:288-309) --------------------------
    def compute(self, rng) -> tuple["Phase1Accumulator", Phase1Proof]:
        alpha_u = _rand_fr(rng)
        x_u = _rand_fr(rng)
        th = self.hash()
        proof = Phase1Proof(
            contributor_index=self.contributor_index + 1,
            proof_alpha=schnorr_prove(alpha_u, b"tzk/p1/alpha", th, rng),
            proof_x=schnorr_prove(x_u, b"tzk/p1/x", th, rng),
        )
        xp = 1
        x_pows = []
        for _ in range(max(self.x_len, self.ax_len)):
            xp = xp * x_u % R_MOD
            x_pows.append(xp)
        a_pows = []
        ap = 1
        for _ in range(N_ALPHA):
            ap = ap * alpha_u % R_MOD
            a_pows.append(ap)
        acc = Phase1Accumulator(
            contributor_index=self.contributor_index + 1,
            x_len=self.x_len,
            ax_len=self.ax_len,
            x_g1=[_g1_mul(p, w) for p, w in zip(self.x_g1, x_pows)],
            x_g2=_g2_mul(self.x_g2, x_u),
            alpha_g1=[_g1_mul(p, w) for p, w in zip(self.alpha_g1, a_pows)],
            alpha_g2=[_g2_mul(p, w) for p, w in zip(self.alpha_g2, a_pows)],
            alpha_x_g1=[
                [_g1_mul(p, (a_pows[k] * x_pows[h]) % R_MOD)
                 for h, p in enumerate(row)]
                for k, row in enumerate(self.alpha_x_g1)
            ],
        )
        return acc, proof

    # -- verification (utils.rs verify_phase1_x_only) -------------------
    def verify(self, cur: "Phase1Accumulator", proof: Phase1Proof,
               rng=None) -> bool:
        if rng is None:
            # batching weights MUST be verifier-fresh: seeding them from the
            # previous accumulator (known to the contributor before they
            # contribute) would let a malicious update craft per-power errors
            # e_h with sum(r_h*e_h) = 0 that pass the batched checks
            from ..utils.rng import secure_rng

            rng = secure_rng()
        th = self.hash()
        if not schnorr_verify(proof.proof_alpha, b"tzk/p1/alpha", th):
            return False
        if not schnorr_verify(proof.proof_x, b"tzk/p1/x", th):
            return False
        # update consistency: e(cur.x_g1[0], G2) == e(prev.x_g1[0], x'_G2)
        pair_checks = [
            (cur.x_g1[0], G2.gen, self.x_g1[0], proof.proof_x.X_g2),
            (cur.alpha_g1[0], G2.gen, self.alpha_g1[0], proof.proof_alpha.X_g2),
            # cur.x_g2 = x' * prev.x_g2
            (G1.gen, cur.x_g2, proof.proof_x.X_g1, self.x_g2),
        ]
        for a, b, c, d in pair_checks:
            na = G1.to_affine(G1.neg(G1.from_affine(a)))
            if not multi_pairing([na, c], [b, d]).is_one():
                return False
        # power-sequence well-formedness, batched with random weights:
        #   e(sum r_h x_g1[h+1], G2) == e(sum r_h x_g1[h], x_g2)
        def batch_shift_check(points, g2_shift):
            if len(points) < 2:
                return True
            rs = [_rand_fr(rng) for _ in range(len(points) - 1)]
            hi = G1.infinity
            lo = G1.infinity
            for r, ph, pl in zip(rs, points[1:], points[:-1]):
                hi = G1.add(hi, G1.scalar_mul(G1.from_affine(ph), r))
                lo = G1.add(lo, G1.scalar_mul(G1.from_affine(pl), r))
            nhi = G1.to_affine(G1.neg(hi))
            return multi_pairing(
                [nhi, G1.to_affine(lo)], [G2.gen, g2_shift]
            ).is_one()

        if not batch_shift_check([G1.gen] + cur.x_g1, cur.x_g2):
            return False
        if not batch_shift_check(cur.alpha_g1, cur.alpha_g2[0]):
            return False
        # alpha_g2 sequence mirrors alpha_g1: e(alpha_g1[k], G2)==e(G1, alpha_g2[k])
        for k in range(N_ALPHA):
            na = G1.to_affine(G1.neg(G1.from_affine(cur.alpha_g1[k])))
            if not multi_pairing([na, G1.gen], [G2.gen, cur.alpha_g2[k]]).is_one():
                return False
        # cross terms: e(alpha_x[k][h], G2) == e(x_g1[h], alpha_g2[k]), batched
        for k in range(N_ALPHA):
            rs = [_rand_fr(rng) for _ in range(cur.ax_len)]
            cross = G1.infinity
            xs = G1.infinity
            for r, pc, px in zip(rs, cur.alpha_x_g1[k], cur.x_g1[: cur.ax_len]):
                cross = G1.add(cross, G1.scalar_mul(G1.from_affine(pc), r))
                xs = G1.add(xs, G1.scalar_mul(G1.from_affine(px), r))
            nc = G1.to_affine(G1.neg(cross))
            if not multi_pairing(
                [nc, G1.to_affine(xs)], [G2.gen, cur.alpha_g2[k]]
            ).is_one():
                return False
        return cur.contributor_index == self.contributor_index + 1

    # -- persistence (file-granular, like the reference ceremony) -------
    def to_json(self):
        return {
            "contributor_index": self.contributor_index,
            "x_len": self.x_len,
            "ax_len": self.ax_len,
            "x_g1": [_ser_g1(p) for p in self.x_g1],
            "x_g2": _ser_g2(self.x_g2),
            "alpha_g1": [_ser_g1(p) for p in self.alpha_g1],
            "alpha_g2": [_ser_g2(p) for p in self.alpha_g2],
            "alpha_x_g1": [[_ser_g1(p) for p in row] for row in self.alpha_x_g1],
        }

    def save(self, path: str):
        with open(path, "w") as f:
            json.dump(self.to_json(), f)

    @staticmethod
    def from_json(d) -> "Phase1Accumulator":
        return Phase1Accumulator(
            contributor_index=d["contributor_index"],
            x_len=d["x_len"],
            ax_len=d["ax_len"],
            x_g1=[_de_g1_checked(s) for s in d["x_g1"]],
            x_g2=_de_g2_checked(d["x_g2"]),
            alpha_g1=[_de_g1_checked(s) for s in d["alpha_g1"]],
            alpha_g2=[_de_g2_checked(s) for s in d["alpha_g2"]],
            alpha_x_g1=[[_de_g1_checked(s) for s in row]
                        for row in d["alpha_x_g1"]],
        )

    @staticmethod
    def load(path: str) -> "Phase1Accumulator":
        with open(path) as f:
            return Phase1Accumulator.from_json(json.load(f))


# ---------------------------------------------------------------------------
# Phase 2: circuit-specific transform + gamma/delta/eta contributions
# ---------------------------------------------------------------------------


def _group_lagrange_points(power_points, size: int):
    """L_k(x)*G for all k from [x^0*G .. x^(size-1)*G]: the Lagrange change
    of basis applied in the exponent (a group iNTT).  Host-exact; the
    ceremony runs offline at setup time."""
    from ..fields import fr_root_of_unity

    omega_inv = pow(fr_root_of_unity(size), -1, R_MOD)
    n_inv = pow(size, -1, R_MOD)
    out = []
    for k in range(size):
        # L_k(x) = (1/size) * sum_h omega^(-k h) x^h
        acc = G1.infinity
        wk = pow(omega_inv, k, R_MOD)
        w = 1
        for h in range(size):
            acc = G1.add(acc, G1.scalar_mul(G1.from_affine(power_points[h]), w))
            w = w * wk % R_MOD
        out.append(G1.to_affine(G1.scalar_mul(acc, n_inv)))
    return out


def phase2_prepare(
    acc: Phase1Accumulator,
    y: int,
    params: SetupParams,
    library: list[SubcircuitR1CS],
    infos: list[SubcircuitInfo],
) -> Sigma:
    """Phase-1 powers + public beacon y -> initial Sigma with
    gamma = delta = eta = 1 (`flows/phase2_prepare.rs`).

    All x/alpha-dependent terms are evaluated IN THE EXPONENT (nobody knows
    x or alpha); y/gamma/delta/eta terms are scalar operations.
    """
    from ..ops import curve as cv

    n, s_max, l, l_free = params.n, params.s_max, params.l, params.l_free
    l_user, l_user_out = params.l_user, params.l_user_out
    m_i, m_d = params.m_i, params.m_D
    m_block = l_free - l_user
    m_function = l - l_free
    y %= R_MOD

    pow1 = [G1.gen] + acc.x_g1  # x^0..x^x_len in the exponent

    # xy_powers[h * 2s_max + i] = y^i * (x^h G1)
    h_max = max(2 * n, 2 * m_i)
    rs_y = 2 * s_max
    y_pows = []
    yp = 1
    for _ in range(rs_y):
        y_pows.append(yp)
        yp = yp * y % R_MOD
    xy_points = []
    for h in range(h_max):
        base = G1.from_affine(pow1[h])
        for i in range(rs_y):
            xy_points.append(G1.to_affine(G1.scalar_mul(base, y_pows[i])))
    xy_powers = cv.pack_affine(xy_points)

    # Lagrange bases in the exponent
    k_pts = _group_lagrange_points(pow1, m_i)                    # K_j(x) G1
    m_pts = _group_lagrange_points(pow1, l_free)                 # M_j(x) G1
    a4_pow1 = [acc.alpha_g1[3]] + acc.alpha_x_g1[3]              # a^4 x^h G1
    k_a4_pts = _group_lagrange_points(a4_pow1, m_i)              # a^4 K_j(x) G1

    # o_vec in the exponent: o_j = sum_k (alpha u + alpha^2 v + alpha^3 w)
    # over the x-Lagrange basis applied to the R1CS columns
    lag_per_alpha = [
        _group_lagrange_points([acc.alpha_g1[k]] + acc.alpha_x_g1[k], n)
        for k in range(3)
    ]
    o_pts = [None] * m_d  # None == identity (o_j = 0)
    for r1cs, info in zip(library, infos):
        local = [G1.infinity for _ in range(info.Nwires)]
        touched = [False] * info.Nwires
        for k, cols in enumerate((r1cs.A_cols, r1cs.B_cols, r1cs.C_cols)):
            basis = lag_per_alpha[k]
            for wire, col in cols.items():
                for row, coeff in col:
                    local[wire] = G1.add(
                        local[wire],
                        G1.scalar_mul(G1.from_affine(basis[row]), coeff % R_MOD),
                    )
                    touched[wire] = True
        for local_idx, g in enumerate(info.flattenMap):
            if touched[local_idx]:
                o_pts[g] = G1.to_affine(local[local_idx])

    l_vec = gen_evaled_lagrange_bases(y, s_max)  # scalars (y public)

    # gamma_inv_o_inst with gamma = 1 (`group_structures/mod.rs:408-447`)
    user_vec = (
        [l_vec[0]] * l_user_out
        + [l_vec[1]] * (l_user - l_user_out)
        + [l_vec[2]] * m_block
        + [l_vec[3]] * m_function
    )
    gi_pts = []
    for j in range(l):
        p = G1.infinity
        if o_pts[j] is not None:
            p = G1.scalar_mul(G1.from_affine(o_pts[j]), user_vec[j])
        if j < l_free:
            p = G1.add(p, G1.from_affine(m_pts[j]))
        gi_pts.append(G1.to_affine(p))
    gamma_inv_o_inst = cv.pack_affine(gi_pts)

    # eta = 1: L_i(y) (o_{l+j} + alpha^4 K_j(x)), idx = j*s_max + i
    inter_pts = []
    for j in range(m_i):
        base = G1.from_affine(k_a4_pts[j])
        if o_pts[l + j] is not None:
            base = G1.add(base, G1.from_affine(o_pts[l + j]))
        for i in range(s_max):
            inter_pts.append(G1.to_affine(G1.scalar_mul(base, l_vec[i])))
    eta_inv_li_o_inter = cv.pack_affine(inter_pts)

    # delta = 1: L_i(y) o_j for private wires
    prv_pts = []
    for j in range(m_d - params.l_D):
        oj = o_pts[params.l_D + j]
        base = G1.infinity if oj is None else G1.from_affine(oj)
        for i in range(s_max):
            prv_pts.append(G1.to_affine(G1.scalar_mul(base, l_vec[i])))
    delta_inv_li_o_prv = cv.pack_affine(prv_pts)

    # vanishing-poly zk families: t_n(x) alpha^k x^h G1 etc. (delta = 1)
    def tx_family(exponent, k_alpha, hs):
        # alpha^k x^h (x^exponent - 1) G1 = alpha^k x^(h+exponent) G1 - alpha^k x^h G1
        fam = [acc.alpha_g1[k_alpha - 1]] + acc.alpha_x_g1[k_alpha - 1]
        # alpha_x only goes to n powers; extend with scalar math impossible —
        # use pairing-free identity: x^(h+e) alpha^k G1 needs h+e <= len
        out = []
        for h in hs:
            hi = fam[h + exponent] if h + exponent < len(fam) else None
            assert hi is not None, "phase-1 cross powers too short"
            p = G1.add(G1.from_affine(hi),
                       G1.neg(G1.from_affine(fam[h])))
            out.append(G1.to_affine(p))
        return out

    t_x_n = [tx_family(n, k, range(3)) for k in (1, 2, 3)]
    dx4 = tx_family(m_i, 4, range(2))

    t_y = (pow(y, s_max, R_MOD) - 1) % R_MOD
    dyi = [
        [
            _g1_mul(acc.alpha_g1[k - 1], (pow(y, i, R_MOD) * t_y) % R_MOD)
            for i in range(3)
        ]
        for k in range(1, 5)
    ]

    lagrange_KL = G1.to_affine(
        G1.scalar_mul(G1.from_affine(k_pts[m_i - 1]), l_vec[s_max - 1])
    )

    sigma1 = Sigma1(
        xy_powers=xy_powers,
        h_max=h_max,
        rs_y=rs_y,
        gamma_inv_o_inst=gamma_inv_o_inst,
        eta_inv_li_o_inter_alpha4_kj=eta_inv_li_o_inter,
        delta_inv_li_o_prv=delta_inv_li_o_prv,
        x=pow1[1],
        y=_g1_mul(G1.gen, y),
        delta=G1.gen,
        eta=G1.gen,
        delta_inv_alphak_xh_tx=t_x_n,
        delta_inv_alpha4_xj_tx=dx4,
        delta_inv_alphak_yi_ty=dyi,
    )
    sigma2 = Sigma2(
        alpha=acc.alpha_g2[0],
        alpha2=acc.alpha_g2[1],
        alpha3=acc.alpha_g2[2],
        alpha4=acc.alpha_g2[3],
        gamma=G2.gen,
        delta=G2.gen,
        eta=G2.gen,
        x=acc.x_g2,
        y=_g2_mul(G2.gen, y),
    )
    return Sigma(G=G1.gen, H=G2.gen, sigma_1=sigma1, sigma_2=sigma2,
                 lagrange_KL=lagrange_KL)


@dataclass
class Phase2Proof:
    contributor_index: int
    proof_gamma: SchnorrProof
    proof_delta: SchnorrProof
    proof_eta: SchnorrProof

    def to_json(self):
        return {"contributor_index": self.contributor_index,
                "proof_gamma": self.proof_gamma.to_json(),
                "proof_delta": self.proof_delta.to_json(),
                "proof_eta": self.proof_eta.to_json()}


def _sigma_hash(sigma: Sigma) -> bytes:
    import numpy as np

    h = hashlib.blake2b(digest_size=64)
    for fam in (sigma.sigma_1.xy_powers, sigma.sigma_1.gamma_inv_o_inst,
                sigma.sigma_1.eta_inv_li_o_inter_alpha4_kj,
                sigma.sigma_1.delta_inv_li_o_prv):
        for c in fam:
            h.update(np.asarray(c).tobytes())
    for p in (sigma.sigma_1.x, sigma.sigma_1.y, sigma.sigma_1.delta,
              sigma.sigma_1.eta, sigma.lagrange_KL):
        h.update(_ser_g1(p).encode())
    for k in ("alpha", "alpha2", "alpha3", "alpha4", "gamma", "delta",
              "eta", "x", "y"):
        h.update(_ser_g2(getattr(sigma.sigma_2, k)).encode())
    return h.digest()


def _scale_family(fam, scalar: int):
    """Multiply every point of a packed device family by one scalar."""
    from ..ops import curve as cv

    pts = cv.unpack_affine(fam)
    out = [
        None if p is None else _g1_mul(p, scalar)
        for p in pts
    ]
    return cv.pack_affine(out)


def phase2_contribute(sigma: Sigma, rng) -> tuple[Sigma, Phase2Proof]:
    """One gamma/delta/eta contribution
    (`flows/phase2_next_contributor.rs:253-320`)."""
    gamma_u = _rand_fr(rng)
    delta_u = _rand_fr(rng)
    eta_u = _rand_fr(rng)
    gamma_inv = pow(gamma_u, -1, R_MOD)
    delta_inv = pow(delta_u, -1, R_MOD)
    eta_inv = pow(eta_u, -1, R_MOD)
    th = _sigma_hash(sigma)
    proof = Phase2Proof(
        contributor_index=0,
        proof_gamma=schnorr_prove(gamma_u, b"tzk/p2/gamma", th, rng),
        proof_delta=schnorr_prove(delta_u, b"tzk/p2/delta", th, rng),
        proof_eta=schnorr_prove(eta_u, b"tzk/p2/eta", th, rng),
    )
    s1, s2 = sigma.sigma_1, sigma.sigma_2
    new_s1 = Sigma1(
        xy_powers=s1.xy_powers,
        h_max=s1.h_max,
        rs_y=s1.rs_y,
        gamma_inv_o_inst=_scale_family(s1.gamma_inv_o_inst, gamma_inv),
        eta_inv_li_o_inter_alpha4_kj=_scale_family(
            s1.eta_inv_li_o_inter_alpha4_kj, eta_inv
        ),
        delta_inv_li_o_prv=_scale_family(s1.delta_inv_li_o_prv, delta_inv),
        x=s1.x,
        y=s1.y,
        delta=_g1_mul(s1.delta, delta_u),
        eta=_g1_mul(s1.eta, eta_u),
        delta_inv_alphak_xh_tx=[
            [_g1_mul(p, delta_inv) for p in row]
            for row in s1.delta_inv_alphak_xh_tx
        ],
        delta_inv_alpha4_xj_tx=[
            _g1_mul(p, delta_inv) for p in s1.delta_inv_alpha4_xj_tx
        ],
        delta_inv_alphak_yi_ty=[
            [_g1_mul(p, delta_inv) for p in row]
            for row in s1.delta_inv_alphak_yi_ty
        ],
    )
    new_s2 = Sigma2(
        alpha=s2.alpha, alpha2=s2.alpha2, alpha3=s2.alpha3, alpha4=s2.alpha4,
        gamma=_g2_mul(s2.gamma, gamma_u),
        delta=_g2_mul(s2.delta, delta_u),
        eta=_g2_mul(s2.eta, eta_u),
        x=s2.x, y=s2.y,
    )
    new_sigma = Sigma(G=sigma.G, H=sigma.H, sigma_1=new_s1, sigma_2=new_s2,
                      lagrange_KL=sigma.lagrange_KL)
    return new_sigma, proof


def _points_equal(a, b) -> bool:
    return (a is None and b is None) or (a is not None and b is not None
                                         and tuple(a) == tuple(b))


def _packed_equal(fam_a, fam_b) -> bool:
    import numpy as np

    ax, ay, ai = (np.asarray(t) for t in fam_a)
    bx, by, bi = (np.asarray(t) for t in fam_b)
    return (ax.shape == bx.shape and np.array_equal(ax, bx)
            and np.array_equal(ay, by) and np.array_equal(ai, bi))


def _rlc_packed(fam, weights):
    """Random linear combination sum_i w_i * P_i over a packed family."""
    from ..ops import msm as msm_mod

    scalars = msm_mod.scalars_from_ints(weights)
    return msm_mod.msm(scalars, *fam)


def phase2_verify(prev: Sigma, cur: Sigma, proof: Phase2Proof,
                  rng=None) -> bool:
    """Pairing + PoK checks that `cur` is a valid contribution over `prev`.

    Every Sigma field is covered: immutable fields by exact equality,
    gamma/delta/eta-scaled fields by pairing ratio checks, and the large
    inverse-scaled families by ONE random-linear-combination pairing check
    each with verifier-fresh weights (sound: a contributor cannot predict
    the weights, so any nonzero per-point error survives the combination
    with overwhelming probability).  Mirrors `flows/phase2_verify.rs`
    except the reference checks points pairwise.
    """
    from ..utils.rng import secure_rng

    if rng is None:
        rng = secure_rng()
    th = _sigma_hash(prev)
    for tag, p in ((b"tzk/p2/gamma", proof.proof_gamma),
                   (b"tzk/p2/delta", proof.proof_delta),
                   (b"tzk/p2/eta", proof.proof_eta)):
        if not schnorr_verify(p, tag, th):
            return False
    # -- immutable fields must be byte-identical ------------------------
    s1p, s1c, s2p, s2c = (prev.sigma_1, cur.sigma_1,
                          prev.sigma_2, cur.sigma_2)
    if not (_points_equal(prev.G, cur.G) and _points_equal(prev.H, cur.H)
            and _points_equal(prev.lagrange_KL, cur.lagrange_KL)):
        return False
    if not (_points_equal(s1p.x, s1c.x) and _points_equal(s1p.y, s1c.y)):
        return False
    if s1p.h_max != s1c.h_max or s1p.rs_y != s1c.rs_y:
        return False
    if not _packed_equal(s1p.xy_powers, s1c.xy_powers):
        return False
    for k in ("alpha", "alpha2", "alpha3", "alpha4", "x", "y"):
        if not _points_equal(getattr(s2p, k), getattr(s2c, k)):
            return False
    # -- G2 updates carry the claimed exponents -------------------------
    #   e(G1, cur.gamma_G2) == e(X_gamma_g1, prev.gamma_G2)  etc.
    ng = G1.to_affine(G1.neg(G1.from_affine(G1.gen)))
    for g2_prev, g2_cur, pk in (
        (s2p.gamma, s2c.gamma, proof.proof_gamma),
        (s2p.delta, s2c.delta, proof.proof_delta),
        (s2p.eta, s2c.eta, proof.proof_eta),
    ):
        if not multi_pairing([ng, pk.X_g1], [g2_cur, g2_prev]).is_one():
            return False
    # -- sigma_1.delta / sigma_1.eta scaled by the same exponent as G2 --
    #   e(cur.s1.delta, prev.s2.delta) == e(prev.s1.delta, cur.s2.delta)
    for g1_prev, g1_cur, g2_prev, g2_cur in (
        (s1p.delta, s1c.delta, s2p.delta, s2c.delta),
        (s1p.eta, s1c.eta, s2p.eta, s2c.eta),
    ):
        nc = G1.to_affine(G1.neg(G1.from_affine(g1_cur)))
        if not multi_pairing([nc, g1_prev], [g2_prev, g2_cur]).is_one():
            return False

    # -- inverse-scaled families: full random-linear-combination check --
    #   cur_i = u^-1 prev_i with g2_cur = u g2_prev
    #   => e(sum w_i cur_i, g2_cur) == e(sum w_i prev_i, g2_prev)
    def rlc_check(comb_prev, comb_cur, g2_prev, g2_cur):
        if comb_prev is None and comb_cur is None:
            return True
        if comb_prev is None or comb_cur is None:
            return False
        ncb = G1.to_affine(G1.neg(G1.from_affine(comb_cur)))
        return multi_pairing([ncb, comb_prev], [g2_cur, g2_prev]).is_one()

    def fam_check_packed(fam_prev, fam_cur, g2_prev, g2_cur):
        import numpy as np

        n_prev = int(np.asarray(fam_prev[2]).size)
        n_cur = int(np.asarray(fam_cur[2]).size)
        if n_prev != n_cur:
            return False
        ws = [_rand_fr(rng) for _ in range(n_prev)]
        return rlc_check(_rlc_packed(fam_prev, ws), _rlc_packed(fam_cur, ws),
                         g2_prev, g2_cur)

    if not fam_check_packed(s1p.gamma_inv_o_inst, s1c.gamma_inv_o_inst,
                            s2p.gamma, s2c.gamma):
        return False
    if not fam_check_packed(s1p.eta_inv_li_o_inter_alpha4_kj,
                            s1c.eta_inv_li_o_inter_alpha4_kj,
                            s2p.eta, s2c.eta):
        return False
    if not fam_check_packed(s1p.delta_inv_li_o_prv, s1c.delta_inv_li_o_prv,
                            s2p.delta, s2c.delta):
        return False

    # -- small delta-inverse list families (host RLC) -------------------
    def flatten(fam):
        out = []
        for item in fam:
            if isinstance(item, (list, tuple)) and item \
                    and isinstance(item[0], (list, tuple)) \
                    and not (len(item) == 2 and isinstance(item[0], int)):
                out.extend(item)
            else:
                out.append(item)
        return out

    def fam_check_list(list_prev, list_cur, g2_prev, g2_cur):
        pts_prev, pts_cur = flatten(list_prev), flatten(list_cur)
        if len(pts_prev) != len(pts_cur):
            return False
        acc_prev, acc_cur = G1.infinity, G1.infinity
        for a, b in zip(pts_prev, pts_cur):
            if (a is None) != (b is None):
                return False
            if a is None:
                continue
            w = _rand_fr(rng)
            acc_prev = G1.add(acc_prev, G1.scalar_mul(G1.from_affine(a), w))
            acc_cur = G1.add(acc_cur, G1.scalar_mul(G1.from_affine(b), w))
        return rlc_check(G1.to_affine(acc_prev), G1.to_affine(acc_cur),
                         g2_prev, g2_cur)

    for fam_prev, fam_cur in (
        (s1p.delta_inv_alphak_xh_tx, s1c.delta_inv_alphak_xh_tx),
        ([s1p.delta_inv_alpha4_xj_tx], [s1c.delta_inv_alpha4_xj_tx]),
        (s1p.delta_inv_alphak_yi_ty, s1c.delta_inv_alphak_yi_ty),
    ):
        if not fam_check_list(fam_prev, fam_cur, s2p.delta, s2c.delta):
            return False
    return True
