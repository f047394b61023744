"""BLS12-381 pairing on host (exact Python ints).

Replaces the reference's arkworks `Bls12_381::multi_pairing`
(`libs/src/group_structures/mod.rs:121-125`).  Pairing cost is milliseconds-
class in the protocol (one 5x5 multi-pairing per verification) and is never
the throughput bottleneck, so it stays on host (SURVEY.md §7.2 step 8).

Construction (standard):
  Fq12 = Fq[w] / (w^12 - 2w^6 + 2)
  which contains Fq2 = Fq[u]/(u^2+1) via u = w^6 - 1, and the sextic twist
  E': y^2 = x^3 + 4(1+u) over Fq2 maps into E(Fq12) by
  (x, y) -> (x * w^2, y * w^3)   [since (1+u) = w^6].
  Ate Miller loop over |u_BLS| = 0xd201000000010000, final exponentiation by
  direct powering with (q^12 - 1)/r (simplicity over speed; this module is a
  correctness anchor — a tuned C++ version can replace it without touching
  callers).

The sign of the BLS parameter is not special-cased: this yields a fixed
bilinear non-degenerate pairing (possibly the inverse of the optimal-ate
normalization), which is all the verifier equations require since both sides
of every check use the same pairing.
"""

from __future__ import annotations

from ..fields import Q_MOD, R_MOD

# BLS parameter |u|; u = -0xd201000000010000
ATE_LOOP_COUNT = 0xD201000000010000

# Fq12 modulus coefficients: w^12 = 2*w^6 - 2
_W12_COEFF_6 = 2
_W12_COEFF_0 = -2

FINAL_EXP = (Q_MOD**12 - 1) // R_MOD


class Fq12:
    """Fq[w]/(w^12 - 2w^6 + 2); elements are 12-tuples of ints."""

    __slots__ = ("c",)

    def __init__(self, coeffs):
        self.c = tuple(x % Q_MOD for x in coeffs)

    @staticmethod
    def zero():
        return Fq12((0,) * 12)

    @staticmethod
    def one():
        return Fq12((1,) + (0,) * 11)

    @staticmethod
    def from_fq(a: int):
        return Fq12((a,) + (0,) * 11)

    def is_one(self) -> bool:
        return self == Fq12.one()

    @staticmethod
    def from_fq2(a):
        """Embed a0 + a1*u with u = w^6 - 1:  (a0 - a1) + a1*w^6."""
        a0, a1 = a
        c = [0] * 12
        c[0] = a0 - a1
        c[6] = a1
        return Fq12(c)

    def __add__(self, o):
        return Fq12(tuple(x + y for x, y in zip(self.c, o.c)))

    def __sub__(self, o):
        return Fq12(tuple(x - y for x, y in zip(self.c, o.c)))

    def __neg__(self):
        return Fq12(tuple(-x for x in self.c))

    def __mul__(self, o):
        a, b = self.c, o.c
        t = [0] * 23
        for i in range(12):
            ai = a[i]
            if ai == 0:
                continue
            for j in range(12):
                t[i + j] += ai * b[j]
        # reduce w^k for k >= 12: w^(12+s) = 2*w^(6+s) - 2*w^s
        for k in range(22, 11, -1):
            v = t[k]
            if v:
                t[k - 6] += 2 * v
                t[k - 12] -= 2 * v
                t[k] = 0
        return Fq12(t[:12])

    def square(self):
        return self * self

    def inv(self):
        # extended Euclid in Fq[w] against the modulus polynomial
        lm, hm = [1] + [0] * 12, [0] * 13
        low = list(self.c) + [0]
        high = [_W12_COEFF_0 % Q_MOD, 0, 0, 0, 0, 0, (-_W12_COEFF_6) % Q_MOD, 0, 0, 0, 0, 0, 1]
        # high = w^12 - 2w^6 + 2 as monic poly coeffs
        high = [(2) % Q_MOD, 0, 0, 0, 0, 0, (-2) % Q_MOD, 0, 0, 0, 0, 0, 1]

        def deg(p):
            for i in reversed(range(len(p))):
                if p[i] % Q_MOD:
                    return i
            return 0

        def poly_rounded_div(a, b):
            dega, degb = deg(a), deg(b)
            temp = [x for x in a]
            out = [0] * len(a)
            binv = pow(b[degb], -1, Q_MOD)
            for i in range(dega - degb, -1, -1):
                out[i] = (out[i] + temp[degb + i] * binv) % Q_MOD
                for c in range(degb + 1):
                    temp[c + i] = (temp[c + i] - out[i] * b[c]) % Q_MOD
            return out[: deg(out) + 1]

        while deg(low):
            r = poly_rounded_div(high, low)
            r += [0] * (13 - len(r))
            nm = [x for x in hm]
            new = [x for x in high]
            for i in range(13):
                for j in range(13 - i):
                    nm[i + j] = (nm[i + j] - lm[i] * r[j]) % Q_MOD
                    new[i + j] = (new[i + j] - low[i] * r[j]) % Q_MOD
            lm, low, hm, high = nm, new, lm, low
        linv = pow(low[0], -1, Q_MOD)
        return Fq12([(x * linv) % Q_MOD for x in lm[:12]])

    def pow(self, e: int):
        result = Fq12.one()
        base = self
        while e:
            if e & 1:
                result = result * base
            base = base.square()
            e >>= 1
        return result

    def __eq__(self, o):
        return self.c == o.c

    def __hash__(self):
        return hash(self.c)


# w powers used by the twist embedding
_W = Fq12((0, 1) + (0,) * 10)
_W2_INV = (_W * _W).inv()
_W3_INV = (_W * _W * _W).inv()


def twist_g2_to_fq12(q_affine):
    """Map a point on E'(Fq2): y^2 = x^3 + 4(1+u) to E(Fq12): y^2 = x^3 + 4
    via (x, y) -> (x/w^2, y/w^3), using w^6 = 1 + u."""
    x, y = q_affine
    return (Fq12.from_fq2(x) * _W2_INV, Fq12.from_fq2(y) * _W3_INV)


def _line_double(r, p):
    """Line through R,R evaluated at P; returns (line_value, 2R).

    r: jacobian-free affine point over Fq12; p: affine over Fq12 (embedded G1).
    """
    xr, yr = r
    xp, yp = p
    three = Fq12.from_fq(3)
    two = Fq12.from_fq(2)
    slope = (xr * xr * three) * (yr * two).inv()
    x3 = slope * slope - xr * two
    y3 = slope * (xr - x3) - yr
    line = slope * (xp - xr) - (yp - yr)
    return line, (x3, y3)


def _line_add(r, q, p):
    xr, yr = r
    xq, yq = q
    xp, yp = p
    if xr == xq and yr == yq:
        return _line_double(r, p)
    if xr == xq:
        # vertical line
        return (xp - xr), None
    slope = (yq - yr) * (xq - xr).inv()
    x3 = slope * slope - xr - xq
    y3 = slope * (xr - x3) - yr
    line = slope * (xp - xr) - (yp - yr)
    return line, (x3, y3)


def miller_loop(p_g1_affine, q_g2_affine) -> Fq12:
    """f_{|u|}(Q)(P) without final exponentiation."""
    if p_g1_affine is None or q_g2_affine is None:
        return Fq12.one()
    px, py = p_g1_affine
    p = (Fq12.from_fq(px), Fq12.from_fq(py))
    q = twist_g2_to_fq12(q_g2_affine)
    f = Fq12.one()
    r = q
    for bit in bin(ATE_LOOP_COUNT)[3:]:
        line, r = _line_double(r, p)
        f = f * f * line
        if bit == "1":
            line, r = _line_add(r, q, p)
            f = f * line
    return f


def final_exponentiation(f: Fq12) -> Fq12:
    return f.pow(FINAL_EXP)


def pairing(p_g1_affine, q_g2_affine) -> Fq12:
    return final_exponentiation(miller_loop(p_g1_affine, q_g2_affine))


def multi_pairing(g1_points, g2_points) -> Fq12:
    """Product of pairings with one shared final exponentiation — the
    host counterpart of arkworks `multi_pairing`."""
    assert len(g1_points) == len(g2_points)
    acc = Fq12.one()
    for p, q in zip(g1_points, g2_points):
        acc = acc * miller_loop(p, q)
    return final_exponentiation(acc)
