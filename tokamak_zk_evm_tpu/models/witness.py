"""Witness / instance polynomial builders.

TPU-native counterpart of the reference's `polynomial_structures`
(`libs/src/polynomial_structures/mod.rs`) and `Permutation::to_poly`
(`libs/src/iotools/mod.rs:417-457`): assemble evaluation grids on host
(cheap, sparse bookkeeping) and interpolate with the device bivariate iNTT.
"""

from __future__ import annotations

import numpy as np

from ..fields import R_MOD, fr_root_of_unity
from ..ops import field as F
from ..ops.poly import BiPoly
from .protocol import Instance, PermutationEntry, Placement, SetupParams, SubcircuitInfo, SubcircuitR1CS


def gen_bXY(
    placements: list[Placement],
    infos: list[SubcircuitInfo],
    params: SetupParams,
) -> BiPoly:
    """Interface-witness grid b(X,Y): rows = interface wires [l, l_D),
    columns = placements (`polynomial_structures/mod.rs:132-162`)."""
    m_i, s_max, l, l_d = params.m_i, params.s_max, params.l, params.l_D
    grid = [[0] * s_max for _ in range(m_i)]
    for i, pl in enumerate(placements):
        fm = infos[pl.subcircuit_id].flattenMap
        assert len(pl.variables) == len(fm), "corrupted placement variables"
        for g, val in zip(fm, pl.variables):
            if l <= g < l_d and val:
                grid[g - l][i] = val % R_MOD
    return BiPoly.from_rou_evals(np.asarray(F.pack_fr(grid)))


def _gen_qap_xy(
    placements: list[Placement],
    library: list[SubcircuitR1CS],
    params: SetupParams,
    which: str,
) -> BiPoly:
    """u/v/w(X,Y): per placement, the witness-weighted R1CS column combination
    evaluated on the n-domain (`polynomial_structures/mod.rs:65-102`)."""
    n, s_max = params.n, params.s_max
    grid = np.zeros((n, s_max), dtype=object)
    grid[:] = 0
    for i, pl in enumerate(placements):
        cols = getattr(library[pl.subcircuit_id], f"{which}_cols")
        for wire, col in cols.items():
            v = pl.variables[wire] % R_MOD
            if v == 0:
                continue
            for k, coeff in col:
                grid[k, i] = (grid[k, i] + v * coeff) % R_MOD
    return BiPoly.from_rou_evals(np.asarray(F.pack_fr(grid.tolist())))


def gen_uXY(placements, library, params):
    return _gen_qap_xy(placements, library, params, "A")


def gen_vXY(placements, library, params):
    return _gen_qap_xy(placements, library, params, "B")


def gen_wXY(placements, library, params):
    return _gen_qap_xy(placements, library, params, "C")


def permutation_to_polys(
    entries: list[PermutationEntry], m_i: int, s_max: int
) -> tuple[BiPoly, BiPoly]:
    """s^0, s^1 permutation polynomials (`iotools/mod.rs:417-457`):
    default grid (omega_x^row, omega_y^col), overridden by cycle targets."""
    wx = fr_root_of_unity(m_i)
    wy = fr_root_of_unity(s_max)
    x_pows = [pow(wx, i, R_MOD) for i in range(m_i)]
    y_pows = [pow(wy, j, R_MOD) for j in range(s_max)]
    s0 = [[x_pows[i]] * s_max for i in range(m_i)]
    s1 = [[y_pows[j] for j in range(s_max)] for _ in range(m_i)]
    for e in entries:
        s0[e.row][e.col] = x_pows[e.X]
        s1[e.row][e.col] = y_pows[e.Y]
    return (
        BiPoly.from_rou_evals(np.asarray(F.pack_fr(s0))),
        BiPoly.from_rou_evals(np.asarray(F.pack_fr(s1))),
    )


def gen_a_free_X(instance: Instance, params: SetupParams) -> BiPoly:
    """Public-instance polynomial over the l_free domain
    (`polynomial_structures/mod.rs:104-130`)."""
    m_block = params.l_free - params.l_user
    vals = [v % R_MOD for v in instance.a_pub_user[: params.l_user]]
    vals += [v % R_MOD for v in instance.a_pub_block[:m_block]]
    assert len(vals) == params.l_free
    return BiPoly.from_rou_evals(np.asarray(F.pack_fr([[v] for v in vals])))


def vanishing_poly_x(n: int) -> BiPoly:
    """t_n(X) = X^n - 1 as a (2n, 1) grid (`prove/src/lib.rs:849-862`)."""
    grid = [[0] for _ in range(2 * n)]
    grid[0] = [(-1) % R_MOD]
    grid[n] = [1]
    return BiPoly.from_ints(grid)


def vanishing_poly_y(n: int) -> BiPoly:
    row = [0] * (2 * n)
    row[0] = (-1) % R_MOD
    row[n] = 1
    return BiPoly.from_ints([row])


def lagrange_kl_xy(m_i: int, s_max: int) -> BiPoly:
    """K_{m_i-1}(X) * L_{s_max-1}(Y) (`prove/src/lib.rs:2018-2071`)."""
    k = [[0] for _ in range(m_i)]
    k[m_i - 1] = [1]
    kx = BiPoly.from_rou_evals(np.asarray(F.pack_fr(k)))
    l = [0] * s_max
    l[s_max - 1] = 1
    ly = BiPoly.from_rou_evals(np.asarray(F.pack_fr([l])))
    return kx * ly


def lagrange_k0_xy(m_i: int) -> BiPoly:
    k = [[0] for _ in range(m_i)]
    k[0] = [1]
    return BiPoly.from_rou_evals(np.asarray(F.pack_fr(k)))
