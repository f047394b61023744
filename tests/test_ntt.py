"""NTT kernel vs host oracle: forward/inverse, cosets, bivariate."""

import numpy as np
import pytest

from tokamak_zk_evm_tpu.fields import FR, R_MOD, fr_root_of_unity
from tokamak_zk_evm_tpu.host import reference as ref
from tokamak_zk_evm_tpu.ops import field as F
from tokamak_zk_evm_tpu.ops import ntt

RNG = np.random.default_rng(11)


def rand_fr(n):
    return [int.from_bytes(RNG.bytes(32), "little") % R_MOD for _ in range(n)]


@pytest.mark.parametrize("n", [1, 2, 8, 32])
def test_forward_matches_dft(n):
    coeffs = rand_fr(n)
    a = np.asarray(F.pack_fr([coeffs]))  # [16, 1, n]
    out = F.unpack_fr(np.asarray(ntt.ntt_batched(a)))
    assert list(out[0]) == ref.dft(coeffs)


@pytest.mark.parametrize("n", [2, 16])
def test_inverse_roundtrip(n):
    coeffs = rand_fr(n)
    a = np.asarray(F.pack_fr([coeffs]))
    evals = ntt.ntt_batched(a)
    back = F.unpack_fr(np.asarray(ntt.ntt_batched(evals, inverse=True)))
    assert list(back[0]) == coeffs


def test_coset_forward_and_inverse():
    n = 16
    coeffs = rand_fr(n)
    coset = 5
    a = np.asarray(F.pack_fr([coeffs]))
    evals = ntt.ntt_batched(a, coset=coset)
    got = F.unpack_fr(np.asarray(evals))
    assert list(got[0]) == ref.dft(coeffs, coset=coset)
    back = F.unpack_fr(np.asarray(ntt.ntt_batched(evals, inverse=True, coset=coset)))
    assert list(back[0]) == coeffs


def test_batched_rows_independent():
    n = 8
    rows = [rand_fr(n) for _ in range(3)]
    a = np.asarray(F.pack_fr(rows))
    out = F.unpack_fr(np.asarray(ntt.ntt_batched(a)))
    for i, row in enumerate(rows):
        assert list(out[i]) == ref.dft(row)


def test_bivariate_matches_oracle():
    x_size, y_size = 8, 4
    grid = [rand_fr(y_size) for _ in range(x_size)]
    a = np.asarray(F.pack_fr(grid))  # [16, x, y]
    evals = F.unpack_fr(np.asarray(ntt.bintt(a)))
    want = ref.bi_dft(grid)
    for i in range(x_size):
        assert list(evals[i]) == want[i]
    # eval grid points directly
    wx, wy = fr_root_of_unity(x_size), fr_root_of_unity(y_size)
    assert int(evals[3][2]) == ref.poly_eval_xy(
        grid, pow(wx, 3, R_MOD), pow(wy, 2, R_MOD)
    )


def test_bivariate_coset_roundtrip():
    x_size, y_size = 4, 8
    grid = [rand_fr(y_size) for _ in range(x_size)]
    a = np.asarray(F.pack_fr(grid))
    cx, cy = 7, 11
    evals = ntt.bintt(a, coset_x=cx, coset_y=cy)
    want = ref.bi_dft(grid, coset_x=cx, coset_y=cy)
    got = F.unpack_fr(np.asarray(evals))
    for i in range(x_size):
        assert list(got[i]) == want[i]
    back = F.unpack_fr(np.asarray(ntt.bintt(evals, inverse=True, coset_x=cx, coset_y=cy)))
    for i in range(x_size):
        assert list(back[i]) == grid[i]
