"""Packed Pallas MSM pipeline vs host oracle (interpreter mode on CPU).

The production MSM path (backend/pallas_kernels.py packed pipeline) is
TPU-only at runtime; these tests run its kernels through the Pallas
interpreter so the merge-tree/flush/tail logic and the packed fused
incomplete-add algebra are covered by plain pytest (the hardware oracle is
scripts/tpu_check.py).  Reference MSM engine: libs/src/group_structures/
mod.rs:107-114 (icicle msm::msm).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tokamak_zk_evm_tpu.backend import pallas_kernels as P
from tokamak_zk_evm_tpu.fields import FQ
from tokamak_zk_evm_tpu.host import curve as C
from tokamak_zk_evm_tpu.ops import curve as cv
from tokamak_zk_evm_tpu.ops import field as F

RNG = np.random.default_rng(97)


def rand_points(n):
    return [
        C.g1_scalar_mul_affine(
            C.G1.gen, int.from_bytes(RNG.bytes(16), "little"))
        for _ in range(n)
    ]


def unpack_cols(a):
    """Packed [12, B] device array -> list of host ints per column."""
    h = np.asarray(a)
    lo, hi = h & 0xFFFF, h >> 16
    limbs = np.stack([lo, hi], axis=1).reshape(24, -1)
    return [FQ.from_mont(FQ.from_limbs(limbs[:, i]))
            for i in range(limbs.shape[1])]


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(P, "_INTERPRET", True)


def test_aff_add_packed_matches_host():
    n = 150
    pts1 = rand_points(n)
    pts2 = rand_points(n)
    # lanes 0/1: p1 = infinity; lanes 2/3: p2 = infinity; lane 4: both
    for i in (0, 1, 4):
        pts1[i] = None
    for i in (2, 3, 4):
        pts2[i] = None
    x1, y1, i1 = cv.pack_affine(pts1)
    x2, y2, i2 = cv.pack_affine(pts2)

    def pk(x, y, inf):
        m = jnp.asarray(np.asarray(inf, np.uint32)[None, :] != 0)
        xz = jnp.where(m, jnp.uint32(0), x)
        yz = jnp.where(m, jnp.uint32(0), y)
        return P.pack_fq_rows(xz), P.pack_fq_rows(yz)

    p1 = pk(x1, y1, i1)
    p2 = pk(x2, y2, i2)
    mask = np.ones(n, np.uint32)
    mask[7:20] = 0  # pass-through lanes
    ox, oy = P.aff_add_packed(p1, p2, mask=jnp.asarray(mask))
    gx = unpack_cols(ox)
    gy = unpack_cols(oy)
    for i in range(n):
        if mask[i] == 0:
            want = pts2[i]
        else:
            a = C.G1.from_affine(pts1[i]) if pts1[i] else C.G1.infinity
            b = C.G1.from_affine(pts2[i]) if pts2[i] else C.G1.infinity
            want = C.G1.to_affine(C.G1.add(a, b))
        if want is None:
            assert gx[i] == 0 and gy[i] == 0, f"lane {i}"
        else:
            assert (gx[i], gy[i]) == want, f"lane {i}"


def test_packed_msm_full_pipeline_matches_host(monkeypatch):
    # pin a small-but-structured config: c=8 -> 32 windows, 4 per scan step
    monkeypatch.setitem(P._MSM_PINNED, 16, (8, 4))
    n = 13  # pads to 16
    pts = rand_points(n)
    pts[5] = None  # an infinity input lane
    scalars = [int.from_bytes(RNG.bytes(32), "little") % C.R_MOD
               for i in range(n)]
    scalars[3] = 0
    x, y, inf = cv.pack_affine(pts)
    s = jnp.asarray(F.pack_fr(scalars, mont=False))
    rows = np.asarray(P.g1_msm(s, x, y, inf))
    X = int(F.unpack_fq(rows[0].reshape(24, 1))[0])
    Y = int(F.unpack_fq(rows[1].reshape(24, 1))[0])
    Z = int(F.unpack_fq(rows[2].reshape(24, 1))[0])
    got = C.G1.to_affine((X, Y, Z))
    want = C.G1.msm_affine(scalars, pts)
    assert got == want
