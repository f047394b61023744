"""Packed MSM pipeline: host-checkable pieces.

The Pallas kernels themselves (fused packed affine/jacobian adds, merge
tree) are hardware-validated by scripts/pk_check.py + scripts/
msm_shape_check.py against the sum-check oracle on a real chip — the
Pallas interpreter is impractically slow for fori-looped CIOS kernels.
Here we cover the pure-JAX/host pieces: limb packing, digit extraction,
and the jacobian host combine in g1_msm_finish.
Reference MSM engine: libs/src/group_structures/mod.rs:107-114.
"""

import numpy as np
import jax.numpy as jnp

from tokamak_zk_evm_tpu.backend import pallas_kernels as P
from tokamak_zk_evm_tpu.fields import FQ, R_MOD
from tokamak_zk_evm_tpu.host import curve as C
from tokamak_zk_evm_tpu.ops import field as F

RNG = np.random.default_rng(97)


def test_pack_unpack_roundtrip():
    a = jnp.asarray(RNG.integers(0, 1 << 16, (24, 37), dtype=np.uint32))
    pk = P.pack_fq_rows(a)
    assert pk.shape == (12, 37)
    back = P.unpack_fq_rows(pk)
    assert (np.asarray(back) == np.asarray(a)).all()
    # row i holds limbs 2i (lo) / 2i+1 (hi)
    h = np.asarray(pk)
    assert (h[3] == np.asarray(a)[6] + (np.asarray(a)[7] << 16)).all()


def test_digits_all_matches_host():
    n, c = 64, 13
    scalars = [int.from_bytes(RNG.bytes(32), "little") % R_MOD
               for _ in range(n)]
    sc = jnp.asarray(F.pack_fr(scalars, mont=False))
    digs = np.asarray(P._digits_all(sc, c))
    W = -(-255 // c)
    assert digs.shape == (W, n)
    for i, s in enumerate(scalars):
        for w in range(W):
            assert digs[w, i] == (s >> (w * c)) & ((1 << c) - 1), (w, i)


def test_msm_finish_jacobian_host_combine():
    """Feed g1_msm_finish hand-built packed jacobian singles and check the
    exact host combine: sum 2^(c*w + lev) * P[w, lev]."""
    c, W, NLEV = 4, 3, 4
    pts = {}
    sing = np.zeros((3, W, NLEV, 24), np.uint64)
    for (w, lev) in [(0, 0), (1, 2), (2, 3)]:
        k = int.from_bytes(RNG.bytes(8), "little")
        aff = C.g1_scalar_mul_affine(C.G1.gen, k)
        z = 7 + w + lev  # arbitrary nonzero Z: X' = X z^2, Y' = Y z^3
        X = aff[0] * z * z % C.Q_MOD
        Y = aff[1] * pow(z, 3, C.Q_MOD) % C.Q_MOD
        sing[0, w, lev] = FQ.to_limbs(FQ.to_mont(X))
        sing[1, w, lev] = FQ.to_limbs(FQ.to_mont(Y))
        sing[2, w, lev] = FQ.to_limbs(FQ.to_mont(z))
        pts[(w, lev)] = aff
    packed = (sing[..., 0::2] | (sing[..., 1::2] << 16)).astype(np.uint32)
    rows = np.asarray(P.g1_msm_finish((jnp.asarray(packed), c)))
    gX = int(F.unpack_fq(rows[0].reshape(24, 1))[0])
    gY = int(F.unpack_fq(rows[1].reshape(24, 1))[0])
    gZ = int(F.unpack_fq(rows[2].reshape(24, 1))[0])
    got = C.G1.to_affine((gX, gY, gZ))
    acc = C.G1.infinity
    for (w, lev), aff in pts.items():
        acc = C.G1.add(acc, C.G1.scalar_mul(
            C.G1.from_affine(aff), 1 << (c * w + lev)))
    assert got == C.G1.to_affine(acc)
