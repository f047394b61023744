"""Multi-chip sharding tests on the virtual 8-device CPU mesh (SURVEY.md §7.2
step 9): distributed bivariate NTT (all-to-all transpose) and distributed MSM
(points sharded, one partial point per chip)."""

import jax
import jax.numpy as jnp
import numpy as np

from tokamak_zk_evm_tpu.fields import R_MOD
from tokamak_zk_evm_tpu.host import curve as C
from tokamak_zk_evm_tpu.ops import curve as cv
from tokamak_zk_evm_tpu.ops import field as F
from tokamak_zk_evm_tpu.ops import msm as msm_mod
from tokamak_zk_evm_tpu.ops import ntt as ntt_mod
from tokamak_zk_evm_tpu.parallel import msm_dist, ntt_dist
from tokamak_zk_evm_tpu.parallel.mesh import make_mesh

RNG = np.random.default_rng(41)


def test_bintt_dist_matches_local():
    mesh = make_mesh(8)
    x_size, y_size = 16, 8
    grid_ints = [
        [int.from_bytes(RNG.bytes(32), "little") % R_MOD for _ in range(y_size)]
        for _ in range(x_size)
    ]
    grid = jnp.asarray(F.pack_fr(grid_ints))
    want = np.asarray(ntt_mod.bintt(grid))
    got = np.asarray(ntt_dist.bintt_dist(grid, mesh))
    assert (got == want).all()
    # inverse round trip
    back = np.asarray(ntt_dist.bintt_dist(jnp.asarray(got), mesh, inverse=True))
    assert (back == np.asarray(grid)).all()


def test_msm_dist_matches_oracle():
    mesh = make_mesh(8)
    n = 64
    pts = [
        C.g1_scalar_mul_affine(C.G1.gen, int.from_bytes(RNG.bytes(16), "little"))
        for _ in range(n)
    ]
    scalars = [int.from_bytes(RNG.bytes(32), "little") % R_MOD for _ in range(n)]
    pts[3] = None
    scalars[4] = 0
    px, py, pinf = cv.pack_affine(pts)
    s = msm_mod.scalars_from_ints(scalars)
    got = msm_dist.msm_dist(s, px, py, pinf, mesh)
    want = C.G1.msm_affine(scalars, pts)
    assert got == want
