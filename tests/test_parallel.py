"""Multi-chip sharding tests on the virtual 8-device CPU mesh (SURVEY.md §7.2
step 9): distributed bivariate NTT (all-to-all transpose) and distributed MSM
(points sharded, one partial point per chip)."""

import jax
import pytest
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


@pytest.mark.slow
def test_bintt_dist_full_shape():
    """Sharded bivariate NTT at the REAL prover domain (16384x512 = 2^23,
    `utils/mod.rs:51-58`) on the 8-device mesh, vs the single-device kernel
    (VERDICT r1 item 5: multi-chip at full shape, not toy grids)."""
    mesh = make_mesh(8)
    x_size, y_size = 16384, 512
    rng = np.random.default_rng(5)
    # random u32 limb grid reduced mod r via device mul by one (cheap, exact)
    raw = rng.integers(0, 1 << 16, (16, x_size, y_size), dtype=np.uint32)
    grid = F.fr_mul(jnp.asarray(raw).reshape(16, -1),
                    jnp.asarray(F.fr_mont(1))).reshape(16, x_size, y_size)
    want = np.asarray(ntt_mod.bintt(grid))
    got = np.asarray(ntt_dist.bintt_dist(grid, mesh))
    assert (got == want).all()
    back = np.asarray(ntt_dist.bintt_dist(jnp.asarray(got), mesh, inverse=True))
    assert (back == np.asarray(grid)).all()


@pytest.mark.slow
def test_msm_dist_large():
    """Points-sharded MSM at 2^16 with the O(1) oracle
    (sum k_i * (c_i * G) == (sum k_i * c_i) * G)."""
    mesh = make_mesh(8)
    N = 1 << 16
    rng = np.random.default_rng(6)
    cs = [int.from_bytes(rng.bytes(32), "little") % R_MOD for _ in range(N)]
    fam = msm_mod.fixed_base_msm_points(cs, C.G1.gen)
    ks = [int.from_bytes(rng.bytes(32), "little") % R_MOD for _ in range(N)]
    s = msm_mod.scalars_from_ints(ks)
    got = msm_dist.msm_dist(s, *fam, mesh)
    total = sum(k * c for k, c in zip(ks, cs)) % R_MOD
    want = C.g1_scalar_mul_affine(C.G1.gen, total)
    assert got == want


def test_full_prove_under_mesh_context():
    """The whole 5-round prover under parallel.context.use_mesh (bintt ->
    all-to-all dist transform, msm -> sharded partials) must produce a proof
    bit-identical to the unsharded run, and it must verify."""
    from tokamak_zk_evm_tpu.models.preprocess import preprocess
    from tokamak_zk_evm_tpu.models.protocol import Mixer
    from tokamak_zk_evm_tpu.models.prover import Prover
    from tokamak_zk_evm_tpu.models.setup import Tau, generate_sigma
    from tokamak_zk_evm_tpu.models.verifier import Verifier
    from tokamak_zk_evm_tpu.parallel import context
    from tokamak_zk_evm_tpu.parallel.mesh import make_mesh
    from tokamak_zk_evm_tpu.testing.fixtures import build_fixture

    fx = build_fixture()
    sigma = generate_sigma(fx.params, Tau.fixed(), fx.library, fx.infos)

    def prove():
        return Prover(
            fx.params, sigma, fx.library, fx.infos, fx.placements,
            fx.permutation, fx.instance, mixer=Mixer.zero(),
        ).prove()

    mesh = make_mesh(8)
    with context.use_mesh(mesh):
        proof_sharded, _ = prove()
    proof_plain, _ = prove()
    assert proof_sharded == proof_plain
    pre = preprocess(sigma, fx.permutation, fx.instance, fx.params)
    assert Verifier(fx.params, sigma, pre, fx.instance, proof_sharded).verify_snark()


# ---------------------------------------------------------------------------
# 2-D (hosts x chips) mesh: the DCN-axis code path (parallel/multihost.py)
# ---------------------------------------------------------------------------


def test_bintt_dist_2d_mesh():
    from tokamak_zk_evm_tpu.parallel.mesh import make_mesh_2d, mesh_size

    mesh = make_mesh_2d(n_hosts=2, per_host=4)
    assert mesh_size(mesh) == 8 and mesh.axis_names == ("hosts", "chips")
    x_size, y_size = 16, 8
    grid_ints = [
        [int.from_bytes(RNG.bytes(32), "little") % R_MOD for _ in range(y_size)]
        for _ in range(x_size)
    ]
    grid = jnp.asarray(F.pack_fr(grid_ints))
    want = np.asarray(ntt_mod.bintt(grid))
    got = np.asarray(ntt_dist.bintt_dist(grid, mesh))
    assert (got == want).all()
    back = np.asarray(ntt_dist.bintt_dist(jnp.asarray(got), mesh, inverse=True))
    assert (back == np.asarray(grid)).all()


def test_msm_dist_2d_mesh():
    from tokamak_zk_evm_tpu.parallel.mesh import make_mesh_2d

    mesh = make_mesh_2d(n_hosts=2, per_host=4)
    n = 64
    pts = [
        C.g1_scalar_mul_affine(C.G1.gen, int.from_bytes(RNG.bytes(16), "little"))
        for _ in range(n)
    ]
    scalars = [int.from_bytes(RNG.bytes(32), "little") % R_MOD for _ in range(n)]
    px, py, pinf = cv.pack_affine(pts)
    s = msm_mod.scalars_from_ints(scalars)
    got = msm_dist.msm_dist(s, px, py, pinf, mesh)
    want = C.G1.msm_affine(scalars, pts)
    assert got == want


def test_multihost_init_noop_single_process():
    from tokamak_zk_evm_tpu.parallel import multihost

    # no TZK_COORDINATOR set: init is a no-op, single-process runtime
    assert multihost.init_from_env() is False
    mesh = multihost.global_mesh()
    assert mesh.axis_names == ("chips",)
    mesh2d = multihost.global_mesh(two_d=True)
    assert mesh2d.axis_names == ("hosts", "chips")
