"""Multi-scalar multiplication (limb-major, backend-dispatched).

Replaces ICICLE `msm::msm` (the reference's `encode_poly` commitment engine,
`libs/src/group_structures/mod.rs:59-119`).

  * CPU: one FFI call into the native Pippenger (native/zk_kernels.cpp) —
    window size auto-picked, OpenMP across windows.
  * TPU: sort-free segmented-scan Pippenger over Pallas point kernels
    (backend/pallas_kernels.py); points sharded across chips in the
    multi-chip variant (parallel/msm_dist.py).

Scalars are canonical (non-Montgomery) [16, N] limb arrays; points are
affine Montgomery ([24, N], [24, N], [N]).  Result: host affine point
((x, y) ints) or None.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..backend import api as B
from ..fields import R_MOD
from . import field as F


def msm_start(scalars_canonical, px, py, pinf):
    """Dispatch an MSM without blocking; `msm_finish` materializes the host
    point.  Enqueueing every commitment of a prover round before the first
    finish pipelines the device work behind ONE sync per round instead of
    one per MSM (the remote-TPU tunnel charges a round trip per sync).

    With an active mesh context (`parallel.context.use_mesh`) the points are
    padded to a multiple of the mesh size (zero scalars on infinities) and
    sharded across chips via `parallel.msm_dist` (computed eagerly — the
    partial combine is its own sync)."""
    from ..parallel import context

    mesh = context.get_mesh()
    if mesh is not None:
        from ..parallel.mesh import mesh_size

        n_dev = mesh_size(mesh)
        if n_dev > 1:
            from ..parallel import msm_dist

            s = jnp.asarray(scalars_canonical)
            px, py = jnp.asarray(px), jnp.asarray(py)
            pinf = jnp.asarray(pinf)
            N = px.shape[1]
            Np = -(-N // n_dev) * n_dev
            if Np != N:
                s = jnp.pad(s, ((0, 0), (0, Np - N)))
                px = jnp.pad(px, ((0, 0), (0, Np - N)))
                py = jnp.pad(py, ((0, 0), (0, Np - N)))
                pinf = jnp.pad(pinf, (0, Np - N), constant_values=1)
            return ("pt", msm_dist.msm_dist(s, px, py, pinf, mesh))

    return ("h", B.g1_msm_start(
        jnp.asarray(scalars_canonical), jnp.asarray(px), jnp.asarray(py),
        jnp.asarray(pinf),
    ))


def msm_finish(handle):
    from ..host.curve import G1

    kind, payload = handle
    if kind == "pt":
        return payload
    rows = np.asarray(B.g1_msm_finish(payload))  # [3, 24]
    X = int(F.unpack_fq(rows[0].reshape(24, 1))[0])
    Y = int(F.unpack_fq(rows[1].reshape(24, 1))[0])
    Z = int(F.unpack_fq(rows[2].reshape(24, 1))[0])
    return G1.to_affine((X, Y, Z))


def msm(scalars_canonical, px, py, pinf):
    """MSM -> host affine ((x, y) ints) or None for the identity."""
    return msm_finish(msm_start(scalars_canonical, px, py, pinf))


def scalars_from_ints(ints):
    """Host ints -> canonical limb array [16, N]."""
    return jnp.asarray(F.pack_fr(ints, mont=False))


def scalars_from_mont(mont_arr):
    """Device Montgomery Fr array [16, ...] -> canonical limbs (device)."""
    one = jnp.asarray(F.pack_fr([1], mont=False))
    flat = mont_arr.reshape(16, -1)
    # multiplying by the non-Montgomery constant 1 applies R^-1: mont -> canon
    return F.fr_mul(flat, one).reshape(mont_arr.shape)


def fixed_base_msm_points(scalars_ints, gen):
    """[k_i * G] for a shared affine generator -> affine device family.

    CRS-generation workhorse (trusted setup xy_powers etc.,
    `group_structures/mod.rs:385-394`).
    """
    scalars = scalars_from_ints([int(s) % R_MOD for s in scalars_ints])
    gen_cols = jnp.asarray(F.pack_fq([gen[0], gen[1]]))  # [24, 2]
    jac = B.g1_fixed_base(scalars, gen_cols)
    from . import curve as cv

    return cv.jac_to_affine(jac)
