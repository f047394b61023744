"""Active-mesh context: route the prover's heavy ops through the mesh.

The reference is strictly single-device; multi-chip is this framework's
addition (SURVEY.md §2.4).  Rather than threading a mesh argument through
every BiPoly/encode call site, the prover activates a mesh context and the
two hot ops consult it:

  * `ops.ntt.bintt`  -> `parallel.ntt_dist.bintt_dist` (local Y pass,
    ICI all-to-all transpose, local X pass) when the grid divides evenly;
  * `ops.msm.msm`    -> `parallel.msm_dist.msm_dist` (points sharded, one
    partial per chip, exact host combine), padding the point count to a
    multiple of the mesh size with infinities.

Everything else (elementwise field ops, vanishing-division cumsums, scans)
stays in plain jnp — XLA GSPMD partitions those automatically when operands
are sharded.  `__graft_entry__.dryrun_multichip` proves a miniature circuit
under this context and asserts the proof is bit-identical to the unsharded
run.
"""

from __future__ import annotations

from contextlib import contextmanager

_MESH = None


def set_mesh(mesh) -> None:
    global _MESH
    _MESH = mesh


def get_mesh():
    return _MESH


@contextmanager
def use_mesh(mesh):
    global _MESH
    prev = _MESH
    _MESH = mesh
    try:
        yield mesh
    finally:
        _MESH = prev
