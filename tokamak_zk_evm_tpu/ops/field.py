"""Limb-major device field layer over the CPU/TPU backends.

Replaces ICICLE's field kernels for the reference backend (SURVEY.md §2,
device-backend row).  Field elements are little-endian 16-bit limbs in uint32
lanes, **limb-major**: an array of elements with batch shape S is stored as
`[L, *S]` so the batch axes occupy TPU vector lanes (a limb-minor layout puts
L=16/24 in the 128-wide lane dimension and wastes >5x in memory and compute).

Montgomery form with R = 2^256 (Fr) / 2^384 (Fq); representations are
bit-identical across the native-CPU and Pallas-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..backend import api as B
from ..fields import FQ, FR, FieldSpec, R_MOD

FR_L = FR.n_limbs  # 16
FQ_L = FQ.n_limbs  # 24


# ---------------------------------------------------------------------------
# Host <-> device packing (limb-major)
# ---------------------------------------------------------------------------


def _pack(spec: FieldSpec, ints, mont: bool) -> np.ndarray:
    arr = np.asarray(ints, dtype=object)
    flat = arr.reshape(-1)
    nbytes = spec.n_limbs * 2
    mod = spec.modulus
    if mont:
        rmod = spec.R_mod
        buf = b"".join(
            ((int(v) % mod) * rmod % mod).to_bytes(nbytes, "little") for v in flat
        )
    else:
        buf = b"".join((int(v) % mod).to_bytes(nbytes, "little") for v in flat)
    out = np.frombuffer(buf, dtype="<u2").astype(np.uint32)
    out = out.reshape(arr.shape + (spec.n_limbs,))
    # limb axis to front
    return np.ascontiguousarray(np.moveaxis(out, -1, 0))


def _unpack(spec: FieldSpec, limbs, mont: bool) -> np.ndarray:
    arr = np.asarray(limbs)
    assert arr.shape[0] == spec.n_limbs
    shape = arr.shape[1:]
    arr = np.moveaxis(arr, 0, -1)
    buf = np.ascontiguousarray(arr.astype("<u2")).tobytes()
    nbytes = spec.n_limbs * 2
    n = int(np.prod(shape)) if shape else 1
    out = np.empty(n, dtype=object)
    rinv = spec.Rinv
    mod = spec.modulus
    for i in range(n):
        x = int.from_bytes(buf[i * nbytes : (i + 1) * nbytes], "little")
        out[i] = (x * rinv % mod) if mont else (x % mod)
    return out.reshape(shape) if shape else out[0]


def pack_fr(ints, mont: bool = True) -> np.ndarray:
    return _pack(FR, ints, mont)


def unpack_fr(limbs, mont: bool = True):
    return _unpack(FR, limbs, mont)


def pack_fq(ints, mont: bool = True) -> np.ndarray:
    return _pack(FQ, ints, mont)


def unpack_fq(limbs, mont: bool = True):
    return _unpack(FQ, limbs, mont)


@functools.lru_cache(maxsize=None)
def fr_mont(x: int) -> np.ndarray:
    """One scalar as a [16, 1] Montgomery column (cached host constant)."""
    return pack_fr([x % R_MOD])


@functools.lru_cache(maxsize=None)
def fr_powers(x: int, n: int) -> np.ndarray:
    """[16, n] table of x^0..x^(n-1), Montgomery (host-exact, cached)."""
    pows = []
    acc = 1
    x = x % R_MOD
    for _ in range(n):
        pows.append(acc)
        acc = acc * x % R_MOD
    return pack_fr(pows)


@functools.lru_cache(maxsize=None)
def fr_one(shape=()) -> np.ndarray:
    return np.broadcast_to(pack_fr([1]).reshape((FR_L,) + (1,) * len(shape)),
                           (FR_L,) + shape).copy()


def fr_zero(shape=()) -> jnp.ndarray:
    return jnp.zeros((FR_L,) + shape, dtype=jnp.uint32)


# ---------------------------------------------------------------------------
# Broadcast resolution: map numpy-style batch broadcasting onto the backend's
# single (rep, Bb) stride model.  Supported: equal shapes, scalar b, suffix
# match (cyclic tiling), prefix match (block broadcast).
# ---------------------------------------------------------------------------


def _resolve(a, b):
    sa, sb = a.shape[1:], b.shape[1:]
    if sa == sb:
        return a, b, 1
    na = int(np.prod(sa)) if sa else 1
    nb = int(np.prod(sb)) if sb else 1
    if nb == 1:
        return a, b, 1
    k = len(sb)
    if sa[-k:] == sb:  # suffix match -> cyclic
        return a, b, 1
    if sa[:k] == sb:  # prefix match -> block broadcast
        return a, b, na // nb
    raise ValueError(f"unsupported broadcast {sa} vs {sb}")


def _bin(op, a, b):
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if int(np.prod(a.shape[1:])) < int(np.prod(b.shape[1:])):
        # materialize a to b's batch shape (rare: scalar/vector on the left)
        pad = b.ndim - a.ndim
        a = a.reshape((a.shape[0],) + (1,) * pad + a.shape[1:])
        a = jnp.broadcast_to(a, (a.shape[0],) + b.shape[1:])
    aa, bb, rep = _resolve(a, b)
    fa = aa.reshape(aa.shape[0], -1)
    fb = bb.reshape(bb.shape[0], -1)
    out = op(fa, fb, rep=rep)
    return out.reshape(aa.shape)


def fr_add(a, b):
    return _bin(B.fr_add, a, b)


def fr_sub(a, b):
    return _bin(B.fr_sub, a, b)


def fr_mul(a, b):
    return _bin(B.fr_mul, a, b)


def fq_add(a, b):
    return _bin(B.fq_add, a, b)


def fq_sub(a, b):
    return _bin(B.fq_sub, a, b)


def fq_mul(a, b):
    return _bin(B.fq_mul, a, b)


def _un(op, a):
    a = jnp.asarray(a)
    return op(a.reshape(a.shape[0], -1)).reshape(a.shape)


def fr_neg(a):
    return _un(B.fr_neg, a)


def fr_inv(a):
    return _un(B.fr_inv, a)


def fq_neg(a):
    return _un(B.fq_neg, a)


def fq_inv(a):
    return _un(B.fq_inv, a)


def fr_batch_inv(a):
    """Exact batched inversion (0 -> 0), any batch shape."""
    return _un(B.fr_batch_inv, a)


def fr_prefix_prod(a):
    """Inclusive prefix product over the flattened batch axes."""
    return _un(B.fr_prefix_prod, a)


def fr_suffix_prod(a):
    return _un(B.fr_suffix_prod, a)


# ---------------------------------------------------------------------------
# Reductions / scans built from backend primitives (log-depth, backend-agnostic)
# ---------------------------------------------------------------------------


def fr_sum(a, axis: int):
    """Exact modular sum along a batch axis (axis counted w/o the limb axis)."""
    ax = axis + 1 if axis >= 0 else a.ndim + axis
    while a.shape[ax] > 1:
        n = a.shape[ax]
        if n % 2 == 1:
            pad_width = [(0, 0)] * a.ndim
            pad_width[ax] = (0, 1)
            a = jnp.pad(a, pad_width)
            n += 1
        lo = jax.lax.slice_in_dim(a, 0, n // 2, axis=ax)
        hi = jax.lax.slice_in_dim(a, n // 2, n, axis=ax)
        a = fr_add(lo, hi)
    return jnp.squeeze(a, axis=ax)


def fr_suffix_sum(a, axis: int):
    """Inclusive suffix sum along a batch axis (log-depth shifted adds)."""
    ax = axis + 1 if axis >= 0 else axis
    n = a.shape[ax]
    d = 1
    while d < n:
        shifted = jnp.roll(a, -d, axis=ax)
        # zero out wrapped entries
        idx = jnp.arange(n)
        mask = (idx < n - d)
        mshape = [1] * a.ndim
        mshape[ax] = n
        shifted = jnp.where(mask.reshape(mshape), shifted, 0)
        a = fr_add(a, shifted)
        d *= 2
    return a
