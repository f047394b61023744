"""Native CPU backend: XLA FFI custom calls into native/zk_kernels.cpp.

Buffers are limb-major uint32 (see zk_kernels.cpp header comment).  The
shared library is compiled on demand with g++ (no pybind11 in the image; the
XLA FFI C API needs only headers shipped with jaxlib).
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import jax
import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "zk_kernels.cpp")
_HDR = os.path.join(_ROOT, "native", "field_constants.h")
_GEN = os.path.join(_ROOT, "native", "gen_constants.py")
_SO = os.path.join(_ROOT, "native", "libzk_kernels.so")

_TARGETS = [
    "FrAdd", "FrSub", "FrMul", "FrNeg", "FrInv",
    "FqAdd", "FqSub", "FqMul", "FqNeg", "FqInv",
    "FrPrefixProd", "FrSuffixProd", "FrBatchInv", "FrNtt",
    "G1Add", "G1Dbl", "G1ToAffine", "G1Msm", "G1FixedBase",
]


def _build():
    if not os.path.exists(_HDR) or os.path.getmtime(_HDR) < os.path.getmtime(_GEN):
        with open(_HDR, "w") as f:
            subprocess.run(
                ["python", _GEN], check=True, stdout=f, cwd=_ROOT,
            )
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= max(
        os.path.getmtime(_SRC), os.path.getmtime(_HDR)
    ):
        return
    import jax.ffi

    subprocess.run(
        [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
            "-std=c++17", f"-I{jax.ffi.include_dir()}", _SRC, "-o", _SO,
        ],
        check=True, capture_output=True,
    )


@functools.lru_cache(maxsize=1)
def _register() -> bool:
    import jax.ffi

    _build()
    lib = ctypes.cdll.LoadLibrary(_SO)
    for name in _TARGETS:
        jax.ffi.register_ffi_target(
            f"tzk_{name}", jax.ffi.pycapsule(getattr(lib, name)), platform="cpu"
        )
    return True


def _call(target, out_shapes, *args, **attrs):
    _register()
    import jax.ffi

    return jax.ffi.ffi_call(f"tzk_{target}", out_shapes)(*args, **attrs)


def _u32(shape):
    return jax.ShapeDtypeStruct(shape, np.uint32)


# -- field elementwise ------------------------------------------------------

def _binop(target, a, b, rep):
    return _call(target, _u32(a.shape), a, b, rep=np.int64(rep))


def fr_add(a, b, rep=1):
    return _binop("FrAdd", a, b, rep)


def fr_sub(a, b, rep=1):
    return _binop("FrSub", a, b, rep)


def fr_mul(a, b, rep=1):
    return _binop("FrMul", a, b, rep)


def fq_add(a, b, rep=1):
    return _binop("FqAdd", a, b, rep)


def fq_sub(a, b, rep=1):
    return _binop("FqSub", a, b, rep)


def fq_mul(a, b, rep=1):
    return _binop("FqMul", a, b, rep)


def fr_neg(a):
    return _call("FrNeg", _u32(a.shape), a)


def fr_inv(a):
    return _call("FrInv", _u32(a.shape), a)


def fq_neg(a):
    return _call("FqNeg", _u32(a.shape), a)


def fq_inv(a):
    return _call("FqInv", _u32(a.shape), a)


# -- scans ------------------------------------------------------------------

def fr_prefix_prod(a):
    return _call("FrPrefixProd", _u32(a.shape), a)


def fr_suffix_prod(a):
    return _call("FrSuffixProd", _u32(a.shape), a)


def fr_batch_inv(a):
    return _call("FrBatchInv", _u32(a.shape), a)


# -- NTT --------------------------------------------------------------------

def fr_ntt(data, pows, scale):
    """data [16, batch, n]; pows [16, n] Montgomery twiddles; scale [16, 1]."""
    return _call("FrNtt", _u32(data.shape), data, pows, scale)


# -- G1 ---------------------------------------------------------------------

def g1_add(p, q, rep=1):
    shapes = (_u32(p[0].shape),) * 3
    return tuple(_call("G1Add", shapes, *p, *q, rep=np.int64(rep)))


def g1_dbl(p):
    shapes = (_u32(p[0].shape),) * 3
    return tuple(_call("G1Dbl", shapes, *p))


def g1_to_affine(p):
    b = p[0].shape[-1]
    shapes = (_u32(p[0].shape), _u32(p[1].shape), _u32((b,)))
    return tuple(_call("G1ToAffine", shapes, *p))


def g1_msm(scalars, px, py, pinf):
    """-> jacobian point as [3, 24] u32 rows (X, Y, Z)."""
    return _call("G1Msm", _u32((3, 24)), scalars, px, py, pinf)


def g1_fixed_base(scalars, gen):
    b = scalars.shape[-1]
    shapes = (_u32((24, b)),) * 3
    return tuple(_call("G1FixedBase", shapes, scalars, gen))
