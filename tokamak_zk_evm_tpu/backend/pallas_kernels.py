"""Pallas TPU backend: VPU kernels for the limb-major field/curve ops.

This is the TPU half of the two-backend compute layer (the CPU half is
native/zk_kernels.cpp behind XLA FFI).  It implements the same API surface
(see backend/api.py) with the same buffer conventions — little-endian 16-bit
limbs in uint32 lanes, limb-major [L, B], Montgomery form — so arrays cross
backends bit-exactly.  It replaces ICICLE's CUDA kernels in the reference
(packages/backend/libs -> icicle ntt/msm/vec_ops, SURVEY.md §2 device row).

Design notes (TPU-first, not a port):
  * All bignum arithmetic uses 16-bit limbs held in uint32 lanes: the product
    of two limbs plus two carries fits a uint32 exactly, so CIOS Montgomery
    multiplication runs entirely in native 32-bit VPU ops with no double-width
    emulation.  Batch elements occupy the 128-wide lane axis; limbs unroll.
  * Elementwise field kernels process [L, S, 128] VMEM blocks (batch reshaped
    to sublanes x lanes).  The CIOS loop is fully unrolled — ~2k vector ops
    for Fr, ~5k for Fq — which Mosaic schedules well; there is no XLA-level
    limb graph (that route hits superlinear fusion-pass compile times).
  * The NTT runs stages at the JAX level with batch in the lane dimension
    ([16, n, batch]) so butterfly pairing indexes sublanes, never lanes; each
    stage is one Pallas butterfly kernel over a [16, nb, 2, m, TB] view.
  * Curve ops use batched *affine* addition with block Montgomery batch
    inversion (~7.5 Fq muls per add vs ~18 for jacobian-jacobian): inversion
    cost amortizes to ~3.2 muls via 32-way product blocks.  The MSM is a
    sort-based Pippenger (window = one 16-bit limb) whose bucket accumulation
    is a leftover-flush merge tree: N batched affine adds per window, the
    per-level segment-boundary leftovers scattered into per-level bucket rows
    (at most one per bucket per level, so plain scatter-set suffices), then a
    tree reduce over levels.  Data-dependent scatter-adds never happen on
    device — exactly the restructuring SURVEY.md §7.3(2) calls for.
  * Tiny sequential tails (Horner window combine, table setup) run on host
    with exact Python ints (host/curve.py), mirroring how the reference keeps
    its transcript on the CPU.

Env knobs:
  TZK_PALLAS_INTERPRET=1  run all kernels in interpreter mode (CPU testing).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import FQ, FR, Q_MOD

FR_L = 16
FQ_L = 24
LANES = 128
_SUBS = 64  # sublanes per elementwise block -> [L, 64, 128] blocks

_INTERPRET = os.environ.get("TZK_PALLAS_INTERPRET", "0") == "1"

_FR_MOD = tuple(FR.to_limbs(FR.modulus))
_FQ_MOD = tuple(FQ.to_limbs(FQ.modulus))
_FR_N0 = FR.n0_inv
_FQ_N0 = FQ.n0_inv
_FR_ONE = tuple(FR.to_limbs(FR.R_mod))
_FQ_ONE = tuple(FQ.to_limbs(FQ.R_mod))

_M16 = 0xFFFF  # python int: weak-typed scalar, safe to close over in kernels


# ---------------------------------------------------------------------------
# Limb arithmetic on lists of uint32 jnp values (any broadcastable shapes)
# ---------------------------------------------------------------------------


def _zero_like(a, b):
    shape = jnp.broadcast_shapes(jnp.shape(a[0]), jnp.shape(b[0]))
    return jnp.zeros(shape, jnp.uint32)


def _cond_sub_top(t, top, mod):
    """Subtract `mod` from limb list `t` iff top != 0 or t >= mod."""
    borrow = jnp.zeros_like(t[0])
    r = []
    for i, m in enumerate(mod):
        d = t[i] - m - borrow
        r.append(d & _M16)
        borrow = (d >> 16) & 1
    need = (top != 0) | (borrow == 0)
    return [jnp.where(need, r[i], t[i]) for i in range(len(mod))]


def _addm(a, b, mod):
    zero = _zero_like(a, b)
    c = zero
    t = []
    for i in range(len(mod)):
        s = a[i] + b[i] + c
        t.append(s & _M16)
        c = s >> 16
    return _cond_sub_top(t, c, mod)


def _subm(a, b, mod):
    zero = _zero_like(a, b)
    borrow = zero
    t = []
    for i in range(len(mod)):
        d = a[i] - b[i] - borrow
        t.append(d & _M16)
        borrow = (d >> 16) & 1
    c = zero
    r = []
    for i, m in enumerate(mod):
        s = t[i] + m + c
        r.append(s & _M16)
        c = s >> 16
    neg = borrow != 0
    return [jnp.where(neg, r[i], t[i]) for i in range(len(mod))]


def _negm(a, mod):
    is_zero = a[0] == 0
    for i in range(1, len(mod)):
        is_zero = is_zero & (a[i] == 0)
    borrow = jnp.zeros_like(a[0])
    r = []
    for i, m in enumerate(mod):
        d = m - a[i] - borrow
        r.append(d & _M16)
        borrow = (d >> 16) & 1
    return [jnp.where(is_zero, jnp.zeros_like(a[0]), r[i]) for i in range(len(mod))]


def _mulm(a, b, mod, n0):
    """CIOS Montgomery multiply; every intermediate fits uint32 exactly."""
    L = len(mod)
    zero = _zero_like(a, b)
    modc = list(mod)
    t = [zero] * (L + 2)
    for i in range(L):
        ai = a[i]
        carry = zero
        for j in range(L):
            cur = t[j] + ai * b[j] + carry
            t[j] = cur & _M16
            carry = cur >> 16
        cur = t[L] + carry
        t[L] = cur & _M16
        t[L + 1] = t[L + 1] + (cur >> 16)
        m = (t[0] * n0) & _M16
        carry = (t[0] + m * modc[0]) >> 16
        for j in range(1, L):
            cur = t[j] + m * modc[j] + carry
            t[j - 1] = cur & _M16
            carry = cur >> 16
        cur = t[L] + carry
        t[L - 1] = cur & _M16
        t[L] = t[L + 1] + (cur >> 16)
        t[L + 1] = zero
    return _cond_sub_top(t[:L], t[L], mod)


def _mulm_fori(a, b, mod, n0, scratch):
    """CIOS Montgomery multiply with the outer limb loop as a fori_loop.

    Same math as _mulm but ~L x fewer traced ops: used inside FUSED kernels
    (point adds) where ~20 inline multiplies would otherwise unroll to ~100k
    vector instructions and blow up the (remote, uncached) Mosaic compile.
    The j-loops stay unrolled — only their carry chain is sequential — and
    a[i] is staged through a VMEM scratch ref and read back by dynamic index
    (Pallas TPU lowers dynamic ref loads on the untiled leading dim, but has
    no value-level dynamic_slice; a concatenate-roll alternative moves the
    whole stacked array every iteration and is ~10x slower).
    """
    L = len(mod)
    zero = _zero_like(a, b)
    for i in range(L):
        scratch[i] = a[i]

    def body(i, t):
        t = list(t)
        ai = scratch[i]
        carry = zero
        for j in range(L):
            cur = t[j] + ai * b[j] + carry
            t[j] = cur & _M16
            carry = cur >> 16
        cur = t[L] + carry
        t[L] = cur & _M16
        t[L + 1] = t[L + 1] + (cur >> 16)
        m = (t[0] * n0) & _M16
        carry = (t[0] + m * mod[0]) >> 16
        for j in range(1, L):
            cur = t[j] + m * mod[j] + carry
            t[j - 1] = cur & _M16
            carry = cur >> 16
        cur = t[L] + carry
        t[L - 1] = cur & _M16
        t[L] = t[L + 1] + (cur >> 16)
        t[L + 1] = zero
        return tuple(t)

    t = jax.lax.fori_loop(0, L, body, tuple([zero] * (L + 2)))
    return _cond_sub_top(list(t[:L]), t[L], mod)


# ---------------------------------------------------------------------------
# Elementwise kernels: [L, S, 128] blocks, batch flattened to sublanes x lanes
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _ew_kernel(op: str, field: str, scalar_b: bool):
    mod = _FR_MOD if field == "fr" else _FQ_MOD
    n0 = _FR_N0 if field == "fr" else _FQ_N0
    L = len(mod)

    def kernel(a_ref, b_ref, o_ref):
        a = [a_ref[i] for i in range(L)]
        if scalar_b:
            b = [jnp.broadcast_to(b_ref[i], a[0].shape) for i in range(L)]
        else:
            b = [b_ref[i] for i in range(L)]
        if op == "add":
            out = _addm(a, b, mod)
        elif op == "sub":
            out = _subm(a, b, mod)
        else:
            out = _mulm(a, b, mod, n0)
        for i in range(L):
            o_ref[i] = out[i]

    return kernel


@functools.lru_cache(maxsize=None)
def _un_kernel(op: str, field: str):
    mod = _FR_MOD if field == "fr" else _FQ_MOD
    L = len(mod)

    def kernel(a_ref, o_ref):
        a = [a_ref[i] for i in range(L)]
        out = _negm(a, mod)
        for i in range(L):
            o_ref[i] = out[i]

    return kernel


def _to_blocks(x, L):
    """[L, B] -> ([L, S, 128], B) padded so S % _SUBS == 0."""
    B = x.shape[1]
    bp = max(_SUBS * LANES, -(-B // LANES) * LANES)
    s = bp // LANES
    s = -(-s // _SUBS) * _SUBS
    bp = s * LANES
    if bp != B:
        x = jnp.pad(x, ((0, 0), (0, bp - B)))
    return x.reshape(L, s, LANES), B


def _from_blocks(x, B):
    L = x.shape[0]
    return x.reshape(L, -1)[:, :B]


@functools.lru_cache(maxsize=None)
def _ew_binop_fn(op, field, scalar_b, s_total):
    """Cached jit-wrapped pallas_call: stable identity => no retrace/recompile
    per invocation (fresh index_map lambdas would otherwise defeat the pjit
    cache and recompile every call)."""
    L = FR_L if field == "fr" else FQ_L
    blk = pl.BlockSpec((L, _SUBS, LANES), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)
    if scalar_b:
        b_spec = pl.BlockSpec((L, 1, 1), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        b_spec = blk
    fn = pl.pallas_call(
        _ew_kernel(op, field, scalar_b),
        grid=(s_total // _SUBS,),
        in_specs=[blk, b_spec],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((L, s_total, LANES), jnp.uint32),
        interpret=_INTERPRET,
    )
    return jax.jit(fn)


def _ew_binop(op, field, a, b, rep=1):
    L = a.shape[0]
    Ba, Bb = a.shape[1], b.shape[1]
    scalar_b = Bb == 1
    if not scalar_b and Bb != Ba:
        idx = (jnp.arange(Ba) // rep) % Bb
        b = b[:, idx]
        Bb = Ba
    ab, B = _to_blocks(a, L)
    s = ab.shape[1]
    if scalar_b:
        bb = b.reshape(L, 1, 1)
    else:
        bb, _ = _to_blocks(b, L)
    out = _ew_binop_fn(op, field, scalar_b, s)(ab, bb)
    return _from_blocks(out, B)


@functools.lru_cache(maxsize=None)
def _ew_unop_fn(op, field, s_total):
    L = FR_L if field == "fr" else FQ_L
    blk = pl.BlockSpec((L, _SUBS, LANES), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        _un_kernel(op, field),
        grid=(s_total // _SUBS,),
        in_specs=[blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((L, s_total, LANES), jnp.uint32),
        interpret=_INTERPRET,
    )
    return jax.jit(fn)


def _ew_unop(op, field, a):
    L = a.shape[0]
    ab, B = _to_blocks(a, L)
    out = _ew_unop_fn(op, field, ab.shape[1])(ab)
    return _from_blocks(out, B)


def fr_add(a, b, rep=1):
    return _ew_binop("add", "fr", a, b, rep)


def fr_sub(a, b, rep=1):
    return _ew_binop("sub", "fr", a, b, rep)


def fr_mul(a, b, rep=1):
    return _ew_binop("mul", "fr", a, b, rep)


def fq_add(a, b, rep=1):
    return _ew_binop("add", "fq", a, b, rep)


def fq_sub(a, b, rep=1):
    return _ew_binop("sub", "fq", a, b, rep)


def fq_mul(a, b, rep=1):
    return _ew_binop("mul", "fq", a, b, rep)


def fr_neg(a):
    return _ew_unop("neg", "fr", a)


def fq_neg(a):
    return _ew_unop("neg", "fq", a)


# ---------------------------------------------------------------------------
# Inversion: Fermat exponentiation (static bits) + block batch inversion
# ---------------------------------------------------------------------------


def _const_col(field, value):
    spec = FR if field == "fr" else FQ
    limbs = spec.to_limbs(spec.to_mont(value % spec.modulus))
    return jnp.asarray(np.array(limbs, np.uint32).reshape(len(limbs), 1))


@functools.lru_cache(maxsize=None)
def _one_col_np(field):
    spec = FR if field == "fr" else FQ
    limbs = spec.to_limbs(spec.R_mod)
    return np.array(limbs, np.uint32).reshape(len(limbs), 1)


@functools.lru_cache(maxsize=None)
def _inv_fn(field, s_total):
    """Fermat inversion a^(p-2) as ONE kernel: fori_loop over the (static)
    exponent bits held in SMEM, two Montgomery muls per iteration.  A JAX-
    level square-and-multiply chain would be ~380 separate dispatches."""
    spec = FR if field == "fr" else FQ
    mod = _FR_MOD if field == "fr" else _FQ_MOD
    n0 = _FR_N0 if field == "fr" else _FQ_N0
    one = _FR_ONE if field == "fr" else _FQ_ONE
    L = len(mod)
    bits = np.array([int(b) for b in bin(spec.modulus - 2)[2:]], np.uint32)

    def kernel(bits_ref, a_ref, o_ref):
        a = [a_ref[i] for i in range(L)]
        acc = [jnp.full(a[0].shape, one[i], jnp.uint32) for i in range(L)]

        def body(k, acc):
            sq = _mulm(acc, acc, mod, n0)
            mu = _mulm(sq, a, mod, n0)
            bit = bits_ref[k]
            return [jnp.where(bit != 0, mu[i], sq[i]) for i in range(L)]

        acc = jax.lax.fori_loop(0, len(bits), body, acc)
        for i in range(L):
            o_ref[i] = acc[i]

    blk = pl.BlockSpec((L, _SUBS, LANES), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel,
        grid=(s_total // _SUBS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk,
        ],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((L, s_total, LANES), jnp.uint32),
        interpret=_INTERPRET,
    )
    jfn = jax.jit(fn)
    return lambda a: jfn(jnp.asarray(bits), a)


def _field_inv(field, a):
    """Elementwise modular inversion on [L, B]; 0 -> 0."""
    L = a.shape[0]
    ab, B = _to_blocks(a, L)
    out = _inv_fn(field, ab.shape[1])(ab)
    return _from_blocks(out, B)


def fr_inv(a):
    return _field_inv("fr", a)


def fq_inv(a):
    return _field_inv("fq", a)


def _is_zero_cols(a):
    return jnp.all(a == 0, axis=0)


_BINV_K = 16  # block width for batched inversion (prefix length per group)


@functools.lru_cache(maxsize=None)
def _binv_fwd_fn(field, r_total):
    """Forward pass: prefix-product stacks.  x [L, K, R, 128] -> P with
    P[k] = x[0]*...*x[k] (prefix along the K axis, one kernel)."""
    mod = _FR_MOD if field == "fr" else _FQ_MOD
    n0 = _FR_N0 if field == "fr" else _FQ_N0
    L = len(mod)
    K = _BINV_K

    def kernel(x_ref, o_ref):
        acc = [x_ref[i, 0] for i in range(L)]
        for i in range(L):
            o_ref[i, 0] = acc[i]

        def body(k, acc):
            xk = [x_ref[i, k] for i in range(L)]
            acc = _mulm(acc, xk, mod, n0)
            for i in range(L):
                o_ref[i, k] = acc[i]
            return acc

        jax.lax.fori_loop(1, K, body, acc)

    rb = min(r_total, 8)
    blk = pl.BlockSpec((L, K, rb, LANES), lambda i: (0, 0, i, 0),
                       memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel,
        grid=(r_total // rb,),
        in_specs=[blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((L, K, r_total, LANES), jnp.uint32),
        interpret=_INTERPRET,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _binv_bwd_fn(field, r_total):
    """Backward pass: walk-back.  inv[k] = P[k-1] * t_k with t running from
    the inverted block totals; one kernel."""
    mod = _FR_MOD if field == "fr" else _FQ_MOD
    n0 = _FR_N0 if field == "fr" else _FQ_N0
    L = len(mod)
    K = _BINV_K

    def kernel(x_ref, p_ref, tinv_ref, o_ref):
        t = [tinv_ref[i] for i in range(L)]

        def body(j, t):
            k = K - 1 - j
            pk = [p_ref[i, k - 1] for i in range(L)]
            inv_k = _mulm(pk, t, mod, n0)
            for i in range(L):
                o_ref[i, k] = inv_k[i]
            xk = [x_ref[i, k] for i in range(L)]
            return _mulm(t, xk, mod, n0)

        t = jax.lax.fori_loop(0, K - 1, body, t)
        for i in range(L):
            o_ref[i, 0] = t[i]

    rb = min(r_total, 8)
    blk4 = pl.BlockSpec((L, K, rb, LANES), lambda i: (0, 0, i, 0),
                        memory_space=pltpu.VMEM)
    blk3 = pl.BlockSpec((L, rb, LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel,
        grid=(r_total // rb,),
        in_specs=[blk4, blk4, blk3],
        out_specs=blk4,
        out_shape=jax.ShapeDtypeStruct((L, K, r_total, LANES), jnp.uint32),
        interpret=_INTERPRET,
    )
    return jax.jit(fn)


def _batch_inv_nz(field, a1):
    """Batched inversion of a zero-free [L, B] array (~3 muls/element)."""
    L, B = a1.shape
    K = _BINV_K
    onecol = jnp.asarray(_one_col_np(field))
    if B <= 2 * K * LANES:
        return _field_inv(field, a1)
    r = -(-B // (K * LANES))
    r = -(-r // 8) * 8
    Bp = K * r * LANES
    if Bp != B:
        a1 = jnp.concatenate(
            [a1, jnp.broadcast_to(onecol, (L, Bp - B))], axis=1
        )
    x = a1.reshape(L, K, r, LANES)
    P = _binv_fwd_fn(field, r)(x)
    tot = P[:, K - 1].reshape(L, r * LANES)
    tot_inv = _batch_inv_nz(field, tot).reshape(L, r, LANES)
    out = _binv_bwd_fn(field, r)(x, P, tot_inv)
    return out.reshape(L, Bp)[:, :B]


def _batch_inv(field, a):
    """Montgomery block batch inversion on [L, B]; zeros map to zero.

    16-way groups along a leading block axis: the prefix-product and
    walk-back passes are single Pallas kernels (fori over the group axis with
    full [R, 128] VPU shapes), block totals recurse; ~3 muls per element and
    ~8 dispatches per call instead of the sequential host-style scan.
    """
    zero_mask = _is_zero_cols(a)
    onecol = jnp.asarray(_one_col_np(field))
    a1 = jnp.where(zero_mask[None, :], jnp.broadcast_to(onecol, a.shape), a)
    out = _batch_inv_nz(field, a1)
    return jnp.where(zero_mask[None, :], jnp.zeros_like(out), out)


def fr_batch_inv(a):
    return _batch_inv("fr", a)


# ---------------------------------------------------------------------------
# Scans: work-efficient via jax.lax.associative_scan over the Pallas mul
# ---------------------------------------------------------------------------


def fr_prefix_prod(a):
    return jax.lax.associative_scan(fr_mul, a, axis=1)


def fr_suffix_prod(a):
    return jax.lax.associative_scan(fr_mul, a, axis=1, reverse=True)


# ---------------------------------------------------------------------------
# NTT: radix-2 DIT, batch in lanes, one Pallas butterfly kernel per stage
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _bf_kernel():
    mod, n0 = _FR_MOD, _FR_N0
    L = FR_L

    def kernel(x_ref, tw_ref, o_ref):
        lo = [x_ref[i, :, 0] for i in range(L)]     # [NBt, Mt, TB]
        hi = [x_ref[i, :, 1] for i in range(L)]
        shape = lo[0].shape
        j = pl.program_id(1)
        tw = [jnp.broadcast_to(tw_ref[i, j][None, :, None], shape) for i in range(L)]
        ht = _mulm(hi, tw, mod, n0)
        up = _addm(lo, ht, mod)
        dn = _subm(lo, ht, mod)
        for i in range(L):
            o_ref[i, :, 0] = up[i]
            o_ref[i, :, 1] = dn[i]

    return kernel


@functools.lru_cache(maxsize=None)
def _bitrev_idx(n):
    logn = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, np.int32)
    for t in range(logn):
        rev |= ((idx >> t) & 1) << (logn - 1 - t)
    return rev


@functools.lru_cache(maxsize=None)
def _ntt_tiles(nb, m, B):
    import math

    # block budget ~2k butterfly pairs: [16, nbt, 2, mt, 128] u32 = 256 KB per
    # buffer (pallas double-buffers every spec, and the unrolled CIOS temps
    # live on the scoped-vmem stack; bigger blocks blow the 16 MB limit).
    # TPU tiling rule: the block's last dim must be a multiple of 128 and its
    # second-to-last (mt) a multiple of 8 — or equal to the array dim.
    tb = LANES  # B is always a multiple of LANES
    mt = min(m, 16)
    nbt = min(nb, max(1, 2048 // (mt * LANES)))
    return nbt, mt, tb


def _ntt_stage(x, tw, nb, m, B):
    """One butterfly stage on [16, n, B]; tw [16, m] stage twiddles."""
    _, mt, _ = _ntt_tiles(nb, m, B)
    out = _ntt_stage_fn(nb, m, B)(
        x.reshape(FR_L, nb, 2, m, B), tw.reshape(FR_L, m // mt, mt)
    )
    return out.reshape(FR_L, nb * 2 * m, B)


@functools.lru_cache(maxsize=None)
def _ntt_stage_fn(nb, m, B):
    L = FR_L
    nbt, mt, tb = _ntt_tiles(nb, m, B)
    grid = (nb // nbt, m // mt, B // tb)
    xblk = pl.BlockSpec((L, nbt, 2, mt, tb), lambda i, j, k: (0, i, 0, j, k),
                        memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        _bf_kernel(),
        grid=grid,
        in_specs=[
            xblk,
            # whole twiddle table stays resident; the kernel picks its stage
            # row by program_id (a blocked lane-dim spec would violate the
            # 128-divisibility tiling rule for small mt)
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=xblk,
        out_shape=jax.ShapeDtypeStruct((L, nb, 2, m, B), jnp.uint32),
        interpret=_INTERPRET,
    )
    return jax.jit(fn)


def fr_ntt(data, pows, scale):
    """NTT along the last axis.  data [16, batch, n]; pows [16, n] Montgomery
    twiddles (omega or omega^-1 powers); scale [16, 1] applied at the end.

    Matches native ntt_impl (zk_kernels.cpp): bit-reversed DIT, natural-order
    input and output.  Batch is moved to the minor (lane) axis so butterfly
    pairing only ever indexes sublanes.
    """
    L, batch, n = data.shape
    if n == 1:
        return fr_mul(data.reshape(L, -1), scale).reshape(data.shape)
    x = jnp.swapaxes(data, 1, 2)  # [L, n, batch]
    Bp = -(-batch // LANES) * LANES
    if Bp != batch:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Bp - batch)))
    x = x[:, jnp.asarray(_bitrev_idx(n)), :]
    m = 1
    while m < n:
        step = n // (2 * m)
        tw = pows[:, :: step][:, :m] if step > 1 else pows[:, :m]
        x = _ntt_stage(x, tw, n // (2 * m), m, Bp)
        m *= 2
    x = x.reshape(L, n, Bp)[:, :, :batch]
    x = jnp.swapaxes(x, 1, 2)
    # scale (n^-1 for inverse, one for forward — applied unconditionally,
    # the forward call passes Montgomery one)
    return fr_mul(x.reshape(L, -1), scale).reshape(data.shape)


# ---------------------------------------------------------------------------
# Batched affine G1 arithmetic (the TPU-native point representation)
#
# Points: (x [24, B], y [24, B], inf [B] uint32 mask).  One batched complete
# affine addition costs ~7.5 Fq muls per lane (block batch inversion included)
# versus ~18 for jacobian-jacobian — and 2/3 the HBM traffic.  All special
# cases (either input infinite, P + (-P), doubling) resolve via selects.
# ---------------------------------------------------------------------------


def _aff_inf(B):
    z = jnp.zeros((FQ_L, B), jnp.uint32)
    return (z, z, jnp.ones((B,), jnp.uint32))


def _affine_add(p1, p2):
    x1, y1, i1 = p1
    x2, y2, i2 = p2
    dx = fq_sub(x2, x1)
    dy = fq_sub(y2, y1)
    xeq = _is_zero_cols(dx)
    yeq = _is_zero_cols(dy)
    dbl = xeq & yeq
    two_y1 = fq_add(y1, y1)
    x1sq = fq_mul(x1, x1)
    three_x1sq = fq_add(fq_add(x1sq, x1sq), x1sq)
    den = jnp.where(dbl[None, :], two_y1, dx)
    num = jnp.where(dbl[None, :], three_x1sq, dy)
    den_inv = _batch_inv("fq", den)
    lam = fq_mul(num, den_inv)
    lam2 = fq_mul(lam, lam)
    x3 = fq_sub(fq_sub(lam2, x1), x2)
    y3 = fq_sub(fq_mul(lam, fq_sub(x1, x3)), y1)
    b1 = i1.astype(bool)
    b2 = i2.astype(bool)
    res_inf = (~b1) & (~b2) & xeq & (~yeq)
    ox = jnp.where(b1[None, :], x2, jnp.where(b2[None, :], x1, x3))
    oy = jnp.where(b1[None, :], y2, jnp.where(b2[None, :], y1, y3))
    oinf = ((b1 & b2) | res_inf).astype(jnp.uint32)
    ox = jnp.where(oinf[None, :].astype(bool), jnp.zeros_like(ox), ox)
    oy = jnp.where(oinf[None, :].astype(bool), jnp.zeros_like(oy), oy)
    return ox, oy, oinf


def _affine_tree_sum(p):
    """Reduce (x [24, n], y, inf [n]) to a single-column point by halving."""
    x, y, inf = p
    n = x.shape[1]
    while n > 1:
        if n % 2 == 1:
            ix, iy, ii = _aff_inf(1)
            x = jnp.concatenate([x, ix], axis=1)
            y = jnp.concatenate([y, iy], axis=1)
            inf = jnp.concatenate([inf, ii])
            n += 1
        h = n // 2
        x, y, inf = _affine_add(
            (x[:, :h], y[:, :h], inf[:h]), (x[:, h:], y[:, h:], inf[h:])
        )
        n = h
    return x, y, inf


def _aff_to_host(x, y, inf):
    """Device affine columns -> list of host ((x, y) ints or None)."""
    xs = np.asarray(x)
    ys = np.asarray(y)
    infs = np.asarray(inf).astype(bool)
    out = []
    for i in range(xs.shape[1]):
        if infs[i]:
            out.append(None)
        else:
            out.append(
                (
                    FQ.from_mont(FQ.from_limbs(xs[:, i])),
                    FQ.from_mont(FQ.from_limbs(ys[:, i])),
                )
            )
    return out


# ---------------------------------------------------------------------------
# Jacobian G1 API (g1_add / g1_dbl / g1_to_affine) — matches native semantics
# ---------------------------------------------------------------------------


def _jac_is_inf(z):
    return _is_zero_cols(z)


def _jac_inf_like(x):
    one = jnp.broadcast_to(jnp.asarray(_one_col_np("fq")), x.shape)
    return one, one, jnp.zeros_like(x)


def _g1_dbl_core(X, Y, Z):
    """dbl-2009-l (as in zk_kernels.cpp g1_dbl)."""
    A = fq_mul(X, X)
    Bv = fq_mul(Y, Y)
    C = fq_mul(Bv, Bv)
    t = fq_add(X, Bv)
    t = fq_mul(t, t)
    t = fq_sub(t, A)
    D = fq_sub(t, C)
    D = fq_add(D, D)
    E = fq_add(fq_add(A, A), A)
    F = fq_mul(E, E)
    X3 = fq_sub(F, fq_add(D, D))
    C2 = fq_add(C, C)
    C4 = fq_add(C2, C2)
    C8 = fq_add(C4, C4)
    Y3 = fq_sub(fq_mul(E, fq_sub(D, X3)), C8)
    YZ = fq_mul(Y, Z)
    Z3 = fq_add(YZ, YZ)
    return X3, Y3, Z3


def g1_dbl(p):
    X, Y, Z = (c.reshape(FQ_L, -1) for c in p)
    X3, Y3, Z3 = _g1_dbl_core(X, Y, Z)
    inf = _jac_is_inf(Z)
    iX, iY, iZ = _jac_inf_like(X)
    m = inf[None, :]
    out = (
        jnp.where(m, iX, X3).reshape(p[0].shape),
        jnp.where(m, iY, Y3).reshape(p[1].shape),
        jnp.where(m, iZ, Z3).reshape(p[2].shape),
    )
    return out


def g1_add(p, q, rep=1):
    shape = p[0].shape
    X1, Y1, Z1 = (c.reshape(FQ_L, -1) for c in p)
    X2, Y2, Z2 = (c.reshape(FQ_L, -1) for c in q)
    Ba, Bb = X1.shape[1], X2.shape[1]
    if Bb != Ba:
        idx = (jnp.arange(Ba) // rep) % Bb
        X2, Y2, Z2 = X2[:, idx], Y2[:, idx], Z2[:, idx]
    # add-2007-bl (as in zk_kernels.cpp g1_add)
    Z1Z1 = fq_mul(Z1, Z1)
    Z2Z2 = fq_mul(Z2, Z2)
    U1 = fq_mul(X1, Z2Z2)
    U2 = fq_mul(X2, Z1Z1)
    S1 = fq_mul(Y1, fq_mul(Z2, Z2Z2))
    S2 = fq_mul(Y2, fq_mul(Z1, Z1Z1))
    H = fq_sub(U2, U1)
    R = fq_sub(S2, S1)
    HH = fq_mul(H, H)
    HHH = fq_mul(H, HH)
    V = fq_mul(U1, HH)
    RR = fq_mul(R, R)
    X3 = fq_sub(fq_sub(fq_sub(RR, HHH), V), V)
    Y3 = fq_sub(fq_mul(R, fq_sub(V, X3)), fq_mul(S1, HHH))
    Z3 = fq_mul(fq_mul(Z1, Z2), H)
    # special cases
    dX, dY, dZ = _g1_dbl_core(X1, Y1, Z1)
    inf1 = _jac_is_inf(Z1)
    inf2 = _jac_is_inf(Z2)
    h0 = _is_zero_cols(H)
    r0 = _is_zero_cols(R)
    iX, iY, iZ = _jac_inf_like(X1)

    def sel(cond, a, b):
        return jnp.where(cond[None, :], a, b)

    use_dbl = (~inf1) & (~inf2) & h0 & r0
    use_inf = (~inf1) & (~inf2) & h0 & (~r0)
    oX = sel(inf1, X2, sel(inf2, X1, sel(use_dbl, dX, sel(use_inf, iX, X3))))
    oY = sel(inf1, Y2, sel(inf2, Y1, sel(use_dbl, dY, sel(use_inf, iY, Y3))))
    oZ = sel(inf1, Z2, sel(inf2, Z1, sel(use_dbl, dZ, sel(use_inf, iZ, Z3))))
    return oX.reshape(shape), oY.reshape(shape), oZ.reshape(shape)


def g1_to_affine(p):
    X, Y, Z = (c.reshape(FQ_L, -1) for c in p)
    zinv = _batch_inv("fq", Z)  # 0 -> 0, so inf lanes come out (0, 0)
    zi2 = fq_mul(zinv, zinv)
    x = fq_mul(X, zi2)
    y = fq_mul(Y, fq_mul(zi2, zinv))
    inf = _jac_is_inf(Z).astype(jnp.uint32)
    return x.reshape(p[0].shape), y.reshape(p[1].shape), inf


# ---------------------------------------------------------------------------
# FUSED jacobian complete addition: the whole add-2007-bl + dbl-2009-l +
# special-case selects in ONE Pallas kernel (~23 fori-looped CIOS muls).
#
# Motivation (measured on a v5e through the axon tunnel): composing point
# adds from per-field-op pallas_calls costs ~25 kernel launches per add; a
# 2^22 MSM issues ~60k launches and spends ~35 s in launch overhead while
# the arithmetic itself is ~1 s.  One fused kernel per merge-tree level
# removes that entirely.
# ---------------------------------------------------------------------------


def _jac_add_block(p1, p2, scratch):
    """Complete jacobian add on limb lists (shared by kernel + interpret).

    Z == 0 encodes infinity.  Returns limb lists (X3, Y3, Z3).  `scratch` is
    a [24, S, 128] VMEM ref staging each multiplicand for dynamic-index
    access inside the CIOS fori loop."""
    mod, n0 = _FQ_MOD, _FQ_N0
    X1, Y1, Z1 = p1
    X2, Y2, Z2 = p2

    def mul(a, b):
        return _mulm_fori(a, b, mod, n0, scratch)

    def is_zero(v):
        z = v[0] == 0
        for i in range(1, len(v)):
            z = z & (v[i] == 0)
        return z

    Z1Z1 = mul(Z1, Z1)
    Z2Z2 = mul(Z2, Z2)
    U1 = mul(X1, Z2Z2)
    U2 = mul(X2, Z1Z1)
    S1 = mul(Y1, mul(Z2, Z2Z2))
    S2 = mul(Y2, mul(Z1, Z1Z1))
    H = _subm(U2, U1, mod)
    R = _subm(S2, S1, mod)
    HH = mul(H, H)
    HHH = mul(H, HH)
    V = mul(U1, HH)
    RR = mul(R, R)
    X3 = _subm(_subm(_subm(RR, HHH, mod), V, mod), V, mod)
    Y3 = _subm(mul(R, _subm(V, X3, mod)), mul(S1, HHH), mod)
    Z3 = mul(mul(Z1, Z2), H)

    # doubling path (dbl-2009-l on P1)
    A = mul(X1, X1)
    Bv = mul(Y1, Y1)
    C = mul(Bv, Bv)
    t = _addm(X1, Bv, mod)
    t = mul(t, t)
    D = _subm(_subm(t, A, mod), C, mod)
    D = _addm(D, D, mod)
    E = _addm(_addm(A, A, mod), A, mod)
    Fv = mul(E, E)
    Xd = _subm(Fv, _addm(D, D, mod), mod)
    C2 = _addm(C, C, mod)
    C4 = _addm(C2, C2, mod)
    C8 = _addm(C4, C4, mod)
    Yd = _subm(mul(E, _subm(D, Xd, mod)), C8, mod)
    YZ = mul(Y1, Z1)
    Zd = _addm(YZ, YZ, mod)

    inf1 = is_zero(Z1)
    inf2 = is_zero(Z2)
    h0 = is_zero(H)
    r0 = is_zero(R)
    use_dbl = (~inf1) & (~inf2) & h0 & r0
    use_inf = (~inf1) & (~inf2) & h0 & (~r0)
    zero = jnp.zeros_like(X1[0])

    def sel(cond, a, b):
        return [jnp.where(cond, a[i], b[i]) for i in range(len(a))]

    zeros = [zero] * len(mod)
    oX = sel(inf1, X2, sel(inf2, X1, sel(use_dbl, Xd, sel(use_inf, zeros, X3))))
    oY = sel(inf1, Y2, sel(inf2, Y1, sel(use_dbl, Yd, sel(use_inf, zeros, Y3))))
    oZ = sel(inf1, Z2, sel(inf2, Z1, sel(use_dbl, Zd, sel(use_inf, zeros, Z3))))
    return oX, oY, oZ


@functools.lru_cache(maxsize=None)
def _jac_add_fused_fn(s_total):
    L = FQ_L

    def kernel(x1, y1, z1, x2, y2, z2, ox, oy, oz, scratch):
        p1 = ([x1[i] for i in range(L)], [y1[i] for i in range(L)],
              [z1[i] for i in range(L)])
        p2 = ([x2[i] for i in range(L)], [y2[i] for i in range(L)],
              [z2[i] for i in range(L)])
        X3, Y3, Z3 = _jac_add_block(p1, p2, scratch)
        for i in range(L):
            ox[i] = X3[i]
            oy[i] = Y3[i]
            oz[i] = Z3[i]

    # small sublane blocks: the fused add holds ~30 live limb lists (24 x
    # [sb, 128] each); sb=16 keeps the kernel's scoped-VMEM stack well under
    # the 16 MB limit (sb=64 OOMs at ~27 MB)
    sb = min(16, s_total)
    blk = pl.BlockSpec((L, sb, LANES), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel,
        grid=(s_total // sb,),
        in_specs=[blk] * 6,
        out_specs=[blk] * 3,
        out_shape=[jax.ShapeDtypeStruct((L, s_total, LANES), jnp.uint32)] * 3,
        scratch_shapes=[pltpu.VMEM((L, sb, LANES), jnp.uint32)],
        interpret=_INTERPRET,
    )
    return jax.jit(fn)


def g1_add_fused(p1, p2):
    """Batched complete jacobian add, one kernel launch: (X,Y,Z) [24, B]."""
    X1, Y1, Z1 = p1
    X2, Y2, Z2 = p2
    B = X1.shape[1]
    args = []
    for c in (X1, Y1, Z1, X2, Y2, Z2):
        cb, _ = _to_blocks(c, FQ_L)
        args.append(cb)
    s_total = args[0].shape[1]
    ox, oy, oz = _jac_add_fused_fn(s_total)(*args)
    return (
        _from_blocks(ox, B), _from_blocks(oy, B), _from_blocks(oz, B)
    )


def _jac_inf_cols(B):
    z = jnp.zeros((FQ_L, B), jnp.uint32)
    return (z, z, z)


def _jac_tree_sum(p):
    """Reduce (X [24, n], Y, Z) to one column by fused-add halving."""
    X, Y, Z = p
    n = X.shape[1]
    while n > 1:
        if n % 2 == 1:
            iX, iY, iZ = _jac_inf_cols(1)
            X = jnp.concatenate([X, iX], axis=1)
            Y = jnp.concatenate([Y, iY], axis=1)
            Z = jnp.concatenate([Z, iZ], axis=1)
            n += 1
        h = n // 2
        X, Y, Z = g1_add_fused(
            (X[:, :h], Y[:, :h], Z[:, :h]), (X[:, h:], Y[:, h:], Z[:, h:])
        )
        n = h
    return X, Y, Z


# ---------------------------------------------------------------------------
# Pippenger MSM (sort + leftover-flush merge tree, batched-AFFINE arithmetic)
#
# Inside the MSM every point is affine (X, Y) with (0, 0) encoding infinity —
# (0, 0) is not on y^2 = x^3 + 4, and the on-curve point (0, 2) keeps Y != 0,
# so the encoding is unambiguous.  A batched affine add costs 4 fused-kernel
# muls + ~3.2 batch-inversion muls per lane versus ~28 for the fused complete
# jacobian add (which always evaluates both the add and double paths), and
# carries 2/3 the HBM traffic.  The denominator never vanishes: doubling
# lanes invert 2y (y != 0 on G1: no 2-torsion), pure adds invert x2 - x1
# (!= 0 by construction), and infinity/cancel lanes are bypassed with 1.
# ---------------------------------------------------------------------------


def _iszero_limbs(v):
    z = v[0] == 0
    for t in v[1:]:
        z = z & (t == 0)
    return z


@functools.lru_cache(maxsize=None)
def _aff_pre_fn(s_total):
    """Fused kernel: affine-add denominators (no muls).

    denom = 2*y1 on doubling lanes, x2 - x1 on add lanes, 1 (Montgomery) on
    bypass lanes (either operand infinite, or P + (-P))."""
    mod = _FQ_MOD
    L = FQ_L

    def kernel(x1, y1, x2, y2, od):
        X1 = [x1[i] for i in range(L)]
        Y1 = [y1[i] for i in range(L)]
        X2 = [x2[i] for i in range(L)]
        Y2 = [y2[i] for i in range(L)]
        inf1 = _iszero_limbs(X1) & _iszero_limbs(Y1)
        inf2 = _iszero_limbs(X2) & _iszero_limbs(Y2)
        dx = _subm(X2, X1, mod)
        dy = _subm(Y2, Y1, mod)
        xeq = _iszero_limbs(dx)
        yeq = _iszero_limbs(dy)
        dbl = (~inf1) & (~inf2) & xeq & yeq
        bypass = inf1 | inf2 | (xeq & (~yeq))
        two_y1 = _addm(Y1, Y1, mod)
        for i in range(L):
            v = jnp.where(dbl, two_y1[i], dx[i])
            od[i] = jnp.where(bypass, jnp.uint32(_FQ_ONE[i]), v)

    sb = min(32, s_total)
    blk = pl.BlockSpec((L, sb, LANES), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel,
        grid=(s_total // sb,),
        in_specs=[blk] * 4,
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((L, s_total, LANES), jnp.uint32),
        interpret=_INTERPRET,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _aff_post_fn(s_total):
    """Fused kernel: complete the affine add given inverted denominators.

    4 CIOS muls per lane: x1^2 (for the doubling numerator), lambda, lambda^2,
    lambda * (x1 - x3).  All special cases resolve via selects."""
    mod, n0 = _FQ_MOD, _FQ_N0
    L = FQ_L

    def kernel(x1, y1, x2, y2, di, ox, oy, scratch):
        X1 = [x1[i] for i in range(L)]
        Y1 = [y1[i] for i in range(L)]
        X2 = [x2[i] for i in range(L)]
        Y2 = [y2[i] for i in range(L)]
        DI = [di[i] for i in range(L)]

        def mul(a, b):
            return _mulm_fori(a, b, mod, n0, scratch)

        inf1 = _iszero_limbs(X1) & _iszero_limbs(Y1)
        inf2 = _iszero_limbs(X2) & _iszero_limbs(Y2)
        dx = _subm(X2, X1, mod)
        dy = _subm(Y2, Y1, mod)
        xeq = _iszero_limbs(dx)
        yeq = _iszero_limbs(dy)
        dbl = (~inf1) & (~inf2) & xeq & yeq
        cancel = (~inf1) & (~inf2) & xeq & (~yeq)

        x1sq = mul(X1, X1)
        three = _addm(_addm(x1sq, x1sq, mod), x1sq, mod)
        num = [jnp.where(dbl, three[i], dy[i]) for i in range(L)]
        lam = mul(num, DI)
        lam2 = mul(lam, lam)
        x3 = _subm(_subm(lam2, X1, mod), X2, mod)
        y3 = _subm(mul(lam, _subm(X1, x3, mod)), Y1, mod)

        def sel(cond, a, b):
            return [jnp.where(cond, a[i], b[i]) for i in range(L)]

        zeros = [jnp.zeros_like(X1[0])] * L
        outx = sel(inf1, X2, sel(inf2, X1, sel(cancel, zeros, x3)))
        outy = sel(inf1, Y2, sel(inf2, Y1, sel(cancel, zeros, y3)))
        for i in range(L):
            ox[i] = outx[i]
            oy[i] = outy[i]

    sb = min(16, s_total)
    blk = pl.BlockSpec((L, sb, LANES), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel,
        grid=(s_total // sb,),
        in_specs=[blk] * 5,
        out_specs=[blk] * 2,
        out_shape=[jax.ShapeDtypeStruct((L, s_total, LANES), jnp.uint32)] * 2,
        scratch_shapes=[pltpu.VMEM((L, sb, LANES), jnp.uint32)],
        interpret=_INTERPRET,
    )
    return jax.jit(fn)


def g1_aff_add_batch(p1, p2):
    """Batched complete affine add: (X, Y) [24, B], (0, 0) = infinity."""
    X1, Y1 = p1
    X2, Y2 = p2
    B = X1.shape[1]
    a1, _ = _to_blocks(X1, FQ_L)
    b1, _ = _to_blocks(Y1, FQ_L)
    a2, _ = _to_blocks(X2, FQ_L)
    b2, _ = _to_blocks(Y2, FQ_L)
    s = a1.shape[1]
    den = _aff_pre_fn(s)(a1, b1, a2, b2)
    dinv = _batch_inv_nz("fq", den.reshape(FQ_L, -1)).reshape(FQ_L, s, LANES)
    ox, oy = _aff_post_fn(s)(a1, b1, a2, b2, dinv)
    return _from_blocks(ox, B), _from_blocks(oy, B)


# ---------------------------------------------------------------------------
# PACKED fused MSM pipeline
#
# Inside the MSM, Fq coordinates are PACKED: 12 u32 rows with limb 2i in
# bits 0..15 and limb 2i+1 in bits 16..31.  Packing halves every gather,
# scatter and inter-kernel HBM pass — the phase profile of the 2^22 MSM
# (scripts/msm_phase_profile.py) attributes ~75% of its wall-clock to
# exactly those moves.  Kernels unpack to 16-bit limbs on entry and repack
# on exit (two shift/mask ops per limb pair — noise next to the ~5k-op
# CIOS multiplies).
#
# Point adds in the merge tree / flush / bucket tail are INCOMPLETE affine
# adds: the only special case handled is an operand at infinity ((0, 0)).
# Doubling and cancellation lanes cannot occur there: every operand is a
# partial sum over a DISTINCT subset of the MSM's input points, so
# P1 == +-P2 would exhibit a nontrivial linear relation among the inputs —
# for CRS points (powers tau^i G) that is precisely what the discrete logs
# make unreachable.  (ICICLE's bucket accumulation makes the same
# assumption, msm.cu bucket kernels.)
#
# The batched add is TWO fused kernels around one small recursive
# inversion instead of the unpacked path's ~10:
#   fwd: denominators + K=16-group Montgomery prefix products (1 mul/lane)
#   [recursive _batch_inv_nz on the K-group totals, B/16 lanes]
#   bwd: walk-back inverses + lambda/x3/y3 + the merge-select, fused
#        (5 muls/lane)
# ---------------------------------------------------------------------------

FQ_P = FQ_L // 2  # 12 packed rows per Fq element

_PK_K = 16  # prefix-group length (totals array = B/16)
_PK_RB = 8  # sublane block: CIOS shapes are [8, 128] = the native VPU tile


def pack_fq_rows(a):
    """Unpacked [24, ...] u32 limb rows -> packed [12, ...]."""
    return a[0::2] | (a[1::2] << jnp.uint32(16))


def unpack_fq_rows(p):
    """Packed [12, ...] -> unpacked [24, ...]."""
    lo = p & jnp.uint32(0xFFFF)
    hi = p >> jnp.uint32(16)
    return jnp.stack([lo, hi], axis=1).reshape((FQ_L,) + p.shape[1:])


def _k_unpack(ref, k):
    """Packed kernel ref row-block k -> 24-limb list."""
    out = []
    for i in range(FQ_P):
        v = ref[i, k]
        out.append(v & _M16)
        out.append(v >> 16)
    return out


def _k_pack(limbs):
    return [limbs[2 * i] | (limbs[2 * i + 1] << 16) for i in range(FQ_P)]


def _k_iszero2(xref, yref, k):
    z = xref[0, k] == 0
    for i in range(1, FQ_P):
        z = z & (xref[i, k] == 0)
    for i in range(FQ_P):
        z = z & (yref[i, k] == 0)
    return z


def _k_den(x1, y1, x2, y2, k):
    """Shared fwd/bwd denominator: dx, or Montgomery one on bypass lanes."""
    X1 = _k_unpack(x1, k)
    X2 = _k_unpack(x2, k)
    inf1 = _k_iszero2(x1, y1, k)
    inf2 = _k_iszero2(x2, y2, k)
    dx = _subm(X2, X1, _FQ_MOD)
    byp = inf1 | inf2
    d = [jnp.where(byp, jnp.uint32(_FQ_ONE[i]), dx[i]) for i in range(FQ_L)]
    return d, X1, X2, inf1, inf2


@functools.lru_cache(maxsize=None)
def _pk_fwd_fn(r_total):
    """Fused denominators + K-group prefix products, packed IO.

    Inputs x1, y1, x2, y2: [12, K, r, 128] packed; output P: same shape,
    P[:, k] = d[0] * ... * d[k] per (r, lane) group."""
    mod, n0 = _FQ_MOD, _FQ_N0
    K = _PK_K

    def kernel(x1, y1, x2, y2, op):
        d, _, _, _, _ = _k_den(x1, y1, x2, y2, 0)
        packed = _k_pack(d)
        for i in range(FQ_P):
            op[i, 0] = packed[i]

        def body(k, acc):
            acc = list(acc)
            d, _, _, _, _ = _k_den(x1, y1, x2, y2, k)
            acc = _mulm(acc, d, mod, n0)
            packed = _k_pack(acc)
            for i in range(FQ_P):
                op[i, k] = packed[i]
            return tuple(acc)

        jax.lax.fori_loop(1, K, body, tuple(d))

    rb = min(_PK_RB, r_total)
    blk = pl.BlockSpec((FQ_P, K, rb, LANES), lambda i: (0, 0, i, 0),
                       memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel,
        grid=(r_total // rb,),
        in_specs=[blk] * 4,
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((FQ_P, K, r_total, LANES), jnp.uint32),
        interpret=_INTERPRET,
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _pk_bwd_fn(r_total, has_mask):
    """Fused walk-back + incomplete-add completion + merge-select.

    Per group the running suffix product t starts from the inverted group
    total; each k (descending) recovers the lane inverse as P[k-1] * t,
    completes the affine add (lambda, x3, y3 — 5 CIOS muls total), and
    writes either the sum or the untouched right operand per the mask."""
    mod, n0 = _FQ_MOD, _FQ_N0
    K = _PK_K

    def kernel(*refs):
        if has_mask:
            x1, y1, x2, y2, p_ref, tinv, mask, ox, oy = refs
        else:
            x1, y1, x2, y2, p_ref, tinv, ox, oy = refs
            mask = None

        t0 = [tinv[i] for i in range(FQ_L)]

        def body(j, t):
            t = list(t)
            k = K - 1 - j
            d, X1, X2, inf1, inf2 = _k_den(x1, y1, x2, y2, k)
            Y1 = _k_unpack(y1, k)
            Y2 = _k_unpack(y2, k)
            km1 = jnp.maximum(k - 1, 0)
            pk = _k_unpack(p_ref, km1)
            invk = _mulm(pk, t, mod, n0)
            first = k == 0
            inv = [jnp.where(first, t[i], invk[i]) for i in range(FQ_L)]
            tn = _mulm(t, d, mod, n0)
            dy = _subm(Y2, Y1, mod)
            lam = _mulm(dy, inv, mod, n0)
            lam2 = _mulm(lam, lam, mod, n0)
            x3 = _subm(_subm(lam2, X1, mod), X2, mod)
            y3 = _subm(_mulm(lam, _subm(X1, x3, mod), mod, n0), Y1, mod)

            def sel(cond, a, b):
                return [jnp.where(cond, a[i], b[i]) for i in range(FQ_L)]

            outx = sel(inf1, X2, sel(inf2, X1, x3))
            outy = sel(inf1, Y2, sel(inf2, Y1, y3))
            if mask is not None:
                m = mask[k] != 0
                outx = sel(m, outx, X2)
                outy = sel(m, outy, Y2)
            px = _k_pack(outx)
            py = _k_pack(outy)
            for i in range(FQ_P):
                ox[i, k] = px[i]
                oy[i, k] = py[i]
            return tuple(tn)

        jax.lax.fori_loop(0, K, body, tuple(t0))

    rb = min(_PK_RB, r_total)
    blk = pl.BlockSpec((FQ_P, K, rb, LANES), lambda i: (0, 0, i, 0),
                       memory_space=pltpu.VMEM)
    tblk = pl.BlockSpec((FQ_L, rb, LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    mblk = pl.BlockSpec((K, rb, LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [blk] * 5 + [tblk] + ([mblk] if has_mask else [])
    fn = pl.pallas_call(
        kernel,
        grid=(r_total // rb,),
        in_specs=in_specs,
        out_specs=[blk] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((FQ_P, K, r_total, LANES), jnp.uint32)
        ] * 2,
        interpret=_INTERPRET,
    )
    return jax.jit(fn)


def aff_add_packed(p1, p2, mask=None):
    """Batched incomplete affine add on packed coords ([12, B] each).

    mask (optional [B] u32): lanes with mask == 0 pass p2 through unchanged
    (the merge tree's not-my-segment lanes) — fusing the select into the
    kernel saves a full-width XLA where-pass per level."""
    x1, y1 = p1
    x2, y2 = p2
    B = x1.shape[1]
    K = _PK_K
    r = -(-B // (K * LANES))
    r = -(-r // _PK_RB) * _PK_RB if r > _PK_RB else r
    Bp = K * r * LANES

    def pad4(a):
        if Bp != B:
            a = jnp.pad(a, ((0, 0), (0, Bp - B)))
        return a.reshape(FQ_P, K, r, LANES)

    x1b, y1b, x2b, y2b = pad4(x1), pad4(y1), pad4(x2), pad4(y2)
    P = _pk_fwd_fn(r)(x1b, y1b, x2b, y2b)
    tot = unpack_fq_rows(P[:, K - 1]).reshape(FQ_L, r * LANES)
    tinv = _batch_inv_nz("fq", tot).reshape(FQ_L, r, LANES)
    if mask is not None:
        mb = mask
        if Bp != B:
            mb = jnp.pad(mb, (0, Bp - B))
        mb = mb.reshape(K, r, LANES)
        ox, oy = _pk_bwd_fn(r, True)(x1b, y1b, x2b, y2b, P, tinv, mb)
    else:
        ox, oy = _pk_bwd_fn(r, False)(x1b, y1b, x2b, y2b, P, tinv)
    return (
        ox.reshape(FQ_P, Bp)[:, :B],
        oy.reshape(FQ_P, Bp)[:, :B],
    )


@functools.lru_cache(maxsize=None)
def _pk_jac_add_fn(s_total, has_mask):
    """Fused INCOMPLETE jacobian add, packed IO ([12, S, 128] per coord).

    Handles only the infinity bypass (Z == 0); doubling/cancellation lanes
    cannot occur for partial sums of disjoint point subsets (see the packed
    pipeline header).  ~16 CIOS muls per lane — no inversion at all, which
    is the point: the merge tree's deep levels and the flush/tail reductions
    otherwise pay a ~4.6 ms sequential Fermat inversion per batch-inverted
    add call (381 squarings of instruction-depth cost), dwarfing their own
    arithmetic.  add-2007-bl, as g1_add (zk_kernels.cpp g1_add)."""
    mod, n0 = _FQ_MOD, _FQ_N0

    def kernel(*refs):
        if has_mask:
            x1, y1, z1, x2, y2, z2, mask, ox, oy, oz, scratch = refs
        else:
            x1, y1, z1, x2, y2, z2, ox, oy, oz, scratch = refs
            mask = None

        def up(ref):
            out = []
            for i in range(FQ_P):
                v = ref[i]
                out.append(v & _M16)
                out.append(v >> 16)
            return out

        X1, Y1, Z1 = up(x1), up(y1), up(z1)
        X2, Y2, Z2 = up(x2), up(y2), up(z2)

        def mul(a, b):
            return _mulm_fori(a, b, mod, n0, scratch)

        inf1 = _iszero_limbs(Z1)
        inf2 = _iszero_limbs(Z2)
        Z1Z1 = mul(Z1, Z1)
        Z2Z2 = mul(Z2, Z2)
        U1 = mul(X1, Z2Z2)
        U2 = mul(X2, Z1Z1)
        S1 = mul(Y1, mul(Z2, Z2Z2))
        S2 = mul(Y2, mul(Z1, Z1Z1))
        H = _subm(U2, U1, mod)
        R = _subm(S2, S1, mod)
        HH = mul(H, H)
        HHH = mul(H, HH)
        V = mul(U1, HH)
        RR = mul(R, R)
        X3 = _subm(_subm(_subm(RR, HHH, mod), V, mod), V, mod)
        Y3 = _subm(mul(R, _subm(V, X3, mod)), mul(S1, HHH), mod)
        Z3 = mul(mul(Z1, Z2), H)

        def sel(cond, a, b):
            return [jnp.where(cond, a[i], b[i]) for i in range(FQ_L)]

        outx = sel(inf1, X2, sel(inf2, X1, X3))
        outy = sel(inf1, Y2, sel(inf2, Y1, Y3))
        outz = sel(inf1, Z2, sel(inf2, Z1, Z3))
        if mask is not None:
            m = mask[0] != 0
            outx = sel(m, outx, X2)
            outy = sel(m, outy, Y2)
            outz = sel(m, outz, Z2)
        px, py, pz = _k_pack(outx), _k_pack(outy), _k_pack(outz)
        for i in range(FQ_P):
            ox[i] = px[i]
            oy[i] = py[i]
            oz[i] = pz[i]

    sb = min(8, s_total)
    blk = pl.BlockSpec((FQ_P, sb, LANES), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)
    mblk = pl.BlockSpec((1, sb, LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [blk] * 6 + ([mblk] if has_mask else [])
    fn = pl.pallas_call(
        kernel,
        grid=(s_total // sb,),
        in_specs=in_specs,
        out_specs=[blk] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((FQ_P, s_total, LANES), jnp.uint32)
        ] * 3,
        scratch_shapes=[pltpu.VMEM((FQ_L, sb, LANES), jnp.uint32)],
        interpret=_INTERPRET,
    )
    return jax.jit(fn)


def jac_add_packed(p1, p2, mask=None):
    """Batched incomplete jacobian add on packed coords ([12, B] each).

    mask semantics match aff_add_packed: mask == 0 lanes pass p2 through."""
    B = p1[0].shape[1]
    sp = -(-B // LANES)
    sp = -(-sp // 8) * 8 if sp > 8 else sp
    Bp = sp * LANES

    def pad(a):
        if Bp != B:
            a = jnp.pad(a, ((0, 0), (0, Bp - B)))
        return a.reshape(FQ_P, sp, LANES)

    args = [pad(c) for c in (*p1, *p2)]
    if mask is not None:
        mb = mask if Bp == B else jnp.pad(mask, (0, Bp - B))
        args.append(mb.reshape(1, sp, LANES))
        ox, oy, oz = _pk_jac_add_fn(sp, True)(*args)
    else:
        ox, oy, oz = _pk_jac_add_fn(sp, False)(*args)
    return tuple(v.reshape(FQ_P, Bp)[:, :B] for v in (ox, oy, oz))


@functools.lru_cache(maxsize=None)
def _one_pk_col():
    one = np.array(_FQ_ONE, np.uint32)
    pk = one[0::2] | (one[1::2] << 16)
    return pk.reshape(FQ_P, 1)


def _jac_z_of_affine_pk(X, Y):
    """Packed affine -> jacobian Z column: one where the point is real,
    zero (infinity) where (X, Y) == (0, 0)."""
    nz = jnp.any(X != 0, axis=0) | jnp.any(Y != 0, axis=0)
    onec = jnp.asarray(_one_pk_col())
    return jnp.where(nz[None, :], onec, jnp.uint32(0))


def _jac_tree_sum_last_pk(X, Y, Z):
    """Reduce packed jacobian [12, W, m] -> [12, W] by pair halving."""
    L, W, m = X.shape
    while m > 1:
        h = m // 2
        a1 = tuple(v[:, :, :h].reshape(L, W * h) for v in (X, Y, Z))
        a2 = tuple(v[:, :, h:].reshape(L, W * h) for v in (X, Y, Z))
        X, Y, Z = (v.reshape(L, W, h) for v in jac_add_packed(a1, a2))
        m = h
    return X[:, :, 0], Y[:, :, 0], Z[:, :, 0]


def _weighted_bucket_tail_jac_pk(bX, bY, bZ):
    """sum_b b * B[w, b] per window via pair halving on packed jacobian
    buckets, the 2^level weighting deferred to the host combine.  Input
    [12, W, NB]; returns per-window per-level singles each [W, NLEV, 12]."""
    L, W, nb = bX.shape
    sXs, sYs, sZs = [], [], []
    while nb > 1:
        ev = tuple(v[:, :, 0::2] for v in (bX, bY, bZ))
        od = tuple(v[:, :, 1::2] for v in (bX, bY, bZ))
        sX, sY, sZ = _jac_tree_sum_last_pk(*od)
        sXs.append(sX)
        sYs.append(sY)
        sZs.append(sZ)
        h = nb // 2
        a1 = tuple(v.reshape(L, W * h) for v in ev)
        a2 = tuple(v.reshape(L, W * h) for v in od)
        bX, bY, bZ = (v.reshape(L, W, h) for v in jac_add_packed(a1, a2))
        nb = h
    return (
        jnp.stack(sXs).transpose(2, 0, 1),
        jnp.stack(sYs).transpose(2, 0, 1),
        jnp.stack(sZs).transpose(2, 0, 1),
    )


def _digits_all(sc, c):
    """All ceil(255/c) c-bit windows of [16, n] canonical 16-bit scalar limbs
    (c <= 16, so a digit spans at most two limbs)."""
    W = -(-255 // c)
    mask = jnp.uint32((1 << c) - 1)
    outs = []
    for w in range(W):
        lo = w * c
        i, off = lo // 16, lo % 16
        d = sc[i] >> jnp.uint32(off)
        if 16 - off < c and i + 1 < 16:
            d = d | (sc[i + 1] << jnp.uint32(16 - off))
        outs.append(d & mask)
    return jnp.stack(outs)


def _msm_c(n: int) -> int:
    """Window bit-width minimizing modeled work: W(c) * (K*n data movement +
    merge adds + per-level bucket-row flush adds + weighted-tail adds)."""
    logn = max(1, n.bit_length() - 1)
    best, bestc = None, 16
    for c in range(4, 17):
        W = -(-255 // c)
        cost = W * (3 * n + logn * (1 << c) + (1 << (c + 1)))
        if best is None or cost < best:
            best, bestc = cost, c
    return bestc


def _msm_wb(n: int, c: int, W: int) -> int:
    """Windows per lax.scan step: bounded by the ~[48, wb*n] u32 gathered
    working set and the [24, wb*2^c] flush-row width; balanced so the last
    scan step is not mostly padding (e.g. W=17 at wb=8 would run 24 window
    slots — rebalancing to wb=6 runs 18)."""
    wb = max(1, min(W, (1 << 23) // n))
    while wb > 1 and wb * (1 << c) > (1 << 22):
        wb //= 2
    steps = -(-W // wb)
    return -(-W // steps)


# Hardware-validated (c, wb) per padded point count, n >= 2^16.  The Mosaic
# backend faults the chip for certain (n, c, wb) combinations with no clean
# shape pattern — observed: (2^17, c=12, wb=22) and (2^17, c=15, wb=6)
# crash while (2^17, c=10, wb=26), (2^16, c=10, wb=26), (2^20, c=15, wb=6)
# and (2^22, c=16, wb=2) run clean (scripts/msm_bisect.py, BENCH_r03 fault).
# Every entry here has been run clean on a real v5e through the oracle in
# scripts/msm_shape_check.py; sizes below 2^16 use the analytic model
# (validated wholesale by the small/mid shape sets).
_MSM_PINNED = {
    1 << 16: (10, 26),
    1 << 17: (10, 26),
    1 << 18: (13, 20),
    1 << 19: (10, 13),
    1 << 20: (15, 6),   # sweep r05: 1.68s vs (16,4) 2.24 / (16,8) 3.81
    1 << 21: (16, 4),   # sweep r05: 3.06s vs (16,2) 3.30; runs in the
                        # full-shape prove (Q_AX/Q_AY) — hardware-clean
    1 << 22: (16, 4),   # sweep r05: 4.96s vs (16,2) 5.28
    # 2^23 is not prover-emitted at the bench shapes (encode max = 2^22);
    # best-guess config kept as a fallback away from the observed-bad region
    1 << 23: (16, 1),
}


def _msm_config(n: int) -> tuple:
    """(c, W, wb) for a padded point count."""
    pinned = _MSM_PINNED.get(n)
    if pinned is not None:
        c, wb = pinned
        return c, -(-255 // c), wb
    c = _msm_c(n)
    W = -(-255 // c)
    return c, W, _msm_wb(n, c, W)


def _msm_windows_core(n, wb, c):
    """Jitted MSM core for a padded point count n (pow2): W = ceil(255/c)
    windows of c bits, wb windows per lax.scan step.

    Bucket accumulation = sorted merge tree in BIT-REVERSED order: after the
    per-window sort, elements are laid out bit-reversed so every level pairs
    the two CONTIGUOUS halves (i, i + m/2) — the natural-order adjacent
    pairing `[0::2]/[1::2]` costs ~0.7 s per level at 2^22 in lane-misaligned
    strided-slice relayouts, contiguous halves ~12 ms.  Same-key pairs merge
    with one batched affine add; boundary pairs flush the left partial into
    per-window bucket rows with ONE batched scatter per level (at most one
    real writer per bucket; dead/merged lanes land in bucket 0, whose weight
    in the bucket sum is zero).  Point work: exactly n-1 adds per window —
    the minimum.  The weighted bucket sum T = sum_b b * B_b runs once for
    all windows after the scan (window-batched pair halving), with the
    2^level weighting deferred to the host combine.

    Returns (sX, sY) each [W_padded, c, 24] affine singles ((0,0) = inf):
    window value = sum_level 2^level * single[window, level].
    """
    NB = 1 << c
    br = jnp.asarray(_bitrev_idx(n))

    # All point arrays stay FLAT [24, wb*width] (window-major): 3-D shapes
    # with a small middle dim pad the sublane axis 4-8x in HBM (a 2^22 run
    # OOM'd at 21.4 GB of 15.75 GB purely from tile padding).

    def _halves(a, wb, m):
        """Flat [24, wb*m] -> contiguous per-window halves [24, wb*(m//2)]."""
        h = m // 2
        if wb == 1:
            return a[:, :h], a[:, h:]
        lefts = jnp.concatenate(
            [a[:, w * m : w * m + h] for w in range(wb)], axis=1
        )
        rights = jnp.concatenate(
            [a[:, w * m + h : (w + 1) * m] for w in range(wb)], axis=1
        )
        return lefts, rights

    def step_body(carry, digits):
        xp, yp = carry  # [24, n] shared source points
        order = jnp.argsort(digits, axis=1)        # [wb, n]
        order = jnp.take(order, br, axis=1)        # sorted, bit-reversed
        key = jnp.take_along_axis(digits, order, axis=1)  # [wb, n]
        src = jnp.concatenate([xp, yp], axis=0)    # [48, n]
        g = jnp.take(src, order.reshape(-1), axis=1)  # [48, wb*n]
        X, Y = g[:FQ_L], g[FQ_L:]
        dead = (key == jnp.uint32(0)).reshape(1, wb * n)
        X = jnp.where(dead, jnp.uint32(0), X)  # digit 0 -> (0,0) = infinity
        Y = jnp.where(dead, jnp.uint32(0), Y)

        woff = (jnp.arange(wb, dtype=jnp.uint32) * jnp.uint32(NB))[:, None]
        zeroNB = jnp.zeros((FQ_L, wb * NB), jnp.uint32)
        bX, bY = zeroNB, zeroNB  # (0,0) everywhere = all-infinity

        def flush_and_add(acc, lk, pX, pY):
            flatk = (lk + woff).reshape(-1)
            row = tuple(
                jnp.zeros((FQ_L, wb * NB), jnp.uint32).at[:, flatk].set(p)
                for p in (pX, pY)
            )
            return g1_aff_add_batch(acc, row)

        m = n
        while m > 1:
            h = m // 2
            kl, kr = key[:, :h], key[:, h:]
            lX, rX = _halves(X, wb, m)
            lY, rY = _halves(Y, wb, m)
            same2 = kl == kr  # [wb, h]
            same = same2.reshape(1, wb * h)
            mX, mY = g1_aff_add_batch((lX, lY), (rX, rY))
            X = jnp.where(same, mX, rX)
            Y = jnp.where(same, mY, rY)
            lk = jnp.where(same2, jnp.uint32(0), kl)  # merged -> bucket 0
            bX, bY = flush_and_add((bX, bY), lk, lX, lY)
            key = kr
            m = h
        # final survivor (never merged)
        bX, bY = flush_and_add((bX, bY), key, X, Y)
        return carry, (bX, bY)

    def run(scalars, xp, yp, infp):
        digits = _digits_all(scalars, c)  # [W, n]
        W = digits.shape[0]
        # dead inputs -> bucket 0 (weight zero)
        key_all = jnp.where(infp[None, :].astype(bool), jnp.uint32(0), digits)
        steps = -(-W // wb)
        if steps * wb != W:
            key_all = jnp.pad(key_all, ((0, steps * wb - W), (0, 0)))
        ks = key_all.reshape(steps, wb, n)
        _, (bXs, bYs) = jax.lax.scan(step_body, (xp, yp), ks)
        # [S, 24, wb*NB] -> [24, S*wb, NB] (step-major == window order)
        bX = jnp.moveaxis(bXs, 1, 0).reshape(FQ_L, steps * wb, NB)
        bY = jnp.moveaxis(bYs, 1, 0).reshape(FQ_L, steps * wb, NB)
        return _weighted_bucket_tail(bX, bY)

    return run


_JAC_TH = 1 << 18  # merge-level width below which jacobian replaces affine


def _msm_windows_core_packed(n, wb, c):
    """Packed-pipeline MSM core.  Same sorted merge-tree structure as
    _msm_windows_core (see its docstring for the algorithm), rebuilt around
    the measured bottlenecks (scripts/msm_phase_profile.py @ 2^22):

      * coordinates packed (two 16-bit limbs per u32 lane) end to end;
      * the point gather runs over [n, 128] ROWS — XLA's TPU gather moves
        aligned 128-lane rows ~3.5x faster per point than lane-major
        columns (scripts/gather_probe.py: 0.14 s vs 0.49 s per 8M rows);
        chunked so the [chunk, 128] transient stays ~1 GB;
      * merge levels >= _JAC_TH lanes use the fused batch-inverted affine
        add (cheapest per lane); smaller levels switch to the fused
        incomplete jacobian add — below ~2^18 lanes the 4.6 ms sequential
        Fermat inversion inside every batch-inverted add dominates the
        level itself;
      * per-level flush scatters collect into PER-LEVEL jacobian rows which
        reduce pairwise at the end (log2(levels) batched adds) instead of
        one running NB-wide batch-inverted add per level;
      * the weighted bucket tail runs jacobian; the host combine does the
        (exact, tiny) jacobian->affine conversion.

    Returns (sX, sY, sZ) each [W_padded, c, 12] packed jacobian singles.
    """
    NB = 1 << c
    br = jnp.asarray(_bitrev_idx(n))

    def _halves(a, wb_, m):
        h = m // 2
        if wb_ == 1:
            return a[:, :h], a[:, h:]
        lefts = jnp.concatenate(
            [a[:, w * m: w * m + h] for w in range(wb_)], axis=1
        )
        rights = jnp.concatenate(
            [a[:, w * m + h: (w + 1) * m] for w in range(wb_)], axis=1
        )
        return lefts, rights

    def step_body(rows, digits):
        # one variadic sort yields both the sorted keys and the order
        iota = jax.lax.broadcasted_iota(jnp.int32, (wb, n), 1)
        key, order = jax.lax.sort((digits, iota), dimension=1, num_keys=1)
        key = jnp.take(key, br, axis=1)            # bit-reversed layout
        order = jnp.take(order, br, axis=1)
        flat = order.reshape(-1)
        chunk = min(wb * n, 1 << 21)
        parts = []
        for i in range(0, wb * n, chunk):
            g = jnp.take(rows, flat[i:i + chunk], axis=0)  # [chunk, 128]
            parts.append(g[:, : 2 * FQ_P].T)               # [24, chunk]
        g24 = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        X, Y = g24[:FQ_P], g24[FQ_P:]
        dead = (key == jnp.uint32(0)).reshape(1, wb * n)
        X = jnp.where(dead, jnp.uint32(0), X)  # digit 0 -> (0,0) = infinity
        Y = jnp.where(dead, jnp.uint32(0), Y)

        woff = (jnp.arange(wb, dtype=jnp.uint32) * jnp.uint32(NB))[:, None]

        def flush_row(lk, fx, fy, fz):
            """Scatter a level's left-partials into bucket-indexed rows.

            fz=None (affine levels, 96% of scattered lanes): scatter only
            (X, Y) and derive Z from the scattered rows afterwards — a
            written bucket holds a real affine point ((0,0) only for dead
            lanes routed to bucket 0), an unwritten bucket stays (0, 0) =
            infinity.  Scatter cost is per element, so dropping the Z row
            cuts a third of the flush traffic."""
            flatk = (lk + woff).reshape(-1)
            sx, sy = (
                jnp.zeros((FQ_P, wb * NB), jnp.uint32).at[:, flatk].set(v)
                for v in (fx, fy)
            )
            if fz is None:
                sz = _jac_z_of_affine_pk(sx, sy)
            else:
                sz = jnp.zeros((FQ_P, wb * NB), jnp.uint32).at[:, flatk].set(fz)
            return sx, sy, sz

        flush_rows = []
        Z = None  # None == affine representation
        m = n
        while m > 1:
            h = m // 2
            kl, kr = key[:, :h], key[:, h:]
            lX, rX = _halves(X, wb, m)
            lY, rY = _halves(Y, wb, m)
            same2 = kl == kr  # [wb, h]
            mask = same2.reshape(wb * h).astype(jnp.uint32)
            lk = jnp.where(same2, jnp.uint32(0), kl)  # merged -> bucket 0
            if Z is None and wb * h < _JAC_TH:
                Z = _jac_z_of_affine_pk(X, Y)
            if Z is None:
                flush_rows.append(flush_row(lk, lX, lY, None))
                X, Y = aff_add_packed((lX, lY), (rX, rY), mask=mask)
            else:
                lZ, rZ = _halves(Z, wb, m)
                flush_rows.append(flush_row(lk, lX, lY, lZ))
                X, Y, Z = jac_add_packed(
                    (lX, lY, lZ), (rX, rY, rZ), mask=mask)
            key = kr
            m = h
        if Z is None:
            Z = _jac_z_of_affine_pk(X, Y)
        flush_rows.append(flush_row(key, X, Y, Z))
        # the per-level rows reduce AFTER the scan, batched across steps
        return rows, tuple(
            jnp.stack([r[i] for r in flush_rows]) for i in range(3))

    def run(scalars, xp, yp, infp):
        digits = _digits_all(scalars, c)  # [W, n]
        W = digits.shape[0]
        key_all = jnp.where(infp[None, :].astype(bool), jnp.uint32(0), digits)
        steps = -(-W // wb)
        if steps * wb != W:
            key_all = jnp.pad(key_all, ((0, steps * wb - W), (0, 0)))
        ks = key_all.reshape(steps, wb, n)
        # [n, 128] gather rows: packed X|Y in the first 24 lanes
        src = jnp.concatenate([xp, yp], axis=0)  # [24, n]
        rows = jnp.pad(src.T, ((0, 0), (0, LANES - 2 * FQ_P)))
        _, (FXs, FYs, FZs) = jax.lax.scan(step_body, rows, ks)
        # FXs: [steps, nlev, 12, wb*NB].  Reduce the level axis pairwise,
        # batching (step, bucket) — one big add per pass instead of ~13
        # small ones per step (launch overhead halved the reduce's speed).
        nlev = FXs.shape[1]
        FX, FY, FZ = FXs, FYs, FZs
        while nlev > 1:
            if nlev % 2 == 1:
                pad = ((0, 0), (0, 1), (0, 0), (0, 0))
                FX, FY, FZ = (jnp.pad(v, pad) for v in (FX, FY, FZ))
                nlev += 1
            h2 = nlev // 2
            a1 = tuple(
                jnp.moveaxis(v[:, 0::2], 2, 0).reshape(FQ_P, -1)
                for v in (FX, FY, FZ))
            a2 = tuple(
                jnp.moveaxis(v[:, 1::2], 2, 0).reshape(FQ_P, -1)
                for v in (FX, FY, FZ))
            o = jac_add_packed(a1, a2)
            FX, FY, FZ = (
                jnp.moveaxis(
                    v.reshape(FQ_P, steps, h2, wb * NB), 0, 2)
                for v in o)
            nlev = h2
        bX = jnp.moveaxis(FX[:, 0].reshape(steps, FQ_P, wb, NB), 1, 0)
        bX = bX.reshape(FQ_P, steps * wb, NB)
        bY = jnp.moveaxis(FY[:, 0].reshape(steps, FQ_P, wb, NB), 1, 0)
        bY = bY.reshape(FQ_P, steps * wb, NB)
        bZ = jnp.moveaxis(FZ[:, 0].reshape(steps, FQ_P, wb, NB), 1, 0)
        bZ = bZ.reshape(FQ_P, steps * wb, NB)
        return _weighted_bucket_tail_jac_pk(bX, bY, bZ)

    return run


_PACKED_MSM = os.environ.get("TZK_MSM_PACKED", "1") == "1"


@functools.lru_cache(maxsize=None)
def _msm_windows_fn(n, wb, c):
    return jax.jit(_msm_windows_core(n, wb, c))


@functools.lru_cache(maxsize=None)
def _msm_full_fn(n, wb, c):
    """The MSM device pipeline as ONE jitted function with ONE stacked
    output: digit extraction, the windowed scan, and the weighted bucket
    tail.  Through the remote TPU tunnel every eager op and every host pull
    costs a round trip — the previous eager chain plus two separate result
    pulls made even an N=8 MSM cost ~1.3 s; one dispatch + one pull removes
    that floor.  Keyed on the PADDED count n (padding happens eagerly in
    g1_msm) so every raw N sharing a power-of-two bucket reuses one
    compiled executable.

    Packed variant (default): points are packed to [12, n] on device inside
    the jit, the whole pipeline runs packed, and the stacked output is
    [2, W, c, 12] packed singles."""
    if _PACKED_MSM:
        run = _msm_windows_core_packed(n, wb, c)

        def full(scalars, px, py, pinf):
            xp = pack_fq_rows(px)
            yp = pack_fq_rows(py)
            dead = pinf[None, :].astype(bool)
            xp = jnp.where(dead, jnp.uint32(0), xp)
            yp = jnp.where(dead, jnp.uint32(0), yp)
            sX, sY, sZ = run(scalars, xp, yp, pinf)
            return jnp.stack([sX, sY, sZ])  # [3, W, c, 12] packed jacobian

        return jax.jit(full)

    run = _msm_windows_core(n, wb, c)

    def full(scalars, px, py, pinf):
        sX, sY = run(scalars, px, py, pinf)
        return jnp.stack([sX, sY])  # [2, W, c, 24]

    return jax.jit(full)


def _aff_tree_sum_last(X, Y):
    """Reduce (X [24, W, m], Y) to [24, W] by affine-add halving along the
    last axis (m a power of two), batching the window axis."""
    L, W, m = X.shape
    while m > 1:
        h = m // 2
        a1 = tuple(v[:, :, :h].reshape(L, W * h) for v in (X, Y))
        a2 = tuple(v[:, :, h:].reshape(L, W * h) for v in (X, Y))
        X, Y = (v.reshape(L, W, h) for v in g1_aff_add_batch(a1, a2))
        m = h
    return X[:, :, 0], Y[:, :, 0]


def _weighted_bucket_tail(bX, bY):
    """sum_b b * B[w, b] for every window at once via pair halving
    (T(B) = 2*T(B_even + B_odd) + sum(B_odd)), deferring the 2^level
    weighting to the host combine.  Input [24, W, NB] affine; returns
    per-window per-level singles (sX, sY) each [W, NLEV, 24]."""
    L, W, nb = bX.shape
    sXs, sYs = [], []
    while nb > 1:
        ev = (bX[:, :, 0::2], bY[:, :, 0::2])
        od = (bX[:, :, 1::2], bY[:, :, 1::2])
        sX, sY = _aff_tree_sum_last(*od)  # [24, W]
        sXs.append(sX)
        sYs.append(sY)
        h = nb // 2
        a1 = tuple(v.reshape(L, W * h) for v in ev)
        a2 = tuple(v.reshape(L, W * h) for v in od)
        bX, bY = (v.reshape(L, W, h) for v in g1_aff_add_batch(a1, a2))
        nb = h
    # [NLEV, 24, W] -> [W, NLEV, 24]
    return jnp.stack(sXs).transpose(2, 0, 1), jnp.stack(sYs).transpose(2, 0, 1)


def _pow2_chunks(N: int) -> list:
    """Greedy pow2 decomposition of a raw point count.

    encode_poly slices are tx*ty grids like 4097*257 — 0.4% above a power
    of two.  Padding that to 2^21 would sort/gather/merge 2^20 dead lanes
    (half the padded MSM!); instead the MSM runs as up to three chunks
    ([2^20, 2^13] here) whose results add exactly on the host.  Chunk
    boundaries are pow2 >= 2^15, so slices stay lane-aligned and chunk
    sizes reuse already-compiled executables."""
    if N <= (1 << 16):
        return [N]
    chunks = []
    rem = N
    while True:
        p = 1 << (rem.bit_length() - 1)
        if p == rem or rem < (1 << 15) or len(chunks) >= 2:
            chunks.append(rem)
            break
        chunks.append(p)
        rem -= p
    return chunks


def _msm_one_start(scalars, px, py, pinf):
    N = px.shape[1]
    n = max(2, 1 << (N - 1).bit_length())
    c, W, wb = _msm_config(n)
    if n != N:
        px = jnp.pad(px, ((0, 0), (0, n - N)))
        py = jnp.pad(py, ((0, 0), (0, n - N)))
        pinf = jnp.pad(pinf.astype(jnp.uint32), (0, n - N),
                       constant_values=1)
        scalars = jnp.pad(scalars.astype(jnp.uint32), ((0, 0), (0, n - N)))
    out = _msm_full_fn(n, wb, c)(
        scalars.astype(jnp.uint32), px, py, pinf.astype(jnp.uint32))
    return (out, c)


def g1_msm_start(scalars, px, py, pinf):
    """Dispatch the device half of an MSM without blocking: returns a
    handle for g1_msm_finish.  Splitting dispatch from the host pull lets a
    prover round enqueue ALL its commitments before the first sync — through
    the remote TPU tunnel each sync costs a round trip.  Point counts just
    above a power of two dispatch as multiple pow2 chunks (_pow2_chunks)
    whose partial results add exactly on the host at finish time."""
    N = px.shape[1]
    handles = []
    off = 0
    for ch in _pow2_chunks(N):
        end = min(off + ch, N)
        handles.append(_msm_one_start(
            scalars[:, off:end], px[:, off:end], py[:, off:end],
            pinf[off:end]))
        off = end
    return handles


def g1_msm_finish(handle):
    """Pull the windowed singles and run the exact host combine.  A list
    handle (pow2-chunked MSM) finishes each chunk and adds the host
    jacobian results exactly."""
    from ..host.curve import G1

    if isinstance(handle, list):
        parts = [g1_msm_finish(h) for h in handle]
        if len(parts) == 1:
            return parts[0]
        acc = None
        for rows in parts:
            rh = np.asarray(rows)
            P = (
                FQ.from_mont(FQ.from_limbs(rh[0])),
                FQ.from_mont(FQ.from_limbs(rh[1])),
                FQ.from_mont(FQ.from_limbs(rh[2])),
            )
            acc = P if acc is None else G1.add(acc, P)
        rows = np.zeros((3, FQ_L), np.uint32)
        rows[0] = FQ.to_limbs(FQ.to_mont(acc[0]))
        rows[1] = FQ.to_limbs(FQ.to_mont(acc[1]))
        rows[2] = FQ.to_limbs(FQ.to_mont(acc[2]))
        return jnp.asarray(rows)

    out, c = handle
    both = np.asarray(out)  # ONE host pull for the whole result
    jac = both.shape[0] == 3  # packed-jacobian singles (packed pipeline)
    if both.shape[-1] == FQ_P:  # packed -> unpack on host
        lo = both & 0xFFFF
        hi = both >> 16
        both = np.stack([lo, hi], axis=-1).reshape(
            both.shape[:-1] + (FQ_L,))
    sXh, sYh = both[0], both[1]
    sZh = both[2] if jac else None
    exps, pts = [], []
    for wi in range(sXh.shape[0]):  # includes padded windows (all-infinity)
        for lev in range(sXh.shape[1]):
            if jac:
                Zi = FQ.from_mont(FQ.from_limbs(sZh[wi, lev]))
                if Zi == 0:
                    continue  # infinity
                Xi = FQ.from_mont(FQ.from_limbs(sXh[wi, lev]))
                Yi = FQ.from_mont(FQ.from_limbs(sYh[wi, lev]))
                zi = pow(Zi, -1, Q_MOD)
                zi2 = zi * zi % Q_MOD
                pt = (Xi * zi2 % Q_MOD, Yi * zi2 % Q_MOD * zi % Q_MOD)
            else:
                if not (sXh[wi, lev].any() or sYh[wi, lev].any()):
                    continue  # (0,0) = infinity
                pt = (
                    FQ.from_mont(FQ.from_limbs(sXh[wi, lev])),
                    FQ.from_mont(FQ.from_limbs(sYh[wi, lev])),
                )
            exps.append(c * wi + lev)
            pts.append(pt)
    X, Y, Z = G1.msm_pow2(exps, pts)  # jacobian host tuple (Z=0 at inf)
    rows = np.zeros((3, FQ_L), np.uint32)
    rows[0] = FQ.to_limbs(FQ.to_mont(X))
    rows[1] = FQ.to_limbs(FQ.to_mont(Y))
    rows[2] = FQ.to_limbs(FQ.to_mont(Z))
    return jnp.asarray(rows)


def g1_msm(scalars, px, py, pinf):
    """Full MSM -> jacobian [3, 24] u32 rows (matches native G1Msm).

    Device work: W scanned windows x (argsort + n batched affine adds +
    bucket halving); the W x c weighted single points are pulled to the host
    once and combined exactly via the power-of-two Horner in host/curve.py —
    the same split as the reference, which runs its Fiat-Shamir/"tiny
    sequential tail" work on CPU."""
    return g1_msm_finish(g1_msm_start(scalars, px, py, pinf))


@functools.lru_cache(maxsize=4)
def _fixed_base_table(gx: int, gy: int):
    """Host-built 32x256 window table for generator (gx, gy) -> device arrays.

    ~8k exact host point ops; cached per generator so repeated CRS-family
    calls (trusted setup makes dozens against the same G) pay it once."""
    from ..host.curve import G1

    W, NWIN, TBL = 8, 32, 256
    base = G1.from_affine((gx, gy))
    tx = np.zeros((FQ_L, NWIN, TBL), np.uint32)
    ty = np.zeros((FQ_L, NWIN, TBL), np.uint32)
    tinf = np.ones((NWIN, TBL), np.uint32)
    for wi in range(NWIN):
        acc = G1.infinity
        pts = []
        for d in range(1, TBL):
            acc = G1.add(acc, base)
            pts.append(acc)
        # batch-normalize the column's jacobian points (one inversion)
        zs = [p[2] for p in pts]
        pre = []
        run = 1
        for z in zs:
            pre.append(run)
            run = run * z % Q_MOD
        inv = pow(run, -1, Q_MOD)
        for d in range(TBL - 1, 0, -1):
            p = pts[d - 1]
            zi = pre[d - 1] * inv % Q_MOD
            inv = inv * p[2] % Q_MOD
            zi2 = zi * zi % Q_MOD
            ax = p[0] * zi2 % Q_MOD
            ay = p[1] * zi2 % Q_MOD * zi % Q_MOD
            tx[:, wi, d] = FQ.to_limbs(FQ.to_mont(ax))
            ty[:, wi, d] = FQ.to_limbs(FQ.to_mont(ay))
            tinf[wi, d] = 0
        for _ in range(W):
            base = G1.double(base)
    return jnp.asarray(tx), jnp.asarray(ty), jnp.asarray(tinf)


def g1_fixed_base(scalars, gen):
    """out[i] = k[i] * G for one shared affine G (CRS generation workhorse).

    The 32x256 window table is built on the host with exact ints (cached per
    generator), then applied as 32 batched gather + affine adds.  Returns
    jacobian arrays like the native kernel (Z in {0, 1} here; callers
    normalize via to_affine, so representations may differ across backends).
    """
    genh = np.asarray(gen)
    gx = FQ.from_mont(FQ.from_limbs(genh[:, 0]))
    gy = FQ.from_mont(FQ.from_limbs(genh[:, 1]))
    txd, tyd, tinfd = _fixed_base_table(gx, gy)
    B = scalars.shape[1]
    X, Y, Z = _fixed_base_apply_fn(B)(scalars, txd, tyd, tinfd)
    return X, Y, Z


@functools.lru_cache(maxsize=None)
def _fixed_base_apply_fn(B):
    """Jitted 32-window table apply: lax.scan over windows (one gather + one
    batched affine add per step) so the body compiles once — the unrolled
    version was a multi-minute XLA compile per batch size."""
    NWIN = 32

    def body(carry, xs):
        txr, tyr, tir, d = xs
        one = jnp.broadcast_to(jnp.asarray(_one_col_np("fq")), carry[0].shape)
        z2 = jnp.where(tir[d][None, :].astype(bool), jnp.zeros_like(one), one)
        return g1_add_fused(carry, (txr[:, d], tyr[:, d], z2)), None

    def run(scalars, txd, tyd, tinfd):
        digits = jnp.stack(
            [
                (scalars[wi // 2, :] >> (8 * (wi % 2))) & jnp.uint32(0xFF)
                for wi in range(NWIN)
            ]
        )  # [32, B]
        xs = (
            jnp.moveaxis(txd, 1, 0),  # [32, 24, 256]
            jnp.moveaxis(tyd, 1, 0),
            tinfd,  # [32, 256]
            digits,
        )
        (X, Y, Z), _ = jax.lax.scan(body, _jac_inf_cols(B), xs)
        return X, Y, Z

    return jax.jit(run)
