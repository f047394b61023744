"""Vectorized big-integer modular arithmetic on TPU (JAX/XLA).

This is the TPU-native replacement for ICICLE's field kernels (the reference
backend's compute substrate — see SURVEY.md §2, "ICICLE (external native
dep)").  Field elements are arrays of 16-bit limbs held in uint32 lanes,
little-endian limb order, shape `[..., n_limbs]`, in Montgomery form with
R = 2^(16*n_limbs).

Design notes (why 16-bit limbs / why these loop shapes):
  * The TPU VPU has no 64-bit integer multiply; uint32*uint32 keeps only the
    low 32 bits.  16x16-bit products are exact in uint32.
  * Products are split into hi/lo 16-bit halves immediately and accumulated in
    relaxed columns.  Each column receives at most ~4*n_limbs terms < 2^16, so
    accumulators stay < 2^23 << 2^32: no overflow, and carries are resolved
    once per Montgomery step (the minimum the algorithm allows).
  * All loops below are over *limb indices* (static, unrolled at trace time);
    the batch dimension is the vectorized axis XLA maps onto the VPU lanes.

The same engine instantiates Fr (16 limbs) and Fq (24 limbs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import FQ, FR, LIMB_BITS, LIMB_MASK, FieldSpec

U32 = jnp.uint32
_MASK = np.uint32(LIMB_MASK)


class LimbField:
    """Device-side modular arithmetic for one prime field."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.L = spec.n_limbs
        self.mod_limbs = np.array(spec.to_limbs(spec.modulus), dtype=np.uint32)
        self.n0 = np.uint32(spec.n0_inv)
        # Montgomery constants as limb arrays
        self.one_mont = np.array(spec.to_limbs(spec.R_mod), dtype=np.uint32)
        self.r2_mont = np.array(spec.to_limbs(spec.R2_mod), dtype=np.uint32)
        self.zero = np.zeros(self.L, dtype=np.uint32)
        # Exponent bits for Fermat inversion, MSB first.
        e = spec.modulus - 2
        self.inv_exp_bits = np.array(
            [(e >> i) & 1 for i in reversed(range(e.bit_length()))], dtype=np.uint32
        )

    # ------------------------------------------------------------------
    # Packing helpers (host <-> device)
    # ------------------------------------------------------------------

    def pack(self, ints, mont: bool = True) -> np.ndarray:
        """Python ints (nested lists / flat) -> uint32 limb array [..., L].

        Bulk path: serialize to little-endian bytes and reinterpret as 16-bit
        limbs (vectorized), so packing million-element witness grids stays
        seconds-class.
        """
        arr = np.asarray(ints, dtype=object)
        flat = arr.reshape(-1)
        nbytes = self.L * 2
        mod = self.spec.modulus
        if mont:
            rmod = self.spec.R_mod
            buf = b"".join(
                ((int(v) % mod) * rmod % mod).to_bytes(nbytes, "little") for v in flat
            )
        else:
            buf = b"".join((int(v) % mod).to_bytes(nbytes, "little") for v in flat)
        out = np.frombuffer(buf, dtype="<u2").astype(np.uint32)
        return out.reshape(arr.shape + (self.L,))

    def unpack(self, limbs, mont: bool = True) -> np.ndarray:
        """uint32 limb array [..., L] -> numpy object array of Python ints."""
        arr = np.asarray(limbs)
        shape = arr.shape[:-1]
        buf = arr.reshape(-1, self.L).astype("<u2").tobytes()
        nbytes = self.L * 2
        n = arr.size // self.L
        out = np.empty(n, dtype=object)
        rinv = self.spec.Rinv
        mod = self.spec.modulus
        for i in range(n):
            x = int.from_bytes(buf[i * nbytes : (i + 1) * nbytes], "little")
            if mont:
                x = x * rinv % mod
            out[i] = x % mod
        return out.reshape(shape) if shape else out[0]

    # ------------------------------------------------------------------
    # Core arithmetic (traced; operate on jnp arrays [..., L])
    # ------------------------------------------------------------------

    def _normalize(self, cols):
        """Carry-propagate a list of L relaxed columns into 16-bit limbs.

        Returns (limbs list, carry_out).
        """
        out = []
        carry = None
        for j in range(len(cols)):
            v = cols[j] if carry is None else cols[j] + carry
            out.append(v & _MASK)
            carry = v >> LIMB_BITS
        return out, carry

    def _cond_sub_mod(self, limbs, extra_bit=None):
        """Given limbs (< 2p, 16-bit each, plus optional overflow bit) return
        canonical representative < p via one conditional subtraction."""
        L = self.L
        borrow = None
        diff = []
        for j in range(L):
            d = limbs[j] + np.uint32(1 << LIMB_BITS) - jnp.uint32(self.mod_limbs[j])
            if borrow is not None:
                d = d - borrow
            diff.append(d & _MASK)
            borrow = jnp.uint32(1) - (d >> LIMB_BITS)
        # underflow iff borrow==1 and no overflow bit
        if extra_bit is not None:
            underflow = (borrow == 1) & (extra_bit == 0)
        else:
            underflow = borrow == 1
        out = [jnp.where(underflow, limbs[j], diff[j]) for j in range(L)]
        return jnp.stack(out, axis=-1)

    def add(self, a, b):
        cols = [a[..., j] + b[..., j] for j in range(self.L)]
        limbs, carry = self._normalize(cols)
        return self._cond_sub_mod(limbs, extra_bit=carry)

    def sub(self, a, b):
        L = self.L
        borrow = None
        diff = []
        for j in range(L):
            d = a[..., j] + np.uint32(1 << LIMB_BITS) - b[..., j]
            if borrow is not None:
                d = d - borrow
            diff.append(d & _MASK)
            borrow = jnp.uint32(1) - (d >> LIMB_BITS)
        underflow = borrow == 1  # a < b: add modulus back
        out_cols = [
            diff[j] + jnp.where(underflow, jnp.uint32(self.mod_limbs[j]), jnp.uint32(0))
            for j in range(L)
        ]
        limbs, _ = self._normalize(out_cols)
        return jnp.stack(limbs, axis=-1)

    def neg(self, a):
        zero = jnp.zeros_like(a)
        return self.sub(zero, a)

    def mont_mul(self, a, b):
        """Montgomery product  a * b * R^{-1} mod p  (SOS with deferred carries).

        Accumulators are kept as a single relaxed-column array [..., 2L+1]
        updated with static limb-axis slices — O(L) traced ops instead of
        O(L^2), which keeps composite kernels (EC adds, NTT stages, scans)
        compilable.  Column values stay < 2^23 (see module docstring).
        """
        L = self.L
        a, b = jnp.broadcast_arrays(a, b)
        batch_shape = a.shape[:-1]
        t = jnp.zeros(batch_shape + (2 * L + 1,), dtype=U32)
        mod = jnp.asarray(self.mod_limbs)

        # product phase: t[i:i+L] += a_i * b (split hi/lo)
        for i in range(L):
            p = a[..., i : i + 1] * b
            t = t.at[..., i : i + L].add(p & _MASK)
            t = t.at[..., i + 1 : i + L + 1].add(p >> LIMB_BITS)

        # reduction phase: digit-serial m = t[i]*n0' mod 2^16; t += m*mod << 16i
        for i in range(L):
            m = (t[..., i : i + 1] * self.n0) & _MASK
            p = m * mod
            t = t.at[..., i : i + L].add(p & _MASK)
            t = t.at[..., i + 1 : i + L + 1].add(p >> LIMB_BITS)
            # retire column i (now ≡ 0 mod 2^16); push its carry up
            t = t.at[..., i + 1].add(t[..., i] >> LIMB_BITS)

        cols = [t[..., L + j] for j in range(L + 1)]
        limbs, carry = self._normalize(cols)
        # value < 2p < 2^(16L+1); top column folds into extra bit
        extra = limbs[self.L] + (carry if carry is not None else 0)
        return self._cond_sub_mod(limbs[: self.L], extra_bit=extra)

    def mont_sqr(self, a):
        return self.mont_mul(a, a)

    def to_mont(self, a):
        return self.mont_mul(a, jnp.asarray(self.r2_mont))

    def from_mont(self, a):
        one = jnp.zeros_like(a).at[..., 0].set(1)
        return self.mont_mul(a, one)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    def select(self, cond, a, b):
        """Elementwise select: cond has the batch shape (no limb axis)."""
        return jnp.where(cond[..., None], a, b)

    def pow_bits(self, a, exp_bits):
        """a ** e with e given as uint32 {0,1} bit array, MSB first (device).

        Uses lax.fori_loop so the trace stays small.
        """
        exp_bits = jnp.asarray(exp_bits, dtype=U32)
        nbits = exp_bits.shape[0]
        one = jnp.broadcast_to(jnp.asarray(self.one_mont), a.shape)

        def body(i, acc):
            acc = self.mont_sqr(acc)
            mul = self.mont_mul(acc, a)
            return jnp.where(exp_bits[i] == 1, mul, acc)

        return jax.lax.fori_loop(0, nbits, body, one)

    def inv(self, a):
        """Batched inversion via Fermat (a^(p-2)); maps 0 -> 0."""
        return self.pow_bits(a, self.inv_exp_bits)

    def full_normalize(self, a):
        """Reduce any relaxed limb array (values < 2^32) to canonical < p.

        Only used at boundaries; cost ~3 passes.
        """
        cols = [a[..., j] for j in range(self.L)]
        limbs, carry = self._normalize(cols)
        return self._cond_sub_mod(limbs, extra_bit=carry)


@functools.lru_cache(maxsize=None)
def fr_ops() -> LimbField:
    return LimbField(FR)


@functools.lru_cache(maxsize=None)
def fq_ops() -> LimbField:
    return LimbField(FQ)
