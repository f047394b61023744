// Native CPU kernels for the Tokamak zk-SNARK TPU framework.
//
// This is the CPU half of the two-backend compute layer (the TPU half is
// Pallas, tokamak_zk_evm_tpu/backend/pallas_kernels.py).  It plays the role
// ICICLE's CPU backend plays for the reference implementation
// (packages/backend/libs — NTT / MSM / VecOps behind a device abstraction):
// every op is exposed as one XLA FFI custom call so JAX graphs stay small
// (one HLO op per field/curve operation) and compile instantly, while the
// heavy limb arithmetic runs as native 64-bit-word Montgomery code.
//
// Buffer conventions (must match backend/api.py):
//   * field elements are little-endian 16-bit limbs in uint32 lanes,
//     limb-major: an array of B elements is laid out [L, B] (limb plane
//     contiguous), L = 16 (Fr) or 24 (Fq);
//   * Montgomery form with R = 2^256 (Fr) / 2^384 (Fq) — identical to the
//     Python/Pallas representation, so buffers cross backends bit-exactly;
//   * G1 points: jacobian (X, Y, Z) with Z == 0 encoding infinity, or
//     affine (x, y, inf-mask).
//
// Binary broadcast ops take a `rep` attribute: b's element index for output
// element i is (i / rep) % Bb, which covers scalar broadcast (Bb == 1),
// cyclic tiling (rep == 1, e.g. twiddle rows), and block broadcast
// (rep == inner extent).

#include "xla/ffi/api/ffi.h"
#include "field_constants.h"

#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace ffi = xla::ffi;

typedef unsigned __int128 u128;

// ---------------------------------------------------------------------------
// Word-level Montgomery field arithmetic (64-bit words)
// ---------------------------------------------------------------------------

template <int NW>
struct Fp {
  uint64_t w[NW];

  static inline void load(const uint32_t* limbs, size_t b, size_t B, Fp& o) {
    // limb-major u32[4*NW, B] -> words
    for (int i = 0; i < NW; ++i) {
      uint64_t v = 0;
      for (int k = 0; k < 4; ++k)
        v |= (uint64_t)(uint16_t)limbs[(size_t)(4 * i + k) * B + b] << (16 * k);
      o.w[i] = v;
    }
  }
  static inline void store(uint32_t* limbs, size_t b, size_t B, const Fp& o) {
    for (int i = 0; i < NW; ++i)
      for (int k = 0; k < 4; ++k)
        limbs[(size_t)(4 * i + k) * B + b] = (uint32_t)((o.w[i] >> (16 * k)) & 0xFFFF);
  }
};

template <int NW>
static inline bool geq(const uint64_t* a, const uint64_t* b) {
  for (int i = NW - 1; i >= 0; --i) {
    if (a[i] > b[i]) return true;
    if (a[i] < b[i]) return false;
  }
  return true;  // equal
}

template <int NW>
static inline void sub_nocarry(uint64_t* a, const uint64_t* b) {
  u128 borrow = 0;
  for (int i = 0; i < NW; ++i) {
    u128 d = (u128)a[i] - b[i] - borrow;
    a[i] = (uint64_t)d;
    borrow = (d >> 64) & 1;
  }
}

template <int NW, const uint64_t* MOD>
static inline void addm(const Fp<NW>& a, const Fp<NW>& b, Fp<NW>& o) {
  u128 carry = 0;
  uint64_t t[NW];
  for (int i = 0; i < NW; ++i) {
    u128 s = (u128)a.w[i] + b.w[i] + carry;
    t[i] = (uint64_t)s;
    carry = s >> 64;
  }
  if (carry || geq<NW>(t, MOD)) sub_nocarry<NW>(t, MOD);
  std::memcpy(o.w, t, sizeof(t));
}

template <int NW, const uint64_t* MOD>
static inline void subm(const Fp<NW>& a, const Fp<NW>& b, Fp<NW>& o) {
  u128 borrow = 0;
  uint64_t t[NW];
  for (int i = 0; i < NW; ++i) {
    u128 d = (u128)a.w[i] - b.w[i] - borrow;
    t[i] = (uint64_t)d;
    borrow = (d >> 64) & 1;
  }
  if (borrow) {
    u128 carry = 0;
    for (int i = 0; i < NW; ++i) {
      u128 s = (u128)t[i] + MOD[i] + carry;
      t[i] = (uint64_t)s;
      carry = s >> 64;
    }
  }
  std::memcpy(o.w, t, sizeof(t));
}

template <int NW, const uint64_t* MOD>
static inline void negm(const Fp<NW>& a, Fp<NW>& o) {
  bool zero = true;
  for (int i = 0; i < NW; ++i) zero &= (a.w[i] == 0);
  if (zero) {
    std::memset(o.w, 0, sizeof(o.w));
    return;
  }
  u128 borrow = 0;
  for (int i = 0; i < NW; ++i) {
    u128 d = (u128)MOD[i] - a.w[i] - borrow;
    o.w[i] = (uint64_t)d;
    borrow = (d >> 64) & 1;
  }
}

// CIOS Montgomery multiplication.
template <int NW, const uint64_t* MOD, const uint64_t* N0P>
static inline void mulm(const Fp<NW>& a, const Fp<NW>& b, Fp<NW>& o) {
  uint64_t t[NW + 2] = {0};
  for (int i = 0; i < NW; ++i) {
    u128 carry = 0;
    for (int j = 0; j < NW; ++j) {
      u128 s = (u128)t[j] + (u128)a.w[i] * b.w[j] + carry;
      t[j] = (uint64_t)s;
      carry = s >> 64;
    }
    u128 s = (u128)t[NW] + carry;
    t[NW] = (uint64_t)s;
    t[NW + 1] = (uint64_t)(s >> 64);

    uint64_t m = t[0] * N0P[0];
    carry = ((u128)t[0] + (u128)m * MOD[0]) >> 64;
    for (int j = 1; j < NW; ++j) {
      u128 s2 = (u128)t[j] + (u128)m * MOD[j] + carry;
      t[j - 1] = (uint64_t)s2;
      carry = s2 >> 64;
    }
    u128 s3 = (u128)t[NW] + carry;
    t[NW - 1] = (uint64_t)s3;
    t[NW] = t[NW + 1] + (uint64_t)(s3 >> 64);
  }
  if (t[NW] || geq<NW>(t, MOD)) sub_nocarry<NW>(t, MOD);
  std::memcpy(o.w, t, NW * sizeof(uint64_t));
}

template <int NW, const uint64_t* MOD, const uint64_t* N0P, const uint64_t* RCONST,
          const uint64_t* INVEXP>
static inline void invm(const Fp<NW>& a, Fp<NW>& o) {
  // Fermat: a^(p-2); maps 0 -> 0.
  Fp<NW> base = a, acc;
  std::memcpy(acc.w, RCONST, NW * sizeof(uint64_t));  // one in Montgomery form
  bool zero = true;
  for (int i = 0; i < NW; ++i) zero &= (a.w[i] == 0);
  if (zero) {
    std::memset(o.w, 0, sizeof(o.w));
    return;
  }
  for (int i = 0; i < NW; ++i) {
    uint64_t e = INVEXP[i];
    for (int bit = 0; bit < 64; ++bit) {
      if ((e >> bit) & 1) mulm<NW, MOD, N0P>(acc, base, acc);
      mulm<NW, MOD, N0P>(base, base, base);
    }
  }
  o = acc;
}

// Field instantiation helpers
struct FrField {
  static const int NW = 4;
  static const int L = 16;
  static inline void add(const Fp<4>& a, const Fp<4>& b, Fp<4>& o) { addm<4, FR_MOD>(a, b, o); }
  static inline void sub(const Fp<4>& a, const Fp<4>& b, Fp<4>& o) { subm<4, FR_MOD>(a, b, o); }
  static inline void neg(const Fp<4>& a, Fp<4>& o) { negm<4, FR_MOD>(a, o); }
  static inline void mul(const Fp<4>& a, const Fp<4>& b, Fp<4>& o) {
    static const uint64_t N0P[1] = {FR_N0};
    mulm<4, FR_MOD, N0P>(a, b, o);
  }
  static inline void inv(const Fp<4>& a, Fp<4>& o) {
    static const uint64_t N0P[1] = {FR_N0};
    invm<4, FR_MOD, N0P, FR_R, FR_INV_EXP>(a, o);
  }
  static inline void one(Fp<4>& o) { std::memcpy(o.w, FR_R, sizeof(o.w)); }
};

struct FqField {
  static const int NW = 6;
  static const int L = 24;
  static inline void add(const Fp<6>& a, const Fp<6>& b, Fp<6>& o) { addm<6, FQ_MOD>(a, b, o); }
  static inline void sub(const Fp<6>& a, const Fp<6>& b, Fp<6>& o) { subm<6, FQ_MOD>(a, b, o); }
  static inline void neg(const Fp<6>& a, Fp<6>& o) { negm<6, FQ_MOD>(a, o); }
  static inline void mul(const Fp<6>& a, const Fp<6>& b, Fp<6>& o) {
    static const uint64_t N0P[1] = {FQ_N0};
    mulm<6, FQ_MOD, N0P>(a, b, o);
  }
  static inline void inv(const Fp<6>& a, Fp<6>& o) {
    static const uint64_t N0P[1] = {FQ_N0};
    invm<6, FQ_MOD, N0P, FQ_R, FQ_INV_EXP>(a, o);
  }
  static inline void one(Fp<6>& o) { std::memcpy(o.w, FQ_R, sizeof(o.w)); }
};

template <int NW>
static inline bool is_zero(const Fp<NW>& a) {
  for (int i = 0; i < NW; ++i)
    if (a.w[i]) return false;
  return true;
}

// ---------------------------------------------------------------------------
// Elementwise batched field ops
// ---------------------------------------------------------------------------

enum BinOp { OP_ADD, OP_SUB, OP_MUL };

template <typename F, BinOp OP>
static ffi::Error binop_impl(ffi::Buffer<ffi::U32> a, ffi::Buffer<ffi::U32> b,
                             int64_t rep, ffi::ResultBuffer<ffi::U32> out) {
  const size_t Ba = a.element_count() / F::L;
  const size_t Bb = b.element_count() / F::L;
  const uint32_t* pa = a.typed_data();
  const uint32_t* pb = b.typed_data();
  uint32_t* po = out->typed_data();
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < (int64_t)Ba; ++i) {
    Fp<F::NW> x, y, z;
    Fp<F::NW>::load(pa, i, Ba, x);
    size_t ib = Bb == Ba ? (size_t)i : (size_t)((i / rep) % (int64_t)Bb);
    Fp<F::NW>::load(pb, ib, Bb, y);
    if (OP == OP_ADD) F::add(x, y, z);
    else if (OP == OP_SUB) F::sub(x, y, z);
    else F::mul(x, y, z);
    Fp<F::NW>::store(po, i, Ba, z);
  }
  return ffi::Error::Success();
}

enum UnOp { OP_NEG, OP_INV };

template <typename F, UnOp OP>
static ffi::Error unop_impl(ffi::Buffer<ffi::U32> a, ffi::ResultBuffer<ffi::U32> out) {
  const size_t Ba = a.element_count() / F::L;
  const uint32_t* pa = a.typed_data();
  uint32_t* po = out->typed_data();
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < (int64_t)Ba; ++i) {
    Fp<F::NW> x, z;
    Fp<F::NW>::load(pa, i, Ba, x);
    if (OP == OP_NEG) F::neg(x, z);
    else F::inv(x, z);
    Fp<F::NW>::store(po, i, Ba, z);
  }
  return ffi::Error::Success();
}

// ---------------------------------------------------------------------------
// Scans (sequential in C++: one pass, no log-depth JAX loop needed)
// ---------------------------------------------------------------------------

template <bool SUFFIX>
static ffi::Error scan_mul_impl(ffi::Buffer<ffi::U32> a, ffi::ResultBuffer<ffi::U32> out) {
  const size_t B = a.element_count() / 16;
  const uint32_t* pa = a.typed_data();
  uint32_t* po = out->typed_data();
  Fp<4> acc;
  FrField::one(acc);
  for (size_t k = 0; k < B; ++k) {
    size_t i = SUFFIX ? B - 1 - k : k;
    Fp<4> x;
    Fp<4>::load(pa, i, B, x);
    FrField::mul(acc, x, acc);
    Fp<4>::store(po, i, B, acc);
  }
  return ffi::Error::Success();
}

static ffi::Error batch_inv_impl(ffi::Buffer<ffi::U32> a, ffi::ResultBuffer<ffi::U32> out) {
  // Montgomery batch inversion; zero entries map to zero.
  const size_t B = a.element_count() / 16;
  const uint32_t* pa = a.typed_data();
  uint32_t* po = out->typed_data();
  std::vector<Fp<4>> pre(B);
  Fp<4> acc;
  FrField::one(acc);
  for (size_t i = 0; i < B; ++i) {
    pre[i] = acc;
    Fp<4> x;
    Fp<4>::load(pa, i, B, x);
    if (!is_zero<4>(x)) FrField::mul(acc, x, acc);
  }
  Fp<4> inv;
  FrField::inv(acc, inv);
  for (size_t k = B; k-- > 0;) {
    Fp<4> x, o;
    Fp<4>::load(pa, k, B, x);
    if (is_zero<4>(x)) {
      std::memset(o.w, 0, sizeof(o.w));
    } else {
      FrField::mul(pre[k], inv, o);
      FrField::mul(inv, x, inv);
    }
    Fp<4>::store(po, k, B, o);
  }
  return ffi::Error::Success();
}

// ---------------------------------------------------------------------------
// NTT: radix-2 DIT over the last axis, batched over the middle axis.
// data [16, BATCH, n]; pows [16, n] Montgomery twiddle powers (omega or
// omega^-1); scale [16] Montgomery factor applied at the end (n^-1 for the
// inverse transform, one for forward).
// ---------------------------------------------------------------------------

static ffi::Error ntt_impl(ffi::Buffer<ffi::U32> data, ffi::Buffer<ffi::U32> pows,
                           ffi::Buffer<ffi::U32> scale,
                           ffi::ResultBuffer<ffi::U32> out) {
  auto dims = data.dimensions();
  const size_t n = dims[dims.size() - 1];
  const size_t total = data.element_count() / 16;
  const size_t batch = total / n;
  const uint32_t* pd = data.typed_data();
  const uint32_t* pp = pows.typed_data();
  const uint32_t* ps = scale.typed_data();
  uint32_t* po = out->typed_data();

  int logn = 0;
  while ((size_t)(1u << logn) < n) ++logn;

  std::vector<Fp<4>> tw(n);
  for (size_t j = 0; j < n; ++j) Fp<4>::load(pp, j, n, tw[j]);
  Fp<4> sc;
  Fp<4>::load(ps, 0, 1, sc);
  bool apply_scale = std::memcmp(sc.w, FR_R, sizeof(sc.w)) != 0;

#pragma omp parallel for schedule(static)
  for (int64_t rb = 0; rb < (int64_t)batch; ++rb) {
    std::vector<Fp<4>> v(n);
    // load with bit-reversal
    for (size_t j = 0; j < n; ++j) {
      size_t r = 0;
      for (int t = 0; t < logn; ++t) r |= ((j >> t) & 1) << (logn - 1 - t);
      Fp<4>::load(pd, (size_t)rb * n + j, total, v[r]);
    }
    for (size_t m = 1; m < n; m <<= 1) {
      size_t step = n / (2 * m);
      for (size_t blk = 0; blk < n; blk += 2 * m) {
        for (size_t j = 0; j < m; ++j) {
          Fp<4> lo = v[blk + j];
          Fp<4> hi;
          FrField::mul(v[blk + j + m], tw[j * step], hi);
          FrField::add(lo, hi, v[blk + j]);
          FrField::sub(lo, hi, v[blk + j + m]);
        }
      }
    }
    for (size_t j = 0; j < n; ++j) {
      if (apply_scale) FrField::mul(v[j], sc, v[j]);
      Fp<4>::store(po, (size_t)rb * n + j, total, v[j]);
    }
  }
  return ffi::Error::Success();
}

// ---------------------------------------------------------------------------
// G1 jacobian arithmetic
// ---------------------------------------------------------------------------

struct G1 {
  Fp<6> X, Y, Z;
  inline bool inf() const { return is_zero<6>(Z); }
  static inline void set_inf(G1& o) {
    FqField::one(o.X);
    FqField::one(o.Y);
    std::memset(o.Z.w, 0, sizeof(o.Z.w));
  }
};

static inline void g1_dbl(const G1& p, G1& o) {
  // dbl-2009-l; Z3 = 2*Y1*Z1 handles Y=0/Z=0 -> infinity.
  Fp<6> A, B, C, D, E, F, t;
  FqField::mul(p.X, p.X, A);
  FqField::mul(p.Y, p.Y, B);
  FqField::mul(B, B, C);
  FqField::add(p.X, B, t);
  FqField::mul(t, t, t);
  FqField::sub(t, A, t);
  FqField::sub(t, C, D);
  FqField::add(D, D, D);
  FqField::add(A, A, E);
  FqField::add(E, A, E);
  FqField::mul(E, E, F);
  G1 r;
  Fp<6> D2, C2, C8, YZ;
  FqField::add(D, D, D2);
  FqField::sub(F, D2, r.X);
  FqField::add(C, C, C2);
  FqField::add(C2, C2, C8);
  FqField::add(C8, C8, C8);
  FqField::sub(D, r.X, t);
  FqField::mul(E, t, t);
  FqField::sub(t, C8, r.Y);
  FqField::mul(p.Y, p.Z, YZ);
  FqField::add(YZ, YZ, r.Z);
  o = r;
}

static inline void g1_add(const G1& p, const G1& q, G1& o) {
  if (p.inf()) { o = q; return; }
  if (q.inf()) { o = p; return; }
  Fp<6> Z1Z1, Z2Z2, U1, U2, S1, S2, H, R, t;
  FqField::mul(p.Z, p.Z, Z1Z1);
  FqField::mul(q.Z, q.Z, Z2Z2);
  FqField::mul(p.X, Z2Z2, U1);
  FqField::mul(q.X, Z1Z1, U2);
  FqField::mul(q.Z, Z2Z2, t);
  FqField::mul(p.Y, t, S1);
  FqField::mul(p.Z, Z1Z1, t);
  FqField::mul(q.Y, t, S2);
  FqField::sub(U2, U1, H);
  FqField::sub(S2, S1, R);
  if (is_zero<6>(H)) {
    if (is_zero<6>(R)) { g1_dbl(p, o); return; }
    G1::set_inf(o);
    return;
  }
  Fp<6> HH, HHH, V, RR;
  FqField::mul(H, H, HH);
  FqField::mul(H, HH, HHH);
  FqField::mul(U1, HH, V);
  FqField::mul(R, R, RR);
  G1 r;
  Fp<6> V2;
  FqField::add(V, V, V2);
  FqField::sub(RR, HHH, t);
  FqField::sub(t, V2, r.X);
  FqField::sub(V, r.X, t);
  FqField::mul(R, t, t);
  Fp<6> S1HHH;
  FqField::mul(S1, HHH, S1HHH);
  FqField::sub(t, S1HHH, r.Y);
  FqField::mul(p.Z, q.Z, t);
  FqField::mul(t, H, r.Z);
  o = r;
}

// mixed add: q affine (qx, qy), not infinity
static inline void g1_add_affine(const G1& p, const Fp<6>& qx, const Fp<6>& qy, G1& o) {
  if (p.inf()) {
    o.X = qx;
    o.Y = qy;
    FqField::one(o.Z);
    return;
  }
  Fp<6> Z1Z1, U2, S2, H, R, t;
  FqField::mul(p.Z, p.Z, Z1Z1);
  FqField::mul(qx, Z1Z1, U2);
  FqField::mul(p.Z, Z1Z1, t);
  FqField::mul(qy, t, S2);
  FqField::sub(U2, p.X, H);
  FqField::sub(S2, p.Y, R);
  if (is_zero<6>(H)) {
    if (is_zero<6>(R)) { g1_dbl(p, o); return; }
    G1::set_inf(o);
    return;
  }
  Fp<6> HH, HHH, V, RR;
  FqField::mul(H, H, HH);
  FqField::mul(H, HH, HHH);
  FqField::mul(p.X, HH, V);
  FqField::mul(R, R, RR);
  G1 r;
  Fp<6> V2;
  FqField::add(V, V, V2);
  FqField::sub(RR, HHH, t);
  FqField::sub(t, V2, r.X);
  FqField::sub(V, r.X, t);
  FqField::mul(R, t, t);
  Fp<6> YH3;
  FqField::mul(p.Y, HHH, YH3);
  FqField::sub(t, YH3, r.Y);
  FqField::mul(p.Z, H, r.Z);
  o = r;
}

static inline void g1_load(const uint32_t* X, const uint32_t* Y, const uint32_t* Z,
                           size_t b, size_t B, G1& o) {
  Fp<6>::load(X, b, B, o.X);
  Fp<6>::load(Y, b, B, o.Y);
  Fp<6>::load(Z, b, B, o.Z);
}

static inline void g1_store(uint32_t* X, uint32_t* Y, uint32_t* Z, size_t b,
                            size_t B, const G1& p) {
  Fp<6>::store(X, b, B, p.X);
  Fp<6>::store(Y, b, B, p.Y);
  Fp<6>::store(Z, b, B, p.Z);
}

static ffi::Error g1_add_impl(ffi::Buffer<ffi::U32> ax, ffi::Buffer<ffi::U32> ay,
                              ffi::Buffer<ffi::U32> az, ffi::Buffer<ffi::U32> bx,
                              ffi::Buffer<ffi::U32> by, ffi::Buffer<ffi::U32> bz,
                              int64_t rep, ffi::ResultBuffer<ffi::U32> ox,
                              ffi::ResultBuffer<ffi::U32> oy,
                              ffi::ResultBuffer<ffi::U32> oz) {
  const size_t Ba = ax.element_count() / 24;
  const size_t Bb = bx.element_count() / 24;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < (int64_t)Ba; ++i) {
    G1 p, q, r;
    g1_load(ax.typed_data(), ay.typed_data(), az.typed_data(), i, Ba, p);
    size_t ib = Bb == Ba ? (size_t)i : (size_t)((i / rep) % (int64_t)Bb);
    g1_load(bx.typed_data(), by.typed_data(), bz.typed_data(), ib, Bb, q);
    g1_add(p, q, r);
    g1_store(ox->typed_data(), oy->typed_data(), oz->typed_data(), i, Ba, r);
  }
  return ffi::Error::Success();
}

static ffi::Error g1_dbl_impl(ffi::Buffer<ffi::U32> ax, ffi::Buffer<ffi::U32> ay,
                              ffi::Buffer<ffi::U32> az,
                              ffi::ResultBuffer<ffi::U32> ox,
                              ffi::ResultBuffer<ffi::U32> oy,
                              ffi::ResultBuffer<ffi::U32> oz) {
  const size_t Ba = ax.element_count() / 24;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < (int64_t)Ba; ++i) {
    G1 p, r;
    g1_load(ax.typed_data(), ay.typed_data(), az.typed_data(), i, Ba, p);
    if (p.inf()) G1::set_inf(r);
    else g1_dbl(p, r);
    g1_store(ox->typed_data(), oy->typed_data(), oz->typed_data(), i, Ba, r);
  }
  return ffi::Error::Success();
}

static ffi::Error g1_to_affine_impl(ffi::Buffer<ffi::U32> ax, ffi::Buffer<ffi::U32> ay,
                                    ffi::Buffer<ffi::U32> az,
                                    ffi::ResultBuffer<ffi::U32> ox,
                                    ffi::ResultBuffer<ffi::U32> oy,
                                    ffi::ResultBuffer<ffi::U32> oinf) {
  // Batched jacobian -> affine via Montgomery batch inversion of Z.
  const size_t B = ax.element_count() / 24;
  std::vector<Fp<6>> pre(B);
  std::vector<G1> pts(B);
  Fp<6> acc;
  FqField::one(acc);
  for (size_t i = 0; i < B; ++i) {
    g1_load(ax.typed_data(), ay.typed_data(), az.typed_data(), i, B, pts[i]);
    pre[i] = acc;
    if (!pts[i].inf()) FqField::mul(acc, pts[i].Z, acc);
  }
  Fp<6> inv;
  FqField::inv(acc, inv);
  for (size_t k = B; k-- > 0;) {
    Fp<6> zi, zi2, x, y;
    if (pts[k].inf()) {
      std::memset(x.w, 0, sizeof(x.w));
      std::memset(y.w, 0, sizeof(y.w));
      oinf->typed_data()[k] = 1;
    } else {
      FqField::mul(pre[k], inv, zi);
      FqField::mul(inv, pts[k].Z, inv);
      FqField::mul(zi, zi, zi2);
      FqField::mul(pts[k].X, zi2, x);
      FqField::mul(zi2, zi, zi2);
      FqField::mul(pts[k].Y, zi2, y);
      oinf->typed_data()[k] = 0;
    }
    Fp<6>::store(ox->typed_data(), k, B, x);
    Fp<6>::store(oy->typed_data(), k, B, y);
  }
  return ffi::Error::Success();
}

// ---------------------------------------------------------------------------
// Pippenger MSM.  scalars [16, B] canonical 16-bit limbs; points affine
// Montgomery [24, B] + inf mask [B].  Output: one jacobian point as [3, 24]
// (X, Y, Z rows, 16-bit limbs).
// ---------------------------------------------------------------------------

static ffi::Error g1_msm_impl(ffi::Buffer<ffi::U32> scal, ffi::Buffer<ffi::U32> px,
                              ffi::Buffer<ffi::U32> py, ffi::Buffer<ffi::U32> pinf,
                              ffi::ResultBuffer<ffi::U32> out) {
  const size_t B = pinf.element_count();
  // window size ~ log2(B) - 3 in [2, 16]
  int w = 2;
  while ((size_t)(1u << (w + 4)) <= B && w < 16) ++w;
  const int nwin = (256 + w - 1) / w;
  const size_t nbuckets = (size_t)1 << w;

  std::vector<Fp<4>> sc(B);
  std::vector<Fp<6>> qx(B), qy(B);
  std::vector<uint8_t> inf(B);
  for (size_t i = 0; i < B; ++i) {
    Fp<4>::load(scal.typed_data(), i, B, sc[i]);
    Fp<6>::load(px.typed_data(), i, B, qx[i]);
    Fp<6>::load(py.typed_data(), i, B, qy[i]);
    inf[i] = pinf.typed_data()[i] != 0;
  }

  std::vector<G1> windows(nwin);
#pragma omp parallel for schedule(dynamic)
  for (int wi = 0; wi < nwin; ++wi) {
    std::vector<G1> buckets(nbuckets);
    for (auto& bkt : buckets) G1::set_inf(bkt);
    for (size_t i = 0; i < B; ++i) {
      if (inf[i]) continue;
      int bit0 = wi * w;
      int word = bit0 >> 6, sh = bit0 & 63;
      uint64_t d = sc[i].w[word] >> sh;
      if (sh + w > 64 && word + 1 < 4) d |= sc[i].w[word + 1] << (64 - sh);
      d &= (nbuckets - 1);
      if (!d) continue;
      g1_add_affine(buckets[d], qx[i], qy[i], buckets[d]);
    }
    // triangle sum: sum_b b * B_b
    G1 run, total;
    G1::set_inf(run);
    G1::set_inf(total);
    for (size_t b = nbuckets - 1; b >= 1; --b) {
      g1_add(run, buckets[b], run);
      g1_add(total, run, total);
    }
    windows[wi] = total;
  }

  // Horner combine: acc = sum_wi 2^(w*wi) * W_wi
  G1 acc;
  G1::set_inf(acc);
  for (int wi = nwin - 1; wi >= 0; --wi) {
    for (int t = 0; t < w; ++t) g1_dbl(acc, acc);
    g1_add(acc, windows[wi], acc);
  }
  uint32_t* po = out->typed_data();
  Fp<6>::store(po + 0 * 24, 0, 1, acc.X);
  Fp<6>::store(po + 1 * 24, 0, 1, acc.Y);
  Fp<6>::store(po + 2 * 24, 0, 1, acc.Z);
  return ffi::Error::Success();
}

// Batched fixed-base scalar-mul: out[i] = k[i] * G for one shared affine G.
// Used by trusted setup CRS families.  scalars canonical [16, B]; gen [24, 2]
// (x then y columns); out jacobian [24, B] x 3.
static ffi::Error g1_fixed_base_impl(ffi::Buffer<ffi::U32> scal,
                                     ffi::Buffer<ffi::U32> gen,
                                     ffi::ResultBuffer<ffi::U32> ox,
                                     ffi::ResultBuffer<ffi::U32> oy,
                                     ffi::ResultBuffer<ffi::U32> oz) {
  const size_t B = scal.element_count() / 16;
  Fp<6> gx, gy;
  Fp<6>::load(gen.typed_data(), 0, 2, gx);
  Fp<6>::load(gen.typed_data(), 1, 2, gy);
  // window table: T[wi][d] = d * 2^(8*wi) * G, wi < 32, d < 256
  const int W = 8, NWIN = 32, TBL = 256;
  std::vector<G1> table((size_t)NWIN * TBL);
  {
    G1 base;
    base.X = gx;
    base.Y = gy;
    FqField::one(base.Z);
    for (int wi = 0; wi < NWIN; ++wi) {
      G1 acc;
      G1::set_inf(acc);
      G1::set_inf(table[(size_t)wi * TBL]);
      for (int d = 1; d < TBL; ++d) {
        g1_add(acc, base, acc);
        table[(size_t)wi * TBL + d] = acc;
      }
      for (int t = 0; t < W; ++t) g1_dbl(base, base);
    }
  }
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < (int64_t)B; ++i) {
    Fp<4> s;
    Fp<4>::load(scal.typed_data(), i, B, s);
    G1 acc;
    G1::set_inf(acc);
    for (int wi = 0; wi < NWIN; ++wi) {
      int word = (wi * 8) >> 6, sh = (wi * 8) & 63;
      uint64_t d = (s.w[word] >> sh) & 0xFF;
      if (d) g1_add(acc, table[(size_t)wi * TBL + d], acc);
    }
    g1_store(ox->typed_data(), oy->typed_data(), oz->typed_data(), i, B, acc);
  }
  return ffi::Error::Success();
}

// ---------------------------------------------------------------------------
// FFI handler symbol definitions
// ---------------------------------------------------------------------------

#define BIN_HANDLER(NAME, FIELD, OP)                                     \
  static ffi::Error NAME##_fn(ffi::Buffer<ffi::U32> a,                   \
                              ffi::Buffer<ffi::U32> b, int64_t rep,      \
                              ffi::ResultBuffer<ffi::U32> out) {         \
    return binop_impl<FIELD, OP>(a, b, rep, out);                        \
  }                                                                      \
  XLA_FFI_DEFINE_HANDLER_SYMBOL(NAME, NAME##_fn,                         \
                                ffi::Ffi::Bind()                         \
                                    .Arg<ffi::Buffer<ffi::U32>>()        \
                                    .Arg<ffi::Buffer<ffi::U32>>()        \
                                    .Attr<int64_t>("rep")                \
                                    .Ret<ffi::Buffer<ffi::U32>>());

#define UN_HANDLER(NAME, FIELD, OP)                                      \
  static ffi::Error NAME##_fn(ffi::Buffer<ffi::U32> a,                   \
                              ffi::ResultBuffer<ffi::U32> out) {         \
    return unop_impl<FIELD, OP>(a, out);                                 \
  }                                                                      \
  XLA_FFI_DEFINE_HANDLER_SYMBOL(NAME, NAME##_fn,                         \
                                ffi::Ffi::Bind()                         \
                                    .Arg<ffi::Buffer<ffi::U32>>()        \
                                    .Ret<ffi::Buffer<ffi::U32>>());

BIN_HANDLER(FrAdd, FrField, OP_ADD)
BIN_HANDLER(FrSub, FrField, OP_SUB)
BIN_HANDLER(FrMul, FrField, OP_MUL)
BIN_HANDLER(FqAdd, FqField, OP_ADD)
BIN_HANDLER(FqSub, FqField, OP_SUB)
BIN_HANDLER(FqMul, FqField, OP_MUL)
UN_HANDLER(FrNeg, FrField, OP_NEG)
UN_HANDLER(FrInv, FrField, OP_INV)
UN_HANDLER(FqNeg, FqField, OP_NEG)
UN_HANDLER(FqInv, FqField, OP_INV)

static ffi::Error FrPrefixProd_fn(ffi::Buffer<ffi::U32> a,
                                  ffi::ResultBuffer<ffi::U32> out) {
  return scan_mul_impl<false>(a, out);
}
XLA_FFI_DEFINE_HANDLER_SYMBOL(FrPrefixProd, FrPrefixProd_fn,
                              ffi::Ffi::Bind()
                                  .Arg<ffi::Buffer<ffi::U32>>()
                                  .Ret<ffi::Buffer<ffi::U32>>());

static ffi::Error FrSuffixProd_fn(ffi::Buffer<ffi::U32> a,
                                  ffi::ResultBuffer<ffi::U32> out) {
  return scan_mul_impl<true>(a, out);
}
XLA_FFI_DEFINE_HANDLER_SYMBOL(FrSuffixProd, FrSuffixProd_fn,
                              ffi::Ffi::Bind()
                                  .Arg<ffi::Buffer<ffi::U32>>()
                                  .Ret<ffi::Buffer<ffi::U32>>());

XLA_FFI_DEFINE_HANDLER_SYMBOL(FrBatchInv, batch_inv_impl,
                              ffi::Ffi::Bind()
                                  .Arg<ffi::Buffer<ffi::U32>>()
                                  .Ret<ffi::Buffer<ffi::U32>>());

XLA_FFI_DEFINE_HANDLER_SYMBOL(FrNtt, ntt_impl,
                              ffi::Ffi::Bind()
                                  .Arg<ffi::Buffer<ffi::U32>>()
                                  .Arg<ffi::Buffer<ffi::U32>>()
                                  .Arg<ffi::Buffer<ffi::U32>>()
                                  .Ret<ffi::Buffer<ffi::U32>>());

XLA_FFI_DEFINE_HANDLER_SYMBOL(G1Add, g1_add_impl,
                              ffi::Ffi::Bind()
                                  .Arg<ffi::Buffer<ffi::U32>>()
                                  .Arg<ffi::Buffer<ffi::U32>>()
                                  .Arg<ffi::Buffer<ffi::U32>>()
                                  .Arg<ffi::Buffer<ffi::U32>>()
                                  .Arg<ffi::Buffer<ffi::U32>>()
                                  .Arg<ffi::Buffer<ffi::U32>>()
                                  .Attr<int64_t>("rep")
                                  .Ret<ffi::Buffer<ffi::U32>>()
                                  .Ret<ffi::Buffer<ffi::U32>>()
                                  .Ret<ffi::Buffer<ffi::U32>>());

XLA_FFI_DEFINE_HANDLER_SYMBOL(G1Dbl, g1_dbl_impl,
                              ffi::Ffi::Bind()
                                  .Arg<ffi::Buffer<ffi::U32>>()
                                  .Arg<ffi::Buffer<ffi::U32>>()
                                  .Arg<ffi::Buffer<ffi::U32>>()
                                  .Ret<ffi::Buffer<ffi::U32>>()
                                  .Ret<ffi::Buffer<ffi::U32>>()
                                  .Ret<ffi::Buffer<ffi::U32>>());

XLA_FFI_DEFINE_HANDLER_SYMBOL(G1ToAffine, g1_to_affine_impl,
                              ffi::Ffi::Bind()
                                  .Arg<ffi::Buffer<ffi::U32>>()
                                  .Arg<ffi::Buffer<ffi::U32>>()
                                  .Arg<ffi::Buffer<ffi::U32>>()
                                  .Ret<ffi::Buffer<ffi::U32>>()
                                  .Ret<ffi::Buffer<ffi::U32>>()
                                  .Ret<ffi::Buffer<ffi::U32>>());

XLA_FFI_DEFINE_HANDLER_SYMBOL(G1Msm, g1_msm_impl,
                              ffi::Ffi::Bind()
                                  .Arg<ffi::Buffer<ffi::U32>>()
                                  .Arg<ffi::Buffer<ffi::U32>>()
                                  .Arg<ffi::Buffer<ffi::U32>>()
                                  .Arg<ffi::Buffer<ffi::U32>>()
                                  .Ret<ffi::Buffer<ffi::U32>>());

XLA_FFI_DEFINE_HANDLER_SYMBOL(G1FixedBase, g1_fixed_base_impl,
                              ffi::Ffi::Bind()
                                  .Arg<ffi::Buffer<ffi::U32>>()
                                  .Arg<ffi::Buffer<ffi::U32>>()
                                  .Ret<ffi::Buffer<ffi::U32>>()
                                  .Ret<ffi::Buffer<ffi::U32>>()
                                  .Ret<ffi::Buffer<ffi::U32>>());
