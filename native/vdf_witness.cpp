// Native witness generation for the VDF workloads.
//
// The reference generates benchmark witnesses with ff_ce's derived
// 4x u64 Montgomery arithmetic on the host (src/experiments/vdf.rs:143-150,
// src/experiments/cubic_vdf.rs:160-175). The TPU build's Python chain is
// exact but slow at 2^20 rows; this is the same 4-limb CIOS Montgomery
// multiply in C++, exposed via ctypes. Fields up to 256 bits (p odd).
//
// Build: g++ -O3 -shared -fPIC -o libhodor_vdf.so vdf_witness.cpp

#include <cstdint>
#include <cstring>

namespace {

using u64 = uint64_t;
using u128 = __uint128_t;

struct Fp {
  u64 p[4];
  u64 inv;  // -p^{-1} mod 2^64
};

// CIOS Montgomery multiply: out = a*b*R^{-1} mod p, R = 2^256.
inline void mont_mul(const Fp& f, const u64 a[4], const u64 b[4], u64 out[4]) {
  u64 t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    u128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 cur = (u128)a[i] * b[j] + t[j] + carry;
      t[j] = (u64)cur;
      carry = cur >> 64;
    }
    u128 cur = (u128)t[4] + carry;
    t[4] = (u64)cur;
    t[5] = (u64)(cur >> 64);

    u64 m = t[0] * f.inv;
    carry = ((u128)m * f.p[0] + t[0]) >> 64;
    for (int j = 1; j < 4; ++j) {
      u128 c2 = (u128)m * f.p[j] + t[j] + carry;
      t[j - 1] = (u64)c2;
      carry = c2 >> 64;
    }
    cur = (u128)t[4] + carry;
    t[3] = (u64)cur;
    t[4] = t[5] + (u64)(cur >> 64);
  }
  // conditional subtract p
  u64 borrow = 0, d[4];
  for (int j = 0; j < 4; ++j) {
    u128 cur = (u128)t[j] - f.p[j] - borrow;
    d[j] = (u64)cur;
    borrow = (cur >> 64) ? 1 : 0;
  }
  bool ge = (t[4] != 0) || !borrow;
  for (int j = 0; j < 4; ++j) out[j] = ge ? d[j] : t[j];
}

inline void add_mod(const Fp& f, const u64 a[4], const u64 b[4], u64 out[4]) {
  u64 carry = 0, s[4];
  for (int j = 0; j < 4; ++j) {
    u128 cur = (u128)a[j] + b[j] + carry;
    s[j] = (u64)cur;
    carry = (u64)(cur >> 64);
  }
  u64 borrow = 0, d[4];
  for (int j = 0; j < 4; ++j) {
    u128 cur = (u128)s[j] - f.p[j] - borrow;
    d[j] = (u64)cur;
    borrow = (cur >> 64) ? 1 : 0;
  }
  bool ge = carry || !borrow;
  for (int j = 0; j < 4; ++j) out[j] = ge ? d[j] : s[j];
}

inline void cp(u64 d[4], const u64 s[4]) { std::memcpy(d, s, 32); }

}  // namespace

extern "C" {

// Quadratic VDF chain (src/experiments/vdf.rs:12-131):
//   (v0, v1) -> (v0^2 + nr*v1^2, 2*v0*v1), num_ops times.
// All inputs canonical 4x u64 LE; r2 = R^2 mod p. Outputs canonical:
// out0/out1 are (num_ops+1)*4 u64.
void hodor_vdf_witness(const u64* p_limbs, u64 inv, const u64* r2,
                       const u64* nr_in, const u64* c0_in, const u64* c1_in,
                       long num_ops, u64* out0, u64* out1) {
  Fp f;
  std::memcpy(f.p, p_limbs, 32);
  f.inv = inv;
  const u64 one[4] = {1, 0, 0, 0};
  u64 nr[4], v0[4], v1[4];
  mont_mul(f, nr_in, r2, nr);
  mont_mul(f, c0_in, r2, v0);
  mont_mul(f, c1_in, r2, v1);
  mont_mul(f, v0, one, out0);
  mont_mul(f, v1, one, out1);
  for (long i = 1; i <= num_ops; ++i) {
    u64 a2[4], b2[4], ab[4], n0[4], n1[4];
    mont_mul(f, v0, v0, a2);
    mont_mul(f, v1, v1, b2);
    mont_mul(f, v0, v1, ab);
    mont_mul(f, b2, nr, b2);
    add_mod(f, a2, b2, n0);
    add_mod(f, ab, ab, n1);
    cp(v0, n0);
    cp(v1, n1);
    mont_mul(f, v0, one, out0 + 4 * i);
    mont_mul(f, v1, one, out1 + 4 * i);
  }
}

// Cubic VDF chain (src/experiments/cubic_vdf.rs:13-265): tracks
// (c0, c1) and the intermediate square (sq0, sq1); see
// hodor_tpu/models/cubic_vdf.py for the recurrence.
void hodor_cubic_vdf_witness(const u64* p_limbs, u64 inv, const u64* r2,
                             const u64* nr_in, const u64* c0_in, const u64* c1_in,
                             long num_ops, u64* out0, u64* out1, u64* outs0,
                             u64* outs1) {
  Fp f;
  std::memcpy(f.p, p_limbs, 32);
  f.inv = inv;
  const u64 one[4] = {1, 0, 0, 0};
  u64 nr[4], v0[4], v1[4], s0[4], s1[4];
  mont_mul(f, nr_in, r2, nr);
  mont_mul(f, c0_in, r2, v0);
  mont_mul(f, c1_in, r2, v1);

  auto square = [&](const u64 a[4], const u64 b[4], u64 o0[4], u64 o1[4]) {
    u64 a2[4], b2[4], ab[4];
    mont_mul(f, a, a, a2);
    mont_mul(f, b, b, b2);
    mont_mul(f, a, b, ab);
    mont_mul(f, b2, nr, b2);
    add_mod(f, a2, b2, o0);
    add_mod(f, ab, ab, o1);
  };
  auto fp2_mul = [&](const u64 a[4], const u64 b[4], const u64 c[4],
                     const u64 d[4], u64 o0[4], u64 o1[4]) {
    // (a, b)*(c, d) = (ac + nr*bd, ad + bc)
    u64 ac[4], bd[4], ad[4], bc[4];
    mont_mul(f, a, c, ac);
    mont_mul(f, b, d, bd);
    mont_mul(f, a, d, ad);
    mont_mul(f, b, c, bc);
    mont_mul(f, bd, nr, bd);
    add_mod(f, ac, bd, o0);
    add_mod(f, ad, bc, o1);
  };

  square(v0, v1, s0, s1);
  mont_mul(f, v0, one, out0);
  mont_mul(f, v1, one, out1);
  mont_mul(f, s0, one, outs0);
  mont_mul(f, s1, one, outs1);
  for (long i = 1; i <= num_ops; ++i) {
    u64 n0[4], n1[4];
    fp2_mul(s0, s1, v0, v1, n0, n1);
    cp(v0, n0);
    cp(v1, n1);
    square(v0, v1, s0, s1);
    mont_mul(f, v0, one, out0 + 4 * i);
    mont_mul(f, v1, one, out1 + 4 * i);
    mont_mul(f, s0, one, outs0 + 4 * i);
    mont_mul(f, s1, one, outs1 + 4 * i);
  }
}

}  // extern "C"
