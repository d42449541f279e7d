// BN254 optimal ate pairing + Gt (Fq12) arithmetic, native runtime twin of
// mira_tpu/curves/pairing.py and the host Tuple12 (curves/host.py).
//
// The host python pairing costs ~1s (its final exponentiation is a plain
// (p^12-1)/r square-and-multiply over python-int Fq12); the Gt cross terms
// of the real-proof SnarkStar fold compute ~9 pairings + several 254-bit Gt
// exponentiations per step.  This module reproduces the exact host
// semantics (same tower layout, same schoolbook 6x6 xi-reduction, same
// LSB-first scalar_mul) over 4x64 Montgomery Fq.
//
// Layout: an Fq12/Gt element is 12 Fq values [c0 parts of w^0..w^5, then c1
// parts], Fq[u,w]/(u^2+1, w^6-(9+u)) — reference fp12.rs:23-34.  All Fq
// values cross the ABI as 4 little-endian u64 words, NON-Montgomery.
//
// Frobenius gammas and the final-exponentiation exponent are passed in from
// python (host computes them once) so this file holds no bigint machinery
// beyond 4x64 field ops.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 pairing.cpp -o libmirapairing.so

#include <cstdint>
#include <cstring>

using u64 = uint64_t;
using u128 = __uint128_t;
using i64 = int64_t;

namespace {

// BN254 Fq modulus and Montgomery constants (R = 2^256)
constexpr u64 P[4] = {0x3c208c16d87cfd47ull, 0x97816a916871ca8dull,
                      0xb85045b68181585dull, 0x30644e72e131a029ull};
constexpr u64 N0INV = 0x87d20782e4866389ull;  // -p^-1 mod 2^64
constexpr u64 R2[4] = {0xf32cfc5b538afa89ull, 0xb5e71911d44501fbull,
                       0x47ab1eff0a417ff6ull, 0x06d89f71cab8351full};
constexpr u64 ONE_M[4] = {0xd35d438dc58f0d9dull, 0x0a78eb28f5c70b3dull,
                          0x666ea36f7879462cull, 0x0e0a77c19a07df2full};
// ate loop count 6u+2 for u = 4965661367192848881 — a 65-bit value
// (29793968203157093288 > 2^64), kept as u128
const u128 ATE_LOOP = ((u128)1 << 64) | 11347224129447541672ull;

struct Fq {
    u64 d[4];
};

inline bool geq_p(const u64 a[4]) {
    for (int i = 3; i >= 0; i--) {
        if (a[i] != P[i]) return a[i] > P[i];
    }
    return true;
}

inline void sub_p(u64 a[4]) {
    u64 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u64 d = a[i] - P[i];
        u64 b1 = a[i] < P[i];
        u64 d2 = d - borrow;
        borrow = b1 | (d2 > d);
        a[i] = d2;
    }
}

inline void fq_add(const Fq &a, const Fq &b, Fq &o) {
    u64 carry = 0;
    for (int i = 0; i < 4; i++) {
        u64 s = a.d[i] + b.d[i];
        u64 c1 = s < a.d[i];
        u64 s2 = s + carry;
        carry = c1 | (s2 < s);
        o.d[i] = s2;
    }
    if (carry || geq_p(o.d)) sub_p(o.d);
}

inline void fq_sub(const Fq &a, const Fq &b, Fq &o) {
    u64 borrow = 0;
    u64 t[4];
    for (int i = 0; i < 4; i++) {
        u64 d = a.d[i] - b.d[i];
        u64 b1 = a.d[i] < b.d[i];
        u64 d2 = d - borrow;
        borrow = b1 | (d2 > d);
        t[i] = d2;
    }
    if (borrow) {
        u64 carry = 0;
        for (int i = 0; i < 4; i++) {
            u64 s = t[i] + P[i];
            u64 c1 = s < t[i];
            u64 s2 = s + carry;
            carry = c1 | (s2 < s);
            t[i] = s2;
        }
    }
    std::memcpy(o.d, t, sizeof(t));
}

inline void fq_neg(const Fq &a, Fq &o) {
    Fq z{};
    fq_sub(z, a, o);
}

// CIOS Montgomery multiplication (Koç et al.; t has N+2 words)
inline void fq_mul(const Fq &a, const Fq &b, Fq &o) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u64 carry = 0;
        u64 ai = a.d[i];
        for (int j = 0; j < 4; j++) {
            u128 cur = (u128)ai * b.d[j] + t[j] + carry;
            t[j] = (u64)cur;
            carry = (u64)(cur >> 64);
        }
        u128 cur = (u128)t[4] + carry;
        t[4] = (u64)cur;
        t[5] = (u64)(cur >> 64);

        u64 m = t[0] * N0INV;
        cur = (u128)m * P[0] + t[0];
        carry = (u64)(cur >> 64);
        for (int j = 1; j < 4; j++) {
            cur = (u128)m * P[j] + t[j] + carry;
            t[j - 1] = (u64)cur;
            carry = (u64)(cur >> 64);
        }
        cur = (u128)t[4] + carry;
        t[3] = (u64)cur;
        t[4] = t[5] + (u64)(cur >> 64);
        t[5] = 0;
    }
    std::memcpy(o.d, t, 4 * sizeof(u64));
    if (t[4] || geq_p(o.d)) sub_p(o.d);
}

inline void fq_sqr(const Fq &a, Fq &o) { fq_mul(a, a, o); }

inline void to_mont(const Fq &a, Fq &o) {
    Fq r2;
    std::memcpy(r2.d, R2, sizeof(R2));
    fq_mul(a, r2, o);
}

inline void from_mont(const Fq &a, Fq &o) {
    Fq one{};
    one.d[0] = 1;
    fq_mul(a, one, o);
}

// a^e for byte-LE exponent (Montgomery in/out)
inline void fq_pow_bytes(const Fq &a, const uint8_t *e, int elen, Fq &o) {
    Fq acc;
    std::memcpy(acc.d, ONE_M, sizeof(ONE_M));
    Fq base = a;
    for (int i = 0; i < elen; i++) {
        uint8_t byte = e[i];
        for (int b = 0; b < 8; b++) {
            if (byte & 1) fq_mul(acc, base, acc);
            byte >>= 1;
            fq_sqr(base, base);
        }
    }
    o = acc;
}

// inverse via Fermat: a^(p-2)
inline void fq_inv(const Fq &a, Fq &o) {
    u64 e[4];
    std::memcpy(e, P, sizeof(e));
    e[0] -= 2;  // p is odd, no borrow
    uint8_t bytes[32];
    std::memcpy(bytes, e, 32);
    fq_pow_bytes(a, bytes, 32, o);
}

// ---------------------------------------------------------------------------
struct Fq2 {
    Fq c0, c1;
};

inline void fq2_add(const Fq2 &a, const Fq2 &b, Fq2 &o) {
    fq_add(a.c0, b.c0, o.c0);
    fq_add(a.c1, b.c1, o.c1);
}

inline void fq2_sub(const Fq2 &a, const Fq2 &b, Fq2 &o) {
    fq_sub(a.c0, b.c0, o.c0);
    fq_sub(a.c1, b.c1, o.c1);
}

inline void fq2_neg(const Fq2 &a, Fq2 &o) {
    fq_neg(a.c0, o.c0);
    fq_neg(a.c1, o.c1);
}

inline void fq2_mul(const Fq2 &a, const Fq2 &b, Fq2 &o) {
    Fq t0, t1, t2, t3;
    fq_mul(a.c0, b.c0, t0);
    fq_mul(a.c1, b.c1, t1);
    fq_mul(a.c0, b.c1, t2);
    fq_mul(a.c1, b.c0, t3);
    Fq2 r;
    fq_sub(t0, t1, r.c0);
    fq_add(t2, t3, r.c1);
    o = r;
}

inline void fq2_sqr(const Fq2 &a, Fq2 &o) { fq2_mul(a, a, o); }

inline void fq2_inv(const Fq2 &a, Fq2 &o) {
    // 1/(c0 + c1 u) = (c0 - c1 u)/(c0^2 + c1^2)
    Fq t0, t1, d, dinv;
    fq_sqr(a.c0, t0);
    fq_sqr(a.c1, t1);
    fq_add(t0, t1, d);
    fq_inv(d, dinv);
    Fq2 r;
    fq_mul(a.c0, dinv, r.c0);
    Fq nc1;
    fq_neg(a.c1, nc1);
    fq_mul(nc1, dinv, r.c1);
    o = r;
}

// ---------------------------------------------------------------------------
// Fq12 with the host Tuple12 layout: e[0..5] = c0 parts, e[6..11] = c1 parts
struct Fq12 {
    Fq e[12];
};

inline void fq12_one(Fq12 &o) {
    std::memset(&o, 0, sizeof(o));
    std::memcpy(o.e[0].d, ONE_M, sizeof(ONE_M));
}

// host.py Tuple12.mul with xi_0 = 9, reproduced verbatim
inline void fq12_mul(const Fq12 &A, const Fq12 &B, Fq12 &O) {
    Fq a0b0[11], a0b1[11], a1b0[11], a1b1[11];
    std::memset(a0b0, 0, sizeof(a0b0));
    std::memset(a0b1, 0, sizeof(a0b1));
    std::memset(a1b0, 0, sizeof(a1b0));
    std::memset(a1b1, 0, sizeof(a1b1));
    Fq t;
    for (int i = 0; i < 6; i++) {
        for (int j = 0; j < 6; j++) {
            fq_mul(A.e[i], B.e[j], t);
            fq_add(a0b0[i + j], t, a0b0[i + j]);
            fq_mul(A.e[i], B.e[j + 6], t);
            fq_add(a0b1[i + j], t, a0b1[i + j]);
            fq_mul(A.e[i + 6], B.e[j], t);
            fq_add(a1b0[i + j], t, a1b0[i + j]);
            fq_mul(A.e[i + 6], B.e[j + 6], t);
            fq_add(a1b1[i + j], t, a1b1[i + j]);
        }
    }
    Fq sub[11], add[11];
    for (int i = 0; i < 11; i++) {
        fq_sub(a0b0[i], a1b1[i], sub[i]);
        fq_add(a0b1[i], a1b0[i], add[i]);
    }
    // xi*x = 9x = 8x + x
    auto xi_mul = [](const Fq &x, Fq &out) {
        Fq d;
        fq_add(x, x, d);   // 2x
        fq_add(d, d, d);   // 4x
        fq_add(d, d, d);   // 8x
        fq_add(d, x, out);  // 9x
    };
    Fq12 R;
    for (int i = 0; i < 6; i++) {
        if (i < 5) {
            Fq x;
            xi_mul(sub[i + 6], x);
            fq_add(x, sub[i], x);
            fq_sub(x, add[i + 6], R.e[i]);
        } else {
            R.e[i] = sub[i];
        }
    }
    for (int i = 0; i < 6; i++) {
        if (i < 5) {
            Fq x;
            xi_mul(add[i + 6], x);
            fq_add(add[i], sub[i + 6], R.e[i + 6]);
            fq_add(R.e[i + 6], x, R.e[i + 6]);
        } else {
            R.e[i + 6] = add[i];
        }
    }
    O = R;
}

// LSB-first square-and-multiply over byte exponent (host scalar_mul)
inline void fq12_pow_bytes(const Fq12 &a, const uint8_t *e, i64 elen,
                           Fq12 &o) {
    // skip trailing zero bytes
    while (elen > 0 && e[elen - 1] == 0) elen--;
    if (elen == 0) {
        fq12_one(o);
        return;
    }
    Fq12 acc;
    bool have = false;
    Fq12 base = a;
    for (i64 i = 0; i < elen; i++) {
        uint8_t byte = e[i];
        int nbits = (i == elen - 1) ? 8 : 8;
        for (int b = 0; b < nbits; b++) {
            if (byte & 1) {
                if (have) {
                    fq12_mul(acc, base, acc);
                } else {
                    acc = base;
                    have = true;
                }
            }
            byte >>= 1;
            bool more = (i < elen - 1) || (byte != 0);
            if (more) fq12_mul(base, base, base);
        }
    }
    o = acc;
}

// ---------------------------------------------------------------------------
// Miller loop (affine, D-twist line untwist — pairing.py:67-118)

struct G2 {
    Fq2 x, y;
};

inline void line_eval(const Fq2 &lam, const Fq2 &xt, const Fq2 &yt,
                      const Fq &xp, const Fq &yp, Fq12 &O) {
    // l = y_P + (-lam x_P) w + (lam x_T - y_T) w^3
    std::memset(&O, 0, sizeof(O));
    O.e[0] = yp;
    Fq nxp;
    fq_neg(xp, nxp);
    Fq2 w1;
    fq_mul(lam.c0, nxp, w1.c0);
    fq_mul(lam.c1, nxp, w1.c1);
    Fq2 w3;
    fq2_mul(lam, xt, w3);
    fq2_sub(w3, yt, w3);
    O.e[1] = w1.c0;
    O.e[7] = w1.c1;
    O.e[3] = w3.c0;
    O.e[9] = w3.c1;
}

inline void dbl_step(Fq12 &f, Fq2 &xt, Fq2 &yt, const Fq &xp, const Fq &yp) {
    // lam = 3 x^2 / (2y)
    Fq2 x2, num, den, lam;
    fq2_sqr(xt, x2);
    fq2_add(x2, x2, num);
    fq2_add(num, x2, num);
    fq2_add(yt, yt, den);
    fq2_inv(den, den);
    fq2_mul(num, den, lam);
    Fq12 l;
    line_eval(lam, xt, yt, xp, yp, l);
    fq12_mul(f, l, f);
    Fq2 x3, y3;
    fq2_sqr(lam, x3);
    fq2_sub(x3, xt, x3);
    fq2_sub(x3, xt, x3);
    fq2_sub(xt, x3, y3);
    fq2_mul(lam, y3, y3);
    fq2_sub(y3, yt, y3);
    xt = x3;
    yt = y3;
}

inline void add_step(Fq12 &f, Fq2 &xt, Fq2 &yt, const Fq2 &x2, const Fq2 &y2,
                     const Fq &xp, const Fq &yp) {
    Fq2 num, den, lam;
    fq2_sub(y2, yt, num);
    fq2_sub(x2, xt, den);
    fq2_inv(den, den);
    fq2_mul(num, den, lam);
    Fq12 l;
    line_eval(lam, xt, yt, xp, yp, l);
    fq12_mul(f, l, f);
    Fq2 x3, y3;
    fq2_sqr(lam, x3);
    fq2_sub(x3, xt, x3);
    fq2_sub(x3, x2, x3);
    fq2_sub(xt, x3, y3);
    fq2_mul(lam, y3, y3);
    fq2_sub(y3, yt, y3);
    xt = x3;
    yt = y3;
}

inline void conj2(const Fq2 &a, Fq2 &o) {
    o.c0 = a.c0;
    fq_neg(a.c1, o.c1);
}

}  // namespace

extern "C" {

// Marshal helpers: ins/outs are 4-u64-LE plain (non-Montgomery) Fq words.

// out12: 12 Fq.  gamma2/gamma3: twist-Frobenius constants (2 Fq each).
// fe_exp: little-endian bytes of (p^12-1)/r, or elen 0 to skip the final
// exponentiation (returns the raw Miller value).
int mira_pairing(const u64 *xp_, const u64 *yp_, const u64 *xq_,
                 const u64 *yq_, const u64 *gamma2_, const u64 *gamma3_,
                 const uint8_t *fe_exp, i64 elen, u64 *out12) {
    Fq xp, yp;
    std::memcpy(xp.d, xp_, 32);
    std::memcpy(yp.d, yp_, 32);
    to_mont(xp, xp);
    to_mont(yp, yp);
    G2 q;
    std::memcpy(q.x.c0.d, xq_, 32);
    std::memcpy(q.x.c1.d, xq_ + 4, 32);
    std::memcpy(q.y.c0.d, yq_, 32);
    std::memcpy(q.y.c1.d, yq_ + 4, 32);
    to_mont(q.x.c0, q.x.c0);
    to_mont(q.x.c1, q.x.c1);
    to_mont(q.y.c0, q.y.c0);
    to_mont(q.y.c1, q.y.c1);
    Fq2 g2c, g3c;
    std::memcpy(g2c.c0.d, gamma2_, 32);
    std::memcpy(g2c.c1.d, gamma2_ + 4, 32);
    std::memcpy(g3c.c0.d, gamma3_, 32);
    std::memcpy(g3c.c1.d, gamma3_ + 4, 32);
    to_mont(g2c.c0, g2c.c0);
    to_mont(g2c.c1, g2c.c1);
    to_mont(g3c.c0, g3c.c0);
    to_mont(g3c.c1, g3c.c1);

    Fq12 f;
    fq12_one(f);
    Fq2 xt = q.x, yt = q.y;

    // MSB-first over ATE_LOOP, skipping the top bit (pairing.py:106-111)
    int top = 127;
    while (top >= 0 && !((ATE_LOOP >> top) & 1)) top--;
    for (int b = top - 1; b >= 0; b--) {
        fq12_mul(f, f, f);
        dbl_step(f, xt, yt, xp, yp);
        if ((ATE_LOOP >> b) & 1) add_step(f, xt, yt, q.x, q.y, xp, yp);
    }
    // Frobenius end steps
    G2 q1, q2;
    conj2(q.x, q1.x);
    fq2_mul(q1.x, g2c, q1.x);
    conj2(q.y, q1.y);
    fq2_mul(q1.y, g3c, q1.y);
    conj2(q1.x, q2.x);
    fq2_mul(q2.x, g2c, q2.x);
    conj2(q1.y, q2.y);
    fq2_mul(q2.y, g3c, q2.y);
    add_step(f, xt, yt, q1.x, q1.y, xp, yp);
    Fq2 ny2;
    fq2_neg(q2.y, ny2);
    add_step(f, xt, yt, q2.x, ny2, xp, yp);

    if (elen > 0) fq12_pow_bytes(f, fe_exp, elen, f);

    for (int i = 0; i < 12; i++) {
        Fq v;
        from_mont(f.e[i], v);
        std::memcpy(out12 + 4 * i, v.d, 32);
    }
    return 0;
}

int mira_gt_mul(const u64 *a_, const u64 *b_, u64 *out12) {
    Fq12 a, b;
    for (int i = 0; i < 12; i++) {
        std::memcpy(a.e[i].d, a_ + 4 * i, 32);
        to_mont(a.e[i], a.e[i]);
        std::memcpy(b.e[i].d, b_ + 4 * i, 32);
        to_mont(b.e[i], b.e[i]);
    }
    Fq12 o;
    fq12_mul(a, b, o);
    for (int i = 0; i < 12; i++) {
        Fq v;
        from_mont(o.e[i], v);
        std::memcpy(out12 + 4 * i, v.d, 32);
    }
    return 0;
}

int mira_gt_pow(const u64 *a_, const uint8_t *exp, i64 elen, u64 *out12) {
    Fq12 a;
    for (int i = 0; i < 12; i++) {
        std::memcpy(a.e[i].d, a_ + 4 * i, 32);
        to_mont(a.e[i], a.e[i]);
    }
    Fq12 o;
    fq12_pow_bytes(a, exp, elen, o);
    for (int i = 0; i < 12; i++) {
        Fq v;
        from_mont(o.e[i], v);
        std::memcpy(out12 + 4 * i, v.d, 32);
    }
    return 0;
}
}
