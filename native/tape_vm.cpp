// Witness-tape VM: executes the straight-line witness-generation program
// captured by mira_tpu/table/tape.py (see ivc/tape_runner.py).  Plays the
// role the per-step imperative synthesis plays in the reference
// (src/table/witness_data.rs): recomputes every advice value for fresh
// step inputs, here as a register machine over 640-bit signed integers
// with python floor-division semantics.
//
// Register file: the Python side renames SSA slots to reusable registers
// (liveness-based), so the working set stays cache-resident.  Values are
// sign+magnitude, magnitude = W 64-bit words (640 bits — the widest value a
// synthesis produces is a 320x320-bit bignat product in mult_mod).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 tape_vm.cpp -o libmiratape.so

#include <cstdint>
#include <cstring>
#include <vector>

using u64 = uint64_t;
using u128 = __uint128_t;
using i64 = int64_t;

namespace {

constexpr int W = 10;        // 640-bit register magnitude
constexpr int WMUL = 2 * W;  // scratch for products / barrett

struct Reg {
    u64 d[W];
    int16_t len;  // number of significant words (0 => value 0)
    int16_t neg;  // 1 => negative
};

inline void rzero(Reg &r) {
    std::memset(r.d, 0, sizeof(r.d));
    r.len = 0;
    r.neg = 0;
}

inline void rnorm(Reg &r) {
    while (r.len > 0 && r.d[r.len - 1] == 0) r.len--;
    if (r.len == 0) r.neg = 0;
}

// -1 / 0 / +1 comparing magnitudes
inline int cmp_mag(const u64 *a, int alen, const u64 *b, int blen) {
    if (alen != blen) return alen < blen ? -1 : 1;
    for (int i = alen - 1; i >= 0; i--)
        if (a[i] != b[i]) return a[i] < b[i] ? -1 : 1;
    return 0;
}

// out = a + b (magnitudes); returns length; out may alias a
inline int add_mag(const u64 *a, int alen, const u64 *b, int blen, u64 *out,
                   int maxw) {
    int n = alen > blen ? alen : blen;
    u64 carry = 0;
    for (int i = 0; i < n; i++) {
        u64 av = i < alen ? a[i] : 0, bv = i < blen ? b[i] : 0;
        u64 s = av + bv;
        u64 c1 = s < av;
        u64 s2 = s + carry;
        carry = c1 | (s2 < s);
        out[i] = s2;
    }
    if (carry) {
        if (n >= maxw) return -1;  // overflow
        out[n++] = carry;
    }
    return n;
}

// out = a - b, requires |a| >= |b|
inline int sub_mag(const u64 *a, int alen, const u64 *b, int blen, u64 *out) {
    u64 borrow = 0;
    for (int i = 0; i < alen; i++) {
        u64 av = a[i], bv = i < blen ? b[i] : 0;
        u64 d = av - bv;
        u64 b1 = av < bv;
        u64 d2 = d - borrow;
        borrow = b1 | (d2 > d);
        out[i] = d2;
    }
    int n = alen;
    while (n > 0 && out[n - 1] == 0) n--;
    return n;
}

// out = a * b (schoolbook), returns length; out must not alias, cap maxw
inline int mul_mag(const u64 *a, int alen, const u64 *b, int blen, u64 *out,
                   int maxw) {
    if (alen == 0 || blen == 0) return 0;
    int n = alen + blen;
    if (n > maxw) return -1;
    std::memset(out, 0, sizeof(u64) * n);
    for (int i = 0; i < alen; i++) {
        u64 carry = 0;
        u64 ai = a[i];
        for (int j = 0; j < blen; j++) {
            u128 cur = (u128)ai * b[j] + out[i + j] + carry;
            out[i + j] = (u64)cur;
            carry = (u64)(cur >> 64);
        }
        out[i + blen] = carry;
    }
    while (n > 0 && out[n - 1] == 0) n--;
    return n;
}

inline int shl_mag(const u64 *a, int alen, unsigned k, u64 *out, int maxw) {
    if (alen == 0) return 0;
    unsigned wsh = k / 64, bsh = k % 64;
    int n = alen + wsh + (bsh != 0);
    if (n > maxw) return -1;
    std::memset(out, 0, sizeof(u64) * n);
    for (int i = alen - 1; i >= 0; i--) {
        u64 v = a[i];
        if (bsh) {
            out[i + wsh + 1] |= v >> (64 - bsh);
            out[i + wsh] |= v << bsh;
        } else {
            out[i + wsh] = v;
        }
    }
    while (n > 0 && out[n - 1] == 0) n--;
    return n;
}

inline int shr_mag(const u64 *a, int alen, unsigned k, u64 *out) {
    unsigned wsh = k / 64, bsh = k % 64;
    if ((int)wsh >= alen) return 0;
    int n = alen - wsh;
    for (int i = 0; i < n; i++) {
        u64 v = a[i + wsh] >> bsh;
        if (bsh && i + (int)wsh + 1 < alen)
            v |= a[i + wsh + 1] << (64 - bsh);
        out[i] = v;
    }
    while (n > 0 && out[n - 1] == 0) n--;
    return n;
}

// ---------------------------------------------------------------------------
// Barrett contexts for the (few) distinct divisors: mu = floor(2^640 / m)
struct Barrett {
    u64 m[W];
    int mlen;
    u64 mu[W + 1];
    int mulen;
};

// long division q = floor(num / den) via binary shift-subtract, used ONCE
// per divisor to build mu (num = 2^640)
static void build_barrett(Barrett &bc) {
    // mu = floor(2^640 / m): binary long division over 641 bits
    u64 rem[WMUL + 2] = {0};
    int rlen = 0;
    u64 q[WMUL + 2] = {0};
    for (int bit = 64 * W; bit >= 0; bit--) {
        // rem = rem*2 + bit(num); num = 2^640 has only bit 640 set
        u64 carry = (bit == 64 * W) ? 1 : 0;
        for (int i = 0; i < rlen || carry; i++) {
            u64 nv = (rem[i] << 1) | carry;
            carry = rem[i] >> 63;
            rem[i] = nv;
            if (i >= rlen && nv) rlen = i + 1;
        }
        if (cmp_mag(rem, rlen, bc.m, bc.mlen) >= 0) {
            rlen = sub_mag(rem, rlen, bc.m, bc.mlen, rem);
            q[bit / 64] |= 1ull << (bit % 64);
        }
    }
    std::memcpy(bc.mu, q, sizeof(u64) * (W + 1));
    int n = W + 1;
    while (n > 0 && bc.mu[n - 1] == 0) n--;
    bc.mulen = n;
}

// divmod of magnitude a (< 2^640) by bc.m: q out (may be null), r out
static bool barrett_divmod(const Barrett &bc, const u64 *a, int alen,
                           u64 *qout, int *qlen, u64 *rout, int *rlen) {
    // q_hat = (a * mu) >> 640
    u64 prod[WMUL + 4];
    int plen = mul_mag(a, alen, bc.mu, bc.mulen, prod, WMUL + 4);
    if (plen < 0) return false;
    u64 qh[WMUL + 4];
    int qhlen = plen > W ? plen - W : 0;
    for (int i = 0; i < qhlen; i++) qh[i] = prod[i + W];
    while (qhlen > 0 && qh[qhlen - 1] == 0) qhlen--;
    // r = a - qh * m
    u64 qm[WMUL + 4];
    int qmlen = mul_mag(qh, qhlen, bc.m, bc.mlen, qm, WMUL + 4);
    if (qmlen < 0) return false;
    u64 r[WMUL + 4];
    int rl = sub_mag(a, alen, qm, qmlen, r);  // a >= qh*m by construction
    // correct: at most a few subtractions
    int guard = 0;
    while (cmp_mag(r, rl, bc.m, bc.mlen) >= 0) {
        rl = sub_mag(r, rl, bc.m, bc.mlen, r);
        // qh += 1
        u64 one = 1;
        qhlen = add_mag(qh, qhlen, &one, 1, qh, WMUL + 4);
        if (++guard > 8) return false;
    }
    if (qout) {
        if (qhlen > W) return false;
        std::memset(qout, 0, sizeof(u64) * W);
        std::memcpy(qout, qh, sizeof(u64) * qhlen);
        *qlen = qhlen;
    }
    if (rout) {
        std::memset(rout, 0, sizeof(u64) * W);
        std::memcpy(rout, r, sizeof(u64) * rl);
        *rlen = rl;
    }
    return true;
}

// modular helpers on magnitudes < m (for invmod)
inline void mod_add(const u64 *a, int alen, const u64 *b, int blen,
                    const u64 *m, int mlen, u64 *out, int *olen) {
    u64 t[W + 1];
    int tl = add_mag(a, alen, b, blen, t, W + 1);
    if (cmp_mag(t, tl, m, mlen) >= 0) tl = sub_mag(t, tl, m, mlen, t);
    std::memset(out, 0, sizeof(u64) * W);
    std::memcpy(out, t, sizeof(u64) * tl);
    *olen = tl;
}

inline void mod_sub(const u64 *a, int alen, const u64 *b, int blen,
                    const u64 *m, int mlen, u64 *out, int *olen) {
    u64 t[W + 1];
    int tl;
    if (cmp_mag(a, alen, b, blen) >= 0) {
        tl = sub_mag(a, alen, b, blen, t);
    } else {
        tl = add_mag(a, alen, m, mlen, t, W + 1);
        tl = sub_mag(t, tl, b, blen, t);
    }
    std::memset(out, 0, sizeof(u64) * W);
    std::memcpy(out, t, sizeof(u64) * tl);
    *olen = tl;
}

inline void half_mod(u64 *x, int *xlen, const u64 *m, int mlen) {
    // x = x/2 if even else (x+m)/2  (m odd)
    u64 t[W + 1];
    int tl;
    if (x[0] & 1) {
        tl = add_mag(x, *xlen, m, mlen, t, W + 1);
    } else {
        std::memcpy(t, x, sizeof(u64) * (*xlen));
        tl = *xlen;
    }
    tl = shr_mag(t, tl, 1, t);
    std::memset(x, 0, sizeof(u64) * W);
    std::memcpy(x, t, sizeof(u64) * tl);
    *xlen = tl;
}

// x^{-1} mod m for odd m, gcd(x,m)=1; binary extended gcd
static bool invmod_odd(const u64 *x0, int xlen, const u64 *m, int mlen,
                       u64 *out, int *olen) {
    u64 u[W] = {0}, v[W] = {0}, b[W] = {0}, c[W] = {0};
    std::memcpy(u, x0, sizeof(u64) * xlen);
    std::memcpy(v, m, sizeof(u64) * mlen);
    int ulen = xlen, vlen = mlen;
    b[0] = 1;
    int blen = 1, clen = 0;
    u64 one = 1;
    int guard = 0;
    while (!(ulen == 1 && u[0] == 1) && !(vlen == 1 && v[0] == 1)) {
        if (++guard > 4000) return false;
        while (ulen > 0 && !(u[0] & 1)) {
            ulen = shr_mag(u, ulen, 1, u);
            half_mod(b, &blen, m, mlen);
        }
        while (vlen > 0 && !(v[0] & 1)) {
            vlen = shr_mag(v, vlen, 1, v);
            half_mod(c, &clen, m, mlen);
        }
        if (ulen == 0 || vlen == 0) return false;  // gcd != 1
        if (cmp_mag(u, ulen, v, vlen) >= 0) {
            ulen = sub_mag(u, ulen, v, vlen, u);
            mod_sub(b, blen, c, clen, m, mlen, b, &blen);
        } else {
            vlen = sub_mag(v, vlen, u, ulen, v);
            mod_sub(c, clen, b, blen, m, mlen, c, &clen);
        }
    }
    std::memset(out, 0, sizeof(u64) * W);
    if (ulen == 1 && u[0] == 1) {
        std::memcpy(out, b, sizeof(u64) * blen);
        *olen = blen;
    } else {
        std::memcpy(out, c, sizeof(u64) * clen);
        *olen = clen;
    }
    (void)one;
    return true;
}

enum Op { ADD = 0, SUB, MUL, MOD, DIV, INVMOD, ISZM, SHL, SHR, AND };

}  // namespace

extern "C" {

// Executes the renamed tape.  Returns 0 on success, else an error code:
// 1 = overflow, 2 = bad op, 3 = division internal error, 4 = negative
// operand where nonnegative required, 5 = invmod failure, 6 = shift too big.
//
// init_mag/init_hdr: preloaded registers [0, n_init)  (hdr = len, sign via
// negative hdr).  n_regs: total register count.
// code/a/b/out: per-op register indices.  emit_start (n_ops+1 prefix) /
// emit_dst: after op i, copy its out register (must fit 4 words, nonneg)
// into out_buf[emit_dst[j]*4 ..].
int mira_tape_execute(const int32_t *code, const int32_t *a_idx,
                      const int32_t *b_idx, const int32_t *out_idx,
                      i64 n_ops, const u64 *init_mag, const int32_t *init_hdr,
                      i64 n_init, i64 n_regs, const int32_t *emit_start,
                      const int32_t *emit_dst, u64 *out_buf) {
    std::vector<Reg> regs(n_regs);
    for (i64 i = 0; i < n_init; i++) {
        std::memcpy(regs[i].d, init_mag + i * W, sizeof(u64) * W);
        int32_t h = init_hdr[i];
        regs[i].neg = h < 0;
        regs[i].len = h < 0 ? -h : h;
    }
    for (i64 i = n_init; i < n_regs; i++) rzero(regs[i]);

    // Barrett cache keyed by divisor register index (divisors are const
    // registers, stable across ops)
    std::vector<Barrett> bcache;
    std::vector<int32_t> bkey;

    auto get_barrett = [&](int32_t reg) -> Barrett * {
        for (size_t i = 0; i < bkey.size(); i++)
            if (bkey[i] == reg) return &bcache[i];
        const Reg &m = regs[reg];
        if (m.neg || m.len == 0) return nullptr;
        bcache.emplace_back();
        Barrett &bc = bcache.back();
        std::memset(bc.m, 0, sizeof(bc.m));
        std::memcpy(bc.m, m.d, sizeof(u64) * m.len);
        bc.mlen = m.len;
        build_barrett(bc);
        bkey.push_back(reg);
        return &bc;
    };

    u64 scratch[WMUL + 4];

    for (i64 i = 0; i < n_ops; i++) {
        const Reg &A = regs[a_idx[i]];
        const Reg &B = regs[b_idx[i]];
        Reg &O = regs[out_idx[i]];
        Reg tmp;  // compute into tmp: O may alias A or B
        rzero(tmp);
        switch (code[i]) {
            case ADD:
            case SUB: {
                int bneg = code[i] == SUB ? !B.neg : B.neg;
                if (A.neg == bneg) {
                    int n = add_mag(A.d, A.len, B.d, B.len, tmp.d, W);
                    if (n < 0) return 1;
                    tmp.len = n;
                    tmp.neg = A.neg;
                } else {
                    int c = cmp_mag(A.d, A.len, B.d, B.len);
                    if (c >= 0) {
                        tmp.len = sub_mag(A.d, A.len, B.d, B.len, tmp.d);
                        tmp.neg = A.neg;
                    } else {
                        tmp.len = sub_mag(B.d, B.len, A.d, A.len, tmp.d);
                        tmp.neg = bneg;
                    }
                }
                rnorm(tmp);
                break;
            }
            case MUL: {
                int n = mul_mag(A.d, A.len, B.d, B.len, scratch, WMUL + 4);
                if (n < 0 || n > W) return 1;
                std::memcpy(tmp.d, scratch, sizeof(u64) * n);
                tmp.len = n;
                tmp.neg = (A.neg != B.neg) && n > 0;
                break;
            }
            case MOD:
            case DIV: {
                Barrett *bc = get_barrett(b_idx[i]);
                if (!bc) return 3;
                u64 q[W], r[W];
                int qlen, rlen;
                if (!barrett_divmod(*bc, A.d, A.len, q, &qlen, r, &rlen))
                    return 3;
                if (code[i] == MOD) {
                    if (A.neg && rlen != 0) {
                        // python floor-mod: m - r
                        tmp.len = sub_mag(bc->m, bc->mlen, r, rlen, tmp.d);
                    } else {
                        std::memcpy(tmp.d, r, sizeof(u64) * rlen);
                        tmp.len = rlen;
                    }
                    tmp.neg = 0;
                } else {
                    if (A.neg) {
                        // python floor-div: -(q + (r != 0))
                        u64 one = 1;
                        if (rlen != 0) {
                            qlen = add_mag(q, qlen, &one, 1, q, W);
                            if (qlen < 0) return 1;
                        }
                        std::memcpy(tmp.d, q, sizeof(u64) * qlen);
                        tmp.len = qlen;
                        tmp.neg = qlen > 0;
                    } else {
                        std::memcpy(tmp.d, q, sizeof(u64) * qlen);
                        tmp.len = qlen;
                        tmp.neg = 0;
                    }
                }
                rnorm(tmp);
                break;
            }
            case INVMOD: {
                Barrett *bc = get_barrett(b_idx[i]);
                if (!bc) return 3;
                u64 r[W];
                int rlen;
                if (!barrett_divmod(*bc, A.d, A.len, nullptr, nullptr, r,
                                    &rlen))
                    return 3;
                if (A.neg && rlen != 0)
                    rlen = sub_mag(bc->m, bc->mlen, r, rlen, r);
                if (rlen == 0) {
                    tmp.d[0] = 1;
                    tmp.len = 1;
                } else {
                    int olen;
                    if (!invmod_odd(r, rlen, bc->m, bc->mlen, tmp.d, &olen))
                        return 5;
                    tmp.len = olen;
                }
                tmp.neg = 0;
                break;
            }
            case ISZM: {
                Barrett *bc = get_barrett(b_idx[i]);
                if (!bc) return 3;
                u64 r[W];
                int rlen;
                if (!barrett_divmod(*bc, A.d, A.len, nullptr, nullptr, r,
                                    &rlen))
                    return 3;
                tmp.d[0] = (rlen == 0) ? 1 : 0;
                tmp.len = tmp.d[0] ? 1 : 0;
                tmp.neg = 0;
                break;
            }
            case SHL: {
                if (B.neg || B.len > 1 || A.neg) return 4;
                u64 k = B.len ? B.d[0] : 0;
                if (k >= 64 * W) return 6;
                int n = shl_mag(A.d, A.len, (unsigned)k, tmp.d, W);
                if (n < 0) return 1;
                tmp.len = n;
                break;
            }
            case SHR: {
                if (B.neg || B.len > 1 || A.neg) return 4;
                u64 k = B.len ? B.d[0] : 0;
                if (k >= 64 * W) {
                    tmp.len = 0;
                } else {
                    tmp.len = shr_mag(A.d, A.len, (unsigned)k, tmp.d);
                }
                break;
            }
            case AND: {
                if (A.neg || B.neg) return 4;
                int n = A.len < B.len ? A.len : B.len;
                for (int j = 0; j < n; j++) tmp.d[j] = A.d[j] & B.d[j];
                tmp.len = n;
                rnorm(tmp);
                break;
            }
            default:
                return 2;
        }
        O = tmp;
        for (int32_t j = emit_start[i]; j < emit_start[i + 1]; j++) {
            if (O.neg || O.len > 4) return 1;
            u64 *dst = out_buf + (i64)emit_dst[j] * 4;
            dst[0] = O.d[0];
            dst[1] = O.d[1];
            dst[2] = O.d[2];
            dst[3] = O.d[3];
        }
    }
    return 0;
}
}
