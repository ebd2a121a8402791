// Host-side CRT reconstruction for RNS-CKKS decode.
//
// The only host-side hot loop that numpy cannot express: reconstructing
// centered big integers (up to ~38 limbs × 61 bits ≈ 2300 bits) from RNS
// residues and converting to double at a given scale — used by every
// decrypt at level > 0 (debug oracles, tests, slot decodes).  The pure
// Python object-dtype path costs seconds per decode; this does it in
// milliseconds.  (The reference has no native code at all — its Go
// runtime plays this role; see README "Design notes".)
//
// Build:  g++ -O2 -shared -fPIC -o libcrt.so crt.cpp
// Loaded via ctypes by optimal_conv_tpu/native/__init__.py with a pure
// Python fallback when the toolchain is unavailable.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// little-endian fixed bignum on u64 words
struct Big {
    std::vector<uint64_t> w;
    explicit Big(size_t n) : w(n, 0) {}
};

inline void add_mul_small(Big &acc, const Big &a, uint64_t m) {
    // acc += a * m
    unsigned __int128 carry = 0;
    size_t n = acc.w.size();
    for (size_t i = 0; i < n; i++) {
        unsigned __int128 cur = (unsigned __int128)a.w[i] * m +
                                acc.w[i] + (uint64_t)carry;
        acc.w[i] = (uint64_t)cur;
        carry = cur >> 64;
    }
}

inline void mul_small(Big &a, uint64_t m) {
    unsigned __int128 carry = 0;
    for (size_t i = 0; i < a.w.size(); i++) {
        unsigned __int128 cur = (unsigned __int128)a.w[i] * m + (uint64_t)carry;
        a.w[i] = (uint64_t)cur;
        carry = cur >> 64;
    }
}

inline uint64_t mod_small(const Big &a, uint64_t q) {
    unsigned __int128 r = 0;
    for (size_t i = a.w.size(); i-- > 0;) {
        r = ((r << 64) | a.w[i]) % q;
    }
    return (uint64_t)r;
}

inline int cmp(const Big &a, const Big &b) {
    for (size_t i = a.w.size(); i-- > 0;) {
        if (a.w[i] != b.w[i]) return a.w[i] < b.w[i] ? -1 : 1;
    }
    return 0;
}

inline void sub(Big &a, const Big &b) {  // a -= b (a >= b)
    unsigned __int128 borrow = 0;
    for (size_t i = 0; i < a.w.size(); i++) {
        unsigned __int128 cur = (unsigned __int128)a.w[i] - b.w[i] - (uint64_t)borrow;
        a.w[i] = (uint64_t)cur;
        borrow = (cur >> 64) ? 1 : 0;
    }
}

inline double to_double(const Big &a) {
    // top-down Horner: stays finite as long as the VALUE fits a double
    // (leading zero words contribute nothing, unlike bottom-up where the
    // base overflows to inf and 0*inf poisons the sum)
    double out = 0.0;
    for (size_t i = a.w.size(); i-- > 0;) {
        out = out * 18446744073709551616.0 + (double)a.w[i];
    }
    return out;
}

inline uint64_t inv_mod(uint64_t a, uint64_t q) {
    // extended euclid (a < q, q prime); 128-bit to dodge overflow
    __int128 t = 0, newt = 1;
    __int128 r = (__int128)q, newr = (__int128)(a % q);
    while (newr != 0) {
        __int128 quo = r / newr;
        __int128 tmp = t - quo * newt; t = newt; newt = tmp;
        tmp = r - quo * newr; r = newr; newr = tmp;
    }
    if (t < 0) t += (__int128)q;
    return (uint64_t)t;
}

}  // namespace

extern "C" {

// residues: [L, n] row-major; mods: [L]; out: [n] doubles = centered/scale.
// Garner's algorithm: mixed-radix digits, accumulate into a bignum.
void crt_decode_centered(const uint64_t *residues, const uint64_t *mods,
                         int64_t L, int64_t n, double scale, double *out) {
    size_t words = (size_t)(L * 64 + 127) / 64;
    // precompute prefix-product inverses: inv[j][i] = (m_0*…*m_{i-1})^-1 mod m_...
    // Garner: for each modulus i: c_i = inv(prod_{j<i} m_j mod m_i) mod m_i
    std::vector<uint64_t> cinv(L);
    for (int64_t i = 1; i < L; i++) {
        uint64_t p = mods[0] % mods[i];
        for (int64_t j = 1; j < i; j++) {
            p = (uint64_t)((unsigned __int128)p * (mods[j] % mods[i]) % mods[i]);
        }
        cinv[i] = inv_mod(p, mods[i]);
    }
    // big_q = prod mods; half = big_q / 2
    Big big_q(words);
    big_q.w[0] = 1;
    for (int64_t i = 0; i < L; i++) mul_small(big_q, mods[i]);
    Big half = big_q;
    // halve
    for (size_t i = 0; i < words; i++) {
        uint64_t lo = half.w[i] >> 1;
        if (i + 1 < words) lo |= half.w[i + 1] << 63;
        half.w[i] = lo;
    }

    std::vector<uint64_t> digits(L);
    Big val(words), prefix(words);
    for (int64_t k = 0; k < n; k++) {
        // mixed-radix digits (Garner)
        digits[0] = residues[k] % mods[0];
        for (int64_t i = 1; i < L; i++) {
            uint64_t x = residues[i * n + k] % mods[i];
            // u = (x - val_so_far) * cinv mod m_i, where val_so_far built
            // incrementally mod m_i
            uint64_t acc = digits[0] % mods[i];
            uint64_t p = 1;
            for (int64_t j = 1; j < i; j++) {
                p = (uint64_t)((unsigned __int128)p * (mods[j - 1] % mods[i]) % mods[i]);
                acc = (uint64_t)((acc + (unsigned __int128)digits[j] *
                                            ((unsigned __int128)p % mods[i])) % mods[i]);
            }
            uint64_t diff = x >= acc ? x - acc : x + mods[i] - acc;
            digits[i] = (uint64_t)((unsigned __int128)diff * cinv[i] % mods[i]);
        }
        // value = d0 + m0*(d1 + m1*(d2 + …)) via bignum
        std::fill(val.w.begin(), val.w.end(), 0);
        std::fill(prefix.w.begin(), prefix.w.end(), 0);
        prefix.w[0] = 1;
        for (int64_t i = 0; i < L; i++) {
            add_mul_small(val, prefix, digits[i]);
            if (i + 1 < L) mul_small(prefix, mods[i]);
        }
        if (cmp(val, half) > 0) {
            Big neg = big_q;
            sub(neg, val);
            out[k] = -to_double(neg) / scale;
        } else {
            out[k] = to_double(val) / scale;
        }
    }
}

}  // extern "C"
