"""uint64 modular arithmetic for RNS-CKKS on TPU.

TPUs have no native 64-bit integer multiplier; XLA emulates uint64 with
uint32 pairs.  We therefore keep every modular primitive expressed in
terms of 32-bit halves so the emitted op mix is small and predictable,
and use Montgomery representation (R = 2^64) so that a modular multiply
is 1 low-product + 2 high-products + a couple of adds — no division.

Conventions
-----------
* Residues live in ``uint64`` arrays, canonically reduced to ``[0, q)``.
* A "Montgomery operand" is ``b·R mod q``; ``mont_mul(a, b_mont) =
  a·b mod q`` returns a *standard* residue.  Ciphertext polynomials stay
  standard; twiddle factors, plaintext polynomials and key polynomials
  are stored in Montgomery form so the hot ct×pt / ct×key paths pay a
  single REDC per multiply.
* Per-limb constants (modulus ``q``, ``qinv = -q^{-1} mod 2^64``) are
  passed as arrays broadcastable against the data, typically shaped
  ``[L, 1]`` against data ``[L, N]``.

Host-side helpers (prime generation, primitive roots, Montgomery
constants) operate on Python ints — they run once at parameter setup.

Reference parity: replaces the ``ring`` package of the Go Lattigo fork
consumed by dwkim606/optimal_conv (see SURVEY.md C1): modular add/sub/
mul (ring/modular_reduction.go), NTT-prime generation (ring/primes.go).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF


def u64(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.uint64)


# ---------------------------------------------------------------------------
# 64-bit wide multiplication built from 32-bit halves
# ---------------------------------------------------------------------------

def mul64_hi(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """High 64 bits of the 128-bit product x*y (schoolbook on 32-bit halves)."""
    m32 = jnp.uint64(_M32)
    xl = x & m32
    xh = x >> jnp.uint64(32)
    yl = y & m32
    yh = y >> jnp.uint64(32)
    ll = xl * yl
    lh = xl * yh
    hl = xh * yl
    hh = xh * yh
    # carry out of the low 64 bits:
    cross = (ll >> jnp.uint64(32)) + (lh & m32) + (hl & m32)
    return hh + (lh >> jnp.uint64(32)) + (hl >> jnp.uint64(32)) + (cross >> jnp.uint64(32))


def mul64_wide(x: jnp.ndarray, y: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(hi, lo) of the exact 128-bit product."""
    return mul64_hi(x, y), x * y


# ---------------------------------------------------------------------------
# Modular add / sub / neg  (inputs canonically reduced)
# ---------------------------------------------------------------------------

def add_mod(a: jnp.ndarray, b: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    s = a + b  # < 2^63, no wraparound for q < 2^62
    return jnp.where(s >= q, s - q, s)


def sub_mod(a: jnp.ndarray, b: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(a >= b, a - b, a + q - b)


def neg_mod(a: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(a == 0, a, q - a)


# ---------------------------------------------------------------------------
# Montgomery multiplication, R = 2^64
# ---------------------------------------------------------------------------

def mont_redc(hi: jnp.ndarray, lo: jnp.ndarray, q: jnp.ndarray, qinv: jnp.ndarray) -> jnp.ndarray:
    """REDC: given t = hi·2^64 + lo < q·2^64, return t·2^-64 mod q in [0, q).

    qinv = -q^{-1} mod 2^64.
    """
    m = lo * qinv                       # m = t·(-q^-1) mod 2^64
    mq_hi = mul64_hi(m, q)
    # lo + m*q ≡ 0 (mod 2^64); carry into the high word iff lo != 0.
    carry = jnp.where(lo != 0, jnp.uint64(1), jnp.uint64(0))
    r = hi + mq_hi + carry              # < 2q
    return jnp.where(r >= q, r - q, r)


def mont_mul(a: jnp.ndarray, b_mont: jnp.ndarray, q: jnp.ndarray, qinv: jnp.ndarray) -> jnp.ndarray:
    """a · b mod q where b_mont = b·2^64 mod q.  Result is standard-form."""
    hi, lo = mul64_wide(a, b_mont)
    return mont_redc(hi, lo, q, qinv)


def mul_mod(a: jnp.ndarray, b: jnp.ndarray, q: jnp.ndarray, qinv: jnp.ndarray,
            r2: jnp.ndarray) -> jnp.ndarray:
    """Generic a·b mod q for two standard-form operands.

    r2 = 2^128 mod q.  Two REDCs: a·b·2^-64, then ·2^128·2^-64 = a·b.
    """
    t = mont_mul(a, b, q, qinv)         # a·b·2^-64 mod q
    return mont_mul(t, r2, q, qinv)     # ·2^64


def to_mont(a: jnp.ndarray, q: jnp.ndarray, qinv: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    """a → a·2^64 mod q."""
    return mont_mul(a, r2, q, qinv)


def from_mont(a_mont: jnp.ndarray, q: jnp.ndarray, qinv: jnp.ndarray) -> jnp.ndarray:
    """a·2^64 mod q → a."""
    return mont_redc(jnp.zeros_like(a_mont), a_mont, q, qinv)


# ---------------------------------------------------------------------------
# Host-side constants (Python ints; run once at parameter setup)
# ---------------------------------------------------------------------------

def mont_qinv(q: int) -> int:
    """-q^{-1} mod 2^64."""
    return (-pow(q, -1, 1 << 64)) & _M64


def mont_r2(q: int) -> int:
    """2^128 mod q."""
    return (1 << 128) % q


def _miller_rabin(n: int) -> bool:
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    # deterministic witness set for n < 3.3e24
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def gen_ntt_primes(log_n: int, bit_sizes: list[int]) -> list[int]:
    """NTT-friendly primes q ≡ 1 (mod 2N), one per requested bit size.

    For each size, candidates are scanned alternately below/above 2^size
    (closest first), skipping primes already taken — deterministic, so a
    given (log_n, bit_sizes) always yields the same chain.
    """
    two_n = 1 << (log_n + 1)
    taken: set[int] = set()
    out = []
    for size in bit_sizes:
        base = 1 << size
        # largest multiple-of-2N offset grid around 2^size
        k = 0
        found = None
        while found is None:
            k += 1
            for cand in (base - k * two_n + 1, base + k * two_n + 1):
                if cand in taken or cand.bit_length() > 62:
                    continue
                if _miller_rabin(cand):
                    found = cand
                    break
        taken.add(found)
        out.append(found)
    return out


def primitive_root(q: int) -> int:
    """Smallest primitive root mod prime q."""
    factors = _factorize(q - 1)
    for g in range(2, q):
        if all(pow(g, (q - 1) // f, q) != 1 for f in factors):
            return g
    raise ValueError(f"no primitive root for {q}")


def _factorize(n: int) -> list[int]:
    out = []
    d = 2
    while d * d <= n:
        if n % d == 0:
            out.append(d)
            while n % d == 0:
                n //= d
        d += 1
    if n > 1:
        out.append(n)
    return out


def root_of_unity(q: int, order: int) -> int:
    """A primitive `order`-th root of unity mod q (order | q-1)."""
    assert (q - 1) % order == 0
    g = primitive_root(q)
    psi = pow(g, (q - 1) // order, q)
    assert pow(psi, order, q) == 1 and pow(psi, order // 2, q) != 1
    return psi


def centered_to_residues(coeffs: np.ndarray, moduli: list[int]) -> np.ndarray:
    """Signed integer coefficients (object or int64 array, length N) →
    uint64 residue array [L, N].  Host-side (encode path)."""
    n = coeffs.shape[-1]
    out = np.empty((len(moduli), n), dtype=np.uint64)
    is_object = coeffs.dtype == object
    for i, q in enumerate(moduli):
        if is_object:
            out[i] = np.array([int(c) % q for c in coeffs], dtype=np.uint64)
        else:
            out[i] = np.mod(coeffs, q).astype(np.uint64)
    return out


def residues_to_centered(res: np.ndarray, moduli: list[int]) -> np.ndarray:
    """uint64 residues [L, N] → centered big-int coefficients (object array).

    CRT reconstruction over however many limbs are present.  Host-side
    (decode / debug path); uses Python big ints, cost O(L·N).
    """
    L, n = res.shape
    mods = [int(q) for q in moduli[:L]]
    big_q = 1
    for q in mods:
        big_q *= q
    acc = np.zeros(n, dtype=object)
    for i, q in enumerate(mods):
        qhat = big_q // q
        inv = pow(qhat % q, -1, q)
        acc += (res[i].astype(object) * ((qhat * inv) % big_q))
    acc %= big_q
    return np.where(acc > big_q // 2, acc - big_q, acc)
