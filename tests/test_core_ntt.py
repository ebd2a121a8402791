"""Unit tests for the RNS ring core: modmul, NTT, automorphisms.

Mirrors the verification the reference gets implicitly from Lattigo's
own test-suite (the fork is consumed as a black box); here it's explicit:
NTT∘iNTT = id, convolution theorem vs. a big-int negacyclic convolution,
automorphism consistency between coefficient and NTT domains.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from optimal_conv_tpu.core import modmath as mm
from optimal_conv_tpu.core import ntt as nttmod

LOG_N = 8
N = 1 << LOG_N
MODULI = mm.gen_ntt_primes(LOG_N, [55, 45, 30])
RNG = np.random.default_rng(0)


def rand_poly(L=len(MODULI), n=N):
    return np.stack([RNG.integers(0, q, size=n, dtype=np.uint64) for q in MODULI[:L]])


@pytest.fixture(scope="module")
def ctx():
    return nttmod.NttContext(MODULI, LOG_N)


def test_prime_generation():
    for q in MODULI:
        assert q % (2 * N) == 1
        assert mm._miller_rabin(q)
    assert len(set(MODULI)) == len(MODULI)


def test_mont_mul_matches_bigint():
    q = MODULI[0]
    a = RNG.integers(0, q, size=128, dtype=np.uint64)
    b = RNG.integers(0, q, size=128, dtype=np.uint64)
    qj = jnp.uint64(q)
    qinv = jnp.uint64(mm.mont_qinv(q))
    r2 = jnp.uint64(mm.mont_r2(q))
    got = mm.mul_mod(jnp.asarray(a), jnp.asarray(b), qj, qinv, r2)
    want = np.array([int(x) * int(y) % q for x, y in zip(a, b)], dtype=np.uint64)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_ntt_roundtrip(ctx):
    a = rand_poly()
    back = ctx.intt(ctx.ntt(jnp.asarray(a)))
    np.testing.assert_array_equal(np.asarray(back), a)


def test_exponent_map_first_principles(ctx):
    """Verify position j of NTT output = p(psi^{2 brv(j)+1}) on a monomial."""
    q = MODULI[0]
    psi = ctx.psi[0]
    a = np.zeros((1, N), dtype=np.uint64)
    a[0, 1] = 1  # p(X) = X  →  output[j] = psi^{e(j)}
    out = np.asarray(ctx.ntt(jnp.asarray(a)))[0]
    e = nttmod._ntt_exponent_map(LOG_N)
    want = np.array([pow(psi, int(k), q) for k in e], dtype=np.uint64)
    np.testing.assert_array_equal(out, want)


def test_convolution_theorem(ctx):
    """Pointwise NTT product == negacyclic convolution (big-int reference)."""
    q = MODULI[1]
    a = RNG.integers(0, q, size=N, dtype=np.uint64)
    b = RNG.integers(0, q, size=N, dtype=np.uint64)

    # big-int negacyclic convolution mod q
    want = np.zeros(N, dtype=object)
    ai = a.astype(object)
    bi = b.astype(object)
    full = np.convolve(ai, bi)
    want[: N] = full[:N]
    want[: N - 1] -= full[N:]
    want = np.mod(want, q).astype(np.uint64)

    idx = (1,)  # limb index of q in MODULI
    qj, qinv, r2 = ctx.q[1], ctx.qinv[1], ctx.r2[1]
    fa = ctx.ntt(jnp.asarray(a[None]).astype(jnp.uint64), idx)
    fb = ctx.ntt(jnp.asarray(b[None]).astype(jnp.uint64), idx)
    # generic standard×standard product
    prod = mm.mul_mod(fa[0], fb[0], qj, qinv, r2)
    got = np.asarray(ctx.intt(prod[None], idx))[0]
    np.testing.assert_array_equal(got, want)


def test_galois_ntt_vs_coeff(ctx):
    """Automorphism via NTT-domain permutation == coeff-domain signed gather."""
    a = rand_poly()
    for g in (5, pow(5, 7, 2 * N), 2 * N - 1, 3):
        perm = jnp.asarray(nttmod.galois_perm_ntt(LOG_N, g))
        via_ntt = ctx.intt(nttmod.apply_galois_ntt(ctx.ntt(jnp.asarray(a)), perm))
        src, flip = nttmod.galois_perm_coeff(LOG_N, g)
        via_coeff = nttmod.apply_galois_coeff(
            jnp.asarray(a), jnp.asarray(src), jnp.asarray(flip), ctx.q)
        np.testing.assert_array_equal(np.asarray(via_ntt), np.asarray(via_coeff))


def test_rot_to_galois():
    assert nttmod.rot_to_galois(0, LOG_N) == 1
    assert nttmod.rot_to_galois(1, LOG_N) == 5
    assert nttmod.rot_to_galois(2, LOG_N) == 25


def test_pallas_u32pair_montmul():
    """Round-2 kernel representation: u32-pair Montgomery multiply (pure
    and Pallas) == the u64 path."""
    from optimal_conv_tpu.core import pallas_mod as pm

    q = MODULI[0]
    qinv = mm.mont_qinv(q)
    a = RNG.integers(0, q, (4, 256), dtype=np.uint64)
    b = RNG.integers(0, q, (4, 256), dtype=np.uint64)
    alo, ahi = pm.split64(a)
    blo, bhi = pm.split64(b)
    want = np.asarray(mm.mont_mul(jnp.asarray(a), jnp.asarray(b),
                                  jnp.uint64(q), jnp.uint64(qinv)))
    lo, hi = pm.mont_mul_u32pair(
        jnp.asarray(alo), jnp.asarray(ahi), jnp.asarray(blo), jnp.asarray(bhi),
        jnp.uint32(q & 0xFFFFFFFF), jnp.uint32(q >> 32),
        jnp.uint32(qinv & 0xFFFFFFFF), jnp.uint32(qinv >> 32))
    np.testing.assert_array_equal(pm.join64(np.asarray(lo), np.asarray(hi)), want)
    plo, phi = pm.mont_mul_pallas(jnp.asarray(alo), jnp.asarray(ahi),
                                  jnp.asarray(blo), jnp.asarray(bhi), q, qinv)
    np.testing.assert_array_equal(pm.join64(np.asarray(plo), np.asarray(phi)),
                                  want)
