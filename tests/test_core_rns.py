"""Tests for RNS fast basis extension (core of key-switching/mod-down)."""

import numpy as np
import jax.numpy as jnp

from optimal_conv_tpu.core import modmath as mm
from optimal_conv_tpu.core import rns

LOG_N = 6
N = 1 << LOG_N
RNG = np.random.default_rng(1)


def test_extend_exact_representative():
    """Extended residues represent x + u·Q_src for a consistent small u ≥ 0."""
    src = mm.gen_ntt_primes(LOG_N, [40, 41])
    dst = mm.gen_ntt_primes(LOG_N, [55, 54, 30])
    big_q = src[0] * src[1]

    # big_q exceeds int64: sample via two draws
    lo = RNG.integers(0, 1 << 41, size=N).astype(object)
    hi = RNG.integers(0, big_q >> 41, size=N).astype(object)
    xs = (hi << 41) + lo
    x_res = np.stack([(xs % q).astype(np.uint64) for q in src])
    ext = rns.BasisExtender(src, dst)
    out = np.asarray(ext.extend(jnp.asarray(x_res)))

    # reconstruct candidate integers x + u*Q for u in {0, 1, 2} and check
    # each target limb matches one consistent u per coefficient
    ok = np.zeros(N, dtype=bool)
    for u in range(len(src) + 1):
        cand = xs + u * big_q
        match = np.ones(N, dtype=bool)
        for i, r in enumerate(dst):
            match &= out[i] == (cand % r).astype(np.uint64)
        ok |= match
    assert ok.all(), f"{(~ok).sum()} coefficients inconsistent"


def test_extend_small_values_exact():
    """For x < q_j (e.g. mod-up from level 0) extension must be exact."""
    src = mm.gen_ntt_primes(LOG_N, [55])
    dst = mm.gen_ntt_primes(LOG_N, [54, 45, 30])
    xs = RNG.integers(0, src[0], size=N, dtype=np.uint64)
    ext = rns.BasisExtender(src, dst)
    out = np.asarray(ext.extend(jnp.asarray(xs[None])))
    for i, r in enumerate(dst):
        np.testing.assert_array_equal(out[i], xs % np.uint64(r))


def test_reduce_u64():
    q = mm.gen_ntt_primes(LOG_N, [45])[0]
    t = RNG.integers(0, 1 << 62, size=N, dtype=np.uint64)
    got = rns.reduce_u64(jnp.asarray(t), jnp.uint64(q),
                         jnp.uint64(mm.mont_qinv(q)), jnp.uint64((1 << 64) % q))
    np.testing.assert_array_equal(np.asarray(got), t % np.uint64(q))


def test_native_crt_decoder_matches_python():
    """C++ Garner CRT decoder == Python big-int path (ckks decode hot path)."""
    from optimal_conv_tpu import native
    mods = mm.gen_ntt_primes(LOG_N, [55, 54, 45, 40, 30])
    ints = RNG.integers(-2**60, 2**60, 128).astype(object)
    res = mm.centered_to_residues(np.array(ints, dtype=object), mods)
    fast = native.crt_decode_centered(res, mods, 2.0**25)
    if fast is None:
        import pytest
        pytest.skip("no C++ toolchain")
    want = np.array([float(x) for x in mm.residues_to_centered(res, mods)])
    np.testing.assert_allclose(fast, want / 2.0**25, rtol=1e-12)
