"""Scheme-layer tests: encode/encrypt/evaluate/decrypt roundtrips.

Covers the evaluator surface the reference consumes (SURVEY.md C8-C13):
coeff & slot encoding, sk-encryption, ct×pt / ct×ct, rescale, SetScale,
rotations (plain, hoisted), conjugation, monomial muls, AddConst.
"""

import numpy as np
import pytest

from optimal_conv_tpu.ckks.params import tiny_params
from optimal_conv_tpu.ckks.context import CkksContext
from optimal_conv_tpu.ckks import encoding

PARAMS = tiny_params(log_n=10, levels=5)
RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(PARAMS, seed=3)


def rand_vec(n=PARAMS.n, lo=-1.0, hi=1.0):
    return RNG.uniform(lo, hi, n)


# ---------------------------------------------------------------------------
# encoders
# ---------------------------------------------------------------------------

def test_slot_embedding_roundtrip():
    n = 64
    z = RNG.normal(size=n) + 1j * RNG.normal(size=n)
    c = encoding.slots_to_coeffs_np(z)
    assert c.dtype == np.float64
    back = encoding.coeffs_to_slots_np(c)
    np.testing.assert_allclose(back, z, atol=1e-12)


def test_slot_embedding_vs_bruteforce():
    n = 16
    c = RNG.normal(size=2 * n)
    z = encoding.coeffs_to_slots_np(c)
    w = np.exp(2j * np.pi / (4 * n))
    e = 1
    for t in range(n):
        want = sum(c[k] * w ** (k * e) for k in range(2 * n))
        assert abs(z[t] - want) < 1e-9
        e = e * 5 % (4 * n)


def test_coeff_encode_decrypt_roundtrip(ctx):
    v = rand_vec()
    pt = ctx.encoder.encode_coeffs(v, PARAMS.scale, PARAMS.max_level)
    ct = ctx.encrypt(pt)
    got = ctx.decrypt_decode_coeffs(ct)
    np.testing.assert_allclose(got, v, atol=1e-5)


def test_slot_encode_decrypt_roundtrip(ctx):
    z = RNG.normal(size=PARAMS.slots) + 1j * RNG.normal(size=PARAMS.slots)
    pt = ctx.encoder.encode_slots(z, PARAMS.scale, 2)
    ct = ctx.encrypt(pt)
    got = ctx.decrypt_decode_slots(ct)
    np.testing.assert_allclose(got, z, atol=1e-4)


# ---------------------------------------------------------------------------
# arithmetic
# ---------------------------------------------------------------------------

def enc_coeffs(ctx, v, level=PARAMS.max_level, scale=PARAMS.scale):
    return ctx.encrypt(ctx.encoder.encode_coeffs(v, scale, level))


def test_add_sub_neg(ctx):
    a, b = rand_vec(), rand_vec()
    ca, cb = enc_coeffs(ctx, a), enc_coeffs(ctx, b)
    np.testing.assert_allclose(ctx.decrypt_decode_coeffs(ctx.add(ca, cb)),
                               a + b, atol=1e-5)
    np.testing.assert_allclose(ctx.decrypt_decode_coeffs(ctx.sub(ca, cb)),
                               a - b, atol=1e-5)
    np.testing.assert_allclose(ctx.decrypt_decode_coeffs(ctx.neg(ca)),
                               -a, atol=1e-5)


def test_mul_plain_negacyclic(ctx):
    """ct × pt = negacyclic convolution of the coefficient vectors."""
    a, b = rand_vec(), np.zeros(PARAMS.n)
    b[:3] = [0.5, -1.0, 0.25]
    ca = enc_coeffs(ctx, a)
    pt = ctx.encoder.encode_coeffs(b, PARAMS.scale, PARAMS.max_level)
    out = ctx.rescale(ctx.mul_plain(ca, pt))
    full = np.convolve(a, b[:3])
    want = full[:PARAMS.n].copy()
    want[: len(full) - PARAMS.n] -= full[PARAMS.n:]
    np.testing.assert_allclose(ctx.decrypt_decode_coeffs(out), want, atol=1e-4)


def test_mul_ct_relin(ctx):
    z1 = RNG.uniform(-1, 1, PARAMS.slots)
    z2 = RNG.uniform(-1, 1, PARAMS.slots)
    c1 = ctx.encrypt(ctx.encoder.encode_slots(z1, PARAMS.scale, 3))
    c2 = ctx.encrypt(ctx.encoder.encode_slots(z2, PARAMS.scale, 3))
    prod = ctx.rescale(ctx.mul_ct(c1, c2))
    got = ctx.decrypt_decode_slots(prod)
    np.testing.assert_allclose(got.real, z1 * z2, atol=1e-3)


def test_rotate(ctx):
    z = RNG.uniform(-1, 1, PARAMS.slots)
    ct = ctx.encrypt(ctx.encoder.encode_slots(z, PARAMS.scale, 2))
    for k in (1, 5, -3, 17):
        got = ctx.decrypt_decode_slots(ctx.rotate(ct, k))
        np.testing.assert_allclose(got.real, np.roll(z, -k), atol=1e-4,
                                   err_msg=f"rot {k}")


def test_rotate_hoisted_matches_plain(ctx):
    z = RNG.uniform(-1, 1, PARAMS.slots)
    ct = ctx.encrypt(ctx.encoder.encode_slots(z, PARAMS.scale, 2))
    rots = [1, 2, 7, -4]
    outs = ctx.rotate_hoisted(ct, rots)
    for k in rots:
        got = ctx.decrypt_decode_slots(outs[k])
        np.testing.assert_allclose(got.real, np.roll(z, -k), atol=1e-4)


def test_conjugate(ctx):
    z = RNG.normal(size=PARAMS.slots) + 1j * RNG.normal(size=PARAMS.slots)
    ct = ctx.encrypt(ctx.encoder.encode_slots(z, PARAMS.scale, 2))
    got = ctx.decrypt_decode_slots(ctx.conjugate(ct))
    np.testing.assert_allclose(got, np.conj(z), atol=1e-4)


def test_mul_monomial_shifts_coeffs(ctx):
    a = rand_vec()
    ct = enc_coeffs(ctx, a)
    k = 37
    got = ctx.decrypt_decode_coeffs(ctx.mul_monomial(ct, k))
    want = np.concatenate([-a[PARAMS.n - k:], a[: PARAMS.n - k]])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mul_by_i(ctx):
    z = RNG.normal(size=PARAMS.slots) + 1j * RNG.normal(size=PARAMS.slots)
    ct = ctx.encrypt(ctx.encoder.encode_slots(z, PARAMS.scale, 2))
    np.testing.assert_allclose(ctx.decrypt_decode_slots(ctx.mul_by_i(ct)),
                               1j * z, atol=1e-4)
    np.testing.assert_allclose(ctx.decrypt_decode_slots(ctx.div_by_i(ct)),
                               -1j * z, atol=1e-4)


def test_set_scale_and_add_const(ctx):
    a = rand_vec()
    ct = enc_coeffs(ctx, a)
    target = PARAMS.scale * 1.75
    out = ctx.set_scale(ct, target)
    assert out.scale == target and out.level == ct.level - 1
    np.testing.assert_allclose(ctx.decrypt_decode_coeffs(out), a, atol=1e-4)
    out2 = ctx.add_const(out, 0.375)
    want = a.copy()
    want[0] += 0.375
    np.testing.assert_allclose(ctx.decrypt_decode_coeffs(out2), want, atol=1e-4)


def test_mul_by_pow2(ctx):
    a = rand_vec()
    ct = enc_coeffs(ctx, a)
    got = ctx.decrypt_decode_coeffs(ctx.mul_scalar_int(ct, 8))
    np.testing.assert_allclose(got, 8 * a, atol=1e-4)
