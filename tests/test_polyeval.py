"""Tests for homomorphic polynomial evaluation and the minimax ReLU."""

import numpy as np
import pytest

from optimal_conv_tpu.ckks.params import CkksParams
from optimal_conv_tpu.ckks.context import CkksContext
from optimal_conv_tpu.ckks.polyeval import evaluate_poly, evaluate_chebyshev
from optimal_conv_tpu.ops.relu import (eval_relu, sign_composite_np, relu_np,
                                       SIGN_POLY_1)

RNG = np.random.default_rng(11)

# deep-ish chain for composite evaluation tests.  NOTE: the evaluation
# region's primes must match the working scale (2^30) or power scales
# decay by (scale/q) per level — the same constraint that gives the
# reference its dedicated ReLUEvalModuli (SURVEY.md C17).
PARAMS = CkksParams(log_n=9, logq=(50,) + (30,) * 16, logp=(55, 55),
                    log_scale=30, h=64)


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(PARAMS, seed=5)


def enc_slots(ctx, z, level=PARAMS.max_level):
    return ctx.encrypt(ctx.encoder.encode_slots(z, PARAMS.scale, level))


def test_eval_poly_deg7(ctx):
    x = RNG.uniform(-1, 1, PARAMS.slots)
    ct = enc_slots(ctx, x)
    out = ctx.decrypt_decode_slots(evaluate_poly(ctx, ct, SIGN_POLY_1))
    want = np.polyval(SIGN_POLY_1[::-1], x)
    np.testing.assert_allclose(out.real, want, atol=2e-3)


def test_eval_poly_general_deg13(ctx):
    coeffs = RNG.uniform(-1, 1, 14)
    x = RNG.uniform(-1, 1, PARAMS.slots) * 0.9
    ct = enc_slots(ctx, x)
    out = ctx.decrypt_decode_slots(evaluate_poly(ctx, ct, coeffs))
    want = np.polyval(coeffs[::-1], x)
    np.testing.assert_allclose(out.real, want, atol=2e-3)


def test_sign_composite_plain_is_signlike():
    x = np.linspace(-1, 1, 1001)
    x = x[np.abs(x) > 0.02]
    s = sign_composite_np(x)
    assert np.all(np.abs(s - np.sign(x)) < 0.01)


@pytest.mark.slow_e2e
def test_eval_relu(ctx):
    x = RNG.uniform(-1, 1, PARAMS.slots)
    ct = enc_slots(ctx, x)
    out = ctx.decrypt_decode_slots(eval_relu(ctx, ct))
    want = relu_np(x)
    assert np.max(np.abs(out.real - want)) < 2e-2
    # interior points (away from 0) should be precise
    mask = np.abs(x) > 0.05
    np.testing.assert_allclose(out.real[mask], want[mask], atol=5e-3)


def test_eval_chebyshev_sine(ctx):
    """Chebyshev approx of sin over [-K, K] — the EvalMod core."""
    K = 12.0
    deg = 40
    f = lambda t: np.sin(2 * np.pi * t / 8.0)
    cheb = np.polynomial.chebyshev.Chebyshev.interpolate(f, deg, domain=[-K, K])
    x = RNG.uniform(-K, K, PARAMS.slots)
    ct = enc_slots(ctx, x / K * 0 + x, level=PARAMS.max_level)
    # encode x directly; evaluate over [a,b] = [-K, K]
    out = ctx.decrypt_decode_slots(
        evaluate_chebyshev(ctx, ct, cheb.coef, -K, K))
    np.testing.assert_allclose(out.real, f(x), atol=5e-3)


# ---------------------------------------------------------------------------
# tight (depth-optimal) evaluation: 45-bit primes at scale 2^30 give leaf
# constants cs ≈ 2^15 so each composite consumes depth(deg) levels exactly
# ---------------------------------------------------------------------------

PARAMS_TIGHT = CkksParams(log_n=9, logq=(50,) + (45,) * 12, logp=(55, 55),
                          log_scale=30, h=64)


@pytest.fixture(scope="module")
def ctx_t():
    return CkksContext(PARAMS_TIGHT, seed=6)


def test_eval_poly_deg7_tight_depth3(ctx_t):
    x = RNG.uniform(-1, 1, PARAMS_TIGHT.slots)
    lvl = PARAMS_TIGHT.max_level
    ct = ctx_t.encrypt(ctx_t.encoder.encode_slots(x, PARAMS_TIGHT.scale, lvl))
    out_ct = evaluate_poly(ctx_t, ct, SIGN_POLY_1, tight=True)
    assert out_ct.level == lvl - 3, out_ct.level
    out = ctx_t.decrypt_decode_slots(out_ct)
    want = np.polyval(SIGN_POLY_1[::-1], x)
    np.testing.assert_allclose(out.real, want, atol=5e-3)


def test_eval_relu_tight_11_levels(ctx_t):
    x = RNG.uniform(-1, 1, PARAMS_TIGHT.slots)
    lvl = PARAMS_TIGHT.max_level
    ct = ctx_t.encrypt(ctx_t.encoder.encode_slots(x, PARAMS_TIGHT.scale, lvl))
    out_ct = eval_relu(ctx_t, ct)
    assert out_ct.level == lvl - 11, out_ct.level   # 3 + 3 + 4 + 1
    assert abs(np.log2(out_ct.scale) - PARAMS_TIGHT.log_scale) < 1.01
    out = ctx_t.decrypt_decode_slots(out_ct)
    want = relu_np(x)
    assert np.max(np.abs(out.real - want)) < 2e-2
    mask = np.abs(x) > 0.05
    np.testing.assert_allclose(out.real[mask], want[mask], atol=5e-3)
