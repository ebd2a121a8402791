"""Split-bootstrapper tests: CtoS layout, EvalMod precision, StoC roundtrip.

Mirrors the reference's per-stage decrypt oracles (debugCtoS/debugStoC,
/root/reference/eval.go:610-722): CtoS must produce slots in the
bit-reversed coefficient order those oracles encode, and StoC must
invert it back to coefficient packing.
"""

import numpy as np
import pytest

from optimal_conv_tpu.ckks.params import mini_boot_params
from optimal_conv_tpu.ckks.context import CkksContext
from optimal_conv_tpu.ckks.bootstrap import SplitBootstrapper, mod_raise
from optimal_conv_tpu.ops.repack import reverse_bits

PARAMS = mini_boot_params(log_n=10)
RNG = np.random.default_rng(17)
N = PARAMS.n
SLOTS = PARAMS.slots
MSG_BITS = 8


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(PARAMS, seed=13)


def boot(ctx, ls):
    return SplitBootstrapper(ctx, log_sparse=ls, k_range=12.0,
                             sin_deg=31, double_angle=3)


def enc_level0(ctx, v, delta0):
    pt = ctx.encoder.encode_coeffs(v, delta0, 0)
    return ctx.encrypt(pt)


def test_mod_raise_preserves_message(ctx):
    v = RNG.uniform(-1, 1, N)
    delta0 = 2.0 ** (55 - MSG_BITS)
    ct = mod_raise(ctx, enc_level0(ctx, v, delta0))
    assert ct.level == PARAMS.max_level
    # decrypt at full level: message is v + (q0/Δ0)·I; check mod-q0 part
    cfs = ctx.decrypt_to_coeffs(ct)
    got = ctx.encoder.decode_coeffs(cfs[:1], delta0)
    np.testing.assert_allclose(got, v, atol=1e-4)


def test_full_bootstrap_roundtrip(ctx):
    """level-0 ct → CtoS (2 cts, brv slot layout) → StoC → coeff ct."""
    btp = boot(ctx, 0)
    v = RNG.uniform(-1, 1, N)
    ct = enc_level0(ctx, v, btp.delta0)
    up, low = btp.ctos(ct)
    zu = ctx.decrypt_decode_slots(up).real
    zl = ctx.decrypt_decode_slots(low).real
    br = np.array([reverse_bits(i, PARAMS.log_slots) for i in range(SLOTS)])
    np.testing.assert_allclose(zu, v[br], atol=2e-2)
    np.testing.assert_allclose(zl, v[br + SLOTS], atol=2e-2)

    out = btp.stoc(up, low)
    assert out.level >= 1
    got = ctx.decrypt_decode_coeffs(out)
    np.testing.assert_allclose(got, v, atol=3e-2)


def test_sparse_bootstrap_roundtrip(ctx):
    """stride-2 coeffs (log_sparse=1): one folded ct through the halves."""
    ls = 1
    btp = boot(ctx, ls)
    v = np.zeros(N)
    v[:: 1 << ls] = RNG.uniform(-1, 1, N >> ls)
    ct = enc_level0(ctx, v, btp.delta0)
    folded, none = btp.ctos(ct)
    assert none is None
    n_sub = SLOTS >> ls
    z = ctx.decrypt_decode_slots(folded).real
    cp = v[:: 1 << ls]                      # subring coeffs c'
    br = np.array([reverse_bits(i, PARAMS.log_slots - ls) for i in range(n_sub)])
    np.testing.assert_allclose(z[:n_sub], cp[br], atol=2e-2)
    np.testing.assert_allclose(z[n_sub: 2 * n_sub], cp[br + n_sub], atol=2e-2)

    out = btp.stoc(folded, None)
    got = ctx.decrypt_decode_coeffs(out)
    np.testing.assert_allclose(got, v, atol=3e-2)


def test_evalmod_poly_at_bettersine_grade():
    """C17: the production EvalMod composite (deg-63 cosine Chebyshev +
    2 double-angles, K=25, message ratio 2^-8) must approximate
    sin(2pi K y) with error BELOW the sine-linearization floor
    (~(2pi/256)^3/6/(2pi) = 3.9e-7) — i.e. the polynomial is not the
    precision limiter, matching Lattigo's bettersine/Cos1 configuration
    at the same depth (the fork's DefaultBootstrapParams[6]:
    SinDeg 63, SinRescal 2, MessageRatio 256, ArcSineDeg 0)."""
    K, r, deg = 25.0, 2, 63
    freq = 2 * np.pi * K / (1 << r)

    def g(y):
        return np.cos(freq * y - np.pi / 2 / (1 << r))

    cheb = np.polynomial.chebyshev.Chebyshev.interpolate(
        g, deg, domain=[-1.0, 1.0])
    eps = np.linspace(-2.0 ** -8, 2.0 ** -8, 201)
    poly_err = 0.0
    total_err = 0.0
    for i in range(-24, 25):
        c = cheb((i + eps) / K)
        for _ in range(r):
            c = 2 * c * c - 1
        poly_err = max(poly_err, np.max(np.abs(c - np.sin(2 * np.pi * eps))))
        total_err = max(total_err, np.max(np.abs(c / (2 * np.pi) - eps)))
    sine_floor = np.max(np.abs((2 * np.pi * eps) ** 3 / 6)) / (2 * np.pi)
    assert poly_err < sine_floor / 5, (poly_err, sine_floor)
    assert total_err < 1.2 * sine_floor, (total_err, sine_floor)


@pytest.mark.parametrize("ls", [0, 1, 2])
def test_plan_lt_shapes_matches_real_bootstrapper(ctx, ls):
    """plan_lt_shapes (host-only prewarm planning) must predict exactly
    the (level, n_babies, sel_len, identity) shapes the real
    bootstrapper's LinearTransforms jit at runtime."""
    from optimal_conv_tpu.ckks.bootstrap import plan_lt_shapes

    btp = boot(ctx, ls)
    real = set()
    for lt in btp.ctos_lt + btp.stoc_lt:
        nb = len(lt.babies)
        for _, sel, _ in lt.stacked:
            ident = len(sel) == nb and np.array_equal(sel, np.arange(nb))
            real.add((lt.level, nb, len(sel), bool(ident)))
    planned = set(plan_lt_shapes(PARAMS, ls))
    assert planned == real, (sorted(planned), sorted(real))


@pytest.mark.slow_e2e
def test_arcsine_beats_sine_floor():
    """The arcsine option (Lattigo ArcSineDeg; the fork pins 0): at
    msg_ratio_bits=5 the payload/q0 ratio is 8x the fork's 2^-8 floor
    and the sin(x)=x linearization error (~x^3/6) dominates; an odd
    asin series after the double-angle recovers the precision.  Uses a
    chain with 4 extra evalmod levels (mini_boot_params n_mod=13)."""
    from optimal_conv_tpu.ckks.params import mini_boot_params
    from optimal_conv_tpu.ckks.context import CkksContext
    from optimal_conv_tpu.ckks.bootstrap import SplitBootstrapper

    p = mini_boot_params(log_n=10, n_relu=2, n_mod=13)
    ctx = CkksContext(p, seed=31)
    rng = np.random.default_rng(5)
    v = rng.uniform(-1, 1, p.n)
    errs = {}
    for deg in (0, 7):
        btp = SplitBootstrapper(ctx, log_sparse=0, k_range=12.0, sin_deg=31,
                                double_angle=3, msg_ratio_bits=5,
                                arcsine_deg=deg)
        ct = ctx.encrypt(ctx.encoder.encode_coeffs(v, btp.delta0, 0))
        up, low = btp.ctos(ct)
        out = btp.stoc(up, low)
        errs[deg] = float(np.max(np.abs(ctx.decrypt_decode_coeffs(out) - v)))
    # deg-7 asin of sin(t) with |t| ≤ 2π·2^-5 ≈ 0.2: linearization error
    # ~t³/6 ≈ 1.2e-3 removed; require ≥ 8x improvement and the sine
    # floor actually visible at deg 0
    assert errs[0] > 4e-4, errs
    assert errs[7] < errs[0] / 8, errs
