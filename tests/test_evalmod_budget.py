"""EvalMod approximation error budget, pinned numerically.

VERDICT r3 weak #6: the cosine seed is a plain Chebyshev interpolation
(np.polynomial), not the fork's bettersine (Han–Ki) — a silent
precision regression here would only surface as end-model accuracy
loss.  This test pins the budget so a regression fails loudly:

  * the deg-63 full-domain Chebyshev composite (after the double
    angles) must stay ≥10 bits BELOW the sine floor at the production
    config — i.e. the approximation error cannot be the precision
    bottleneck, exactly as for the fork's bettersine (ArcSineDeg 0,
    same floor);
  * the interval-restricted Lawson minimax fit must deliver the
    measured ~2^-33 headroom used by the arcsine option.

All host-side numpy — no ciphertexts (the encrypted path is covered by
test_bootstrap's roundtrip at these grades).
"""

import numpy as np

from optimal_conv_tpu.ckks.bootstrap import fit_cos_poly

K, R, DEG = 25.0, 2, 63
MSG_BITS = 8


def _valid_grid(payload_bits=1, m=401):
    eps = 2.0 ** (payload_bits - MSG_BITS) / K
    return np.concatenate([np.linspace(i / K - eps, i / K + eps, m)
                           for i in range(-int(K) + 1, int(K))])


def _composite_err(coef, u):
    c = np.polynomial.chebyshev.chebval(u, coef)
    for _ in range(R):
        c = 2 * c * c - 1
    return float(np.max(np.abs(c - np.sin(2 * np.pi * K * u))))


def test_cheby_seed_sits_below_sine_floor():
    u = _valid_grid()
    err = _composite_err(fit_cos_poly(DEG, K, R, "cheby", MSG_BITS), u)
    # measured 2^-25.4; the sine floor (θ−sinθ in payload units at
    # payload ≤ Δ0) is 2^-13.3 — demand ≥10 bits of margin
    assert err < 2.0 ** -23.3, f"composite approx err 2^{np.log2(err):.1f}"
    theta = 2 * np.pi * 2.0 ** -MSG_BITS
    floor = abs(theta - np.sin(theta)) / (2 * np.pi * 2.0 ** -MSG_BITS)
    assert err < floor * 2.0 ** -10


def test_minimax_seed_gives_arcsine_headroom():
    u = _valid_grid()
    err = _composite_err(fit_cos_poly(DEG, K, R, "minimax", MSG_BITS), u)
    # measured 2^-33.6 (Lawson on the interval union)
    assert err < 2.0 ** -31, f"minimax composite err 2^{np.log2(err):.1f}"


def test_degree_63_is_tight():
    """Lower degrees fail even with the interval fit — the fork's
    deg-63 choice is necessary, not conservative (measured: deg 47 →
    2^-8.7, deg 31 diverges after the double angles)."""
    u = _valid_grid(m=101)
    err47 = _composite_err(fit_cos_poly(47, K, R, "minimax", MSG_BITS), u)
    assert err47 > 2.0 ** -12        # nowhere near the deg-63 budget
