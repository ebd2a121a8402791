"""Production parameter-chain validation (boot_params: the reference-
envelope chain — h=192, q0=60b, K=25, deg-63 cosine EvalMod, r=2).

Same layout as the logN=16 deployment chain, exercised at logN=12 so it
runs in CI.  Round-trip precision here is ~1e-4 (vs ~2e-2 on the mini
2^25-scale chain) — this is the accuracy the full-scale model runs at.
"""

import numpy as np
import pytest

from optimal_conv_tpu.ckks.params import boot_params
from optimal_conv_tpu.ckks.context import CkksContext
from optimal_conv_tpu.ckks.bootstrap import SplitBootstrapper
from optimal_conv_tpu.ops.repack import reverse_bits

PARAMS = boot_params(12)
RNG = np.random.default_rng(71)


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(PARAMS, seed=3)


def test_layout_level_walk():
    lay = PARAMS.boot_layout
    assert lay["ctos"][1] - 1 == PARAMS.max_level
    # relu region primes are 30b and match the scale
    lo, hi = lay["relu"]
    assert all(PARAMS.logq[i] == PARAMS.log_scale for i in range(lo, hi))


@pytest.mark.slow_e2e
def test_full_roundtrip_production(ctx):
    btp = SplitBootstrapper(ctx, log_sparse=0)
    v = RNG.uniform(-1, 1, PARAMS.n)
    ct = ctx.encrypt(ctx.encoder.encode_coeffs(v, btp.delta0, 0))
    up, low = btp.ctos(ct)
    br = np.array([reverse_bits(i, PARAMS.log_slots)
                   for i in range(PARAMS.slots)])
    zu = ctx.decrypt_decode_slots(up).real
    np.testing.assert_allclose(zu, v[br], atol=1e-3)
    out = btp.stoc(up, low)
    assert out.level == 1
    np.testing.assert_allclose(ctx.decrypt_decode_coeffs(out), v, atol=1e-3)


def test_sparse_roundtrip_production(ctx):
    ls = 2
    btp = SplitBootstrapper(ctx, log_sparse=ls)
    v = np.zeros(PARAMS.n)
    v[:: 1 << ls] = RNG.uniform(-1, 1, PARAMS.n >> ls)
    ct = ctx.encrypt(ctx.encoder.encode_coeffs(v, btp.delta0, 0))
    folded, none = btp.ctos(ct)
    assert none is None
    out = btp.stoc(folded, None)
    np.testing.assert_allclose(ctx.decrypt_decode_coeffs(out), v, atol=1e-3)
