"""Baseline (prior-art) slot-domain conv + FC vs the plain oracle."""

import numpy as np
import pytest

from optimal_conv_tpu.ckks.params import CkksParams
from optimal_conv_tpu.ckks.context import CkksContext
from optimal_conv_tpu.ops import baseline as bl
from optimal_conv_tpu.ops.conv import conv2d_same_np

RNG = np.random.default_rng(55)
PARAMS = CkksParams(log_n=11, logq=(50, 40, 40), logp=(55,), log_scale=30,
                    h=64)


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(PARAMS, seed=23)


def test_conv_bn_bl(ctx):
    in_wid, ker_wid, ch = 8, 3, 4
    pad = 1
    raw = in_wid - pad
    img = RNG.uniform(-1, 1, (raw, raw, ch))
    ker = RNG.uniform(-1, 1, (ker_wid, ker_wid, ch, ch)) / 4
    bn_a = RNG.uniform(0.8, 1.2, ch)
    bn_b = RNG.uniform(-0.3, 0.3, ch)

    padded = np.zeros((in_wid, in_wid, ch))
    padded[:raw, :raw] = img
    slots_in = bl.reshape_input_bl(padded.ravel(), in_wid)
    ct = ctx.encrypt(ctx.encoder.encode_slots(
        slots_in.astype(np.complex128), PARAMS.scale, PARAMS.max_level))

    out = bl.eval_conv_bn_bl(ctx, ct, ker.ravel(), bn_a, bn_b, in_wid,
                             ker_wid, ch, ch, pad=pad)
    z = ctx.decrypt_decode_slots(ctx.rescale(out)).real

    want = conv2d_same_np(img, ker) * bn_a + bn_b
    got = np.stack([z[b * in_wid * in_wid:(b + 1) * in_wid * in_wid]
                    .reshape(in_wid, in_wid)[:raw, :raw] for b in range(ch)],
                   axis=-1)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_rmfc_bl(ctx):
    """Rotate-sum reduce-mean + diagonal-method FC."""
    ch, out_num, spatial = 8, 4, 16
    blk = PARAMS.slots // ch
    feat = RNG.uniform(-1, 1, (ch, spatial))
    fc_w = RNG.uniform(-1, 1, (ch, out_num))
    fc_b = RNG.uniform(-1, 1, out_num)

    slots = np.zeros(PARAMS.slots, dtype=np.complex128)
    for b in range(ch):
        slots[b * blk: b * blk + spatial] = feat[b]
    ct = ctx.encrypt(ctx.encoder.encode_slots(slots, PARAMS.scale,
                                              PARAMS.max_level))
    out = bl.eval_rmfc_bl(ctx, ct, fc_w, fc_b, ch, spatial)
    z = ctx.decrypt_decode_slots(ctx.rescale(out)).real
    got = z[np.arange(out_num) * blk]
    want = feat.mean(axis=1) @ fc_w + fc_b
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_conv_bl_boot_relu():
    """R26: imaginary-part packing — two slot cts share ONE bootstrap,
    then unfold + minimax ReLU (reference test_BL.go:113-168)."""
    from optimal_conv_tpu.ckks.params import mini_boot_params
    from optimal_conv_tpu.ckks.bootstrap import SplitBootstrapper
    from optimal_conv_tpu.ops.relu import relu_np

    P = mini_boot_params(log_n=10, n_relu=14)
    bctx = CkksContext(P, seed=31)
    # StoC right below EvalMod so the refreshed cts keep the ReLU depth
    stoc_top = P.boot_layout["relu"][1] - 1
    btp = SplitBootstrapper(bctx, log_sparse=0, k_range=12.0, sin_deg=31,
                            double_angle=3, stoc_level=stoc_top)
    rng = np.random.default_rng(61)
    pow_ = 4.0
    z1 = rng.uniform(-8, 8, P.slots)
    z2 = rng.uniform(-8, 8, P.slots)
    c1 = bctx.encrypt(bctx.encoder.encode_slots(z1, P.scale, P.max_level))
    c2 = bctx.encrypt(bctx.encoder.encode_slots(z2, P.scale, P.max_level))
    r1, r2 = bl.eval_conv_bl_boot_relu(bctx, btp, c1, c2, 0.0, pow_)
    got1 = bctx.decrypt_decode_slots(r1).real
    got2 = bctx.decrypt_decode_slots(r2).real
    tol = 0.4  # mini chain precision at range 2^4
    assert np.max(np.abs(got1 - relu_np(z1))) < tol, np.max(np.abs(got1 - relu_np(z1)))
    assert np.max(np.abs(got2 - relu_np(z2))) < tol
