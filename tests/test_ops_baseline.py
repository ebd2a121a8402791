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


def test_conv_bl_split_and_postprocess(ctx):
    """The BL driver's 2-ct × 2×2 block conv + post_trim_BL/post_process_BL
    (reference test_BL.go:59-110, main.go:1073-1102)."""
    in_wid, ker_wid, ch = 8, 3, 4
    pad = 1
    raw = in_wid - pad
    hb = ch // 2
    img = RNG.uniform(-1, 1, (raw, raw, ch))
    ker = RNG.uniform(-1, 1, (ker_wid, ker_wid, ch, ch)) / 4
    bn_a = RNG.uniform(0.8, 1.2, ch)
    bn_b = RNG.uniform(-0.3, 0.3, ch)

    cts = []
    for half in range(2):
        padded = np.zeros((in_wid, in_wid, hb))
        padded[:raw, :raw] = img[..., half * hb:(half + 1) * hb]
        slots_in = bl.reshape_input_bl(padded.ravel(), in_wid)
        cts.append(ctx.encrypt(ctx.encoder.encode_slots(
            slots_in.astype(np.complex128), PARAMS.scale, PARAMS.max_level)))

    res = bl.conv_bl_split(ctx, cts[0], cts[1], ker.ravel(), bn_a, bn_b,
                           in_wid, ker_wid, ch, pad)
    v1 = ctx.decrypt_decode_slots(ctx.rescale(res[0]))[: hb * in_wid * in_wid]
    v2 = ctx.decrypt_decode_slots(ctx.rescale(res[1]))[: hb * in_wid * in_wid]
    got = np.concatenate([bl.post_trim_bl(v1, raw, in_wid),
                          bl.post_trim_bl(v2, raw, in_wid)])
    got = bl.post_process_bl(got, raw)
    want = (conv2d_same_np(img, ker) * bn_a + bn_b).ravel()
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_rmfc_bl_img(ctx):
    """ImageNet-tail reduce-mean+FC: 64-slot channel blocks, sum-64
    ladder, diagonal method (evalRMFC_BL_img, eval.go:187-218)."""
    in_batch, out_num, raw = 16, 8, 7
    blk = 64
    assert in_batch * blk <= PARAMS.slots
    feat = RNG.uniform(-1, 1, (in_batch, raw * raw))
    fc_w = RNG.uniform(-1, 1, (in_batch, out_num))

    slots = np.zeros(PARAMS.slots, dtype=np.complex128)
    for b in range(in_batch):
        spa = np.zeros((8, 8))
        spa[:raw, :raw] = feat[b].reshape(raw, raw)
        slots[b * blk:(b + 1) * blk] = spa.ravel()
    ct = ctx.encrypt(ctx.encoder.encode_slots(slots, PARAMS.scale,
                                              PARAMS.max_level))
    out = bl.eval_rmfc_bl_img(ctx, ct, fc_w.ravel(), in_batch, out_num, raw)
    z = ctx.decrypt_decode_slots(ctx.rescale(out)).real
    got = z[np.arange(out_num) * blk]
    want = feat.mean(axis=1) @ fc_w
    np.testing.assert_allclose(got, want, atol=2e-3)
