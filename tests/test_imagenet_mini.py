"""Encrypted ImageNet tail (miniaturized) vs the plain mirror.

The reference reaches ``testImagenet_sparse`` only by editing main()
(/root/reference/test.go:1402-1607): block 1 at FULL pack on the
16-grid, the block transition as a dual StrConv_sparse_full (odd half
interleaved by X^norm), block 2 half-sparse on the 8-grid, identity-FC
reduce-mean readout.  Miniaturized to logN=10 (4 -> 8 channels) with
num_blc (1, 1).
"""

import numpy as np
import pytest

from optimal_conv_tpu.ckks.params import mini_boot_params
from optimal_conv_tpu.ckks.context import CkksContext
from optimal_conv_tpu.models.imagenet import ImagenetTailRunner
from optimal_conv_tpu.models.plain import conv_bn_relu_plain

PARAMS = mini_boot_params(log_n=10, n_relu=14)


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(PARAMS, seed=23)


@pytest.mark.slow_e2e
def test_imagenet_tail_mini(ctx):
    runner = ImagenetTailRunner(
        ctx, ker_wid=3, num_blc=(1, 1),
        boot_kwargs=dict(k_range=12.0, sin_deg=31, double_angle=3))
    b0, b1 = runner.real_batch           # 4, 8 at logN=10
    rng = np.random.default_rng(11)
    x = rng.uniform(-0.8, 0.8, (14, 14, b0))
    convs = [rng.uniform(-1, 1, (3, 3, b0, b0)) / 5.0,
             rng.uniform(-1, 1, (3, 3, b0, b1)) / 5.0,
             rng.uniform(-1, 1, (3, 3, b1, b1)) / 5.0]
    bn_a = [rng.uniform(0.8, 1.2, k.shape[-1]) for k in convs]
    bn_b = [rng.uniform(-0.2, 0.2, k.shape[-1]) for k in convs]

    cfs = runner.infer_features(x, convs, bn_a, bn_b,
                                init_pow=4.0, mid_pow=4.0)

    # plain mirror: SAME convs; stride-2 samples odd positions
    y = conv_bn_relu_plain(x, convs[0], bn_a[0], bn_b[0])
    y = conv_bn_relu_plain(y, convs[1], bn_a[1], bn_b[1], stride=2)
    y = y[:7, :7]
    y = conv_bn_relu_plain(y, convs[2], bn_a[2], bn_b[2])
    feat = y.mean(axis=(0, 1))

    # readout: identity-FC conv output at the center position, channel
    # stride = norm[1] (models/resnet._fc_conv layout)
    mb = PARAMS.n // 64
    kw = 7
    ctr = (kw // 2) * 8 * mb + (kw // 2) * mb
    got = cfs[ctr: ctr + runner.norm[1] * b1: runner.norm[1]]

    err = np.max(np.abs(got - feat))
    assert err < 0.1, f"feature err {err}: {got} vs {feat}"
    assert np.max(np.abs(feat)) > 0.02


def test_imagenet_tail_logits_mini(ctx):
    """The FC-1000 head (miniaturized to 12 logits > b1=8 so the
    out-batch exceeds the in-batch like 1000 > 512 at full scale):
    RMFC conv with in_norm=2 (sparse block-2 layout) and output
    stride 1, vs the plain reduce-mean+FC mirror."""
    runner = ImagenetTailRunner(
        ctx, ker_wid=3, num_blc=(1, 1),
        boot_kwargs=dict(k_range=12.0, sin_deg=31, double_angle=3))
    b0, b1 = runner.real_batch
    rng = np.random.default_rng(17)
    x = rng.uniform(-0.8, 0.8, (14, 14, b0))
    convs = [rng.uniform(-1, 1, (3, 3, b0, b0)) / 5.0,
             rng.uniform(-1, 1, (3, 3, b0, b1)) / 5.0,
             rng.uniform(-1, 1, (3, 3, b1, b1)) / 5.0]
    bn_a = [rng.uniform(0.8, 1.2, k.shape[-1]) for k in convs]
    bn_b = [rng.uniform(-0.2, 0.2, k.shape[-1]) for k in convs]
    n_out = 12
    fc_w = rng.normal(0, 1.0, (b1, n_out))
    fc_b = rng.normal(0, 0.3, n_out)

    logits = runner.infer_logits(x, convs, bn_a, bn_b, fc_w, fc_b,
                                 init_pow=4.0, mid_pow=4.0)

    y = conv_bn_relu_plain(x, convs[0], bn_a[0], bn_b[0])
    y = conv_bn_relu_plain(y, convs[1], bn_a[1], bn_b[1], stride=2)
    y = y[:7, :7]
    y = conv_bn_relu_plain(y, convs[2], bn_a[2], bn_b[2])
    plain = y.mean(axis=(0, 1)) @ fc_w + fc_b

    assert logits.shape == plain.shape
    err = np.max(np.abs(logits - plain))
    assert err < 0.2, f"logits err {err}: {logits} vs {plain}"
    assert np.argmax(logits) == np.argmax(plain), (logits, plain)


def test_imagenet_final_fast_logits_mini(ctx):
    from optimal_conv_tpu.models.imagenet import ImagenetFinalFastRunner

    runner = ImagenetFinalFastRunner(
        ctx, ker_wid=3, num_blc=(1, 1),
        boot_kwargs=dict(k_range=12.0, sin_deg=31, double_angle=3))
    b0, b1 = runner.real_batch
    rng = np.random.default_rng(19)
    x = rng.uniform(-0.8, 0.8, (14, 14, b0))
    convs = [rng.uniform(-1, 1, (3, 3, b0, b0)) / 5.0,
             rng.uniform(-1, 1, (3, 3, b0, b1)) / 5.0,
             rng.uniform(-1, 1, (3, 3, b1, b1)) / 5.0]
    bn_a = [rng.uniform(0.8, 1.2, k.shape[-1]) for k in convs]
    bn_b = [rng.uniform(-0.2, 0.2, k.shape[-1]) for k in convs]
    n_out = 12
    fc_w = rng.normal(0, 1.0, (b1, n_out))
    fc_b = rng.normal(0, 0.3, n_out)

    logits = runner.infer_logits(x, convs, bn_a, bn_b, fc_w, fc_b,
                                 init_pow=4.0, mid_pow=4.0)

    y = conv_bn_relu_plain(x, convs[0], bn_a[0], bn_b[0])
    y = conv_bn_relu_plain(y, convs[1], bn_a[1], bn_b[1], stride=2)
    y = y[:7, :7]
    y = conv_bn_relu_plain(y, convs[2], bn_a[2], bn_b[2])
    plain = y.mean(axis=(0, 1)) @ fc_w + fc_b

    assert logits.shape == plain.shape
    err = np.max(np.abs(logits - plain))
    assert err < 0.2, f"logits err {err}: {logits} vs {plain}"
    assert np.argmax(logits) == np.argmax(plain), (logits, plain)


def test_imagenet_final_fast_mini(ctx):
    """The Imagenet_final_fast regime (test.go:1209-1400): both blocks
    at full pack, transition = two plain StrConvs at pack_pos 0/1 with
    single-stage comprs_full repack (kp = 2·kp_wids[1]), summed."""
    from optimal_conv_tpu.models.imagenet import ImagenetFinalFastRunner

    runner = ImagenetFinalFastRunner(
        ctx, ker_wid=3, num_blc=(1, 1),
        boot_kwargs=dict(k_range=12.0, sin_deg=31, double_angle=3))
    b0, b1 = runner.real_batch           # 4, 8 at logN=10
    rng = np.random.default_rng(13)
    x = rng.uniform(-0.8, 0.8, (14, 14, b0))
    convs = [rng.uniform(-1, 1, (3, 3, b0, b0)) / 5.0,
             rng.uniform(-1, 1, (3, 3, b0, b1)) / 5.0,
             rng.uniform(-1, 1, (3, 3, b1, b1)) / 5.0]
    bn_a = [rng.uniform(0.8, 1.2, k.shape[-1]) for k in convs]
    bn_b = [rng.uniform(-0.2, 0.2, k.shape[-1]) for k in convs]

    cfs = runner.infer_features(x, convs, bn_a, bn_b,
                                init_pow=4.0, mid_pow=4.0)

    y = conv_bn_relu_plain(x, convs[0], bn_a[0], bn_b[0])
    y = conv_bn_relu_plain(y, convs[1], bn_a[1], bn_b[1], stride=2)
    y = y[:7, :7]
    y = conv_bn_relu_plain(y, convs[2], bn_a[2], bn_b[2])
    feat = y.mean(axis=(0, 1))

    mb = PARAMS.n // 64
    kw = 7
    ctr = (kw // 2) * 8 * mb + (kw // 2) * mb
    got = cfs[ctr: ctr + b1]

    err = np.max(np.abs(got - feat))
    assert err < 0.1, f"feature err {err}: {got} vs {feat}"
    assert np.max(np.abs(feat)) > 0.02
