"""End-to-end encrypted ResNet, FAST regime, wide2/wide3 (miniaturized).

Mirrors ``testResNet_crop_fast_wide_in`` (/root/reference/test.go:914-1207)
with the ``Resnet_crop_fast_wide2/3`` context maps (main.go:264-345):
block 1 = plain full-pack Conv on the in_wids[0] grid; blc1→2 =
StrConv_odd with gen_comprs_fast(kp = 2·raw[1]) maps (wide2: one conv
over input-interleaved kernels at norm[0]/2; wide3: even/odd out-channel
halves at pack_pos 0/2, summed); blocks 2/3 = Conv_inside at steps
(1, 2) on the in_wids[1] grid; blc2→3 = StrConv_inside.

The plain oracle is the same plain_forward — all packings compute the
same network function.  Miniaturized to logN=10: the reference ratios
real_batch/max_batch and norm (wide2 (2,4,2) / wide3 (1,2,1)) are kept;
in_ch=2 for wide2 because 3 input channels at stride norm[0]=2 exceed
max_batch[0]=4 at this scale.
"""

import numpy as np
import pytest

from optimal_conv_tpu.ckks.params import mini_boot_params
from optimal_conv_tpu.ckks.context import CkksContext
from optimal_conv_tpu.models.plain import random_weights, plain_forward
from optimal_conv_tpu.models.resnet import ResNetConfig, WideFastResNetRunner

PARAMS = mini_boot_params(log_n=10, n_relu=14)


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(PARAMS, seed=19)


@pytest.mark.slow_e2e
def test_resnet8_wide2_fast_mini_end_to_end(ctx):
    cfg = ResNetConfig(ker_wid=3, depth=8, in_wids=(16, 8, 4),
                       real_batch=(2, 4, 8), wide=2, init_batch=1, fc_out=4,
                       init_pow=4.0, mid_pow=4.0, final_pow=4.0)
    runner = WideFastResNetRunner(
        ctx, cfg,
        boot_kwargs=dict(k_range=12.0, sin_deg=31, double_angle=3))
    w = random_weights(3, 8, cfg.real_batch, fc_out=4, in_ch=2, seed=5,
                       scale=0.7, init_batch=cfg.init_batch)
    w.fc_w = w.fc_w * 6.0
    w.fc_b = w.fc_b * 2.0
    rng = np.random.default_rng(7)
    raw0 = cfg.raw_in_wids[0]
    image = rng.uniform(-1, 1, (raw0, raw0, 2))

    logits = runner.infer(image, w)
    plain = plain_forward(w, image, 8, cfg.raw_in_wids)

    assert logits.shape == plain.shape
    err = np.max(np.abs(logits - plain))
    assert err < 0.15, f"logits err {err}: enc {logits} vs plain {plain}"
    assert np.argmax(logits) == np.argmax(plain), (logits, plain)


def test_resnet8_wide3_fast_mini_end_to_end(ctx):
    cfg = ResNetConfig(ker_wid=3, depth=8, in_wids=(16, 8, 4),
                       real_batch=(3, 6, 12), wide=3, init_batch=2, fc_out=4,
                       init_pow=4.0, mid_pow=4.0, final_pow=4.0)
    runner = WideFastResNetRunner(
        ctx, cfg,
        boot_kwargs=dict(k_range=12.0, sin_deg=31, double_angle=3))
    w = random_weights(3, 8, cfg.real_batch, fc_out=4, in_ch=3, seed=8,
                       scale=0.7, init_batch=cfg.init_batch)
    w.fc_w = w.fc_w * 6.0
    w.fc_b = w.fc_b * 2.0
    rng = np.random.default_rng(9)
    raw0 = cfg.raw_in_wids[0]
    image = rng.uniform(-1, 1, (raw0, raw0, 3))

    logits = runner.infer(image, w)
    plain = plain_forward(w, image, 8, cfg.raw_in_wids)

    assert logits.shape == plain.shape
    err = np.max(np.abs(logits - plain))
    assert err < 0.15, f"logits err {err}: enc {logits} vs plain {plain}"
    assert np.argmax(logits) == np.argmax(plain), (logits, plain)
