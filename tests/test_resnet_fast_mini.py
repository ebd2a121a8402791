"""End-to-end encrypted ResNet in the FAST packing regime (miniaturized).

Mirrors ``testResNet_crop_fast_in`` (/root/reference/test.go:372-636):
every layer stays on the block-1 grid at log_sparse=0; transitions use
StrConv_inside with interleaved double-batch kernels and the dilation
step doubles (1 → 2 → 4); repack = keep_vec_stride per (step, ul); FC
head reads logits at grid position (kw/2+1, kw/2+1).

The plain oracle is the SAME plain_forward as the sparse regime — the
two packings compute the same network function.
"""

import numpy as np
import pytest

from optimal_conv_tpu.ckks.params import mini_boot_params
from optimal_conv_tpu.ckks.context import CkksContext
from optimal_conv_tpu.models.plain import random_weights, plain_forward
from optimal_conv_tpu.models.resnet import ResNetConfig, FastResNetRunner

PARAMS = mini_boot_params(log_n=10, n_relu=14)


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(PARAMS, seed=19)


def test_resnet8_fast_mini_end_to_end(ctx):
    cfg = ResNetConfig(ker_wid=3, depth=8, in_wids=(16, 8, 4),
                       real_batch=(1, 2, 4), fc_out=4,
                       init_pow=4.0, mid_pow=4.0, final_pow=4.0)
    runner = FastResNetRunner(
        ctx, cfg,
        boot_kwargs=dict(k_range=12.0, sin_deg=31, double_angle=3))
    w = random_weights(3, 8, cfg.real_batch, fc_out=4, in_ch=1, seed=4,
                       scale=0.7)
    w.fc_w = w.fc_w * 6.0
    w.fc_b = w.fc_b * 2.0
    rng = np.random.default_rng(6)
    raw0 = cfg.raw_in_wids[0]
    image = rng.uniform(-1, 1, (raw0, raw0, 1))

    logits = runner.infer(image, w)
    plain = plain_forward(w, image, 8, cfg.raw_in_wids)

    assert logits.shape == plain.shape
    err = np.max(np.abs(logits - plain))
    assert err < 0.15, f"logits err {err}: enc {logits} vs plain {plain}"
    assert np.argmax(logits) == np.argmax(plain), (logits, plain)
