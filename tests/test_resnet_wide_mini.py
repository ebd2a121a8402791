"""Wide-2 encrypted ResNet (miniaturized): the distinctive part is the
block-1→2 strided transition at combined log_sparse 0 — the FULL-pack
StrConv_sparse where CtoS yields two ciphertexts and repack needs both
the up and low compression maps (reference wide driver,
/root/reference/test.go:638-796 and newContext wide2 branch).
"""

import numpy as np
import pytest

from optimal_conv_tpu.ckks.params import mini_boot_params
from optimal_conv_tpu.ckks.context import CkksContext
from optimal_conv_tpu.models.plain import random_weights, plain_forward
from optimal_conv_tpu.models.resnet import ResNetConfig, ResNetRunner

PARAMS = mini_boot_params(log_n=10, n_relu=14)


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(PARAMS, seed=19)


def test_resnet8_wide2_mini(ctx):
    cfg = ResNetConfig(ker_wid=3, depth=8, in_wids=(16, 8, 4),
                       real_batch=(2, 4, 8), wide=2, init_batch=2,
                       fc_out=4, init_pow=4.0, mid_pow=4.0, final_pow=4.0)
    runner = ResNetRunner(
        ctx, cfg,
        boot_kwargs=dict(k_range=12.0, sin_deg=31, double_angle=3))
    w = random_weights(3, 8, cfg.real_batch, fc_out=4, in_ch=1, seed=4,
                       scale=0.7, init_batch=cfg.init_batch)
    w.fc_w = w.fc_w * 6.0
    w.fc_b = w.fc_b * 2.0
    rng = np.random.default_rng(6)
    raw0 = cfg.raw_in_wids[0]
    image = rng.uniform(-1, 1, (raw0, raw0, 1))

    logits = runner.infer(image, w)
    plain = plain_forward(w, image, 8, cfg.raw_in_wids)

    err = np.max(np.abs(logits - plain))
    assert err < 0.2, f"logits err {err}: enc {logits} vs plain {plain}"
    assert np.argmax(logits) == np.argmax(plain), (logits, plain)
