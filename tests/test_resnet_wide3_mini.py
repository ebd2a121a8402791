"""Wide-3 encrypted ResNet (miniaturized): block 1 runs at FULL pack
(log_sparse 0, norm 1 — CtoS returns two ciphertexts, keep needs the
up/low mask pair) and the block-1→2 transition is the dual
StrConv_sparse_full: even/odd out-channel halves convolved separately,
the odd half shifted by X^norm and added (reference wide3 driver,
/root/reference/test.go:797-818; newContext wide3 branch
main.go:137-224).
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
    return CkksContext(PARAMS, seed=23)


@pytest.mark.slow_e2e
def test_resnet8_wide3_mini(ctx):
    cfg = ResNetConfig(ker_wid=3, depth=8, in_wids=(16, 8, 4),
                       real_batch=(4, 8, 16), wide=3, init_batch=4,
                       fc_out=4, init_pow=4.0, mid_pow=4.0, final_pow=4.0)
    runner = ResNetRunner(
        ctx, cfg,
        boot_kwargs=dict(k_range=12.0, sin_deg=31, double_angle=3))
    w = random_weights(3, 8, cfg.real_batch, fc_out=4, in_ch=1, seed=8,
                       scale=0.7, init_batch=cfg.init_batch)
    w.fc_w = w.fc_w * 6.0
    w.fc_b = w.fc_b * 2.0
    rng = np.random.default_rng(9)
    raw0 = cfg.raw_in_wids[0]
    image = rng.uniform(-1, 1, (raw0, raw0, 1))

    logits = runner.infer(image, w)
    plain = plain_forward(w, image, 8, cfg.raw_in_wids)

    err = np.max(np.abs(logits - plain))
    assert err < 0.2, f"logits err {err}: enc {logits} vs plain {plain}"
    assert np.argmax(logits) == np.argmax(plain), (logits, plain)
