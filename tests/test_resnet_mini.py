"""End-to-end encrypted ResNet (miniaturized) vs the plaintext mirror.

The full graph of testResNet_crop_sparse — three conv blocks at
log_sparse 2/3/4, split-kernel strided transitions at 1/2, one
bootstrap per layer, reduce-mean+FC head — run at logN=10 geometry
(16×16 input, real_batch (1,2,4)) so it fits the CPU test budget.
Full-scale runs live in scripts/run_resnet_demo.py.
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


def test_resnet8_mini_end_to_end(ctx):
    cfg = ResNetConfig(ker_wid=3, depth=8, in_wids=(16, 8, 4),
                       real_batch=(1, 2, 4), fc_out=4,
                       init_pow=4.0, mid_pow=4.0, final_pow=4.0)
    runner = ResNetRunner(
        ctx, cfg,
        boot_kwargs=dict(k_range=12.0, sin_deg=31, double_angle=3))
    # single-channel input: at logN=10 max_batch[0]=4 cannot hold 3 RGB
    # channels at stride norm=4 (full-scale geometry uses max_batch 64)
    w = random_weights(3, 8, cfg.real_batch, fc_out=4, in_ch=1, seed=4,
                       scale=0.7)
    # boost the head so the top-2 logit gap (~0.45) dominates the
    # encrypted-evaluation error (~0.05) and argmax is meaningful
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


def test_resnet8_mini_resume(ctx, tmp_path, monkeypatch):
    """Interrupt mid-inference, then resume from the per-layer ciphertext
    checkpoint (round-3 regression: the resume path raised NameError on
    the missing Ciphertext/jnp imports the first time it was ever hit)."""
    import optimal_conv_tpu.models.resnet as resnet_mod

    cfg = ResNetConfig(ker_wid=3, depth=8, in_wids=(16, 8, 4),
                       real_batch=(1, 2, 4), fc_out=4,
                       init_pow=4.0, mid_pow=4.0, final_pow=4.0)
    runner = ResNetRunner(
        ctx, cfg,
        boot_kwargs=dict(k_range=12.0, sin_deg=31, double_angle=3))
    w = random_weights(3, 8, cfg.real_batch, fc_out=4, in_ch=1, seed=4,
                       scale=0.7)
    w.fc_w = w.fc_w * 6.0
    w.fc_b = w.fc_b * 2.0
    rng = np.random.default_rng(6)
    raw0 = cfg.raw_in_wids[0]
    image = rng.uniform(-1, 1, (raw0, raw0, 1))
    plain = plain_forward(w, image, 8, cfg.raw_in_wids)

    # kill the process after 2 completed fused layers
    orig = resnet_mod.eval_conv_bn_relu
    calls = {"n": 0}

    def bomb(*a, **k):
        if calls["n"] >= 2:
            raise KeyboardInterrupt("simulated session end")
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(resnet_mod, "eval_conv_bn_relu", bomb)
    with pytest.raises(KeyboardInterrupt):
        runner.infer(image, w, ckpt_dir=str(tmp_path))
    monkeypatch.setattr(resnet_mod, "eval_conv_bn_relu", orig)

    assert (tmp_path / "layer.npz").exists()
    assert int(np.load(tmp_path / "layer.npz")["li"]) == 1

    logits = runner.infer(image, w, ckpt_dir=str(tmp_path))
    err = np.max(np.abs(logits - plain))
    assert err < 0.15, f"resumed logits err {err}: {logits} vs {plain}"
    assert np.argmax(logits) == np.argmax(plain), (logits, plain)


def test_resnet8_mini_cf100_split_fc(ctx):
    """fc_out > real_batch[2] (the CIFAR-100 case) splits the head into
    two half-width FC convs (/root/reference/test.go:291-317).  Mini
    geometry: fc_out=8 > b3=4."""
    cfg = ResNetConfig(ker_wid=3, depth=8, in_wids=(16, 8, 4),
                       real_batch=(1, 2, 4), fc_out=8, cf100=True,
                       init_pow=4.0, mid_pow=4.0, final_pow=4.0)
    runner = ResNetRunner(
        ctx, cfg,
        boot_kwargs=dict(k_range=12.0, sin_deg=31, double_angle=3))
    w = random_weights(3, 8, cfg.real_batch, fc_out=8, in_ch=1, seed=12,
                       scale=0.7)
    w.fc_w = w.fc_w * 6.0
    w.fc_b = w.fc_b * 2.0
    rng = np.random.default_rng(13)
    raw0 = cfg.raw_in_wids[0]
    image = rng.uniform(-1, 1, (raw0, raw0, 1))

    logits = runner.infer(image, w)
    plain = plain_forward(w, image, 8, cfg.raw_in_wids)

    assert logits.shape == (8,)
    err = np.max(np.abs(logits - plain))
    assert err < 0.2, f"logits err {err}: enc {logits} vs plain {plain}"
    assert np.argmax(logits) == np.argmax(plain), (logits, plain)
