"""Fast-regime ("inside") fused-layer kinds vs the plaintext mirror chain.

The reference's fast/inside packing keeps every block at the block-1
spatial resolution and dilates kernels instead of repacking
(testResNet_crop_fast_in, /root/reference/test.go:372-636): Conv_inside
dilates the kernel by `step`, StrConv_inside halves the step for the
conv and downsamples via the stride keep-mask.  Expected values follow
the reference's own debug oracle (debugStoC,
/root/reference/eval.go:651-722): coeff→bit-reversed slots → exact ReLU
→ keep_vec_stride mirror → bit-reverse back to coefficients.
"""

import numpy as np
import pytest

from optimal_conv_tpu.ckks.params import mini_boot_params
from optimal_conv_tpu.ckks.context import CkksContext
from optimal_conv_tpu.ckks.bootstrap import SplitBootstrapper
from optimal_conv_tpu.ops import conv as convops
from optimal_conv_tpu.ops import repack as rp
from optimal_conv_tpu.ops.pipeline import eval_conv_bn_relu, LayerMaps
from optimal_conv_tpu.ops.relu import relu_np

PARAMS = mini_boot_params(log_n=10, n_relu=14)
RNG = np.random.default_rng(47)
N = PARAMS.n
POW = 4.0
IN_WID = 16
MB = N // (IN_WID * IN_WID)          # 4 channels, full pack (norm 1)


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(PARAMS, seed=23)


@pytest.fixture(scope="module")
def btps(ctx):
    return {0: SplitBootstrapper(ctx, log_sparse=0, k_range=12.0,
                                 sin_deg=31, double_angle=3)}


def mirror_expected(conv_sp: np.ndarray, kp_wid: int, step: int) -> np.ndarray:
    """debugStoC chain for the inside kinds: spatial conv output
    [IN_WID, IN_WID, MB] → expected output coefficient vector [N]."""
    cfs = np.zeros(N)
    for b in range(MB):
        cfs[b::MB] = conv_sp[..., b].ravel()
    brv = np.array([rp.reverse_bits(i, PARAMS.log_n - 1) for i in range(N // 2)])
    up = relu_np(cfs[:N // 2][brv])
    low = relu_np(cfs[N // 2:][brv])
    t0 = rp.keep_vec_stride(up, IN_WID, kp_wid, step, 0, True)
    t1 = rp.keep_vec_stride(low, IN_WID, kp_wid, step, 1, True)
    return np.concatenate([t0[brv], t1[brv]])


def run_layer(ctx, btps, inp_sp, ker, bn_a, bn_b, kind, step, kp_wid):
    inp = np.zeros(N)
    for b in range(MB):
        inp[b::MB] = inp_sp[..., b].ravel()
    ct = ctx.encrypt(ctx.encoder.encode_coeffs(inp, PARAMS.scale, 1))
    maps = LayerMaps(ext_idx=[
        rp.gen_keep_vec_stride(N // 2, IN_WID, kp_wid, step, 0, True),
        rp.gen_keep_vec_stride(N // 2, IN_WID, kp_wid, step, 1, True)])
    out = eval_conv_bn_relu(ctx, btps, ct, ker.ravel(), bn_a, bn_b, 0.0, POW,
                            IN_WID, kp_wid, ker.shape[0], MB, MB, 1, 0, step,
                            2, 0, kind, maps)
    return ctx.decrypt_decode_coeffs(out)


def dilate(ker: np.ndarray, s: int) -> np.ndarray:
    kw = ker.shape[0]
    nk = kw * s - s + 1
    out = np.zeros((nk, nk) + ker.shape[2:])
    out[::s, ::s] = ker
    return out


def test_conv_inside_dilated(ctx, btps):
    """Conv_inside at step 2: data on the stride-2 subgrid, kernel dilated
    ×2 inside the evaluator, stride-2 keep mask."""
    kp_wid, step, kw = 7, 2, 3
    sub = RNG.uniform(-0.8, 0.8, (kp_wid, kp_wid, MB))
    ker = RNG.uniform(-1, 1, (kw, kw, MB, MB)) / 4.0
    bn_a = RNG.uniform(0.8, 1.2, MB)
    bn_b = RNG.uniform(-0.2, 0.2, MB)

    full = np.zeros((IN_WID, IN_WID, MB))
    full[0:2 * kp_wid:2, 0:2 * kp_wid:2] = sub
    got = run_layer(ctx, btps, full, ker, bn_a, bn_b, "Conv_inside",
                    step, kp_wid)

    conv = convops.conv2d_same_np(full, dilate(ker, step)) * bn_a + bn_b
    want = mirror_expected(conv, kp_wid, step)
    err = np.max(np.abs(got - want))
    assert err < 5e-2, f"max err {err}"
    # sanity: the kept region is non-trivial
    assert np.max(np.abs(want)) > 0.1


def test_strconv_inside(ctx, btps):
    """StrConv_inside at step 2: stride-1 input, un-dilated conv
    (in_step = step/2 = 1), output downsampled by the stride-2 mask."""
    kp_wid, step, kw = 7, 2, 3
    raw = IN_WID - kw // 2                     # 15
    img = RNG.uniform(-0.8, 0.8, (raw, raw, MB))
    ker = RNG.uniform(-1, 1, (kw, kw, MB, MB)) / 4.0
    bn_a = RNG.uniform(0.8, 1.2, MB)
    bn_b = RNG.uniform(-0.2, 0.2, MB)

    full = np.zeros((IN_WID, IN_WID, MB))
    full[:raw, :raw] = img
    got = run_layer(ctx, btps, full, ker, bn_a, bn_b, "StrConv_inside",
                    step, kp_wid)

    conv = convops.conv2d_same_np(full, ker) * bn_a + bn_b
    want = mirror_expected(conv, kp_wid, step)
    err = np.max(np.abs(got - want))
    assert err < 5e-2, f"max err {err}"
    assert np.max(np.abs(want)) > 0.1
