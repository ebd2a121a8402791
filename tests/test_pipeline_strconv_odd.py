"""StrConv_odd fused-layer kind vs the plaintext mirror chain.

The reference's fast-wide drivers stride odd-width layers by
premultiplying X^offset so strided outputs land on the even grid
(eval.go:315-332), then conv + two-stage comprs_full_fast repack
(debugStoC case "StrConv_odd" with fast_pack,
/root/reference/eval.go:702-704; maps built by the
Resnet_crop_fast_wide2 branch, main.go:291-292).
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
RNG = np.random.default_rng(53)
N = PARAMS.n
POW = 4.0
IN_WID = 16
MB = N // (IN_WID * IN_WID)


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(PARAMS, seed=23)


def test_strconv_odd(ctx):
    kw = 3
    raw = IN_WID - kw // 2                      # 15 (odd -> offset shift)
    kp_wid = 14                                 # 2*kp_wids[1] as in wide2
    img = RNG.uniform(-0.8, 0.8, (raw, raw, MB))
    ker = RNG.uniform(-1, 1, (kw, kw, MB, MB)) / 4.0
    bn_a = RNG.uniform(0.8, 1.2, MB)
    bn_b = RNG.uniform(-0.2, 0.2, MB)

    inp = convops.prep_input(img.ravel(), raw, IN_WID, N, 1)
    ct = ctx.encrypt(ctx.encoder.encode_coeffs(inp, PARAMS.scale, 1))

    m0, r0 = rp.gen_comprs_fast(N // 2, IN_WID, kp_wid, 0, 0)
    m1, r1 = rp.gen_comprs_fast(N // 2, IN_WID, kp_wid, 0, 1)
    maps = LayerMaps(m_idx=m0, r_idx=r0, m_idx_l=m1, r_idx_l=r1)
    btps = {0: SplitBootstrapper(ctx, log_sparse=0, k_range=12.0,
                                 sin_deg=31, double_angle=3)}
    out = eval_conv_bn_relu(ctx, btps, ct, ker.ravel(), bn_a, bn_b, 0.0, POW,
                            IN_WID, kp_wid, kw, MB, MB, 1, 0, 2, 2, 0,
                            "StrConv_odd", maps)
    got = ctx.decrypt_decode_coeffs(out)

    # mirror: X^offset premultiply = shift by one row+col (offset =
    # MB·(IN_WID+1) in the coeff layout; no negacyclic wrap since the
    # data fits the padded grid), SAME conv, bit-rev slots, exact ReLU,
    # comprs_full_fast, back to coefficients
    shifted = np.zeros((IN_WID, IN_WID, MB))
    shifted[1: 1 + raw, 1: 1 + raw] = img
    conv = convops.conv2d_same_np(shifted, ker) * bn_a + bn_b
    cfs = np.zeros(N)
    for b in range(MB):
        cfs[b::MB] = conv[..., b].ravel()
    brv = np.array([rp.reverse_bits(i, PARAMS.log_n - 1)
                    for i in range(N // 2)])
    up = relu_np(cfs[: N // 2][brv])
    low = relu_np(cfs[N // 2:][brv])
    t0 = rp.comprs_full_fast(up, IN_WID, kp_wid, 0, 0)
    t1 = rp.comprs_full_fast(low, IN_WID, kp_wid, 0, 1)
    want = np.concatenate([t0[brv], t1[brv]])

    err = np.max(np.abs(got - want))
    assert err < 5e-2, f"max err {err}"
    assert np.max(np.abs(want)) > 0.1
