"""TransConv fused-layer kind vs the plaintext mirror chain.

The reference dispatches kind "TransConv" in evalConv_BNRelu_new
(trans=true, /root/reference/eval.go:309; repack via ext_ctxt,
eval.go:494) but its extend index generators were deleted upstream, so
the kind is undrivable there.  Here the full pipeline runs with our
reconstructed extend maps (ops/repack.gen_extend_full — exact inverses
of the compression maps): interleaved input → transposed conv → CtoS →
ReLU → extend repack → StoC, validated against the float mirror chain.
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
RNG = np.random.default_rng(61)
N = PARAMS.n
POW = 4.0
IN_WID = 16
MB = N // (IN_WID * IN_WID)              # 16


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(PARAMS, seed=23)


def test_transconv(ctx):
    kw = 3
    raw = 6                              # < IN_WID/2 (set_Variables guard)
    kp_wid = 14
    ob = MB // 4                         # out_batch = batch/4 (eval.go:45)
    img = RNG.uniform(-0.8, 0.8, (raw, raw, MB))
    ker = RNG.uniform(-1, 1, (kw, kw, MB, ob)) / 8.0
    bn_a = RNG.uniform(0.8, 1.2, ob)
    bn_b = RNG.uniform(-0.2, 0.2, ob)

    inp = convops.prep_input(img.ravel(), raw, IN_WID, N, 1, trans=True)
    ct = ctx.encrypt(ctx.encoder.encode_coeffs(inp, PARAMS.scale, 1))

    r0 = rp.gen_extend_full(N // 2, IN_WID, kp_wid, 0, 0)
    r1 = rp.gen_extend_full(N // 2, IN_WID, kp_wid, 0, 1)
    maps = LayerMaps(r_idx=r0, r_idx_l=r1)
    btps = {0: SplitBootstrapper(ctx, log_sparse=0, k_range=12.0,
                                 sin_deg=31, double_angle=3)}
    out = eval_conv_bn_relu(ctx, btps, ct, ker.transpose(0, 1, 3, 2).ravel(),
                            bn_a, bn_b, 0.0, POW, IN_WID, kp_wid, kw, MB, ob,
                            1, 0, 1, 2, 0, "TransConv", maps)
    got = ctx.decrypt_decode_coeffs(out)

    # mirror: stride-2 transposed conv (dilated input, flipped-kernel
    # correlation), bit-rev slots, exact ReLU, extend repack, back
    dil = np.zeros((IN_WID, IN_WID, MB))
    dil[1::2, 1::2][:raw, :raw] = img
    conv = convops.conv2d_same_np(dil, ker[::-1, ::-1]) * bn_a + bn_b
    cfs = np.zeros(N)
    for b in range(ob):
        cfs[b::MB] = conv[..., b].ravel()
    brv = np.array([rp.reverse_bits(i, PARAMS.log_n - 1)
                    for i in range(N // 2)])
    up = relu_np(cfs[: N // 2][brv])
    low = relu_np(cfs[N // 2:][brv])
    t0 = rp.apply_rot_maps(up, r0)
    t1 = rp.apply_rot_maps(low, r1)
    want = np.concatenate([t0[brv], t1[brv]])

    err = np.max(np.abs(got - want))
    assert err < 5e-2, f"max err {err}"
    assert np.max(np.abs(want)) > 0.1
