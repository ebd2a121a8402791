"""Fused Conv→BN→CtoS→ReLU→repack→StoC layer vs the plaintext mirror.

The reference's equivalent check is ``convReLU`` against golden
``reluout`` CSVs plus the per-stage decrypt oracles (SURVEY.md §4);
here the oracle is the numpy conv + exact ReLU.
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
RNG = np.random.default_rng(41)
N = PARAMS.n
POW = 4.0


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(PARAMS, seed=19)


def btp_for(ctx, ls):
    return {ls: SplitBootstrapper(ctx, log_sparse=ls, k_range=12.0,
                                  sin_deg=31, double_angle=3)}


def test_conv_bn_relu_sparse(ctx):
    """One ResNet block-1 style layer: Conv_sparse at log_sparse=2."""
    in_wid, ker_wid = 16, 3
    raw = in_wid - ker_wid // 2            # 15
    max_batch = N // (in_wid * in_wid)     # 16
    norm, ls = 4, 2
    real_ib = real_ob = max_batch // norm  # 4

    img = RNG.uniform(-0.8, 0.8, (raw, raw, real_ib))
    ker = RNG.uniform(-1, 1, (ker_wid, ker_wid, real_ib, real_ob)) / 4.0
    bn_a = RNG.uniform(0.8, 1.2, real_ob)
    bn_b = RNG.uniform(-0.2, 0.2, real_ob)

    inp = convops.prep_input(img.ravel(), raw, in_wid, N, norm)
    ct = ctx.encrypt(ctx.encoder.encode_coeffs(inp, PARAMS.scale, 1))

    maps = LayerMaps(ext_idx=[rp.gen_keep_vec_sparse(N // 2, in_wid, raw, ls),
                              None])
    out = eval_conv_bn_relu(ctx, btp_for(ctx, ls), ct, ker.ravel(), bn_a,
                            bn_b, 0.0, POW, in_wid, raw, ker_wid, real_ib,
                            real_ob, norm, 0, 1, 2, ls, "Conv_sparse", maps)
    assert out.level >= 1

    cfs = ctx.decrypt_decode_coeffs(out)
    got = convops.post_process(cfs, raw, in_wid)
    got = got.reshape(raw, raw, max_batch)[:, :, ::norm][:, :, :real_ob]
    want = relu_np(convops.conv2d_same_np(img, ker) * bn_a + bn_b)
    err = np.max(np.abs(got - want))
    assert err < 5e-2, f"max err {err}"
    # bulk of entries precise (mini chain: scale 2^25, 25-bit relu primes)
    assert np.mean(np.abs(got - want) < 2.5e-2) > 0.97


def test_strconv_bn_relu_sparse(ctx):
    """Strided transition: StrConv_sparse (split-kernel double conv,
    combined stride-2 ct bootstrapped at ls−1, comprs repack)."""
    in_wid, ker_wid = 16, 3
    raw_in = in_wid - ker_wid // 2          # 15
    out_wid = in_wid // 2                   # 8
    raw_out = out_wid - ker_wid // 2        # 7
    max_in = N // (in_wid * in_wid)         # 16
    norm_in, ls_in = 4, 2
    real_ib = max_in // norm_in             # 4
    max_out = N // (out_wid * out_wid)      # 64
    norm_out = 8
    real_ob = max_out // norm_out           # 8
    ls_comb = ls_in - 1                     # combined strided ct stride 2

    img = RNG.uniform(-0.8, 0.8, (raw_in, raw_in, real_ib))
    ker = RNG.uniform(-1, 1, (ker_wid, ker_wid, real_ib, real_ob)) / 4.0
    bn_a = RNG.uniform(0.8, 1.2, real_ob)
    bn_b = RNG.uniform(-0.2, 0.2, real_ob)

    inp = convops.prep_input(img.ravel(), raw_in, in_wid, N, norm_in)
    ct = ctx.encrypt(ctx.encoder.encode_coeffs(inp, PARAMS.scale, 1))

    m_idx, r_idx = rp.gen_comprs_sparse(N // 2, in_wid, raw_out, ls_comb, 0, 0)
    maps = LayerMaps(m_idx=m_idx, r_idx=r_idx)
    out = eval_conv_bn_relu(ctx, btp_for(ctx, ls_comb), ct, ker.ravel(), bn_a,
                            bn_b, 0.0, POW, in_wid, raw_out, ker_wid, real_ib,
                            real_ob, norm_out, 0, 1, 2, ls_comb,
                            "StrConv_sparse", maps)
    assert out.level >= 1

    cfs = ctx.decrypt_decode_coeffs(out)
    got = convops.post_process(cfs, raw_out, out_wid)
    got = got.reshape(raw_out, raw_out, max_out)[:, :, ::norm_out][:, :, :real_ob]

    full = convops.conv2d_same_np(img, ker) * bn_a + bn_b   # [15, 15, ob]
    # the reference contract, pinned EXACTLY (no best-of-two fallback):
    # for odd raw widths the strided output is the SAME-conv sampled on
    # the even grid y[2i, 2j] — proven by running the bit-exact
    # comprs_sparse mirror chain (gen_comprs_sparse is a loop-for-loop
    # port of rot_util.go:557-722) over the conv coefficient layout:
    # the mirror reproduces y[2i,2j] with error 0.0 and the encrypted
    # path matches it.  (Even raw widths pre-shift by X^{mb(w+1)} so
    # y[2i+1,2j+1] lands on the even grid — eval.go:377-385.)  A phase
    # regression must fail, not fall back.
    want = relu_np(full[0::2, 0::2][:raw_out, :raw_out])
    err = np.max(np.abs(got - want))
    assert err < 5e-2, f"stride phase y[2i,2j] err {err}"
