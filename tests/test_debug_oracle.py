"""DebugOracle golden coverage across kinds (VERDICT r1 #9).

The reference's debug mode replays the plaintext mirrors for EVERY kind
(debugStoC, /root/reference/eval.go:651-722); round 1's oracle had
goldens for 2 of 9 kinds.  These tests drive the fused layer with the
oracle attached and assert each stage got a golden (not magnitude-only)
comparison with sane precision.
"""

import numpy as np
import pytest

from optimal_conv_tpu.ckks.params import mini_boot_params
from optimal_conv_tpu.ckks.context import CkksContext
from optimal_conv_tpu.ckks.bootstrap import SplitBootstrapper
from optimal_conv_tpu.ops import conv as convops
from optimal_conv_tpu.ops import repack as rp
from optimal_conv_tpu.ops.debug import DebugOracle
from optimal_conv_tpu.ops.pipeline import eval_conv_bn_relu, LayerMaps

PARAMS = mini_boot_params(log_n=10, n_relu=14)
RNG = np.random.default_rng(41)
N = PARAMS.n
POW = 4.0


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(PARAMS, seed=19)


def check_history(oracle, min_bits=4.0):
    stages = [s for s, _ in oracle.history]
    assert any(s.startswith("repack") for s in stages), stages
    assert "stoc" in stages
    for stage, avg in oracle.history:
        assert avg is not None, f"stage {stage} had no golden"
        assert avg > min_bits, f"stage {stage} precision {avg} bits"


@pytest.mark.slow_e2e
def test_oracle_strconv_sparse(ctx):
    """Golden oracle through a StrConv_sparse layer: the conv-stage
    expected vector models the split-kernel even/odd interleave."""
    in_wid, ker_wid = 16, 3
    raw_in = in_wid - ker_wid // 2
    out_wid = in_wid // 2
    raw_out = out_wid - ker_wid // 2
    max_in = N // (in_wid * in_wid)
    norm_in, ls_in = 4, 2
    real_ib = max_in // norm_in
    max_out = N // (out_wid * out_wid)
    norm_out = 8
    real_ob = max_out // norm_out
    ls = ls_in - 1

    img = RNG.uniform(-0.8, 0.8, (raw_in, raw_in, real_ib))
    ker = RNG.uniform(-1, 1, (ker_wid, ker_wid, real_ib, real_ob)) / 4.0
    bn_a = RNG.uniform(0.8, 1.2, real_ob)
    bn_b = RNG.uniform(-0.2, 0.2, real_ob)

    inp = convops.prep_input(img.ravel(), raw_in, in_wid, N, norm_in)
    ct = ctx.encrypt(ctx.encoder.encode_coeffs(inp, PARAMS.scale, 1))
    m_idx, r_idx = rp.gen_comprs_sparse(N // 2, in_wid, raw_out, ls, 0, 0)
    maps = LayerMaps(m_idx=m_idx, r_idx=r_idx)

    # expected combined conv layout: even out-channels at 4t, odd at 4t+2
    full = np.zeros((in_wid, in_wid, real_ib))
    full[:raw_in, :raw_in] = img
    conv = convops.conv2d_same_np(full, ker) * bn_a + bn_b
    cfs = np.zeros(N)
    idx = (np.arange(in_wid)[:, None] * in_wid
           + np.arange(in_wid)[None, :]) * max_in
    cfs[idx.ravel()] = conv[:, :, 0].ravel()
    cfs[idx.ravel() + norm_out // 4] = conv[:, :, 1].ravel()

    oracle = DebugOracle(ctx, in_wid, raw_out, "StrConv_sparse", POW, ls,
                         cfs, maps=maps)
    btps = {ls: SplitBootstrapper(ctx, log_sparse=ls, k_range=12.0,
                                  sin_deg=31, double_angle=3)}
    eval_conv_bn_relu(ctx, btps, ct, ker.ravel(), bn_a, bn_b, 0.0, POW,
                      in_wid, raw_out, ker_wid, real_ib, real_ob, norm_out,
                      0, 1, 2, ls, "StrConv_sparse", maps, debug_hook=oracle)
    check_history(oracle)


def test_oracle_conv_inside(ctx):
    """Golden oracle through Conv_inside (keep_vec_stride masks)."""
    in_wid, kw, step, kp_wid = 16, 3, 2, 7
    mb = N // (in_wid * in_wid)
    sub = RNG.uniform(-0.8, 0.8, (kp_wid, kp_wid, mb))
    ker = RNG.uniform(-1, 1, (kw, kw, mb, mb)) / 4.0
    bn_a = RNG.uniform(0.8, 1.2, mb)
    bn_b = RNG.uniform(-0.2, 0.2, mb)

    full = np.zeros((in_wid, in_wid, mb))
    full[0:2 * kp_wid:2, 0:2 * kp_wid:2] = sub
    inp = np.zeros(N)
    for b in range(mb):
        inp[b::mb] = full[..., b].ravel()
    ct = ctx.encrypt(ctx.encoder.encode_coeffs(inp, PARAMS.scale, 1))
    maps = LayerMaps(ext_idx=[
        rp.gen_keep_vec_stride(N // 2, in_wid, kp_wid, step, 0, True),
        rp.gen_keep_vec_stride(N // 2, in_wid, kp_wid, step, 1, True)])

    dil = np.zeros((kw * 2 - 1, kw * 2 - 1, mb, mb))
    dil[::2, ::2] = ker
    conv = convops.conv2d_same_np(full, dil) * bn_a + bn_b
    cfs = np.zeros(N)
    for b in range(mb):
        cfs[b::mb] = conv[..., b].ravel()

    oracle = DebugOracle(ctx, in_wid, kp_wid, "Conv_inside", POW, 0, cfs,
                         maps=maps)
    btps = {0: SplitBootstrapper(ctx, log_sparse=0, k_range=12.0,
                                 sin_deg=31, double_angle=3)}
    eval_conv_bn_relu(ctx, btps, ct, ker.ravel(), bn_a, bn_b, 0.0, POW,
                      in_wid, kp_wid, kw, mb, mb, 1, 0, step, 2, 0,
                      "Conv_inside", maps, debug_hook=oracle)
    check_history(oracle)


def test_prt_mat_views(capsys):
    """mat_view/mat_one/prt_mat mirror the reference's prt_mat family
    (position-major layout, 1-based positions, norm channel stride)."""
    from optimal_conv_tpu.ops.debug import mat_view, mat_one, prt_mat, \
        prt_mat_step

    row, batch, norm = 8, 16, 4
    vec = np.arange(row * row * batch, dtype=float)
    m = mat_view(vec, batch, norm)
    assert m.shape == (row, row, batch // norm)
    # position (j,k) holds the contiguous channel block, norm-strided
    j, k = 3, 5
    base = ((j - 1) * row + (k - 1)) * batch
    assert np.array_equal(m[j - 1, k - 1], vec[base: base + batch: norm])
    assert np.array_equal(mat_one(vec, batch, j, k, norm),
                          vec[base: base + batch: norm])
    prt_mat(vec, batch, show=2, norm=norm)
    out = capsys.readouterr().out
    assert "(1, 1):" in out and "(8, 8):" in out and "(4, 4):" not in out
    prt_mat_step(vec, batch, norm, step=2, start=1, show=2)
    out = capsys.readouterr().out
    assert "(1, 1):" in out


def test_precision_stats_distribution():
    from optimal_conv_tpu.ops.debug import precision_stats

    want = np.zeros(1000)
    have = np.full(1000, 2.0 ** -20)
    s = precision_stats(want, have, distribution=True)
    assert "med" in s and ">=" in s and "100.0%" in s
    assert "avg  20.00" in s
