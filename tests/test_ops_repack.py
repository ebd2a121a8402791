"""Cross-validation of the repack index generators.

The reference validates these only implicitly (commented scratchpad in
main(), /root/reference/main.go:513-568).  Here: the generator-driven
masked-rotate-accumulate must equal independent value-level ports of
comprs_full / comprs_full_fast, and the fast (2-stage BSGS) path must
equal the 1-stage path — the same equivalences the reference relies on
when it switches fast_pack on (/root/reference/test.go:126).
"""

import numpy as np
import pytest

from optimal_conv_tpu.ops import repack as rp

RNG = np.random.default_rng(33)


@pytest.mark.parametrize("in_wid,kp_wid", [(16, 8), (16, 14), (32, 30), (8, 6)])
@pytest.mark.parametrize("ul", [0, 1])
@pytest.mark.parametrize("pos", [0, 2])
def test_comprs_gen_matches_direct(in_wid, kp_wid, ul, pos):
    vec_size = in_wid * in_wid * 8   # batch 16
    x = RNG.normal(size=vec_size)
    got = rp.apply_rot_maps(x, rp.gen_comprs_full(vec_size, in_wid, kp_wid, pos, ul))
    want = rp.comprs_full_direct(x, in_wid, kp_wid, pos, ul)
    np.testing.assert_allclose(got, want)


@pytest.mark.parametrize("in_wid,kp_wid", [(16, 8), (16, 14), (32, 30)])
@pytest.mark.parametrize("ul", [0, 1])
@pytest.mark.parametrize("pos", [0, 2])
def test_comprs_fast_matches_direct(in_wid, kp_wid, ul, pos):
    vec_size = in_wid * in_wid * 8
    x = RNG.normal(size=vec_size)
    got = rp.comprs_full_fast(x, in_wid, kp_wid, pos, ul)
    want = rp.comprs_full_fast_direct(x, in_wid, kp_wid, pos, ul)
    np.testing.assert_allclose(got, want)


def test_keep_vec_masks_are_binary_and_sized():
    for (iw, kp, ul) in [(16, 14, 0), (16, 14, 1), (32, 30, 0)]:
        m = rp.gen_keep_vec(iw * iw * 8, iw, kp, ul)
        assert set(np.unique(m)) <= {0, 1}
        # upper mask keeps kp columns over in_wid/2 rows of every batch
        batch = 2 * len(m) // (iw * iw)
        want = (iw // 2 if ul == 0 else kp - iw // 2) * kp * batch
        assert m.sum() == want


def test_keep_vec_sparse_replicates():
    iw, kp, ls = 16, 14, 2
    vec = iw * iw * 32 // 2
    m = rp.gen_keep_vec_sparse(vec, iw, kp, ls)
    post = 2 * len(m) // (1 << ls)
    for k in range(1, (1 << ls) // 2):
        np.testing.assert_array_equal(m[k * post:(k + 1) * post], m[:post])


@pytest.mark.parametrize("in_wid,kp_wid", [(16, 8), (16, 14), (32, 30)])
@pytest.mark.parametrize("ul", [0, 1])
def test_extend_inverts_comprs_full(in_wid, kp_wid, ul):
    """extend ∘ comprs == identity on the compressed layout's image, and
    comprs ∘ extend == identity on the compressed layout itself — the
    TransConv repack is the exact inverse of the StrConv repack."""
    vec_size = in_wid * in_wid * 8
    x = RNG.normal(size=vec_size)
    fwd = rp.gen_comprs_full(vec_size, in_wid, kp_wid, 0, ul)
    inv = rp.gen_extend_full(vec_size, in_wid, kp_wid, 0, ul)
    comp = rp.apply_rot_maps(x, fwd)
    back = rp.apply_rot_maps(comp, inv)
    # back == x wherever the forward map reads (mask support)
    support = np.zeros(vec_size)
    for m in fwd.values():
        support = support + m
    np.testing.assert_allclose(back * support, x * support)
    # and the other direction: comprs(extend(y)) == y on the image
    np.testing.assert_allclose(rp.apply_rot_maps(back, fwd), comp)


@pytest.mark.parametrize("in_wid,kp_wid", [(16, 8), (32, 30)])
def test_extend_fast_inverts_comprs_fast(in_wid, kp_wid):
    vec_size = in_wid * in_wid * 8
    x = RNG.normal(size=vec_size)
    comp = rp.comprs_full_fast(x, in_wid, kp_wid, 0, 0)
    em, er = rp.gen_extend_fast(vec_size, in_wid, kp_wid, 0, 0)
    back = rp.apply_rot_maps(rp.apply_rot_maps(comp, em), er)
    fm, fr = rp.gen_comprs_fast(vec_size, in_wid, kp_wid, 0, 0)
    again = rp.apply_rot_maps(rp.apply_rot_maps(back, fm), fr)
    np.testing.assert_allclose(again, comp)


@pytest.mark.parametrize("log_sparse", [1, 2])
def test_extend_sparse_inverts_comprs_sparse(log_sparse):
    in_wid, kp_wid = 16, 8
    vec_size = in_wid * in_wid * 8
    x = RNG.normal(size=vec_size)
    comp = rp.comprs_vec_sparse(x, in_wid, kp_wid, log_sparse, 0, 0)
    em, er = rp.gen_extend_sparse(vec_size, in_wid, kp_wid, log_sparse, 0, 0)
    back = rp.apply_rot_maps(rp.apply_rot_maps(comp, em), er)
    again = rp.comprs_vec_sparse(back, in_wid, kp_wid, log_sparse, 0, 0)
    np.testing.assert_allclose(again, comp)


def test_reverse_bits():
    assert rp.reverse_bits(1, 4) == 8
    assert rp.reverse_bits(0b1011, 4) == 0b1101
    assert rp.reverse_bits(3, 2) == 3
