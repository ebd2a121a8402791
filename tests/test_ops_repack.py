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


def test_reverse_bits():
    assert rp.reverse_bits(1, 4) == 8
    assert rp.reverse_bits(0b1011, 4) == 0b1101
    assert rp.reverse_bits(3, 2) == 3
