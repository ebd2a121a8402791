"""Reference weight/data file-layout ingestion (SURVEY §4 real-data
contract; /root/reference/test.go:92-148, 170-186, 281-299).

The reference consumes a weight directory of flat CSVs (w{li}-conv/a/b,
final-fckernel/fcbias) and full-grid image CSVs (in_wid² with only the
raw corner meaningful).  These tests pin our loaders to that exact
layout with synthesized files."""

import numpy as np

from optimal_conv_tpu.models.plain import (
    random_weights, load_weights_dir, save_weights_dir, plain_forward,
    channel_plan, NUM_BLOCKS)


def test_weight_dir_roundtrip(tmp_path):
    w = random_weights(3, 8, (16, 32, 64), fc_out=10, seed=3)
    d = str(tmp_path / "weights_crop_ker3_d8_wid1")
    save_weights_dir(d, w)
    # exact file set the reference reads
    import os
    names = sorted(os.listdir(d))
    n_layers = len(channel_plan(8, (16, 32, 64)))
    assert f"w{n_layers - 1}-conv.csv" in names
    assert "final-fckernel.csv" in names and "final-fcbias.csv" in names
    w2 = load_weights_dir(d, 3, 8, (16, 32, 64), fc_out=10)
    for a, b in zip(w.convs, w2.convs):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(w.bn_a, w2.bn_a):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(w.fc_w, w2.fc_w)
    np.testing.assert_array_equal(w.fc_b, w2.fc_b)


def test_weight_dir_wide_init_batch(tmp_path):
    """Wide models open 3→init_batch→b1 (test.go:752-771)."""
    w = random_weights(3, 8, (32, 64, 128), fc_out=10, seed=4,
                       init_batch=16)
    d = str(tmp_path / "weights_crop_ker3_d8_wid2")
    save_weights_dir(d, w)
    w2 = load_weights_dir(d, 3, 8, (32, 64, 128), fc_out=10, init_batch=16)
    assert w2.convs[0].shape == (3, 3, 3, 16)
    assert w2.convs[1].shape == (3, 3, 16, 32)
    for a, b in zip(w.convs, w2.convs):
        np.testing.assert_array_equal(a, b)


def test_reference_image_csv_format(tmp_path):
    """Image CSVs carry the FULL in_wid² grid in (i, j, b) order; only
    the raw_in_wid² top-left corner is data (test.go:129-148)."""
    rng = np.random.default_rng(0)
    w0, raw0 = 32, 31
    full = np.zeros((w0, w0, 3))
    full[:raw0, :raw0] = rng.uniform(-1, 1, (raw0, raw0, 3))
    f = tmp_path / "test_image_0.csv"
    np.savetxt(f, full.ravel(), fmt="%.17g")   # (i, j, b) flat — ref order
    loaded = np.loadtxt(f).reshape(w0, w0, 3)[:raw0, :raw0]
    np.testing.assert_allclose(loaded, full[:raw0, :raw0])
    # and the plain model consumes the cropped image directly
    w = random_weights(3, 8, (16, 32, 64), fc_out=10, seed=5)
    logits = plain_forward(w, loaded, 8, (31, 15, 7))
    assert logits.shape == (10,)
