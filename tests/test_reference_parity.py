"""True A/B against the Go reference binary at IDENTICAL parameters.

Round 1's validation was self-referential (our numpy mirror).  Here the
golden values were produced by the reference binary itself
(`/root/reference/test_run`, the paper's artifact) running on inputs we
synthesized deterministically:

    python scripts/make_ref_golden.py .ref_run/test_conv_data 3 0 1
    ./test_run conv 3 0 1        # prints decrypted outputs at 10 decimals

The binary's "Ours" section runs the coefficient-domain packed conv at
DefaultBootstrapParams[6] (logN=16, logQP=1553 — the EXACT moduli chain
this framework now uses, extracted from the binary's data section by
scripts/extract_ref_moduli.py).  Its first 10 decrypted post-processed
outputs and precision stats are committed in
tests/golden/ref_conv_3_0_1.json (captured from the run log).

This test evaluates the same conv, at the same moduli, on the same
inputs, and checks agreement with the binary-computed ciphertext outputs
to ~1e-5 (two independent CKKS evaluations of the same function at the
same parameters agree to the scheme's noise, ~25 bits here) — the
SURVEY §4.1 golden-vector contract "bit-comparably at identical
parameters".
"""

import json
import os

import numpy as np
import pytest

from optimal_conv_tpu.ckks.params import boot_params
from optimal_conv_tpu.ckks.context import CkksContext
from optimal_conv_tpu.ops import conv as convops

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "ref_conv_3_0_1.json")


def _synth_inputs():
    """EXACT draw order of scripts/make_ref_golden.py (= cli.run_conv)."""
    ker_wid, in_batch, in_wid = 3, 4, 128
    raw_wid = in_wid - ker_wid // 2
    rng = np.random.default_rng(0)
    raw = rng.uniform(-1, 1, raw_wid * raw_wid * in_batch)
    ker = rng.uniform(-1, 1, ker_wid * ker_wid * in_batch * in_batch) / 9.0
    bn_a = rng.uniform(0.8, 1.2, in_batch)
    bn_b = rng.uniform(-0.2, 0.2, in_batch)
    return raw, ker, bn_a, bn_b


def test_reference_binary_parity_conv():
    g = json.load(open(GOLDEN))
    ref_vals = np.array(g["ours"]["values_test"])
    want_vals = np.array(g["ours"]["values_want"])

    raw, ker, bn_a, bn_b = _synth_inputs()
    # self-check: our deterministic inputs reproduce the golden CSVs the
    # binary consumed (values_want = first 10 of the numpy oracle)
    img = raw.reshape(127, 127, 4)
    kk = ker.reshape(3, 3, 4, 4)
    plain = (convops.conv2d_same_np(img, kk) * bn_a + bn_b).ravel()
    np.testing.assert_allclose(plain[:10], want_vals, atol=1e-9)

    params = boot_params(16)         # the binary's exact moduli chain
    ctx = CkksContext(params, seed=0)
    inp = convops.prep_input(raw, 127, 128, params.n, 1)
    ct = ctx.encrypt(ctx.encoder.encode_coeffs(inp, params.scale, 1))
    out = convops.eval_conv_bn(ctx, ct, ker, bn_a, bn_b, 128, 3, 4, 4, 1,
                               float(1 << 30))
    got = convops.post_process(ctx.decrypt_decode_coeffs(out), 127, 128)

    # (a) agree with the reference binary's own decrypted outputs
    np.testing.assert_allclose(got[:10], ref_vals, atol=2e-5)
    # (b) precision vs the plain oracle matches the binary's stats
    # (binary: avg 25.08 bits, min 22.97; thresholds = binary − 1 bit
    # so a ≥1-bit regression of mean precision fails)
    lg = -np.log2(np.abs(got - plain) + 1e-300)
    assert lg.mean() > 24.0, f"avg precision {lg.mean():.2f} bits"
    assert lg.min() > 21.9, f"min precision {lg.min():.2f} bits"


@pytest.mark.skipif(os.environ.get("OPTCONV_RUN_HEAVY") != "1",
                    reason="logN=16 bootstrap pipeline — run explicitly "
                           "(OPTCONV_RUN_HEAVY=1), e.g. on the TPU via "
                           "scripts/run_convrelu_parity.py")
def test_reference_binary_parity_convrelu():
    """convReLU 3 0 1 — the full conv→CtoS→ReLU→StoC pipeline against
    the binary's decrypted outputs (tests/golden ref_conv_3_0_1.json
    ["convReLU"], captured from `test_run convReLU 3 0 1` at the exact
    moduli; /root/reference/main.go:639-643, eval.go:272-607, pow=4.0,
    kind "Conv", test.go:15-76)."""
    from optimal_conv_tpu.ckks.bootstrap import BootstrapperFamily
    from optimal_conv_tpu.ops.pipeline import eval_conv_bn_relu, LayerMaps
    from optimal_conv_tpu.ops import repack as rp

    g = json.load(open(GOLDEN))["convReLU"]["ours"]
    ref_vals = np.array(g["values_test"])

    raw, ker, bn_a, bn_b = _synth_inputs()
    params = boot_params(16)
    ctx = CkksContext(params, seed=0)
    btps = BootstrapperFamily(ctx, None)
    vec = params.n // 2
    maps = LayerMaps(ext_idx=[rp.gen_keep_vec(vec, 128, 127, 0),
                              rp.gen_keep_vec(vec, 128, 127, 1)])
    inp = convops.prep_input(raw, 127, 128, params.n, 1)
    ct = ctx.encrypt(ctx.encoder.encode_coeffs(inp, params.scale, 1))
    out = eval_conv_bn_relu(ctx, btps, ct, ker, bn_a, bn_b, 0.0, 4.0, 128,
                            127, 3, 4, 4, 1, 0, 1, 2, 0, "Conv", maps)
    got = convops.post_process(ctx.decrypt_decode_coeffs(out), 127, 128)

    # the binary's outputs carry the ReLU-composite approximation error
    # (avg 7.73 bits vs EXACT relu); two faithful evaluations of the
    # SAME pipeline must agree far tighter than that
    lg = -np.log2(np.abs(got[:10] - ref_vals) + 1e-300)
    assert lg.mean() > 12.0, f"avg agreement {lg.mean():.2f} bits: " \
        f"{got[:10]} vs {ref_vals}"

    # and our own precision vs exact conv+ReLU must match the binary's
    # stats (avg 7.73, min 6.1 — the sine/poly approximation floor)
    img = raw.reshape(127, 127, 4)
    kk = ker.reshape(3, 3, 4, 4)
    from optimal_conv_tpu.ops.relu import relu_np
    plain = relu_np(convops.conv2d_same_np(img, kk) * bn_a + bn_b).ravel()
    lgp = -np.log2(np.abs(got - plain) + 1e-300)
    assert lgp.mean() > 7.0, f"avg precision {lgp.mean():.2f} bits"
