"""Double-hoisted BSGS LinearTransform (Bossuat et al. 2021).

The double-hoisted path keeps baby rotations in the QP basis (no
per-baby mod-down), multiplies by QP-encoded plaintexts and divides by
P once per giant.  It must agree with the single-hoisted path to within
keyswitch noise, and both must match the plain diagonal-matrix oracle
(the reference's BSGS semantics — /root/reference/conv.go:303-344).
"""

import numpy as np
import pytest

from optimal_conv_tpu.ckks.params import mini_boot_params
from optimal_conv_tpu.ckks.bootstrap import LinearTransform
from optimal_conv_tpu.ckks.context import CkksContext

PARAMS = mini_boot_params(log_n=9)
RNG = np.random.default_rng(5)
SLOTS = PARAMS.slots


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(PARAMS, seed=3)


def _diag_oracle(diags, z):
    out = np.zeros(SLOTS, dtype=np.complex128)
    for k, v in diags.items():
        out += v * np.roll(z, -k)
    return out


@pytest.mark.parametrize("keys", [
    (0, 1, 2, 5, 9, 12),     # identity baby, dense + sparse giants
    (3, 7),                  # no identity rotation anywhere
])
def test_double_hoist_matches_single(ctx, keys):
    level = PARAMS.boot_layout["stoc"][1] - 1
    diags = {k: RNG.uniform(-1, 1, SLOTS) + 1j * RNG.uniform(-1, 1, SLOTS)
             for k in keys}
    z = RNG.uniform(-1, 1, SLOTS) + 1j * RNG.uniform(-1, 1, SLOTS)
    scale = float(PARAMS.scale)
    ct = ctx.encrypt(ctx.encoder.encode_slots(z, scale, level))

    lt_sh = LinearTransform(ctx, diags, level, double_hoist=False)
    lt_dh = LinearTransform(ctx, diags, level, double_hoist=True)
    out_sh = ctx.decrypt_decode_slots(lt_sh(ct))
    out_dh = ctx.decrypt_decode_slots(lt_dh(ct))

    want = _diag_oracle(diags, z)
    tol = 2e-2
    np.testing.assert_allclose(out_sh, want, atol=tol)
    np.testing.assert_allclose(out_dh, want, atol=tol)
    # the two paths differ only by mod-down rounding order (≪ ks noise)
    np.testing.assert_allclose(out_dh, out_sh, atol=1e-3)


def test_identity_triple_is_exact(ctx):
    """hoistid embeds P·c1 on the Q rows: mod-down must recover the
    ciphertext EXACTLY (no basis-extension noise for a zero P-part)."""
    level = 3
    z = RNG.uniform(-1, 1, SLOTS)
    ct = ctx.encrypt(ctx.encoder.encode_slots(z, float(PARAMS.scale), level))
    c0q, a0, a1 = ctx.rotate_hoisted_lazy(ct, [0])[0]
    md = ctx._mod_down_builder(level)
    np.testing.assert_array_equal(np.asarray(c0q), np.asarray(ct.c0))
    np.testing.assert_array_equal(np.asarray(md(a1)), np.asarray(ct.c1))
    assert not np.asarray(a0).any()
