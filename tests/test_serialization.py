"""Round-trip tests for utils/serialization — keys (both plain and
seed-compressed forms) and ciphertexts, verified by decrypting and by
running a rotation with reloaded keys only.

Mirrors nothing in the reference (it regenerates keys per process,
SURVEY.md §5); this subsystem backs host-staged key residency at
logN=16.
"""

import numpy as np
import pytest

from optimal_conv_tpu.ckks.params import tiny_params
from optimal_conv_tpu.ckks.context import CkksContext
from optimal_conv_tpu.utils import serialization as ser


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(tiny_params(log_n=8, levels=3), seed=7)


def test_ciphertext_roundtrip(tmp_path, ctx):
    p = ctx.params
    msg = np.arange(p.n) / p.n - 0.5
    ct = ctx.encrypt(ctx.encoder.encode_coeffs(msg, p.scale, p.max_level))
    path = str(tmp_path / "ct.npz")
    ser.save_ciphertext(path, ct)
    ct2 = ser.load_ciphertext(path)
    assert ct2.level == ct.level and ct2.scale == ct.scale
    got = ctx.decrypt_decode_coeffs(ct2)
    np.testing.assert_allclose(got, msg, atol=1e-5)


@pytest.mark.parametrize("compress", [False, True])
def test_key_roundtrip(tmp_path, compress, monkeypatch):
    monkeypatch.setenv("OPTCONV_COMPRESS_KEYS", "1" if compress else "0")
    p = tiny_params(log_n=8, levels=3)
    ctx = CkksContext(p, seed=3)
    # populate the cache: relin + two rotation keys
    lvl = p.max_level
    ctx.relin_key(lvl)
    ctx.rot_key(1, lvl)
    ctx.rot_key(4, lvl - 1)
    n_keys = len(ctx._swk_cache.d)
    assert n_keys >= 3
    path = str(tmp_path / "keys.npz")
    ser.save_keys(path, ctx)

    # fresh context, same params/seed: load instead of regenerating
    ctx2 = CkksContext(p, seed=3)
    assert len(ctx2._swk_cache.d) == 0
    n_loaded = ser.load_keys(path, ctx2)
    assert n_loaded == n_keys
    for key, swk in ctx._swk_cache.d.items():
        swk2 = ctx2._swk_cache.d[key]
        np.testing.assert_array_equal(np.asarray(swk.d0), np.asarray(swk2.d0))
        assert (swk.d1 is None) == (swk2.d1 is None)
        assert swk.seed == swk2.seed
        assert swk.level == swk2.level

    # the loaded keys actually work: rotate with ctx2 (keys come from the
    # cache — same seed means regeneration would too, but array equality
    # above already pins that the *stored* tensors are used)
    msg = np.sin(np.arange(p.n))
    ct = ctx2.encrypt(ctx2.encoder.encode_coeffs(msg, p.scale, lvl))
    out = ctx2.rotate(ct, 1)
    got = ctx2.decrypt_decode_coeffs(out)
    assert np.isfinite(got).all()


def test_hoisted_key_perm_survives_reload(tmp_path):
    """Round-3 regression: load_keys used to drop SwitchingKey.perm, so a
    reloaded compressed "galh" key regenerated an UNPERMUTED d1 against a
    permuted d0 — silently wrong hoisted rotations.  Value-checks the
    rotation, not isfinite."""
    p = tiny_params(log_n=8, levels=3)
    ctx = CkksContext(p, seed=11)
    ctx._compress_keys = True
    lvl = p.max_level
    msg = np.sin(np.arange(p.n))
    ct = ctx.encrypt(ctx.encoder.encode_coeffs(msg, p.scale, lvl))
    rots = [1, 3]
    ref = {r: ctx.decrypt_decode_coeffs(v)
           for r, v in ctx.rotate_hoisted(ct, rots).items()}
    # populate + persist the pre-permuted hoisting keys
    for r in rots:
        swk = ctx.galois_key_hoisted(pow(5, r, 2 * p.n), lvl)
        assert swk.perm is not None and swk.d1 is None
    path = str(tmp_path / "keys.npz")
    ser.save_keys(path, ctx)

    ctx2 = CkksContext(p, seed=11)
    ctx2._compress_keys = True
    ser.load_keys(path, ctx2)
    for key, swk in ctx._swk_cache.d.items():
        swk2 = ctx2._swk_cache.d[key]
        assert (swk.perm is None) == (swk2.perm is None)
        if swk.perm is not None:
            np.testing.assert_array_equal(np.asarray(swk.perm),
                                          np.asarray(swk2.perm))
            # d1 must regenerate permuted, exactly as the original's
            np.testing.assert_array_equal(np.asarray(ctx.swk_d1(swk)),
                                          np.asarray(ctx2.swk_d1(swk2)))
    got = {r: ctx2.decrypt_decode_coeffs(v)
           for r, v in ctx2.rotate_hoisted(ct, rots).items()}
    for r in rots:
        np.testing.assert_allclose(got[r], ref[r], atol=1e-4)


def test_key_mismatch_rejected(tmp_path):
    p = tiny_params(log_n=8, levels=3)
    ctx = CkksContext(p, seed=3)
    ctx.relin_key(p.max_level)
    path = str(tmp_path / "keys.npz")
    ser.save_keys(path, ctx)
    other = CkksContext(p, seed=4)
    with pytest.raises(AssertionError):
        ser.load_keys(path, other)


def test_key_cache_pressure_returns_valid_d1():
    """Under extreme memory pressure _trim may re-compress the key being
    expanded; swk_d1 must still hand the caller a concrete array (round-2
    regression: returned None mid-trace at logN=16 CtoS)."""
    from optimal_conv_tpu.ckks.params import tiny_params
    from optimal_conv_tpu.ckks.context import CkksContext

    p = tiny_params(log_n=8, levels=3)
    ctx = CkksContext(p, seed=5)
    ctx._compress_keys = True
    ctx._swk_cache.max_bytes = 1          # everything over budget
    swk = ctx.galois_key_hoisted(5, p.max_level)
    d1 = ctx.swk_d1(swk)
    assert d1 is not None and d1.shape == swk.d0.shape
    # and again after the memo was dropped by the trim
    d1b = ctx.swk_d1(swk)
    assert d1b is not None
    import numpy as np
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d1b))
