"""Four-step MXU NTT backend vs the unrolled butterfly reference.

The 'mxu' backend (int8-decomposed modular matmuls, ψ-twist and output
bit-reversal folded into the constant matrices) must be BIT-IDENTICAL
to the XLA butterfly path.  It is the default at logN ≥ 14 (measured
on v5e at logN=16, [34, 2^16]: fwd 16 ms vs 67 ms unrolled, compile
10 s vs 373 s).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from optimal_conv_tpu.core import ntt as nttmod
from optimal_conv_tpu.core import mxu_ntt
from optimal_conv_tpu.core import modmath as mm


@pytest.mark.parametrize("log_n", [10, 12])
def test_mxu_matches_reference(log_n):
    n = 1 << log_n
    mods = mm.gen_ntt_primes(log_n, [60, 45, 30, 55, 61])
    ctx = nttmod.NttContext(mods, log_n)
    tabs = mxu_ntt.MxuNttTables(mods, log_n, ctx.psi)
    idx = tuple(range(len(mods)))
    rng = np.random.default_rng(0)
    a = np.stack([rng.integers(0, q, size=n, dtype=np.uint64) for q in mods])
    aj = jnp.asarray(a)
    q, qinv = ctx.tabs(idx)[:2]
    g = tabs.group(idx)
    ref = np.asarray(ctx.ntt(aj, idx))
    got = np.asarray(mxu_ntt._mxu_fwd(aj, g[0], g[1], g[2], g[3], g[4],
                                      g[10], g[11], g[12], q, qinv,
                                      log_n, log_n - 8))
    assert np.array_equal(ref, got)
    gi = np.asarray(mxu_ntt._mxu_inv(jnp.asarray(ref), g[5], g[6], g[7],
                                     g[8], g[9], g[10], g[11], g[12],
                                     q, qinv, log_n, log_n - 8))
    assert np.array_equal(gi, a)


def test_mxu_batched_subset():
    log_n = 10
    n = 1 << log_n
    mods = mm.gen_ntt_primes(log_n, [60, 45, 30, 55])
    ctx = nttmod.NttContext(mods, log_n)
    tabs = mxu_ntt.MxuNttTables(mods, log_n, ctx.psi)
    idx = (3, 1)
    rng = np.random.default_rng(1)
    a = np.stack([np.stack([rng.integers(0, mods[i], size=n, dtype=np.uint64)
                            for i in idx]) for _ in range(2)])
    aj = jnp.asarray(a)
    q, qinv = ctx.tabs(idx)[:2]
    g = tabs.group(idx)
    ref = np.asarray(ctx.ntt(aj, idx))
    got = np.asarray(mxu_ntt._mxu_fwd(aj, g[0], g[1], g[2], g[3], g[4],
                                      g[10], g[11], g[12], q, qinv,
                                      log_n, log_n - 8))
    assert np.array_equal(ref, got)


def test_adaptive_byte_planes_bit_exact():
    """OPTCONV_MXU_NB=auto (width-bucketed int8 planes) must be
    bit-identical to the uniform 8-plane path on a production-shaped
    mixed chain (30/45/55/60-bit Q + 61-bit P limbs)."""
    import os
    log_n = 10
    n = 1 << log_n
    sizes = [60, 45, 30, 30, 30, 55, 55, 61, 61]     # mixed widths
    mods = mm.gen_ntt_primes(log_n, sizes)
    rng = np.random.default_rng(3)
    old_b = os.environ.get("OPTCONV_NTT_BACKEND")
    old_nb = os.environ.get("OPTCONV_MXU_NB")
    os.environ["OPTCONV_NTT_BACKEND"] = "mxu"
    try:
        os.environ["OPTCONV_MXU_NB"] = "uniform"
        ctx_u = nttmod.NttContext(mods, log_n)
        os.environ["OPTCONV_MXU_NB"] = "auto"
        ctx_a = nttmod.NttContext(mods, log_n)
        # several limb subsets incl. multi-bucket and leftover-merge cases
        for idx in [tuple(range(len(mods))),      # 3 buckets (8/7/4 + merge)
                    (2, 3, 4),                    # single narrow bucket
                    (0, 7, 8),                    # single wide bucket
                    (1, 2, 3, 4, 5, 6),           # 45 folds into 55-bucket
                    (5, 0, 2)]:                   # unsorted, <3 per class
            a = np.stack([rng.integers(0, mods[i], size=(2, n),
                                       dtype=np.uint64) for i in idx],
                         axis=-2)                 # leading batch dim
            aj = jnp.asarray(a)
            buckets = ctx_a._mxu().buckets(idx)
            assert sorted(p for pos, _ in buckets for p in pos) \
                == list(range(len(idx)))
            ref = np.asarray(ctx_u.ntt(aj, idx))
            got = np.asarray(ctx_a.ntt(aj, idx))
            assert np.array_equal(ref, got), idx
            back = np.asarray(ctx_a.intt(jnp.asarray(got), idx))
            assert np.array_equal(back, a), idx
    finally:
        for k, v in (("OPTCONV_NTT_BACKEND", old_b),
                     ("OPTCONV_MXU_NB", old_nb)):
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_backend_selection_through_context():
    """NttContext dispatch: forcing 'mxu' must equal the 'xla' default."""
    import os
    log_n = 10
    mods = mm.gen_ntt_primes(log_n, [50, 40, 40])
    rng = np.random.default_rng(2)
    a = jnp.asarray(np.stack([rng.integers(0, q, size=1 << log_n,
                                           dtype=np.uint64) for q in mods]))
    ctx = nttmod.NttContext(mods, log_n)
    ref = np.asarray(ctx.ntt(a))
    old = os.environ.get("OPTCONV_NTT_BACKEND")
    os.environ["OPTCONV_NTT_BACKEND"] = "mxu"
    try:
        ctx2 = nttmod.NttContext(mods, log_n)
        got = np.asarray(ctx2.ntt(a))
        back = np.asarray(ctx2.intt(jnp.asarray(got)))
    finally:
        if old is None:
            os.environ.pop("OPTCONV_NTT_BACKEND", None)
        else:
            os.environ["OPTCONV_NTT_BACKEND"] = old
    assert np.array_equal(ref, got)
    assert np.array_equal(back, np.asarray(a))


def test_mxu_scan_over_limb_groups_bit_exact():
    """The scan-over-limb-groups path (wide stacks; core/mxu_ntt.py
    _mxu_fwd_scan/_mxu_inv_scan) is bit-identical to the unrolled MXU
    transform, including a limb count NOT divisible by the group size
    (pad-with-repeat + slice)."""
    log_n = 10
    mods = mm.gen_ntt_primes(log_n, [50, 40, 40, 30, 30, 55, 45, 45, 50,
                                     40, 40, 30, 30, 55, 45, 45, 50])
    ctx = nttmod.NttContext(mods, log_n)
    L = len(mods)
    idx = tuple(range(L))
    rng = np.random.default_rng(3)
    a = jnp.asarray(np.stack([rng.integers(0, q, size=1 << log_n,
                                           dtype=np.uint64) for q in mods])
                    [None])                       # extra batch dim
    f0 = np.asarray(ctx._mxu_transform(a, idx, inverse=False, scan=False))
    f1 = np.asarray(ctx._mxu_transform(a, idx, inverse=False, scan=True))
    assert np.array_equal(f0, f1)
    b0 = np.asarray(ctx._mxu_transform(jnp.asarray(f0), idx, inverse=True,
                                       scan=False))
    b1 = np.asarray(ctx._mxu_transform(jnp.asarray(f1), idx, inverse=True,
                                       scan=True))
    assert np.array_equal(b0, b1)
    assert np.array_equal(b1, np.asarray(a))
