"""Looped uniform-stage NTT backend vs the unrolled reference.

The 'xla_loop' backend (fori_loop roll+mask butterflies, factorized
twiddle planes) must be BIT-IDENTICAL to the unrolled reshape-stage
path — it is the default at logN ≥ 14 where the unrolled graphs take
minutes each in the remote XLA-TPU compile helper.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from optimal_conv_tpu.core import ntt as nttmod
from optimal_conv_tpu.core import modmath as mm


@pytest.mark.parametrize("log_n", [8, 10])
def test_loop_matches_unrolled(log_n):
    n = 1 << log_n
    mods = mm.gen_ntt_primes(log_n, [60, 45, 30, 55, 61])
    ctx = nttmod.NttContext(mods, log_n)
    idx = tuple(range(len(mods)))
    rng = np.random.default_rng(0)
    a = np.stack([rng.integers(0, q, size=n, dtype=np.uint64) for q in mods])
    aj = jnp.asarray(a)
    q, qinv, _, _, psi, ipsi, ninv = ctx.tabs(idx)
    t = ctx._loop_tabs(idx)
    ref = np.asarray(nttmod._ntt_fwd(aj, psi, q, qinv, log_n))
    got = np.asarray(nttmod._ntt_fwd_loop(aj, t[0], t[1], t[2], q, qinv, log_n))
    assert np.array_equal(ref, got)
    gi = np.asarray(nttmod._ntt_inv_loop(jnp.asarray(ref), t[3], t[4], t[5],
                                         t[6], q, qinv, log_n))
    assert np.array_equal(gi, a)


def test_loop_batched_and_subset():
    log_n = 10
    n = 1 << log_n
    mods = mm.gen_ntt_primes(log_n, [60, 45, 30, 55])
    ctx = nttmod.NttContext(mods, log_n)
    rng = np.random.default_rng(1)
    idx = (2, 0)
    a = np.stack([np.stack([rng.integers(0, mods[i], size=n, dtype=np.uint64)
                            for i in idx]) for _ in range(3)])
    aj = jnp.asarray(a)
    q, qinv, _, _, psi, _, _ = ctx.tabs(idx)
    t = ctx._loop_tabs(idx)
    ref = np.asarray(nttmod._ntt_fwd(aj, psi, q, qinv, log_n))
    got = np.asarray(nttmod._ntt_fwd_loop(aj, t[0], t[1], t[2], q, qinv, log_n))
    assert np.array_equal(ref, got)


def test_backend_env_validation(monkeypatch):
    monkeypatch.setenv("OPTCONV_NTT_BACKEND", "bogus")
    with pytest.raises(ValueError):
        nttmod.NttContext(mm.gen_ntt_primes(8, [40]), 8)


def test_auto_backend_resolves_per_call():
    """'auto' at logN>=14 takes MXU for narrow limb stacks (fast compile
    AND fastest runtime) but the compile-light looped backend for wide
    ones (the MXU byte-plane HLO explodes on the remote helper at
    bootstrap-region widths — measured level-27 decntt >50min vs 24s)."""
    from optimal_conv_tpu.core.ntt import NttContext, _MXU_MAX_LIMBS

    c = NttContext([65537], 14)      # 65536 = 2^16 | q-1: negacyclic ok
    assert c.backend == "auto"
    assert c._resolved_backend(tuple(range(2))) == "mxu"
    assert c._resolved_backend(tuple(range(_MXU_MAX_LIMBS))) == "mxu"
    assert c._resolved_backend(tuple(range(_MXU_MAX_LIMBS + 1))) == "xla_loop"
    assert c._resolved_backend(None) == "xla_loop"
    c14 = NttContext([65537], 10)
    assert c14._resolved_backend(tuple(range(20))) == "xla"
