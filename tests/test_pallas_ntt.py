"""Pallas NTT/iNTT kernels vs the XLA reshape-stage reference.

The Pallas path must be BIT-IDENTICAL to core/ntt.py's XLA transforms
(same butterfly network, same bit-reversed output convention) so the
two backends can be swapped freely (auto-selected per platform).  On
CPU the kernels run in interpreter mode — small sizes only.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from optimal_conv_tpu.core import ntt as nttmod
from optimal_conv_tpu.core import modmath as mm
from optimal_conv_tpu.core import pallas_ntt as pntt


@pytest.fixture(scope="module")
def setup():
    log_n = 10
    mods = mm.gen_ntt_primes(log_n, [60, 45, 30, 55, 61])
    ctx = nttmod.NttContext(mods, log_n)
    tabs = pntt.PallasNttTables(mods, log_n, ctx.psi)
    return log_n, mods, ctx, tabs


def _rand(mods, n, rng, shape=()):
    return np.stack([rng.integers(0, q, size=shape + (n,), dtype=np.uint64)
                     for q in mods], axis=-2 if shape else 0)


def test_forward_exact(setup):
    log_n, mods, ctx, tabs = setup
    n = 1 << log_n
    rng = np.random.default_rng(0)
    a = jnp.asarray(_rand(mods, n, rng))
    idx = tuple(range(len(mods)))
    ref = np.asarray(ctx.ntt(a, idx))
    got = np.asarray(pntt.transform(a, idx, tabs, False, True))
    assert np.array_equal(ref, got)


def test_inverse_exact_and_roundtrip(setup):
    log_n, mods, ctx, tabs = setup
    n = 1 << log_n
    rng = np.random.default_rng(1)
    a = jnp.asarray(_rand(mods, n, rng))
    idx = tuple(range(len(mods)))
    fwd = ctx.ntt(a, idx)
    ref = np.asarray(ctx.intt(fwd, idx))
    got = np.asarray(pntt.transform(fwd, idx, tabs, True, True))
    assert np.array_equal(ref, got)
    assert np.array_equal(got, np.asarray(a))


def test_limb_subset(setup):
    """Non-prefix limb subsets (rescale / mod-down call patterns)."""
    log_n, mods, ctx, tabs = setup
    n = 1 << log_n
    rng = np.random.default_rng(2)
    idx = (3, 1)
    a = jnp.asarray(np.stack([
        rng.integers(0, mods[i], size=n, dtype=np.uint64) for i in idx]))
    ref = np.asarray(ctx.ntt(a, idx))
    got = np.asarray(pntt.transform(a, idx, tabs, False, True))
    assert np.array_equal(ref, got)


def test_batched(setup):
    """[beta, l, N] batch dims (key-switch decompose call pattern)."""
    log_n, mods, ctx, tabs = setup
    n = 1 << log_n
    rng = np.random.default_rng(3)
    idx = (0, 1, 2)
    a = np.stack([_rand([mods[i] for i in idx], n, rng) for _ in range(3)])
    aj = jnp.asarray(a)
    ref = np.asarray(ctx.ntt(aj, idx))
    got = np.asarray(pntt.transform(aj, idx, tabs, False, True))
    assert ref.shape == got.shape == a.shape
    assert np.array_equal(ref, got)
