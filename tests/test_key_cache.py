"""Unit tests for the _KeyCache budget tiers (ckks/context.py:55-127).

The cache backs sharded key residency at logN=16 (keys are 100-400 MB
each; the Go reference instead keeps ~100 GB resident in host RAM —
/root/reference/README.md:67).  Its two documented invariants have no
other coverage:

  * trims NEVER touch the most-recent entry (it may be the key being
    expanded right now; the caller holds no other reference), and the
    d1 returned by swk_d1 stays valid even if _trim immediately
    re-compresses the key;
  * eviction is transparent — a miss regenerates the bit-identical key
    from its deterministic seed (both the d1 memo of a compressed key
    and a whole evicted galh key, including its pre-permutation).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from optimal_conv_tpu.ckks.context import _KeyCache, SwitchingKey, CkksContext
from optimal_conv_tpu.ckks.params import tiny_params
from optimal_conv_tpu.core import ntt as nttmod


def _mk(level=0, beta=2, n=16, compressed=True):
    d0 = jnp.zeros((beta, 3, n), dtype=jnp.uint64)
    if compressed:
        return SwitchingKey(d0, None, level, seed=0)
    return SwitchingKey(d0, d0, level, seed=0)


SZ = 2 * 3 * 16 * 8          # d0 bytes of one _mk key (768)


def test_resident_tier_lru_eviction():
    c = _KeyCache(max_bytes=3 * SZ + 1, policy="lru")
    ks = [_mk() for _ in range(4)]
    for i, k in enumerate(ks[:3]):
        c.put(i, k)
    assert c.d0_bytes == 3 * SZ and set(c.d) == {0, 1, 2}
    c.get(0)                              # 0 becomes most-recent
    c.put(3, ks[3])                       # over budget -> evict LRU = 1
    assert set(c.d) == {0, 2, 3}
    assert c.d0_bytes == 3 * SZ
    # uncompressed keys charge d0+d1 (2x) and their eviction refunds 2x
    big = _mk(compressed=False)
    c.put(4, big)                         # 2*SZ -> evicts 0 then 2
    assert 4 in c.d and c.d0_bytes <= c.max_bytes


def test_resident_tier_mru_eviction_cyclic():
    """The default 'mru' policy: under a cyclic scan whose working set
    exceeds the budget (a fused layer's CtoS→…→StoC key cycle), the
    early keys stay resident and hit every cycle — LRU would miss every
    access (the flagship's measured 4-6 s/stage key-churn regime)."""
    cap, w = 4, 6
    c = _KeyCache(max_bytes=cap * SZ + 1, policy="mru")
    hits = 0
    for cycle in range(4):
        for k in range(w):
            if c.get(k) is not None:
                hits += 1
            else:
                c.put(k, _mk())
    assert c.d0_bytes <= c.max_bytes
    # after warmup, each cycle hits the pinned cap-1 keys (minus the
    # occasional every-8th LRU-side eviction)
    assert hits >= (cap - 2) * 3, hits
    # never evicts the just-inserted entry
    assert w - 1 in c.d


def test_resident_tier_never_evicts_last_entry():
    c = _KeyCache(max_bytes=1)            # nothing fits
    c.put("only", _mk())
    assert "only" in c.d                  # len==1 guard keeps it
    c.put("next", _mk())
    assert "next" in c.d and "only" not in c.d


def test_memo_tier_drops_coldest_first_and_spares_newest():
    c = _KeyCache(max_bytes=100 * SZ, expand_bytes=2 * SZ)
    ks = {i: _mk() for i in range(4)}
    for i, k in ks.items():
        c.put(i, k)
    for i in (0, 1, 2):                   # expand three memos
        ks[i].d1_cache = ks[i].d0
        c.note_expand(ks[i])
    # over the memo budget by SZ: coldest memo (key 0) dropped, the
    # most-recent ENTRY (key 3, no memo) untouched, others kept
    assert ks[0].d1_cache is None
    assert ks[1].d1_cache is not None and ks[2].d1_cache is not None
    assert c.d1_bytes == 2 * SZ
    # newest entry's memo survives even when it alone busts the budget
    c2 = _KeyCache(max_bytes=100 * SZ, expand_bytes=0)
    a, b = _mk(), _mk()
    c2.put("a", a)
    c2.put("b", b)
    b.d1_cache = b.d0
    c2.note_expand(b)                     # b is most-recent: spared
    assert b.d1_cache is not None and c2.d1_bytes == SZ
    a.d1_cache = a.d0
    c2.note_expand(a)                     # a is NOT most-recent: dropped
    assert a.d1_cache is None and b.d1_cache is not None


def test_interleaved_get_put_expand_accounting():
    c = _KeyCache(max_bytes=4 * SZ, expand_bytes=2 * SZ)
    keys = {}
    for i in range(12):
        k = _mk()
        keys[i] = k
        c.put(i, k)
        if i % 2:
            k.d1_cache = k.d0
            c.note_expand(k)
        c.get(max(0, i - 1))
        assert c.d0_bytes <= c.max_bytes or len(c.d) == 1
        assert c.d1_bytes <= c.expand_bytes or (
            list(c.d.values())[-1].d1_cache is not None)
        # byte counters must agree with the dict contents exactly
        want0 = sum(c._size0(s) for s in c.d.values())
        want1 = sum(s.d0.size * 8 for s in c.d.values()
                    if s.d1 is None and s.d1_cache is not None)
        assert c.d0_bytes == want0 and c.d1_bytes == want1


@pytest.fixture(scope="module")
def cctx(request):
    import os
    os.environ["OPTCONV_COMPRESS_KEYS"] = "1"
    request.addfinalizer(lambda: os.environ.pop("OPTCONV_COMPRESS_KEYS"))
    return CkksContext(tiny_params(log_n=8, levels=3), seed=11)


def test_galh_regen_after_memo_drop_bit_identity(cctx):
    g = nttmod.rot_to_galois(3, cctx.params.log_n)
    swk = cctx.galois_key_hoisted(g, 2)
    assert swk.d1 is None and swk.perm is not None
    d1_first = np.asarray(cctx.swk_d1(swk))
    swk.d1_cache = None                   # simulate memo-tier trim
    cctx._swk_cache.d1_bytes = 0
    d1_again = np.asarray(cctx.swk_d1(swk))
    np.testing.assert_array_equal(d1_first, d1_again)


def test_galh_regen_after_full_evict_bit_identity(cctx):
    g = nttmod.rot_to_galois(5, cctx.params.log_n)
    swk = cctx.galois_key_hoisted(g, 2)
    d0_first = np.asarray(swk.d0)
    d1_first = np.asarray(cctx.swk_d1(swk))
    # evict EVERYTHING (LRU clear, as under extreme HBM pressure)
    cctx._swk_cache.d.clear()
    cctx._swk_cache.d0_bytes = cctx._swk_cache.d1_bytes = 0
    swk2 = cctx.galois_key_hoisted(g, 2)
    assert swk2 is not swk
    np.testing.assert_array_equal(d0_first, np.asarray(swk2.d0))
    np.testing.assert_array_equal(d1_first, np.asarray(cctx.swk_d1(swk2)))


def test_inflight_d1_survives_zero_budget(cctx):
    """swk_d1's returned array stays usable when _trim immediately
    re-compresses the key (the trim-during-expand race fixed round 2)."""
    cache = cctx._swk_cache
    old_budget = cache.expand_bytes
    try:
        cache.expand_bytes = 0
        g = nttmod.rot_to_galois(7, cctx.params.log_n)
        swk = cctx.galois_key_hoisted(g, 1)
        cctx.galois_key(3, 1)             # make swk non-most-recent
        d1 = cctx.swk_d1(swk)
        assert d1 is not None
        got = np.asarray(d1)              # local ref must be concrete
        assert swk.d1_cache is None       # cache re-compressed it
        cache.expand_bytes = 1 << 40
        np.testing.assert_array_equal(got, np.asarray(cctx.swk_d1(swk)))
    finally:
        cache.expand_bytes = old_budget
