"""Key / ciphertext serialization.

The reference never persists anything — keys are regenerated in every
process (newContext) and the only checkpoints are per-sample logits CSVs
(SURVEY.md §5 checkpoint/resume).  Here keys and ciphertexts round-trip
through npz so a 100 GB-class key set can be generated once and reloaded
(or staged per level from host memory).

Switching keys live in the context's LRU ``_KeyCache`` and may be
seed-compressed (``d1 is None``; the uniform half regenerates from the
stored per-key seed) — both forms round-trip.
"""

from __future__ import annotations

import ast

import numpy as np
import jax.numpy as jnp

from ..ckks.context import CkksContext, SwitchingKey
from ..ckks.types import Ciphertext


def save_ciphertext(path: str, ct: Ciphertext) -> None:
    np.savez_compressed(path, c0=np.asarray(ct.c0), c1=np.asarray(ct.c1),
                        level=ct.level, scale=ct.scale, is_ntt=ct.is_ntt)


def load_ciphertext(path: str) -> Ciphertext:
    z = np.load(path)
    return Ciphertext(jnp.asarray(z["c0"]), jnp.asarray(z["c1"]),
                      level=int(z["level"]), scale=float(z["scale"]),
                      is_ntt=bool(z["is_ntt"]))


def save_keys(path: str, ctx: CkksContext) -> None:
    """Persist the secret key + every cached switching key (compressed
    keys store d0 + seed only — d1_cache is never persisted)."""
    blobs = {"sk": ctx._sk_ints}
    index = []
    for i, (key, swk) in enumerate(ctx._swk_cache.d.items()):
        blobs[f"d0_{i}"] = np.asarray(swk.d0)
        if swk.d1 is not None:
            blobs[f"d1_{i}"] = np.asarray(swk.d1)
        if swk.perm is not None:
            # pre-permuted hoisting keys ("galh") regenerate a compressed
            # d1 by re-applying `perm` — dropping it on reload silently
            # corrupts every hoisted rotation after a key-cache miss
            blobs[f"perm_{i}"] = np.asarray(swk.perm)
        index.append((repr(key), int(swk.level),
                      -1 if swk.seed is None else int(swk.seed),
                      swk.d1 is not None, swk.perm is not None))
    blobs["index"] = np.array(
        [(k, str(l), str(s), str(h), str(pp)) for k, l, s, h, pp in index],
        dtype=object)
    np.savez_compressed(path, **blobs)


def load_keys(path: str, ctx: CkksContext) -> int:
    """Restore cached switching keys into a context built with the same
    params + seed (the secret key must match).  Returns #keys loaded."""
    z = np.load(path, allow_pickle=True)
    assert np.array_equal(z["sk"], ctx._sk_ints), "secret key mismatch"
    index = z["index"]
    for i, row in enumerate(index):
        # pre-round-3 archives have 4-column rows (no perm flag)
        key_repr, level, seed, has_d1 = row[:4]
        has_perm = len(row) > 4 and row[4] == "True"
        key = ast.literal_eval(key_repr)   # tuples of str/int built by us
        seed = int(seed)
        swk = SwitchingKey(
            jnp.asarray(z[f"d0_{i}"]),
            jnp.asarray(z[f"d1_{i}"]) if has_d1 == "True" else None,
            int(level), seed=None if seed < 0 else seed,
            perm=jnp.asarray(z[f"perm_{i}"]) if has_perm else None)
        ctx._swk_cache.put(key, swk)
    return len(index)
