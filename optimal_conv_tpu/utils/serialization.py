"""Key / ciphertext serialization.

The reference never persists anything — keys are regenerated in every
process (newContext) and the only checkpoints are per-sample logits CSVs
(SURVEY.md §5 checkpoint/resume).  Here keys and ciphertexts round-trip
through npz so a 100 GB-class key set can be generated once and reloaded
(or staged per level from host memory).
"""

from __future__ import annotations

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
    """Persist the secret key + every cached switching key."""
    blobs = {"sk": ctx._sk_ints}
    index = []
    for i, (key, swk) in enumerate(ctx._swk_cache.items()):
        blobs[f"d0_{i}"] = np.asarray(swk.d0)
        blobs[f"d1_{i}"] = np.asarray(swk.d1)
        index.append((repr(key), swk.level))
    blobs["index"] = np.array(index, dtype=object)
    np.savez_compressed(path, **blobs)


def load_keys(path: str, ctx: CkksContext) -> int:
    """Restore cached switching keys into a context built with the same
    params + seed (the secret key must match).  Returns #keys loaded."""
    z = np.load(path, allow_pickle=True)
    assert np.array_equal(z["sk"], ctx._sk_ints), "secret key mismatch"
    index = z["index"]
    for i, (key_repr, level) in enumerate(index):
        key = eval(key_repr)  # keys are tuples of str/int built by us
        ctx._swk_cache[key] = SwitchingKey(
            jnp.asarray(z[f"d0_{i}"]), jnp.asarray(z[f"d1_{i}"]), int(level))
    return len(index)
