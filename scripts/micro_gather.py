#!/usr/bin/env python
"""Micro: NTT-domain Galois gather (jnp.take 65536-perm) vs cyclic roll
on the real TPU — decides whether the cyclic-order automorphism rewrite
(every Galois g = ±5^t mod 2N ⇒ branch-swap + roll) is worth building.

Chained timing protocol (one drain per span — CLAUDE.md tunnel note).
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = 1 << 16
    rows = 32                      # ≈ nqp at the production chain
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(n))
    xs = [jnp.asarray(rng.integers(0, 1 << 62, (rows, n), dtype=np.uint64))
          for _ in range(9)]

    def take(a):
        return jnp.take(a, perm, axis=-1)

    def roll(a):
        return jnp.roll(a, 12345, axis=-1)

    def swaproll(a):
        b = a.reshape(rows, 2, n // 2)
        b = jnp.roll(b[:, ::-1, :], 12345, axis=-1)
        return b.reshape(rows, n)

    for name, fn in [("take_perm", take), ("roll", roll),
                     ("swap_roll", swaproll)]:
        f = jax.jit(fn)
        np.asarray(f(xs[0])[0, 0])          # warm + drain
        t0 = time.perf_counter()
        outs = [f(x) for x in xs[1:]]
        np.asarray(outs[-1][0, 0])          # one drain
        dt = (time.perf_counter() - t0) / (len(xs) - 1)
        print(f"{name}: {dt*1e3:.3f} ms  ({rows}x{n} u64, "
              f"{rows*n*8/dt/1e9:.1f} GB/s eff read)")


if __name__ == "__main__":
    main()
