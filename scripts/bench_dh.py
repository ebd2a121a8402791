#!/usr/bin/env python
"""Measure the double-hoisted (lazy) baby rotation vs the single-hoisted
one on hardware: the per-baby saving is exactly the mod-down the lazy
path skips (rotate_hoisted_lazy vs rotate_hoisted at the same level).

    python scripts/bench_dh.py [--level 16] [--rots 4] [--iters 8]

Keeps device allocations small (a few hundred MB) so it can run next to
a live model process on the same chip.  Timing protocol: distinct-input
chains with ONE drain per span (CLAUDE.md tunnel note).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=16)
    ap.add_argument("--level", type=int, default=16)
    ap.add_argument("--rots", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    from optimal_conv_tpu.ckks.params import boot_params
    from optimal_conv_tpu.ckks.context import CkksContext
    from optimal_conv_tpu.ckks.types import Ciphertext
    from optimal_conv_tpu.utils.timing import sync

    params = boot_params(args.logn)
    ctx = CkksContext(params, seed=0)
    lvl = args.level
    rng = np.random.default_rng(0)
    rots = [1 << i for i in range(args.rots)]

    def dummy_ct(j):
        rows = np.stack([rng.integers(0, params.moduli[i], size=params.n,
                                      dtype=np.uint64)
                         for i in range(lvl + 1)])
        return Ciphertext(jnp.asarray(rows), jnp.asarray(rows), level=lvl,
                          scale=params.scale)

    cts = [dummy_ct(j) for j in range(args.iters + 1)]

    def span(fn, label):
        out = fn(cts[0])           # warm: compiles + keys
        sync(*[x for v in out.values()
               for x in (v if isinstance(v, tuple) else (v.c0, v.c1))])
        t0 = time.perf_counter()
        outs = [fn(cts[1 + i]) for i in range(args.iters)]
        last = list(outs[-1].values())[-1]
        sync(*(last if isinstance(last, tuple) else (last.c0, last.c1)))
        dt = (time.perf_counter() - t0) / args.iters / len(rots)
        print(f"{label}: {dt * 1e3:.2f} ms/rotation "
              f"({len(rots)} rots x {args.iters} iters)", flush=True)
        return dt

    t_sh = span(lambda c: ctx.rotate_hoisted(c, rots), "hoisted (mod-down)")
    t_dh = span(lambda c: ctx.rotate_hoisted_lazy(c, rots), "lazy (no md)")
    print(f"per-baby saving at level {lvl}: {(t_sh - t_dh) * 1e3:.2f} ms "
          f"({t_sh / t_dh:.2f}x)")


if __name__ == "__main__":
    main()
