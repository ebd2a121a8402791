#!/usr/bin/env python
"""Wide-stack NTT backend shootout at the production shape.

The bootstrap CtoS/EvalMod keyswitches transform [>12, 2^16] limb
stacks, which the 'auto' backend routes to the looped schedule
(core/ntt.py _resolved_backend).  This measures the candidates at the
real shapes and the end effect on a level-27 hoisted rotation:

    python scripts/ntt_wide_bench.py [--limbs 32] [--iters 8]

Chained-timing protocol (one drain per span, distinct inputs).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--limbs", type=int, default=32)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--logn", type=int, default=16)
    ap.add_argument("--rotate", action="store_true",
                    help="also measure a level-27 hoisted rotation "
                         "(production chain) under each wide backend")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from optimal_conv_tpu.core import ntt as nt
    from optimal_conv_tpu.core import modmath as mm
    from optimal_conv_tpu.utils.timing import sync

    moduli = mm.gen_ntt_primes(args.logn, [50] + [45] * (args.limbs - 1))
    ctx = nt.NttContext(moduli, args.logn)
    idx = tuple(range(args.limbs))
    n = 1 << args.logn
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(np.stack([rng.integers(0, q, n, dtype=np.uint64)
                                for q in moduli]))
          for _ in range(args.iters + 1)]
    q, qinv, _, _, psi, ipsi, ninv = ctx.tabs(idx)

    res = {"limbs": args.limbs, "logn": args.logn}
    gb = args.limbs * n * 8 / 1e9

    def run(name, fn):
        t0 = time.perf_counter()
        out = fn(xs[0])
        sync(out)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [fn(x) for x in xs[1:]]
        sync(outs[-1])
        dt = (time.perf_counter() - t0) / args.iters
        res[name + "_ms"] = round(dt * 1e3, 2)
        print(f"{name}: {dt*1e3:.2f} ms  (cold {cold:.1f} s, "
              f"{2*gb/dt:.0f} GB/s rw-once equiv)", flush=True)
        return outs[-1]

    twA, f2, f1, itwB2, itwB1, itwA, lninv = ctx._loop_tabs(idx)
    a = run("fwd_roll", lambda x: nt._ntt_fwd_loop(
        x, twA, f2, f1, q, qinv, args.logn))
    b = run("fwd_pease", lambda x: nt._ntt_fwd_pease(
        x, psi, q, qinv, args.logn))
    assert np.array_equal(np.asarray(a), np.asarray(b)), "fwd mismatch"
    a = run("inv_roll", lambda x: nt._ntt_inv_loop(
        x, itwB2, itwB1, itwA, lninv, q, qinv, args.logn))
    b = run("inv_pease", lambda x: nt._ntt_inv_pease(
        x, ipsi, ninv, q, qinv, args.logn))
    assert np.array_equal(np.asarray(a), np.asarray(b)), "inv mismatch"

    if args.rotate:
        from optimal_conv_tpu.ckks.params import boot_params
        from optimal_conv_tpu.ckks.context import CkksContext
        from optimal_conv_tpu.ckks.types import Ciphertext
        p = boot_params(args.logn)
        cctx = CkksContext(p, seed=0)
        lvl = p.max_level
        rows = np.stack([rng.integers(0, p.moduli[i], p.n, dtype=np.uint64)
                         for i in range(lvl + 1)])
        ct = Ciphertext(jnp.asarray(rows), jnp.asarray(rows), level=lvl,
                        scale=p.scale)
        cts = [Ciphertext(ct.c0 + jnp.uint64(i), ct.c1, level=lvl,
                          scale=p.scale) for i in range(args.iters + 1)]
        out = cctx.rotate_hoisted(cts[0], [1, 2])
        sync(out[2].c0)
        t0 = time.perf_counter()
        outs = [cctx.rotate_hoisted(c, [1, 2]) for c in cts[1:]]
        sync(outs[-1][2].c0)
        dt = (time.perf_counter() - t0) / args.iters
        res["hoisted_rotate_pair_L27_ms"] = round(dt * 1e3, 1)
        print(f"hoisted rotate pair @L{lvl}: {dt*1e3:.1f} ms", flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
