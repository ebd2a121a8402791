#!/usr/bin/env python
"""Micro-benchmarks: rotations/sec, hoisted rotations/sec, NTT/sec,
ct×ct mul/sec per chip — the BASELINE.json north-star per-chip rates.

    python scripts/bench_micro.py [--logn 15] [--limbs 24] [--cpu]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=15)
    ap.add_argument("--limbs", type=int, default=24)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from optimal_conv_tpu.ckks.params import CkksParams
    from optimal_conv_tpu.ckks.context import CkksContext

    params = CkksParams(log_n=args.logn,
                        logq=(60,) + (45,) * (args.limbs - 1),
                        logp=(61,) * 4, log_scale=30, h=192)
    ctx = CkksContext(params, seed=0)
    lvl = params.max_level
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, params.n)
    # distinct inputs per iteration (the tunnel memoizes identical
    # (executable, input) pairs) and ONE drain per benchmark: a host
    # sync round-trip is ~30 ms and must not be counted per call.
    cts = [ctx.encrypt(ctx.encoder.encode_coeffs(
        v * (1.0 - 1e-6 * i), params.scale, lvl))
        for i in range(args.iters + 1)]

    from optimal_conv_tpu.utils.timing import sync

    def rate(name, fn, per_call=1):
        out = fn(cts[0])                   # warmup/compile
        sync(*jax.tree_util.tree_leaves(out))
        t0 = time.perf_counter()
        outs = [fn(cts[1 + i]) for i in range(args.iters)]
        sync(*jax.tree_util.tree_leaves(outs[-1]))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:28s} {dt * 1e3:8.2f} ms/call  "
              f"{per_call / dt:8.1f} /s", flush=True)
        return dt

    idx = params.q_idx(lvl)

    rate("ntt [L,N]", lambda c: params.ntt.ntt(c.c0, idx))
    rate("rotate (keyswitch)", lambda c: ctx.rotate(c, 1).c0)
    rots = list(range(1, 9))
    rate("hoisted rotate ×8", lambda c: ctx.rotate_hoisted(c, rots)[8].c0,
         per_call=8)
    rate("ct×ct mul+relin", lambda c: ctx.mul_ct(c, c).c0)
    rate("rescale", lambda c: ctx.rescale(c).c0)

    print(f"(logN={args.logn}, {args.limbs} Q-limbs + 4P, "
          f"platform={jax.devices()[0].platform})")


if __name__ == "__main__":
    main()
