#!/usr/bin/env python
"""Bootstrap benchmark: split-bootstrap (CtoS / StoC) latency and
bootstraps/sec at the production chain (BASELINE.md north-star rows).

    python scripts/bench_boot.py [--logn 16] [--ls 0] [--iters 4] [--cpu]

Timing protocol: distinct inputs per iteration, ONE device drain per
span (the tunnel's host sync is ~30 ms — see CLAUDE.md).
Reference host-CPU numbers for the same op (test_run convReLU 3 0 1,
this container): CtoS 38.8 s, StoC 6.1 s — tests/golden/ref_conv_3_0_1.json.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=16)
    ap.add_argument("--ls", type=int, default=0)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from optimal_conv_tpu.ckks.params import boot_params, mini_boot_params
    from optimal_conv_tpu.ckks.context import CkksContext
    from optimal_conv_tpu.ckks.bootstrap import SplitBootstrapper
    from optimal_conv_tpu.utils.timing import sync

    if args.logn >= 15:
        params = boot_params(args.logn)
        kw = {}
    else:
        params = mini_boot_params(args.logn, n_relu=14)
        kw = dict(k_range=12.0, sin_deg=31, double_angle=3)
    ctx = CkksContext(params, seed=0)
    t0 = time.perf_counter()
    btp = SplitBootstrapper(ctx, log_sparse=args.ls, **kw)
    print(f"bootstrapper built in {time.perf_counter() - t0:.1f}s",
          flush=True)
    rng = np.random.default_rng(0)
    v = rng.uniform(-1, 1, params.n)
    if args.ls:
        m = np.zeros(params.n)
        m[:: 1 << args.ls] = 1.0
        v = v * m
    cts = [ctx.encrypt(ctx.encoder.encode_coeffs(
        v * (1.0 - 1e-6 * i), btp.delta0, 0)) for i in range(args.iters + 1)]

    # warm (compiles)
    t0 = time.perf_counter()
    up, low = btp.ctos(cts[0])
    sync(up.c0)
    t_ctos_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = btp.stoc(up, low)
    sync(out.c0)
    t_stoc_cold = time.perf_counter() - t0
    print(f"cold: ctos {t_ctos_cold:.1f}s stoc {t_stoc_cold:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    ups = [btp.ctos(cts[1 + i]) for i in range(args.iters)]
    sync(ups[-1][0].c0)
    t_ctos = (time.perf_counter() - t0) / args.iters
    t0 = time.perf_counter()
    outs = [btp.stoc(u, l) for u, l in ups]
    sync(outs[-1].c0)
    t_stoc = (time.perf_counter() - t0) / args.iters

    got = ctx.decrypt_decode_coeffs(outs[-1])
    err = float(np.max(np.abs(got - v * (1.0 - 1e-6 * args.iters))))
    res = {
        "logn": args.logn, "log_sparse": args.ls,
        "ctos_s": round(t_ctos, 3), "stoc_s": round(t_stoc, 3),
        "boot_s": round(t_ctos + t_stoc, 3),
        "boots_per_sec": round(1.0 / (t_ctos + t_stoc), 3),
        "roundtrip_err": err,
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
