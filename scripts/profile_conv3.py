#!/usr/bin/env python
"""Separate sync round-trip cost from device compute for the conv bench.

Enqueues K conv_then_pack calls on distinct inputs WITHOUT intermediate
host syncs, then drains once:  per-call = (total - 0)/K with the single
round-trip amortized.  Also measures the bare sync round-trip.
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    import numpy as np

    from optimal_conv_tpu.ckks.params import CkksParams
    from optimal_conv_tpu.ckks.context import CkksContext
    from optimal_conv_tpu.ops import conv as convops
    from optimal_conv_tpu.utils.timing import sync

    log_n = 16
    in_wid, ker_wid, batch = 128, 3, 4
    raw_wid = in_wid - ker_wid // 2
    params = CkksParams(log_n=log_n, logq=(60, 45), logp=(61,),
                        log_scale=30, h=192)
    ctx = CkksContext(params, seed=0)
    p = params
    rng = np.random.default_rng(0)

    img = rng.uniform(-1, 1, (raw_wid, raw_wid, batch))
    inp = convops.prep_input(img.ravel(), raw_wid, in_wid, p.n, 1)
    K = 16
    cts = [ctx.encrypt(ctx.encoder.encode_coeffs(
        inp * (1.0 - 1e-6 * i), p.scale, 1)) for i in range(K + 1)]

    ker = rng.uniform(-1, 1, (ker_wid, ker_wid, batch, batch)) / 9.0
    bn_a = rng.uniform(0.8, 1.2, batch)
    bn_b = rng.uniform(-0.2, 0.2, batch)
    max_batch = p.n // (in_wid * in_wid)
    out_scale = float(1 << 30)
    pl = convops.prep_ker(ctx, ker.ravel(), bn_a, in_wid, ker_wid, batch,
                          batch, 1, 1, 0, False)
    b_coeffs = np.zeros(p.n)
    for i, b in enumerate(bn_b):
        b_coeffs[i::max_batch] = b
    pl_b = ctx.encoder.encode_coeffs(b_coeffs, out_scale, 0, mont=False)

    def run(ct_in):
        return convops.conv_then_pack(ctx, ct_in, pl, max_batch, 1,
                                      out_scale, bias_pt=pl_b)

    o = run(cts[0])
    sync(o.c0, o.c1)                      # compile + drain

    # bare sync round-trip on an already-materialized array
    t0 = time.perf_counter()
    for _ in range(10):
        sync(o.c0)
    print("bare sync roundtrip      %7.2f ms" %
          ((time.perf_counter() - t0) / 10 * 1e3), flush=True)

    # K calls, one drain
    t0 = time.perf_counter()
    outs = [run(cts[1 + i]) for i in range(K)]
    sync(outs[-1].c0, outs[-1].c1)
    dt = (time.perf_counter() - t0) / K
    print("conv chained (K=%d)      %7.2f ms/call" % (K, dt * 1e3),
          flush=True)

    # per-call with sync every iteration (bench.py's current method)
    t0 = time.perf_counter()
    for i in range(5):
        oo = run(cts[1 + i])
        sync(oo.c0, oo.c1)
    print("conv synced each call    %7.2f ms/call" %
          ((time.perf_counter() - t0) / 5 * 1e3), flush=True)


if __name__ == "__main__":
    main()
